"""Scalar expression library — exact-parity ports of the reference's
per-record transform helpers (SURVEY §2.8), as native Column expressions.

Each function reproduces the reference's quirky NULL semantics
(reference main.py):

- 0-epoch / NULL epoch -> NULL, never 1970-01-01 (main.py:234-241, 243-250)
- empty cleaned string -> NULL (main.py:292)
- empty array -> NULL (main.py:429-430)
- ``to_str`` preserves NULL (main.py:197-198)
- lenient JSON parse: malformed -> NULL (main.py:215-222)

Everything here is a pure ``Column -> Column`` expression (JVM-side,
whole-stage-codegen eligible); only the exact-parity HTML cleaner
(SAX-equivalent tag strip + entity unescape, main.py:41-55, 104-122)
drops to a vectorized Pandas UDF, with a regex-based native
approximation offered for the hot path.
"""

from __future__ import annotations

import html as _html
import re as _re
from html.parser import HTMLParser as _HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# F1: to_str — stringify, preserve NULL (main.py:197-198)
# ---------------------------------------------------------------------------


def to_str(col: Column) -> Column:
    """``str(v) if v is not None else None``.

    Plain ``cast("string")`` already preserves NULL; Python-repr quirks for
    bools ("True"/"False") are handled by :func:`py_bool_str`.
    """
    return col.cast("string")


def py_bool_str(col: Column) -> Column:
    """Python-repr stringification of a boolean: ``True``/``False``
    (Spark's cast produces ``true``/``false``; the reference stringifies
    via ``str()``, main.py:310 ``isRead``)."""
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(col, F.lit("True")).otherwise(F.lit("False"))
    )


def py_list_str(col: Column) -> Column:
    """Python-repr of a list of strings: ``['a', 'b']`` (main.py:301-305
    stringifies arrays with ``str(list)``). NULL-preserving. Delegates
    to :func:`py_repr` so element quoting/escaping follows the same
    Python-parity rules everywhere."""
    return py_repr(col, T.ArrayType(T.StringType()))


def py_repr(col: Column, dtype: T.DataType) -> Column:
    """Generalized Python-``str()`` rendering of an arbitrarily nested
    value — the reference stringifies whole Python objects with
    ``to_str`` (main.py:197-198), including list-of-dict fields like
    ``discounts`` (main.py:305), producing reprs such as
    ``[{'code': 'WELCOME', 'amount': 10}]``.

    Pure Column-expression recursion over the *static* schema (pass the
    field's DataType): strings quote like Python ``repr`` — single
    quotes normally, DOUBLE quotes when the value contains ``'`` but no
    ``"`` (``str(["it's"]) == '["it\\'s"]'`` renders ``["it's"]``) —
    with ``\\``/newline/CR/tab escaped as ``\\\\``/``\\n``/``\\r``/
    ``\\t``; booleans render ``True``/``False``, integers bare, NULL
    elements render ``None`` (Python ``str(None)``), structs render as
    dicts in field order, arrays as lists. Top-level NULL is preserved
    as SQL NULL (to_str semantics).

    Documented divergences from CPython's repr: floats are rejected
    (shortest-round-trip repr has no SQL equivalent — cast first), and
    control characters other than ``\\n``/``\\r``/``\\t`` (e.g.
    ``\\x00``-``\\x08``) plus non-printable Unicode are passed through
    raw instead of ``\\xNN``/``\\uNNNN``-escaped.
    """

    def render(c: Column, dt: T.DataType) -> Column:
        # Inner nulls render as Python's 'None'
        if isinstance(dt, T.StringType):
            esc = F.replace(c, F.lit("\\"), F.lit("\\\\"))
            esc = F.replace(esc, F.lit("\n"), F.lit("\\n"))
            esc = F.replace(esc, F.lit("\r"), F.lit("\\r"))
            esc = F.replace(esc, F.lit("\t"), F.lit("\\t"))
            # Python's quote selection: prefer ', switch to " when the
            # value has a ' and no " (then ' needs no escape).
            body = F.when(
                c.contains("'") & ~c.contains('"'),
                F.concat(F.lit('"'), esc, F.lit('"')),
            ).otherwise(
                F.concat(
                    F.lit("'"),
                    F.replace(esc, F.lit("'"), F.lit("\\'")),
                    F.lit("'"),
                )
            )
        elif isinstance(dt, T.BooleanType):
            body = F.when(c, F.lit("True")).otherwise(F.lit("False"))
        elif isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            body = c.cast("string")
        elif isinstance(dt, T.ArrayType):
            body = F.concat(
                F.lit("["),
                F.array_join(
                    F.transform(c, lambda e: render(e, dt.elementType)), ", "
                ),
                F.lit("]"),
            )
        elif isinstance(dt, T.StructType):
            parts: list[Column] = []
            for i, fld in enumerate(dt.fields):
                prefix = "{" if i == 0 else ", "
                parts.append(
                    F.concat(
                        F.lit(f"{prefix}'{fld.name}': "),
                        render(c.getField(fld.name), fld.dataType),
                    )
                )
            body = F.concat(*parts, F.lit("}"))
        else:
            raise TypeError(f"py_repr: unsupported type {dt.simpleString()}")
        # when/otherwise, not coalesce: a NULL struct still concat()s its
        # literal field-name parts into a non-NULL string, so coalesce
        # would render "{'f': None}" where Python prints "None".
        return F.when(c.isNull(), F.lit("None")).otherwise(body)

    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(render(col, dtype))


# ---------------------------------------------------------------------------
# F5/F6: epoch seconds -> formatted string, 0/NULL -> NULL (main.py:234-250)
# ---------------------------------------------------------------------------


def seconds_to_readable(col: Column) -> Column:
    """Epoch **seconds** (not ms; main.py:258 stresses no ``/1000``) ->
    ``yyyy-MM-dd HH:mm:ss`` UTC string; 0/NULL -> NULL (main.py:234-241)."""
    return F.when(
        col.isNull() | (col.cast("double") == 0),
        F.lit(None).cast("string"),
    ).otherwise(F.date_format(F.timestamp_seconds(col), "yyyy-MM-dd HH:mm:ss"))


def seconds_to_date_only(col: Column) -> Column:
    """Epoch seconds -> ``yyyy-MM-dd`` UTC string; 0/NULL -> NULL
    (main.py:243-250)."""
    return F.when(
        col.isNull() | (col.cast("double") == 0),
        F.lit(None).cast("string"),
    ).otherwise(F.date_format(F.timestamp_seconds(col), "yyyy-MM-dd"))


# ---------------------------------------------------------------------------
# F4/F14/F17/F18: string hygiene
# ---------------------------------------------------------------------------


def collapse_whitespace(col: Column) -> Column:
    """``re.sub(r'\\s+', ' ', s).strip()`` (main.py:116, 122).

    ``(?U)`` (UNICODE_CHARACTER_CLASS) makes Java's ``\\s`` match
    Unicode whitespace like Python's does — U+00A0 NBSP matters for
    HTML-derived text. Known remaining divergence: Python also treats
    U+001C-U+001F as whitespace, Java never does; not worth leaving
    whole-stage codegen over control chars.

    ORACLE-PARITY NOTE: DuckDB's RE2 ``\\s`` is ASCII-only, so any
    oracle SQL replaying this function must pre-normalize Unicode
    whitespace (e.g. ``replace(s, chr(160), ' ')`` before the
    ``regexp_replace``) or it diverges on exactly the non-ASCII inputs
    this (?U) flag exists for. _ORACLE_CLEAN_TEXT normalizes NBSP that
    way; the sync-pipeline oracle documents the assumption instead
    (its test corpus is ASCII, where parity holds trivially).
    """
    return F.trim(F.regexp_replace(col, r"(?U)\s+", " "))


def empty_to_null(col: Column) -> Column:
    """``s or None`` for strings — empty string becomes NULL (main.py:292)."""
    return F.nullif(col, F.lit(""))


def truncate(col: Column, n: int) -> Column:
    """``s[:n]`` (main.py:454 subject[:50], :506 errors[:10])."""
    return F.substring(col, 1, n)


# ---------------------------------------------------------------------------
# F2/F3: HTML unescape + tag strip (main.py:41-55, 104-122)
# ---------------------------------------------------------------------------


class _HTMLTextExtractor(_HTMLParser):
    """SAX-style text extractor equivalent in behavior to the reference's
    HTMLTextExtractor (main.py:41-55): keep text nodes, join with spaces."""

    def __init__(self) -> None:
        super().__init__()
        self.parts: list[str] = []

    def handle_data(self, data: str) -> None:
        if data and data.strip():
            self.parts.append(data.strip())

    def text(self) -> str:
        return " ".join(self.parts)


def _clean_html_one(s: str | None) -> str | None:
    """Exact-parity HTML clean (main.py:104-122): unescape entities, strip
    tags via SAX parse, collapse whitespace; empty result -> None."""
    if s is None or not s:
        return None
    try:
        unescaped = _html.unescape(s)
        parser = _HTMLTextExtractor()
        parser.feed(unescaped)
        parser.close()
        out = _re.sub(r"\s+", " ", parser.text()).strip()
    except Exception:
        out = _re.sub(r"\s+", " ", _re.sub(r"<[^>]+>", " ", s)).strip()
    return out or None


@pandas_udf(T.StringType())
def clean_html(s: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) exact-parity HTML cleaner.

    The slow path by design: only used when byte-parity with the
    reference's SAX cleaning matters. Prefer :func:`clean_html_native`
    in 100 TB hot paths.
    """
    return s.map(_clean_html_one)


def clean_html_native(col: Column) -> Column:
    """Whole-stage-codegen approximation of F2+F3+F4: entity decode for
    the common entities, regex tag strip, whitespace collapse, empty->NULL.
    """
    no_tags = F.regexp_replace(col, r"<[^>]+>", " ")
    # Order matters: &amp; last so "&amp;lt;" decodes once like html.unescape.
    decoded = no_tags
    for ent, ch in [
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ]:
        decoded = F.regexp_replace(decoded, ent, ch)
    return empty_to_null(collapse_whitespace(decoded))


# ---------------------------------------------------------------------------
# F7/F8: lenient JSON parse / serialize (main.py:215-222, 309, 318)
# ---------------------------------------------------------------------------


def json_parse(col: Column, schema: str | T.DataType) -> Column:
    """Lenient parse: malformed JSON -> NULL (matches the reference's
    swallow-errors ``json.loads``, main.py:215-222). ``from_json`` is
    already lenient in this exact way."""
    return F.from_json(col, schema)


def json_serialize(col: Column, container: bool = False) -> Column:
    """``json.dumps(x) if x else None`` (main.py:309, 318): NULL and
    *empty* values serialize to NULL (empty dict/list is falsy in
    Python). Also covers PERMISSIVE from_json of malformed input, which
    yields an all-NULL struct -> "{}" -> NULL, matching the reference's
    lenient-parse-then-skip behavior.

    ``container=True`` adds the empty-array/map -> NULL rule via size()
    (only analyzable on array/map columns).
    """
    is_empty = col.isNull() | (F.size(col) == 0) if container else col.isNull()
    out = F.when(is_empty, F.lit(None).cast("string")).otherwise(F.to_json(col))
    return F.nullif(F.nullif(out, F.lit("{}")), F.lit("[]"))


# ---------------------------------------------------------------------------
# F9/F10/F11: struct & array-of-struct shaping (main.py:203-209, 299, 429-430)
# ---------------------------------------------------------------------------


def email_struct(email: Column, name: Column) -> Column:
    """``{'email': ..., 'name': ...}`` or NULL when the source is falsy
    (main.py:203-209)."""
    return F.when(
        email.isNull() & name.isNull(), F.lit(None).cast("struct<email:string,name:string>")
    ).otherwise(F.struct(email.cast("string").alias("email"), name.cast("string").alias("name")))


def map_to_structs(col: Column, builder) -> Column:
    """``[f(e) for e in (x or [])]`` (main.py:299): NULL array treated as
    empty, per-element struct build via the higher-order ``transform``."""
    return F.transform(F.coalesce(col, F.array()), builder)


def empty_array_to_null(col: Column) -> Column:
    """``[] -> None`` (main.py:429-430)."""
    return F.when(F.size(F.coalesce(col, F.array())) == 0, F.lit(None)).otherwise(col)


# ---------------------------------------------------------------------------
# F12/F13: coercion defaults (main.py:286, 200, 301-306)
# ---------------------------------------------------------------------------


def bool_with_default(col: Column, default: bool = False) -> Column:
    """``bool(x.get(k, False))`` (main.py:286, 307-308)."""
    return F.coalesce(col.cast("boolean"), F.lit(default))


def default_on_missing(col: Column, default) -> Column:
    """``.get(k, default)`` (main.py:200, 301-306)."""
    return F.coalesce(col, F.lit(default))
