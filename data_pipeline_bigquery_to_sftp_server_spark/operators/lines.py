"""Line-level corpus cleaning (C4 / Dolma rules, SURVEY §2.11).

Two operators that work on documents as ordered lists of LINES — the
granularity web-text boilerplate lives at:

- :func:`c4_line_filter` — C4's per-line cleaning (Raffel et al. 2020
  §2.2): keep only lines with at least ``min_words`` words and (by
  default) terminal punctuation; drop documents left empty. Pure
  map-side: the line split, per-line predicate, and reassembly are ONE
  higher-order-function expression over the split array — no explode,
  no shuffle, whole-stage codegen.
- :func:`corpus_line_dedup` — the corpus-WIDE rule (C4 "discard all
  but one of any three-sentence span occurring more than once",
  reduced to its line-granular Dolma form): remove every line whose
  normalized text occurs more than ``max_occurrences`` times ACROSS
  the corpus — nav bars, cookie banners, license headers. This one is
  inherently distributional: one line-hash count aggregation
  (map-side combinable), the duplicated-line set joined back via
  LEFT ANTI (duplicate-line vocabulary ≪ corpus → broadcast), and a
  per-doc reassembly keyed on the id (the one real shuffle).

Both preserve line order and return the document transform —
``(id_col, text)`` rebuilt — because the downstream pipeline consumes
documents, not line tables (same contract as dedup.py's span-removal
transform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.operators.scale import (
    ensure_parallelism,
)

# terminal punctuation per C4: sentence-enders, optionally followed by
# a closing quote
_TERMINAL_RE = r"[.!?][\"']?$"


def _line_words(line):
    return F.size(F.split(F.trim(F.regexp_replace(line, r"\s+", " ")), " "))


def c4_line_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    require_terminal: bool = True,
) -> DataFrame:
    """C4 per-line cleaning as one map-side expression. Returns
    ``(id_col, text, n_lines, n_kept)`` for documents with at least
    one surviving line; fully-stripped documents are dropped (C4
    discards them)."""
    lines = F.split(F.col(text_col), "\n")
    pred = lambda l: (_line_words(l) >= min_words) & (  # noqa: E731
        F.rtrim(l).rlike(_TERMINAL_RE) if require_terminal else F.lit(True)
    )
    kept = F.filter(lines, pred)
    return (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.array_join(kept, "\n").alias(text_col),
            F.size(lines).alias("n_lines"),
            F.size(kept).alias("n_kept"),
        )
        .where(F.col("n_kept") > 0)
    )


def corpus_line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_occurrences: int = 1,
) -> DataFrame:
    """Remove every line whose normalized form occurs more than
    ``max_occurrences`` times across the WHOLE corpus. Returns
    ``(id_col, text, n_lines, n_kept)`` — documents whose every line
    was boilerplate come back with empty text and n_kept = 0 (the
    caller's drop policy decides; the reference point is C4, which
    discards them).

    Scale shape: line counting is a (hash-keyed, map-side-combinable)
    aggregation; the over-limit line set is the DUPLICATED-line
    vocabulary — tiny relative to the corpus, so Spark broadcasts the
    anti join probe; reassembly shuffles once on the doc id with
    order restored from the carried line index (no window)."""
    norm = lambda l: F.trim(F.regexp_replace(F.lower(l), r"\s+", " "))  # noqa: E731
    lines = (
        ensure_parallelism(df.where(F.col(text_col).isNotNull()))
        .select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
        )
        .withColumn("_h", F.xxhash64(norm(F.col("_line"))))
    )
    over = (
        lines.groupBy("_h")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > int(max_occurrences))
        .select("_h")
    )
    kept = lines.join(over, "_h", "left_anti")
    return (
        kept.groupBy(id_col)
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                    lambda x: x["_line"],
                ),
            ).alias("_kept_text"),
            F.count("*").alias("n_kept"),
        )
        .join(
            df.where(F.col(text_col).isNotNull()).select(
                F.col(id_col), F.size(F.split(F.col(text_col), "\n")).alias("n_lines")
            ),
            id_col,
            "right",
        )
        .select(
            id_col,
            F.coalesce("_kept_text", F.lit("")).alias(text_col),
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


def dup_line_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """FineWeb-style WITHIN-document duplicate-line signals (Penedo et
    al. 2024: the `dup_line_frac` / `dup_line_char_frac` filters that,
    after exact dedup, were the highest-impact quality rules): per
    document, the fraction of lines whose normalized form occurs more
    than once inside the SAME document, and the fraction of characters
    living on those lines. Boilerplate-heavy pages (repeated nav rows,
    chat transcripts quoting themselves, scraped tables) score high
    and get dropped by a threshold the caller picks.

    Complements :func:`corpus_line_dedup` (corpus-WIDE multiplicity —
    needs an aggregation) and the bigram ``repetition_scores`` (token
    granularity): this one is per-doc only, so the whole computation
    is ONE higher-order-function expression over the line array —
    zero exchanges, whole-stage codegen end to end, embarrassingly
    parallel at any corpus size. The in-array membership count is
    O(lines^2) per doc, which is the right trade: web documents have
    tens of lines, and the alternative (explode + two shuffles) moves
    the whole corpus to count what each row already holds.

    Both fractions compute over NORMALIZED lines (lower, collapsed
    whitespace — the corpus_line_dedup key) so near-identical
    boilerplate matches; char mass is the normalized line's length.
    Returns ``(id_col, n_lines, dup_line_frac, dup_char_frac)``
    rounded to 6dp, one row per non-NULL-text document.
    """
    norm = lambda l: F.trim(F.regexp_replace(F.lower(l), r"\s+", " "))  # noqa: E731
    lines = F.transform(F.split(F.col(text_col), "\n"), norm)
    is_dup = lambda arr: (  # noqa: E731
        lambda l: F.size(F.filter(arr, lambda x: x == l)) > 1
    )
    dup_lines = F.filter(lines, is_dup(lines))
    chars = lambda arr: F.aggregate(  # noqa: E731
        F.transform(arr, F.length), F.lit(0), lambda acc, x: acc + x
    )
    total_chars = chars(lines)
    return (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.size(lines).alias("n_lines"),
            F.round(
                F.size(dup_lines).cast("double") / F.size(lines), 6
            ).alias("dup_line_frac"),
            F.round(
                F.when(
                    total_chars > 0,
                    chars(dup_lines).cast("double") / total_chars,
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_char_frac"),
        )
    )
