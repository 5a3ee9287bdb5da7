"""NULL-quirk parity tests for the scalar layer (SURVEY §2.8, §5:
'unit level: null-semantics edge cases — 0-epoch, empty-string,
empty-array, malformed JSON')."""

import pandas as pd
from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.functions import scalar


def one_col(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_seconds_to_readable_zero_and_null(spark):
    df = one_col(spark, [(0,), (None,), (1700000000,)], "epoch bigint")
    out = df.select(scalar.seconds_to_readable(F.col("epoch")).alias("s")).collect()
    assert out[0].s is None  # 0-epoch -> NULL (main.py:235-236)
    assert out[1].s is None
    assert out[2].s == "2023-11-14 22:13:20"  # UTC


def test_seconds_to_date_only(spark):
    df = one_col(spark, [(0,), (1700000000,)], "epoch bigint")
    out = df.select(scalar.seconds_to_date_only(F.col("epoch")).alias("s")).collect()
    assert out[0].s is None
    assert out[1].s == "2023-11-14"


def test_empty_string_to_null(spark):
    df = one_col(spark, [("",), ("x",), (None,)], "s string")
    out = df.select(scalar.empty_to_null(F.col("s")).alias("s")).collect()
    assert [r.s for r in out] == [None, "x", None]


def test_empty_array_to_null(spark):
    df = spark.createDataFrame([([],), (["a"],), (None,)], "a array<string>")
    out = df.select(scalar.empty_array_to_null(F.col("a")).alias("a")).collect()
    assert out[0].a is None  # [] -> NULL (main.py:429-430)
    assert out[1].a == ["a"]
    assert out[2].a is None


def test_py_bool_str(spark):
    df = one_col(spark, [(True,), (False,), (None,)], "b boolean")
    out = df.select(scalar.py_bool_str(F.col("b")).alias("s")).collect()
    assert [r.s for r in out] == ["True", "False", None]


def test_py_list_str(spark):
    df = spark.createDataFrame([(["a", "b"],), ([],)], "a array<string>")
    out = df.select(scalar.py_list_str(F.col("a")).alias("s")).collect()
    assert out[0].s == "['a', 'b']"  # Python repr shape (main.py:301-305)
    assert out[1].s == "[]"


def test_json_parse_lenient(spark):
    df = one_col(spark, [('{"k": 1}',), ("not json",), (None,)], "j string")
    out = df.select(scalar.json_parse(F.col("j"), "k INT")["k"].alias("k")).collect()
    assert [r.k for r in out] == [1, None, None]  # malformed -> NULL (main.py:218-219)


def test_json_serialize_empty_rules(spark):
    df = spark.createDataFrame([([],), (["a"],), (None,)], "a array<string>")
    out = df.select(scalar.json_serialize(F.col("a"), container=True).alias("s")).collect()
    assert out[0].s is None  # empty -> NULL (main.py:318)
    assert out[1].s == '["a"]'
    assert out[2].s is None


def test_clean_html_exact_parity(spark):
    """Pandas-UDF cleaner reproduces the reference SAX pipeline
    (main.py:104-122): unescape -> strip tags -> collapse -> empty->None."""
    rows = [
        ("<p>Hello <b>world</b></p>",),
        ("&lt;tag&gt; &amp; entity",),
        ("   ",),
        ("",),
        (None,),
        ("a\n\n  b",),
    ]
    df = spark.createDataFrame(rows, "h string")
    out = df.select(scalar.clean_html(F.col("h")).alias("t")).collect()
    assert out[0].t == "Hello world"
    assert out[1].t == "& entity"  # '<tag>' parses as a tag after unescape, dropped
    assert out[2].t is None
    assert out[3].t is None
    assert out[4].t is None
    assert out[5].t == "a b"


def test_clean_html_native_approximation(spark):
    df = spark.createDataFrame([("<p>Hello <b>world</b></p>",), ("x &amp; y",)], "h string")
    out = df.select(scalar.clean_html_native(F.col("h")).alias("t")).collect()
    assert out[0].t == "Hello world"
    assert out[1].t == "x & y"


def test_collapse_whitespace(spark):
    df = spark.createDataFrame([("  a\t\nb   c ",)], "s string")
    assert df.select(scalar.collapse_whitespace(F.col("s")).alias("s")).first().s == "a b c"


def test_email_struct_null_when_both_null(spark):
    df = spark.createDataFrame([("a@b.c", "A"), (None, None)], "email string, name string")
    out = df.select(scalar.email_struct(F.col("email"), F.col("name")).alias("e")).collect()
    assert out[0].e.email == "a@b.c" and out[0].e.name == "A"
    assert out[1].e is None  # falsy input -> NULL struct (main.py:203-209)


def test_bool_and_default_coercions(spark):
    df = spark.createDataFrame([(None,), (True,)], "b boolean")
    out = df.select(scalar.bool_with_default(F.col("b")).alias("b")).collect()
    assert [r.b for r in out] == [False, True]
    df2 = spark.createDataFrame([(None,), (5,)], "v int")
    out2 = df2.select(scalar.default_on_missing(F.col("v"), 0).alias("v")).collect()
    assert [r.v for r in out2] == [0, 5]


def test_variant_malformed_json_is_null(spark):
    """The reference swallows JSON parse errors to None (main.py:215-222);
    the VARIANT path must keep that rule: try_parse_json(malformed) ->
    NULL, and variant_get on NULL stays NULL."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [('{"k": 1}',), ("not json",), (None,), ('{"k": null}',)], "props string"
    )
    out = df.select(
        F.variant_get(F.try_parse_json("props"), "$.k", "bigint").alias("k")
    ).collect()
    assert [r.k for r in out] == [1, None, None, None]
