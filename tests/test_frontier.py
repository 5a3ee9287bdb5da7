"""Skyline (Pareto frontier) — operators/frontier.py."""

from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.operators.frontier import skyline_2d


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_skyline_basic(spark):
    # frontier: (5,1), (3,4), (1,9); dominated: (2,2) by (3,4),
    # (3,1) by (3,4) and (5,1)... (3,1): x=3,y=1 dominated by (3,4).
    df = spark.createDataFrame(
        [("a", 5, 1), ("b", 3, 4), ("c", 1, 9), ("d", 2, 2), ("e", 3, 1)],
        "id string, x int, y int",
    )
    out = _rows(skyline_2d(df, "x", "y").select("id", "x", "y"))
    assert out == {("a", 5, 1), ("b", 3, 4), ("c", 1, 9)}


def test_skyline_ties_survive_together(spark):
    # exact coordinate duplicates are mutually non-dominating: both stay
    df = spark.createDataFrame(
        [("a", 4, 4), ("b", 4, 4), ("c", 4, 3), ("d", 2, 5)],
        "id string, x int, y int",
    )
    out = _rows(skyline_2d(df, "x", "y").select("id"))
    assert out == {("a",), ("b",), ("d",)}


def test_skyline_same_x_lower_y_dominated(spark):
    df = spark.createDataFrame(
        [("a", 3, 9), ("b", 3, 8)], "id string, x int, y int"
    )
    assert _rows(skyline_2d(df, "x", "y").select("id")) == {("a",)}


def test_skyline_equal_y_across_x_strictness(spark):
    # (5,7) dominates (3,7): y ties but x is strict
    df = spark.createDataFrame(
        [("a", 5, 7), ("b", 3, 7)], "id string, x int, y int"
    )
    assert _rows(skyline_2d(df, "x", "y").select("id")) == {("a",)}


def test_skyline_nulls_excluded(spark):
    df = spark.createDataFrame(
        [("a", 1, 1), ("b", None, 99), ("c", 99, None)],
        "id string, x int, y int",
    )
    assert _rows(skyline_2d(df, "x", "y").select("id")) == {("a",)}


def test_skyline_matches_bruteforce_on_fixture(spark, sf_dir):
    per = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "s"
            ),
        )
    )
    fast = _rows(skyline_2d(per, "n", "s").select("o_custkey", "n", "s"))
    rows = per.collect()
    brute = {
        tuple(a)
        for a in rows
        if not any(
            (b.n >= a.n and b.s >= a.s and (b.n > a.n or b.s > a.s))
            for b in rows
        )
    }
    assert fast == brute
