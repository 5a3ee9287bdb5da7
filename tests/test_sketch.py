"""Sketch-then-verify heavy hitters (operators/sketch.py): candidates
from Misra-Gries, counts exact, result == exact top-k when the k-th
frequency clears N/capacity."""

from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.catalog import load_table
from data_pipeline_bigquery_to_sftp_server_spark.functions import text
from data_pipeline_bigquery_to_sftp_server_spark.operators import sketch


def test_heavy_hitters_equals_exact_topk(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    toks = text.tokenize(F.col("text"))
    exact = (
        d.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
        .collect()
    )
    got = sketch.heavy_hitters(d, toks, k=20, capacity=256).collect()
    assert [(r.token, r.n) for r in got] == [(r.token, r.n) for r in exact]


def test_heavy_hitters_survives_eviction(spark):
    """capacity far below cardinality forces the decrement-all path;
    the guaranteed-heavy item (freq > N/capacity) must still surface
    with its EXACT count, and every reported count must be exact."""
    rows = []
    # 200 occurrences of 'hot', 400 singletons -> N=600; capacity=4
    # threshold N/cap=150 < 200, so 'hot' must survive every batch it
    # dominates and be verified exactly.
    for i in range(200):
        rows.append((i, "hot"))
    for i in range(400):
        rows.append((1000 + i, f"rare{i}"))
    df = spark.createDataFrame(rows, "id long, word string").repartition(4)
    out = sketch.heavy_hitters(
        df, F.array(F.col("word")), k=3, capacity=4
    ).collect()
    assert out[0].token == "hot" and out[0].n == 200
    exact = {
        r.word: r.n
        for r in df.groupBy("word").agg(F.count("*").alias("n")).collect()
    }
    for r in out:
        assert exact[r.token] == r.n  # verify pass is exact, always
