"""Sketch-then-verify heavy hitters (operators/sketch.py): candidates
from the vectorized per-batch frequency threshold, counts exact, result
== exact top-k when the k-th frequency clears N/capacity — and the
runtime guard fails loudly when it does not."""

import pytest
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
    # check_exact left at its default: the guard must PASS silently here
    # (f_k ~ 900 vs N/capacity ~ 110 on this corpus).
    got = sketch.heavy_hitters(d, toks, k=20, capacity=256).collect()
    assert [(r.token, r.n) for r in got] == [(r.token, r.n) for r in exact]


def test_threshold_recall_guarantee(spark):
    """The averaging argument: a token with global freq > N/capacity
    must clear the per-batch threshold in some batch, surface as a
    candidate, and be verified with its EXACT count — even with the
    candidate set squeezed far below token cardinality."""
    rows = []
    # 200 occurrences of 'hot', 400 singletons -> N=600; capacity=4
    # threshold N/cap=150 < 200, so 'hot' must surface exactly.
    for i in range(200):
        rows.append((i, "hot"))
    for i in range(400):
        rows.append((1000 + i, f"rare{i}"))
    df = spark.createDataFrame(rows, "id long, word string").repartition(4)
    # check_exact=False: the k=3 tail is singletons (f_3=1 <= N/cap),
    # i.e. legitimately not exact-top-k territory — the guard existing
    # to flag is tested separately below.
    out = sketch.heavy_hitters(
        df, F.array(F.col("word")), k=3, capacity=4, check_exact=False
    ).collect()
    assert out[0].token == "hot" and out[0].n == 200
    exact = {
        r.word: r.n
        for r in df.groupBy("word").agg(F.count("*").alias("n")).collect()
    }
    for r in out:
        assert exact[r.token] == r.n  # verify pass is exact, always


def test_exactness_guard_raises_on_undersized_capacity(spark):
    """Same skewed input, guard ON: f_3=1 <= N/capacity=150 must fail
    the job with the diagnostic, not silently return a doubtful tail."""
    rows = [(i, "hot") for i in range(200)]
    rows += [(1000 + i, f"rare{i}") for i in range(400)]
    df = spark.createDataFrame(rows, "id long, word string").repartition(4)
    hh = sketch.heavy_hitters(df, F.array(F.col("word")), k=3, capacity=4)
    with pytest.raises(Exception, match="heavy_hitters: exactness bound"):
        hh.collect()


def test_candidate_width_bounded(spark):
    """Per-batch candidate count stays below capacity (the summary-size
    bound the shuffle-volume claim rests on)."""
    rows = [(i, f"w{i % 50}") for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, word string").coalesce(1)
    toks = df.select(F.explode(F.array(F.col("word"))).alias("token"))
    cap = 8
    summary = toks.mapInPandas(
        sketch._batch_candidates(cap), "token string, n_batch long"
    ).collect()
    per_batch: dict[int, int] = {}
    batch = 0
    for r in summary:
        if r.token is None:
            batch += 1
        else:
            per_batch[batch] = per_batch.get(batch, 0) + 1
    for n_cands in per_batch.values():
        assert n_cands < cap
