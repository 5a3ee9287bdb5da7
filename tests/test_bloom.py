"""Bloom membership screen (X38): no false negatives, bounded FPR,
build-contract assert, two-tier parity with the exact screen."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.operators import bloom


def test_bloom_no_false_negatives_and_low_fpr(spark):
    corpus = spark.createDataFrame(
        [(i, f"member text {i}") for i in range(3000)], "id long, t string"
    )
    probe = spark.createDataFrame(
        [(i, f"member text {i}") for i in range(2800, 3000)]
        + [(i, f"novel text {i}") for i in range(5000, 7000)],
        "id long, t string",
    )
    bm = bloom.build_bloom(corpus, F.col("t"), num_bits=1 << 17, num_hashes=4)
    got = probe.withColumn("maybe", bloom.bloom_flag(F.col("t"), bm)).toPandas()
    members = got[got.id < 3000]
    novel = got[got.id >= 5000]
    assert bool(members.maybe.all())            # Bloom contract: no FN
    # theoretical FPR at m=131072, n=3000, k=4 is ~4e-5; allow slack
    assert float(novel.maybe.mean()) < 0.01


def test_build_bloom_asserts_collect_ceiling(spark):
    df = spark.createDataFrame([(1, "x")], "id long, t string")
    with pytest.raises(ValueError, match="max_build_mb"):
        bloom.build_bloom(df, F.col("t"), num_bits=1 << 23, max_build_mb=1)


def test_two_tier_screen_equals_exact_membership(spark, sf_dir):
    from data_pipeline_bigquery_to_sftp_server_spark.catalog import load_table
    from data_pipeline_bigquery_to_sftp_server_spark.operators.dedup import (
        normalize_text,
    )

    d = load_table(spark, sf_dir, "documents")
    new = d.where(F.col("doc_id") % 10 == 0)
    corpus = d.where(F.col("doc_id") % 10 != 0)
    bm = bloom.build_bloom(corpus, normalize_text(F.col("text")), num_bits=1 << 18)
    flagged = new.withColumn(
        "maybe", bloom.bloom_flag(normalize_text(F.col("text")), bm)
    )
    exact_fp = corpus.select(
        F.xxhash64(normalize_text(F.col("text"))).alias("_fp")
    ).dropDuplicates()
    exact_dups = set(
        r.doc_id
        for r in new.withColumn("_fp", F.xxhash64(normalize_text(F.col("text"))))
        .join(exact_fp, "_fp", "left_semi")
        .select("doc_id")
        .collect()
    )
    maybe_ids = set(r.doc_id for r in flagged.where("maybe").select("doc_id").collect())
    assert exact_dups <= maybe_ids  # every true dup survives the prefilter
