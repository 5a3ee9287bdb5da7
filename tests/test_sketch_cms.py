"""Count-min sketch (X11b): bounded state, one-sided error,
exactness at sufficient width, mergeability, unseen probes."""

import pyspark.sql.functions as F

from data_pipeline_bigquery_to_sftp_server_spark.operators.sketch import (
    cms_absorb,
    cms_lookup,
    cms_state,
)


def _stream(spark, n=2000, card=40):
    # value i%card occurs n/card times each
    return spark.range(0, n).select(
        F.concat(F.lit("v"), (F.col("id") % card)).alias("v")
    )


def test_estimates_are_one_sided_and_state_is_bounded(spark):
    df = _stream(spark)
    st = cms_state(df, "v", depth=3, width=8)  # heavy collisions
    assert st.count() <= 3 * 8
    probes = df.dropDuplicates(["v"])
    est = {r.v: r.est_count for r in cms_lookup(st, probes, "v", depth=3, width=8).collect()}
    assert len(est) == 40
    assert all(c >= 50 for c in est.values())  # never under true count
    assert any(c > 50 for c in est.values())  # width 8 < 40 must collide


def test_exact_at_sufficient_width(spark):
    df = _stream(spark, n=400, card=10)
    st = cms_state(df, "v", depth=4, width=4096)
    probes = df.dropDuplicates(["v"])
    est = cms_lookup(st, probes, "v", depth=4, width=4096).collect()
    assert all(r.est_count == 40 for r in est)


def test_unseen_probe_estimates_zero_when_uncollided(spark):
    df = _stream(spark, n=100, card=5)
    st = cms_state(df, "v", depth=4, width=4096)
    probes = df.sparkSession.createDataFrame([("never-seen",)], "v string")
    [r] = cms_lookup(st, probes, "v", depth=4, width=4096).collect()
    assert r.est_count == 0


def test_absorb_equals_one_shot(spark):
    df = spark.range(0, 2000).select(
        F.col("id"), F.concat(F.lit("v"), (F.col("id") % 40)).alias("v")
    )
    left, right = df.where("id < 900"), df.where("id >= 900")
    merged = cms_absorb(
        cms_state(left, "v", depth=3, width=32),
        cms_state(right, "v", depth=3, width=32),
    )
    one_shot = cms_state(df, "v", depth=3, width=32)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, one_shot.collect())
    )
