"""HyperLogLog sketch (X58c): register state, mergeability,
duplicate-insensitivity, both estimator arms, save/load lifecycle."""

import pyspark.sql.functions as F
import pytest

from data_pipeline_bigquery_to_sftp_server_spark.operators.sketch import (
    hll_absorb,
    hll_estimate,
    hll_linear_count_table,
    hll_state,
    load_hll_state,
    save_hll_state,
)


def _vals(spark, n, g="g", start=0):
    return spark.range(start, start + n).select(
        F.lit(g).alias("grp"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )


def _est(state):
    return {r.grp: r for r in hll_estimate(state, "grp").collect()}


def test_state_is_duplicate_insensitive(spark):
    once = _vals(spark, 50)
    thrice = once.unionAll(once).unionAll(once)
    a = sorted(map(tuple, hll_state(once, "v", "grp").collect()))
    b = sorted(map(tuple, hll_state(thrice, "v", "grp").collect()))
    assert a == b and len(a) <= 64


def test_absorb_equals_one_shot(spark):
    df = _vals(spark, 400)
    left = df.where(F.col("v") < "v2")
    right = df.subtract(left)
    merged = hll_absorb(
        hll_state(left, "v", "grp"), hll_state(right, "v", "grp"), "grp"
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, hll_state(df, "v", "grp").collect())
    )


def test_linear_counting_arm_uses_lookup(spark):
    df = _vals(spark, 20)
    r = _est(hll_state(df, "v", "grp"))["g"]
    assert r.zeros > 0
    table = hll_linear_count_table(64)
    assert r.est_distinct == table[r.zeros]
    assert abs(r.est_distinct - 20) / 20 < 0.5


def test_raw_arm_fires_at_high_cardinality(spark):
    df = _vals(spark, 3000)
    r = _est(hll_state(df, "v", "grp"))["g"]
    # raw harmonic estimate: not a lookup value, within ~3 sigma of
    # truth (1.04/sqrt(64) ~ 13% per sigma)
    assert r.est_distinct > 2.5 * 64
    assert abs(r.est_distinct - 3000) / 3000 < 0.4


def test_save_load_roundtrip_and_absorb_after_load(spark, tmp_path):
    a = _vals(spark, 100)
    b = _vals(spark, 100, start=80)  # overlapping -> union of sets
    st_a = hll_state(a, "v", "grp")
    path = str(tmp_path / "hll")
    save_hll_state(st_a, path, "grp")
    loaded, grp_col, p, salt = load_hll_state(spark, path)
    assert (grp_col, p, salt) == ("grp", 6, "hll")
    resumed = hll_absorb(loaded, hll_state(b, "v", "grp"), grp_col)
    continuous = hll_absorb(st_a, hll_state(b, "v", "grp"), "grp")
    assert sorted(map(tuple, resumed.collect())) == sorted(
        map(tuple, continuous.collect())
    )
