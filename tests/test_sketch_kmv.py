"""KMV distinct sketch (X61): estimate accuracy and mergeability."""

from data_pipeline_bigquery_to_sftp_server_spark.operators.sketch import (
    kmv_absorb,
    kmv_estimate,
    kmv_state,
    load_kmv_state,
    save_kmv_state,
)


def _vals(spark, grp, n, off=0):
    return spark.createDataFrame(
        [(grp, f"v{off + i}") for i in range(n)], "g string, v string"
    )


def test_kmv_exact_below_k(spark):
    df = _vals(spark, "a", 40)
    est = kmv_estimate(kmv_state(df, "v", "g", k=64), "g", k=64).collect()[0]
    assert est.n_sketch == 40 and est.est_distinct == 40.0


def test_kmv_estimate_within_bound(spark):
    df = _vals(spark, "a", 5000)
    est = kmv_estimate(kmv_state(df, "v", "g", k=64), "g", k=64).collect()[0]
    # 1/sqrt(62) ~ 13%; allow 4 sigma for a single deterministic draw
    assert abs(est.est_distinct - 5000) / 5000 < 0.5
    assert est.n_sketch == 64


def test_kmv_duplicates_collapse(spark):
    dup = _vals(spark, "a", 30).union(_vals(spark, "a", 30))
    est = kmv_estimate(kmv_state(dup, "v", "g", k=64), "g", k=64).collect()[0]
    assert est.est_distinct == 30.0


def test_kmv_absorb_equals_whole(spark):
    a, b = _vals(spark, "a", 3000), _vals(spark, "a", 3000, off=2500)  # overlap
    whole = a.union(b)
    sa, sb = kmv_state(a, "v", "g", k=64), kmv_state(b, "v", "g", k=64)
    merged = kmv_absorb(sa, sb, "g", k=64)
    direct = kmv_state(whole, "v", "g", k=64)
    assert sorted(r.u for r in merged.collect()) == sorted(
        r.u for r in direct.collect()
    )


def test_kmv_zero_uk_guard_falls_back_to_exact(spark):
    # a k-th smallest hash of exactly 0 cannot happen with md5, but the
    # estimate must not emit Infinity if it ever does (r9 advice):
    # manual state whose max(u) is 0 falls back to n_sketch.
    state = spark.createDataFrame(
        [("g1", i + 1, 0.0) for i in range(64)], "g string, pos int, u double"
    )
    est = kmv_estimate(state, "g", k=64).collect()[0]
    assert est.est_distinct == 64.0


def test_kmv_save_load_roundtrip_and_absorb_parity(spark, tmp_path):
    a, b = _vals(spark, "a", 3000), _vals(spark, "a", 3000, off=2500)
    sa = kmv_state(a, "v", "g", k=64, salt="kmv")
    path = str(tmp_path / "kmv_state")
    save_kmv_state(sa, path, "g", k=64, salt="kmv")
    loaded, group_col, k, salt = load_kmv_state(spark, path)
    # load . save == identity (params + the full k-row state)
    assert (group_col, k, salt) == ("g", 64, "kmv")
    assert sorted(map(tuple, loaded.collect())) == sorted(
        map(tuple, sa.collect())
    )
    # absorb-after-load == continuous absorb (the durability contract)
    sb = kmv_state(b, "v", group_col, k=k, salt=salt)
    after_load = kmv_absorb(loaded, sb, group_col, k=k)
    continuous = kmv_absorb(sa, sb, "g", k=64)
    assert sorted(r.u for r in after_load.collect()) == sorted(
        r.u for r in continuous.collect()
    )


def test_kmv_estimate_smaller_k_fails_loudly(spark):
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = _vals(spark, "a", 5000)
    state = kmv_state(df, "v", "g", k=64)
    with pytest.raises(SparkRuntimeException, match="built with a larger k"):
        # estimating a k=64 state with k=32 would silently halve the
        # estimate — must raise inside the plan instead (r10 review)
        kmv_estimate(state, "g", k=32).collect()


def test_two_level_tier_identical_to_window_tier(spark):
    # the billions-of-distincts tier must be a pure plan change: same
    # state rows, bit for bit, duplicates and multi-group included
    a = _vals(spark, "a", 3000)
    b = _vals(spark, "b", 200)
    df = a.union(b).union(_vals(spark, "a", 500))  # overlap dups in 'a'
    one = kmv_state(df, "v", "g", k=64)
    two = kmv_state(df, "v", "g", k=64, two_level=True)
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, two.collect()))


def test_kmv_set_estimates_exact_below_k(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators.sketch import kmv_set_estimates

    # |A|=30, |B|=25, overlap 15 -> union 40 < k=64: every estimate
    # must be EXACT (the merged sketch holds the whole union).
    a = _vals(spark, "a", 30)
    b = _vals(spark, "b", 25, off=15)
    st = kmv_state(a.union(b), "v", "g", k=64)
    row = kmv_set_estimates(st, "g", k=64).collect()[0]
    assert (row.ga, row.gb) == ("a", "b")
    assert row.n_merged == 40
    assert row.n_common == 15
    assert row.union_est == 40.0
    assert row.inter_est == 15.0
    assert abs(row.jaccard_est - 15 / 40) < 1e-12


def test_kmv_set_estimates_above_k_within_bound(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators.sketch import kmv_set_estimates

    # |A|=|B|=3000, overlap 1500 -> union 4500, jaccard 1/3; a k=256
    # sketch pair must land within a loose 4-sigma band.
    a = _vals(spark, "a", 3000)
    b = _vals(spark, "b", 3000, off=1500)
    st = kmv_state(a.union(b), "v", "g", k=256)
    row = kmv_set_estimates(st, "g", k=256).collect()[0]
    assert abs(row.union_est - 4500) / 4500 < 0.3
    assert abs(row.jaccard_est - 1 / 3) < 0.15
    assert row.n_merged == 256


def test_kmv_set_estimates_disjoint_groups(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators.sketch import kmv_set_estimates

    a = _vals(spark, "a", 20)
    b = _vals(spark, "b", 20, off=1000)
    st = kmv_state(a.union(b), "v", "g", k=64)
    row = kmv_set_estimates(st, "g", k=64).collect()[0]
    assert row.n_common == 0 and row.inter_est == 0.0 and row.jaccard_est == 0.0
    assert row.union_est == 40.0


def test_kmv_set_estimates_compose_from_absorbed_state(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators.sketch import kmv_set_estimates

    # Set estimates computed from a state assembled via kmv_absorb must
    # equal those from the directly-built state: mergeability composes.
    a1, a2 = _vals(spark, "a", 40), _vals(spark, "a", 40, off=20)
    b = _vals(spark, "b", 30, off=10)
    direct = kmv_state(a1.union(a2).union(b), "v", "g", k=64)
    absorbed = kmv_absorb(
        kmv_state(a1.union(b), "v", "g", k=64),
        kmv_state(a2, "v", "g", k=64),
        "g",
        k=64,
    )
    r1 = kmv_set_estimates(direct, "g", k=64).collect()[0]
    r2 = kmv_set_estimates(absorbed, "g", k=64).collect()[0]
    assert r1 == r2
