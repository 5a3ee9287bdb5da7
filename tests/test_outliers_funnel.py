"""IQR outlier fences (X55) and ordered funnel conversion (X56)."""

from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.operators.sampling import iqr_outliers


def test_iqr_outliers_flags_far_points(spark):
    rows = [(i, "a", v) for i, v in enumerate([10, 11, 12, 13, 14, 1000])]
    rows += [(100 + i, "b", v) for i, v in enumerate([5, 5, 5, 5])]
    df = spark.createDataFrame(rows, "id long, grp string, v long")
    out = {r.id: r for r in iqr_outliers(df, "v", "grp").collect()}
    assert out[5].is_outlier            # the 1000 in group a
    assert not out[0].is_outlier
    # group b: zero IQR -> fences collapse to the constant, nothing flagged
    assert not any(out[100 + i].is_outlier for i in range(4))
    # fences are per-group: group a's bounds differ from b's
    assert out[0].lo != out[100].lo


def test_iqr_outliers_exact_quartiles(spark):
    # [1,2,3,10]: q1=1.75, q3=4.75 (linear interpolation), iqr=3 ->
    # fences at -2.75 / 9.25 with k=1.5; 10 is out, 1..3 are in
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate([1, 2, 3, 10])], "id long, grp string, v long"
    )
    out = {r.id: r for r in iqr_outliers(df, "v", "grp", k=1.5).collect()}
    assert out[0].lo == -2.75 and out[0].hi == 9.25
    assert [out[i].is_outlier for i in range(4)] == [False, False, False, True]


def test_iqr_approx_tier_matches_exact_within_tolerance(spark, sf_dir):
    # the 100 TB tier (exact=False -> percentile_approx): fences within
    # sketch tolerance of exact on a real distribution, and at high
    # accuracy the outlier verdicts agree row-for-row on the fixture
    from data_pipeline_bigquery_to_sftp_server_spark.operators.sampling import (
        iqr_bounds,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {r._g: r for r in iqr_bounds(d, "n_chars", "source").collect()}
    approx = {
        r._g: r
        for r in iqr_bounds(
            d, "n_chars", "source", exact=False, accuracy=10_000
        ).collect()
    }
    assert exact.keys() == approx.keys()
    for g, e in exact.items():
        a = approx[g]
        span = max(e.hi - e.lo, 1.0)
        assert abs(a.lo - e.lo) <= 0.05 * span
        assert abs(a.hi - e.hi) <= 0.05 * span
    flags_exact = {
        r.doc_id: r.is_outlier
        for r in iqr_outliers(d, "n_chars", "source").collect()
    }
    flags_approx = {
        r.doc_id: r.is_outlier
        for r in iqr_outliers(
            d, "n_chars", "source", exact=False, accuracy=10_000
        ).collect()
    }
    agree = sum(flags_exact[i] == flags_approx[i] for i in flags_exact)
    assert agree / len(flags_exact) > 0.999


def test_funnel_requires_stage_order(spark, sf_dir):
    from data_pipeline_bigquery_to_sftp_server_spark.queries import (
        q_funnel_conversion,
    )

    rows = q_funnel_conversion(spark, sf_dir).collect()
    assert [r.stage for r in rows] == [1, 2, 3]
    assert [r.event_type for r in rows] == ["view", "click", "purchase"]
    # funnel counts are monotone non-increasing and stage 1 converts at 1.0
    assert rows[0].n_users >= rows[1].n_users >= rows[2].n_users
    assert rows[0].conv_rate == 1.0


def test_cohort_retention_offsets(spark, sf_dir):
    from data_pipeline_bigquery_to_sftp_server_spark.queries import (
        q_cohort_retention,
    )

    rows = q_cohort_retention(spark, sf_dir).collect()
    assert rows, "events fixture must produce cohorts"
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, []).append(r)
    for cw, cells in by_cohort.items():
        offs = [c.week_offset for c in cells]
        assert offs == sorted(offs) and offs[0] == 0
        base = cells[0]
        assert base.retention == 1.0
        # retention can never exceed the cohort size
        assert all(c.n_users <= base.n_users for c in cells)


def test_rolling_anomaly_matches_numpy_recompute(spark, sf_dir):
    """The trailing-7-day z must equal a literal numpy recompute from
    the emitted revenue series (exact-integer window sums -> one
    division + one sqrt, so equality is exact, not approximate)."""
    import math

    from data_pipeline_bigquery_to_sftp_server_spark import queries as Q

    rows = Q.q_rolling_anomaly(spark, sf_dir).collect()
    cents = [int(round(r.revenue * 100)) for r in rows]
    # rebuild the full daily series (the first 7 days were filtered):
    o = Q.load_table(spark, sf_dir, "orders")
    from pyspark.sql import functions as F

    daily = (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c"))
        .orderBy("day")
        .collect()
    )
    series = [(r.day, r.c) for r in daily]
    byday = {r.day: r for r in rows}
    n_checked = 0
    for i in range(7, len(series)):
        day, c = series[i]
        trail = [v for _, v in series[i - 7 : i]]
        s1, s2 = sum(trail), sum(v * v for v in trail)
        varnum = 7 * s2 - s1 * s1
        r = byday[day]
        if varnum > 0:
            z = (float(c) - float(s1) / 7.0) / math.sqrt(float(varnum) / 42.0)
            assert r.z == z, (day, r.z, z)
            assert r.is_anomaly == (abs(z) > 2.0)
            n_checked += 1
        else:
            assert r.z is None
    assert n_checked > 1000


def test_sequence_pattern_counts_nonoverlapping_matches(spark):
    import datetime as dt

    from data_pipeline_bigquery_to_sftp_server_spark.operators.sessions import (
        sequence_pattern,
    )

    def ev(uid, i, t):
        return (i, dt.datetime(2024, 1, 1, 0, i), uid, t)

    rows = [
        # user 1: v c p | v p  -> two matches of v[vc]*p
        ev(1, 0, "view"), ev(1, 1, "click"), ev(1, 2, "purchase"),
        ev(1, 3, "view"), ev(1, 4, "purchase"),
        # user 2: p v c  -> purchase BEFORE any view: no match
        ev(2, 0, "purchase"), ev(2, 1, "view"), ev(2, 2, "click"),
        # user 3: error events only
        ev(3, 0, "error"), ev(3, 1, "error"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r.user_id: r for r in sequence_pattern(df, "v[vc]*p").collect()}
    assert (out[1].n_matches, out[1].converted, out[1].first_path) == (2, 1, "vcp")
    assert (out[2].n_matches, out[2].converted, out[2].first_path) == (0, 0, "")
    assert out[3].n_matches == 0 and out[3].n_events == 2
    assert out[1].path_len == 3
