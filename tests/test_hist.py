"""Mergeable histogram quantile sketch (X64): state mergeability,
durability, error bound vs the exact order statistic, and the signed-
domain guard."""

import pytest

from data_pipeline_bigquery_to_sftp_server_spark.operators.hist import (
    DEFAULT_UNIT,
    DEFAULT_WIDTH,
    hist_absorb,
    hist_quantiles,
    hist_state,
    load_hist_state,
    save_hist_state,
)


def _ev(spark, sf_dir):
    from data_pipeline_bigquery_to_sftp_server_spark.catalog import load_table

    return load_table(spark, sf_dir, "events")


def _cells(df):
    return sorted((r[0], r[1], r[2]) for r in df.collect())


def test_hist_absorb_equals_direct_build(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    from pyspark.sql import functions as F

    a = ev.where(F.col("event_id") % 3 == 0)
    b = ev.where(F.col("event_id") % 3 != 0)
    direct = hist_state(ev, "value", "event_type")
    merged = hist_absorb(
        hist_state(a, "value", "event_type"),
        hist_state(b, "value", "event_type"),
        "event_type",
    )
    assert _cells(direct) == _cells(merged)


def test_hist_quantile_error_bounded_by_bucket_width(spark, sf_dir):
    from data_pipeline_bigquery_to_sftp_server_spark import queries as Q

    rows = Q.q_hist_quantiles(spark, sf_dir).collect()
    bound = DEFAULT_WIDTH / DEFAULT_UNIT
    assert len(rows) == 20  # 5 event types x 4 percentiles
    for r in rows:
        assert abs(r.err) <= bound, (r.event_type, r.p, r.err)
        assert r.est >= 0.0


def test_derived_width_bounds_error_on_zipf(spark):
    """Heavy-tail accuracy tier (r10 verdict #7): on a Zipf-like metric
    the DEFAULT fixed width smears every mid quantile into bucket 0
    (realized error ~ the 5.0 bucket width), while the IQR-derived
    width keeps the realized error within IQR/buckets_per_iqr."""
    from pyspark.sql import functions as F

    from data_pipeline_bigquery_to_sftp_server_spark.operators.hist import (
        derive_hist_width,
    )

    n = 5000
    zipf = spark.range(1, n + 1).select(
        F.lit("z").alias("g"), (F.lit(1000.0) / F.col("id")).alias("v")
    )
    exact = dict(
        zip([25, 50, 75], zipf.approxQuantile("v", [0.25, 0.5, 0.75], 0.0))
    )

    def realized(width):
        st = hist_state(zipf, "v", "g", width=width)
        qs = hist_quantiles(st, "g", ps=[25, 50, 75], width=width)
        return {r.p: abs(r.est - exact[r.p]) for r in qs.collect()}

    err_default = realized(DEFAULT_WIDTH)
    # the whole body lands in bucket 0: mid quantiles are off by >1.0
    # (an order of magnitude above the true p50 of 0.4)
    assert err_default[50] > 1.0

    width = derive_hist_width(zipf, "v", "g", buckets_per_iqr=16)
    assert width < DEFAULT_WIDTH // 10
    err_derived = realized(width)
    bound = width / DEFAULT_UNIT
    for p, e in err_derived.items():
        assert e <= bound + 1e-9, (p, e, bound)


def test_hist_save_load_roundtrip_and_absorb_parity(spark, sf_dir, tmp_path):
    ev = _ev(spark, sf_dir)
    from pyspark.sql import functions as F

    held = ev.where(F.col("event_id") % 2 == 0)
    late = ev.where(F.col("event_id") % 2 == 1)
    st = hist_state(held, "value", "event_type")
    save_hist_state(st, str(tmp_path / "h"), "value", "event_type")
    loaded, vcol, gcol, unit, width = load_hist_state(spark, str(tmp_path / "h"))
    assert (vcol, gcol, unit, width) == (
        "value",
        "event_type",
        DEFAULT_UNIT,
        DEFAULT_WIDTH,
    )
    assert _cells(loaded) == _cells(st)
    cont = hist_absorb(st, hist_state(late, "value", gcol), gcol)
    after_load = hist_absorb(loaded, hist_state(late, "value", gcol), gcol)
    assert _cells(cont) == _cells(after_load)
    q1 = sorted(map(tuple, hist_quantiles(cont, gcol).collect()))
    q2 = sorted(map(tuple, hist_quantiles(after_load, gcol).collect()))
    assert q1 == q2


def test_hist_state_rejects_negative_metrics(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame([("a", -1.5), ("a", 2.0)], "g string, v double")
    with pytest.raises(SparkRuntimeException, match="negative micro-units"):
        hist_state(df, "v", "g").collect()


def test_hist_drift_identical_states_is_zero(spark, sf_dir):
    from data_pipeline_bigquery_to_sftp_server_spark.operators.hist import hist_drift

    ev = _ev(spark, sf_dir)
    st = hist_state(ev, "value", "event_type")
    for r in hist_drift(st, st, "event_type").collect():
        assert r.tvd == 0.0 and r.max_bucket_dev == 0.0
        assert r.n_a == r.n_b


def test_hist_drift_disjoint_supports_is_one(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators.hist import hist_drift

    lo = spark.createDataFrame(
        [("g", float(v)) for v in (1, 2, 3)], "g string, v double"
    )
    hi = spark.createDataFrame(
        [("g", float(v)) for v in (100, 200, 300)], "g string, v double"
    )
    a = hist_state(lo, "v", "g")
    b = hist_state(hi, "v", "g")
    row = hist_drift(a, b, "g").collect()[0]
    assert row.tvd == 1.0


def test_hist_drift_is_symmetric_and_bounded(spark, sf_dir):
    from pyspark.sql import functions as F

    from data_pipeline_bigquery_to_sftp_server_spark.operators.hist import hist_drift

    ev = _ev(spark, sf_dir)
    a = hist_state(ev.where(F.col("event_id") % 3 == 0), "value", "event_type")
    b = hist_state(ev.where(F.col("event_id") % 3 != 0), "value", "event_type")
    ab = {r.event_type: r.tvd for r in hist_drift(a, b, "event_type").collect()}
    ba = {r.event_type: r.tvd for r in hist_drift(b, a, "event_type").collect()}
    assert ab == ba
    assert all(0.0 <= v <= 1.0 for v in ab.values())
