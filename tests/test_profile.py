"""One-pass table profiler (X68): per-type min/max, nulls, distinct,
subset selection, the approx distinct tier, unknown-column guard."""

import datetime as dt

import pytest

from data_pipeline_bigquery_to_sftp_server_spark.operators.profile import (
    profile_table,
)


def _frame(spark):
    rows = [
        (1, 2.5, "b", True, dt.datetime(2024, 1, 2), dt.date(2024, 1, 5), [1]),
        (2, -1.0, "a", False, dt.datetime(2024, 1, 1), dt.date(2024, 1, 6), []),
        (2, None, None, None, None, None, None),
    ]
    return spark.createDataFrame(
        rows,
        "i long, x double, s string, b boolean, ts timestamp, d date, arr array<int>",
    )


def test_profile_covers_every_type(spark):
    out = {r.col_name: r for r in profile_table(_frame(spark)).collect()}
    assert set(out) == {"i", "x", "s", "b", "ts", "d", "arr"}
    assert all(r.n_rows == 3 for r in out.values())
    i = out["i"]
    assert (i.n_nulls, i.n_distinct, i.min_num, i.max_num) == (0, 2, 1.0, 2.0)
    x = out["x"]
    assert (x.n_nulls, x.n_distinct, x.min_num, x.max_num) == (1, 2, -1.0, 2.5)
    s = out["s"]
    assert (s.n_nulls, s.min_str, s.max_str) == (1, "a", "b")
    assert (out["b"].min_num, out["b"].max_num) == (0.0, 1.0)
    # epoch micros / epoch days, engine-exact integers in doubles
    assert out["ts"].min_num == 1704067200.0 * 1_000_000
    assert out["d"].max_num == (dt.date(2024, 1, 6) - dt.date(1970, 1, 1)).days
    arr = out["arr"]
    assert (arr.min_num, arr.min_str) == (None, None)
    assert arr.n_distinct == 2  # distinct still works on complex types


def test_subset_and_unknown_column(spark):
    df = _frame(spark)
    assert [r.col_name for r in profile_table(df, ["x", "i"]).collect()] == ["x", "i"]
    with pytest.raises(ValueError):
        profile_table(df, ["nope"])


def test_approx_tier_tracks_exact(spark):
    import pyspark.sql.functions as F

    df = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") % 997).alias("m")
    )
    exact = {r.col_name: r.n_distinct for r in profile_table(df).collect()}
    approx = {
        r.col_name: r.n_distinct
        for r in profile_table(df, exact=False, rsd=0.05).collect()
    }
    assert exact == {"id": 5000, "m": 997}
    for c in exact:
        assert abs(approx[c] - exact[c]) / exact[c] < 0.15
