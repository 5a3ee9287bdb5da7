"""Feature-engineering transforms — operators/features.py."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.operators.features import (
    impute_group_mean,
    target_encode,
)


def test_target_encode_hand_computed(spark):
    # cat a: 2/3 positive; cat b: 0/1; prior = 2/4
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 0), ("b", 0)], "cat string, y int"
    )
    out = {
        r["cat"]: r
        for r in target_encode(df, "cat", F.col("y"), m=2.0).collect()
    }
    assert out["a"]["n_rows"] == 3 and out["a"]["n_pos"] == 2
    assert out["a"]["prior"] == pytest.approx(0.5)
    assert out["a"]["te"] == pytest.approx((2 + 2.0 * 0.5) / (3 + 2.0))
    assert out["b"]["te"] == pytest.approx((0 + 2.0 * 0.5) / (1 + 2.0))


def test_target_encode_smoothing_pulls_small_groups_to_prior(spark):
    rows = [("big", 1)] * 90 + [("big", 0)] * 10 + [("tiny", 0)]
    df = spark.createDataFrame(rows, "cat string, y int")
    out = {r["cat"]: r for r in target_encode(df, "cat", F.col("y")).collect()}
    prior = out["tiny"]["prior"]
    # one negative observation barely moves a tiny group off the prior
    assert abs(out["tiny"]["te"] - prior) < abs(0.0 - prior)
    # the big group sits near its raw rate
    assert out["big"]["te"] == pytest.approx(0.9, abs=0.02)


def test_impute_fills_only_nulls(spark):
    df = spark.createDataFrame(
        [("g", 1, 10.0), ("g", 2, None), ("g", 3, 20.0), ("h", 4, None)],
        "grp string, id int, v double",
    )
    out = {
        r["id"]: r for r in impute_group_mean(df, "grp", "v").collect()
    }
    assert out[1]["v_filled"] == 10.0
    assert out[3]["v_filled"] == 20.0
    assert out[2]["v_filled"] == pytest.approx(15.0)
    # group h is entirely NULL: stays NULL
    assert out[4]["v_filled"] is None


def test_impute_exact_cents_mean(spark):
    # 0.01 and 0.02 -> mean 1.5 cents / 100 = 0.015 exactly via ints
    df = spark.createDataFrame(
        [("g", 1, 0.01), ("g", 2, 0.02), ("g", 3, None)],
        "grp string, id int, v double",
    )
    out = {r["id"]: r for r in impute_group_mean(df, "grp", "v").collect()}
    assert out[3]["v_filled"] == (1 + 2) / 2 / 100.0


def test_rank_quantile_score_percent_rank_semantics(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators.features import (
        rank_quantile_score,
    )

    # values 1..10 unique -> quintiles of two each
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)], "id long, v double"
    )
    out = {
        r["id"]: r["s"]
        for r in rank_quantile_score(df, "v", "id", 5, "s").collect()
    }
    assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3, 7: 4, 8: 4, 9: 5, 10: 5}


def test_rank_quantile_score_ties_share_score(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators.features import (
        rank_quantile_score,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 5.0), (4, 9.0)], "id long, v double"
    )
    out = {
        r["id"]: r["s"]
        for r in rank_quantile_score(df, "v", "id", 4, "s").collect()
    }
    assert out[1] == out[2] == out[3]
    assert out[4] == 4


def test_rank_quantile_score_single_row(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators.features import (
        rank_quantile_score,
    )

    df = spark.createDataFrame([(1, 3.0)], "id long, v double")
    (r,) = rank_quantile_score(df, "v", "id", 5, "s").collect()
    assert r["s"] == 1


def test_grouped_ols_matches_numpy(spark):
    import numpy as np

    from data_pipeline_bigquery_to_sftp_server_spark.operators.features import (
        grouped_ols,
    )

    xs = [0, 1, 2, 3, 4]
    ys = [10, 12, 15, 15, 20]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "grp string, x long, y long"
    )
    (r,) = grouped_ols(df, ["grp"], "x", "y").collect()
    slope_np, icept_np = np.polyfit(xs, ys, 1)
    assert abs(r["slope"] - slope_np) < 1e-9
    assert abs(r["intercept"] - icept_np) < 1e-9
    corr = np.corrcoef(xs, ys)[0, 1]
    assert abs(r["r2"] - corr * corr) < 1e-9
    assert (r["n"], r["sum_x"], r["sum_y"]) == (5, 10, 72)


def test_grouped_ols_degenerate_x_is_null(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators.features import (
        grouped_ols,
    )

    df = spark.createDataFrame(
        [("g", 3, 1), ("g", 3, 9)], "grp string, x long, y long"
    )
    (r,) = grouped_ols(df, ["grp"], "x", "y").collect()
    assert r["slope"] is None and r["intercept"] is None and r["r2"] is None


def test_grouped_ols_exact_line(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators.features import (
        grouped_ols,
    )

    # y = 7x + 3 exactly: slope/intercept exact, r2 == 1.0
    df = spark.createDataFrame(
        [("g", x, 7 * x + 3) for x in range(6)], "grp string, x long, y long"
    )
    (r,) = grouped_ols(df, ["grp"], "x", "y").collect()
    assert r["slope"] == 7.0 and r["intercept"] == 3.0 and r["r2"] == 1.0
