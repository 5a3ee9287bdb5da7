"""Multi-touch attribution — operators/sessions.py attribution()."""

from datetime import datetime

from data_pipeline_bigquery_to_sftp_server_spark.operators.sessions import (
    attribution,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime(2024, 1, 1, 0, m), u, t, v)
            for i, (m, u, t, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_attribution_links_touches_to_next_purchase(spark):
    rows = [
        (1, 1, "view", 0.0),
        (2, 1, "click", 0.0),
        (3, 1, "purchase", 9.0),
        (4, 1, "view", 0.0),      # after the purchase: next group
        (5, 1, "purchase", 5.0),
    ]
    out = attribution(_ev(spark, rows)).collect()
    by_conv = {}
    for r in out:
        by_conv.setdefault(r["conv_event_id"], []).append(r)
    first = sorted(by_conv[2], key=lambda r: r["touch_rank"])
    assert [r["touch_event_id"] for r in first] == [0, 1]
    assert (first[0]["is_first"], first[0]["is_last"]) == (1, 0)
    assert (first[1]["is_first"], first[1]["is_last"]) == (0, 1)
    assert all(r["weight_den"] == 2 and r["weight_num"] == 1 for r in first)
    second = by_conv[4]
    assert [r["touch_event_id"] for r in second] == [3]
    assert (second[0]["is_first"], second[0]["is_last"]) == (1, 1)
    assert second[0]["conv_value"] == 5.0


def test_attribution_drops_trailing_and_touchless(spark):
    rows = [
        (1, 1, "purchase", 1.0),  # zero-touch purchase: dropped
        (2, 1, "view", 0.0),      # trailing touch, never converts
        (3, 2, "signup", 0.0),    # untracked type: ignored entirely
        (4, 2, "view", 0.0),
        (5, 2, "purchase", 2.0),
    ]
    out = attribution(_ev(spark, rows)).collect()
    assert {(r["user"], r["conv_event_id"], r["touch_event_id"]) for r in out} == {
        (2, 4, 3)
    }


def test_attribution_single_touch_is_first_and_last(spark):
    rows = [(1, 7, "click", 0.0), (2, 7, "purchase", 3.0)]
    (r,) = attribution(_ev(spark, rows)).collect()
    assert r["is_first"] == 1 and r["is_last"] == 1 and r["weight_den"] == 1
