"""Incremental view maintenance — operators/ivm.py."""

import pytest

from data_pipeline_bigquery_to_sftp_server_spark.operators.ivm import (
    absorb_delta,
    agg_state,
    delta_group,
)


def _base(spark):
    return spark.createDataFrame(
        [("a", 1.00), ("a", 2.50), ("b", 4.00)], "k string, amt double"
    )


def _state_rows(df):
    return {(r["k"], r["n_rows"], r["sum_cents"]) for r in df.collect()}


def test_agg_state(spark):
    s = agg_state(_base(spark), ["k"], "amt")
    assert _state_rows(s) == {("a", 2, 350), ("b", 1, 400)}


def test_absorb_insert_delete_update(spark):
    s = agg_state(_base(spark), ["k"], "amt")
    delta = spark.createDataFrame(
        [
            ("I", "a", 10.00),   # insert
            ("D", "a", 1.00),    # delete the 1.00 row
            ("D", "b", 4.00),    # update b: 4.00 -> 5.00 as D+I
            ("I", "b", 5.00),
            ("I", "c", 0.25),    # brand-new group
        ],
        "op string, k string, amt double",
    )
    out = absorb_delta(s, delta_group(delta, ["k"], "amt"), ["k"])
    assert _state_rows(out) == {
        ("a", 2, 1250),  # 350 - 100 + 1000
        ("b", 1, 500),
        ("c", 1, 25),
    }


def test_absorb_drops_emptied_groups(spark):
    s = agg_state(_base(spark), ["k"], "amt")
    delta = spark.createDataFrame(
        [("D", "b", 4.00)], "op string, k string, amt double"
    )
    out = absorb_delta(s, delta_group(delta, ["k"], "amt"), ["k"])
    assert _state_rows(out) == {("a", 2, 350)}


def test_absorb_is_batch_order_invariant(spark):
    # absorb(absorb(s,d1),d2) == absorb(s, d1 union d2) == recompute
    s = agg_state(_base(spark), ["k"], "amt")
    d1 = spark.createDataFrame(
        [("I", "c", 1.00), ("D", "a", 2.50)], "op string, k string, amt double"
    )
    d2 = spark.createDataFrame(
        [("I", "c", 2.00), ("I", "a", 9.00)], "op string, k string, amt double"
    )
    two_step = absorb_delta(
        absorb_delta(s, delta_group(d1, ["k"], "amt"), ["k"]),
        delta_group(d2, ["k"], "amt"),
        ["k"],
    )
    one_shot = absorb_delta(
        s, delta_group(d1.unionByName(d2), ["k"], "amt"), ["k"]
    )
    assert _state_rows(two_step) == _state_rows(one_shot)
    post = spark.createDataFrame(
        [("a", 1.00), ("a", 9.00), ("b", 4.00), ("c", 1.00), ("c", 2.00)],
        "k string, amt double",
    )
    assert _state_rows(two_step) == _state_rows(agg_state(post, ["k"], "amt"))


def test_unknown_op_tag_raises(spark):
    delta = spark.createDataFrame(
        [("X", "a", 1.00)], "op string, k string, amt double"
    )
    with pytest.raises(Exception, match="unknown CDC op tag"):
        delta_group(delta, ["k"], "amt").collect()


def test_state_survives_save_load(spark, tmp_path):
    from data_pipeline_bigquery_to_sftp_server_spark.operators.ivm import (
        load_state,
        save_state,
    )

    s = agg_state(_base(spark), ["k"], "amt")
    p = str(tmp_path / "ivm_state")
    save_state(s, p)
    back = load_state(spark, p)
    assert _state_rows(back) == _state_rows(s)
    # absorb after reload == continuous absorb
    delta = spark.createDataFrame(
        [("I", "a", 1.00), ("D", "b", 4.00)], "op string, k string, amt double"
    )
    cont = absorb_delta(s, delta_group(delta, ["k"], "amt"), ["k"])
    resumed = absorb_delta(back, delta_group(delta, ["k"], "amt"), ["k"])
    assert _state_rows(resumed) == _state_rows(cont)
