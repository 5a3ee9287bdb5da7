"""As-of join, range join (J5-J8 compositions), salted skew join,
bucketed no-shuffle join."""

from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.operators import asof, skew
from data_pipeline_bigquery_to_sftp_server_spark.plans import explain
from data_pipeline_bigquery_to_sftp_server_spark.sources import files


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 205), (3, "u", 50), (4, "v", 100)],
        "id int, k string, t long",
    ).select("id", "k", F.timestamp_seconds("t").alias("ts"))
    right = spark.createDataFrame(
        [("u", 100, 1.0), ("u", 200, 2.0), ("v", 999, 9.0)], "k string, t long, px double"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "px")

    out = asof.asof_join_backward(left, right, "k", "ts", "ts", ["px"])
    got = {r.id: r.px_asof for r in out.collect()}
    # id=1: right at exactly t=100 matches (<=); id=2: latest is 200;
    # id=3: nothing before t=50; id=4: v's only right row is later.
    assert got == {1: 1.0, 2: 2.0, 3: None, 4: None}
    assert out.count() == left.count()  # left-outer: every left row kept


def test_range_join_matches_naive(spark):
    left = spark.createDataFrame([(i, i * 100) for i in range(50)], "lid int, t long").select(
        "lid", F.timestamp_seconds("t").alias("lts")
    )
    right = spark.createDataFrame([(j, j * 70) for j in range(70)], "rid int, t long").select(
        "rid", F.timestamp_seconds("t").alias("rts")
    )
    got = {
        (r.lid, r.rid)
        for r in asof.range_join(
            left, right, F.col("lts"), F.col("rts"), lower_s=30, upper_s=45, bucket_s=60
        ).collect()
    }
    naive = {
        (l, r)
        for l in range(50)
        for r in range(70)
        if l * 100 - 30 <= r * 70 <= l * 100 + 45
    }
    assert got == naive


def test_range_join_avoids_nested_loop(spark):
    left = spark.createDataFrame([(1, 100)], "lid int, t long").select(
        "lid", F.timestamp_seconds("t").alias("lts")
    )
    right = spark.createDataFrame([(2, 120)], "rid int, t long").select(
        "rid", F.timestamp_seconds("t").alias("rts")
    )
    df = asof.range_join(left, right, F.col("lts"), F.col("rts"), 60, 60, 120)
    plan = explain.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_salted_join_correctness(spark):
    skewed = spark.createDataFrame(
        [(1, f"row{i}") for i in range(500)] + [(2, "x")], "k int, payload string"
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unused")], "k int, name string")
    out = skew.salted_join(skewed, dim, "k", factor=4)
    assert out.count() == 501
    names = {r.name for r in out.select("name").distinct().collect()}
    assert names == {"hot", "cold"}
    # Deterministic under re-execution
    assert out.count() == out.count()


def test_bucketed_join_no_shuffle(spark, sf_dir):
    import uuid

    from data_pipeline_bigquery_to_sftp_server_spark.catalog import load_table

    # Unique names: managed-table locations outlive a crashed session.
    ta, tb = f"b_orders_{uuid.uuid4().hex[:8]}", f"b_lineitem_{uuid.uuid4().hex[:8]}"
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        files.write_bucketed(o, ta, "o_orderkey", buckets=8)
        files.write_bucketed(li.select("o_orderkey", "l_quantity"), tb, "o_orderkey", buckets=8)
        # Force the sort-merge path: at real scale neither side broadcasts,
        # and bucketing must eliminate the shuffle Exchange entirely.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(ta).join(spark.table(tb), "o_orderkey")
        plan = explain.formatted_plan(joined)
        assert "Exchange" not in plan, "bucketed join should not shuffle"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_asof_forward_direction_and_tolerance(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators.asof import (
        asof_join_forward,
    )

    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, "u", t(10)), (2, "u", t(30)), (3, "u", t(50))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", t(10), 1.0), ("u", t(35), 2.0)], "k string, ts timestamp, v double"
    )
    out = {
        r.id: r
        for r in asof_join_forward(
            left, right, key="k", left_ts="ts", right_ts="ts",
            right_value_cols=["v"], tolerance_s=10,
        ).collect()
    }
    # id 1: same-instant right matches (inclusive tie)
    assert out[1].v_asof == 1.0
    # id 2: next right at t+5 within tolerance
    assert out[2].v_asof == 2.0
    # id 3: no right at-or-after -> NULLs
    assert out[3].v_asof is None and out[3].ts_asof is None

    # tolerance_s=0: the exact-instant tie (id 1) still matches, and
    # id 2's 5-seconds-later match is discarded
    out0 = {
        r.id: r
        for r in asof_join_forward(
            left, right, key="k", left_ts="ts", right_ts="ts",
            right_value_cols=["v"], tolerance_s=0,
        ).collect()
    }
    assert out0[1].v_asof == 1.0 and out0[2].v_asof is None


def test_asof_null_value_does_not_mix_rows(spark):
    """A NULL value column on the NEAREST right row must surface as
    NULL, not skip to a farther row's value (the r9 review's
    struct-fill finding — ts and values must come from one row)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators.asof import (
        asof_join_backward,
        asof_join_forward,
    )
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)  # noqa: E731
    left = spark.createDataFrame([(1, "u", t(0))], "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("u", t(10), None), ("u", t(50), 2.0)],
        "k string, ts timestamp, v double",
    )
    fwd = asof_join_forward(
        left, right, key="k", left_ts="ts", right_ts="ts",
        right_value_cols=["v"], tolerance_s=20,
    ).collect()[0]
    assert fwd.ts_asof == t(10) and fwd.v_asof is None

    left_b = spark.createDataFrame(
        [(1, "u", t(60))], "id long, k string, ts timestamp"
    )
    right_b = spark.createDataFrame(
        [("u", t(5), 2.0), ("u", t(55), None)],
        "k string, ts timestamp, v double",
    )
    bwd = asof_join_backward(
        left_b, right_b, key="k", left_ts="ts", right_ts="ts",
        right_value_cols=["v"], tolerance_s=20,
    ).collect()[0]
    assert bwd.ts_asof == t(55) and bwd.v_asof is None


def test_interval_overlap_join_matches_bruteforce(spark):
    """Grid-celled interval join == the quadratic predicate join, with
    boundary-touching overlaps, multi-cell-spanning intervals, and
    exactly-once emission (no distinct pass)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators.asof import (
        interval_overlap_join,
    )

    a = spark.createDataFrame(
        [
            (1, "2024-01-01", "2024-01-03"),
            (2, "2024-01-10", "2024-02-20"),   # spans many 7d cells
            (3, "2024-03-01", "2024-03-01"),   # single-day interval
        ],
        "aid long, s string, e string",
    ).select("aid", F.col("s").cast("date").alias("a_s"), F.col("e").cast("date").alias("a_e"))
    b = spark.createDataFrame(
        [
            (10, "2024-01-03", "2024-01-05"),  # touches a1's end exactly
            (11, "2024-01-15", "2024-01-16"),  # inside a2
            (12, "2024-02-18", "2024-03-01"),  # overlaps a2 tail AND a3
            (13, "2023-12-01", "2023-12-31"),  # no overlap with anything
        ],
        "bid long, s string, e string",
    ).select("bid", F.col("s").cast("date").alias("b_s"), F.col("e").cast("date").alias("b_e"))

    got = sorted(
        (r.aid, r.bid)
        for r in interval_overlap_join(
            a, b, "a_s", "a_e", "b_s", "b_e", cell_days=7
        ).collect()
    )
    brute = sorted(
        (r.aid, r.bid)
        for r in a.crossJoin(b)
        .where((F.col("a_s") <= F.col("b_e")) & (F.col("b_s") <= F.col("a_e")))
        .collect()
    )
    assert got == brute == [(1, 10), (2, 11), (2, 12), (3, 12)]
    # exactly-once: multi-cell-sharing pair (2, 12) appears once
    assert len(got) == len(set(got))
