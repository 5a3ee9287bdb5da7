"""Relational operator semantics + the scale-critical plan properties
(SURVEY §4: pushdown, pruning, broadcast)."""

from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.catalog import load_table
from data_pipeline_bigquery_to_sftp_server_spark.operators import relational as R
from data_pipeline_bigquery_to_sftp_server_spark.plans import explain


def test_semi_anti_partition(spark, sf_dir):
    """semi + anti partition the left side exactly."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    semi = R.semi_join(c, o, "c_custkey")
    anti = R.anti_join(c, o, "c_custkey")
    assert semi.count() + anti.count() == c.count()
    assert semi.join(anti, "c_custkey", "inner").count() == 0


def test_distinct_keys_drops_nulls(spark):
    df = spark.createDataFrame([(1,), (1,), (None,), (2,)], "k int")
    got = sorted(r.k for r in R.distinct_keys(df, "k").collect())
    assert got == [1, 2]


def test_top_k_deterministic(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    got = R.top_k(o, [F.desc("o_totalprice"), F.asc("o_orderkey")], 5).collect()
    exp = sorted(o.collect(), key=lambda r: (-r.o_totalprice, r.o_orderkey))[:5]
    assert [r.o_orderkey for r in got] == [r.o_orderkey for r in exp]


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("a", 2), ("b", 9)], "g string, v int"
    )
    got = R.top_k_per_group(df, ["g"], [F.desc("v"), F.asc("v")], 2)
    rows = {(r.g, r.v) for r in got.collect()}
    assert rows == {("a", 3), ("a", 2), ("b", 9)}


def test_paginate_disjoint_and_ordered(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    p1 = {r.o_orderkey for r in R.paginate(o, [F.asc("o_orderkey")], 1, 100).collect()}
    p2 = {r.o_orderkey for r in R.paginate(o, [F.asc("o_orderkey")], 2, 100).collect()}
    assert len(p1) == len(p2) == 100 and not (p1 & p2)
    assert max(p1) < min(p2)


# --- plan properties (the 100 TB checks) -----------------------------------


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.where(F.col("l_shipdate") <= "1996-01-01").select("l_orderkey")
    pushed = explain.pushed_filters(df)
    assert "l_shipdate" in pushed, f"filter not pushed: {pushed}"


def test_column_pruning_reaches_parquet(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rs = explain.read_schema(li.select("l_orderkey", "l_quantity"))
    assert "l_orderkey" in rs and "l_extendedprice" not in rs


def test_lookup_join_broadcasts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    df = R.lookup_join(li, part, li.l_partkey == part.p_partkey)
    assert explain.has_broadcast_join(df)


def test_whole_stage_codegen_present(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    assert explain.codegen_stage_count(agg) >= 1


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    assert explain.has_partial_aggregation(agg)


def test_exists_subquery_plans_as_semi_join(spark, sf_dir):
    """The correlated-EXISTS shape (TPC-H Q4) must decorrelate to a
    single semi join with the date conjunct as a residual — no
    nested-loop re-scan of lineitem per order."""
    from data_pipeline_bigquery_to_sftp_server_spark.queries import q_exists_subquery

    df = q_exists_subquery(spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert explain.has_partial_aggregation(df)


def test_promo_share_broadcasts_dim(spark, sf_dir):
    """part is a dimension table: the Q14-shaped ratio must broadcast it
    rather than shuffling lineitem."""
    from data_pipeline_bigquery_to_sftp_server_spark.queries import q_promo_share

    df = q_promo_share(spark, sf_dir)
    assert explain.has_broadcast_join(df)
    assert explain.has_partial_aggregation(df)


def test_big_orders_aggregates_before_join(spark, sf_dir):
    """Q18 shape: the HAVING groupBy must run before the dimension
    joins (partial agg present), and the fact scan must be pruned to
    the two columns the agg needs."""
    from data_pipeline_bigquery_to_sftp_server_spark.queries import q_big_orders

    df = q_big_orders(spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert explain.has_partial_aggregation(df)
    assert "CartesianProduct" not in plan


def test_disjunctive_rev_stays_hash_join(spark, sf_dir):
    """Q19 shape: the OR-of-conjuncts must remain a residual on the
    broadcast equi join — no nested-loop fallback."""
    from data_pipeline_bigquery_to_sftp_server_spark.queries import q_disjunctive_rev

    df = q_disjunctive_rev(spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert explain.has_broadcast_join(df)
    assert "BroadcastNestedLoop" not in plan


def test_fuzzy_name_pairs_compares_vocab_not_table(spark, sf_dir):
    """The levenshtein self-join must run on the deduped name
    vocabulary: a distinct aggregate appears below the join in the
    plan, and only p_name is read from parquet."""
    from data_pipeline_bigquery_to_sftp_server_spark.queries import q_fuzzy_name_pairs

    df = q_fuzzy_name_pairs(spark, sf_dir)
    pairs = df.collect()
    assert all(r.edit_dist <= 2 and r.name_a < r.name_b for r in pairs)
    rs = explain.read_schema(df)
    assert "p_name" in rs and "p_retailprice" not in rs


def test_with_global_rank_is_exact_and_partition_independent(spark):
    """r8: the scalable rank must equal the single-window row_number
    for every row, across different input partitionings."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators.relational import (
        ntile_by_rank,
        with_global_rank,
    )

    rows = [(i, float((i * 37) % 101)) for i in range(500)]
    expected = {
        i: r + 1
        for r, (i, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    for parts in (1, 7, 32):
        df = spark.createDataFrame(rows, "id long, score double").repartition(parts)
        out, n = with_global_rank(df, ["score", "id"])
        assert n == 500
        got = {r.id: r.grank for r in out.collect()}
        assert got == expected
    # ntile_by_rank == Spark's ntile under the same total order
    from pyspark.sql.window import Window

    df = spark.createDataFrame(rows, "id long, score double")
    w = Window.orderBy(F.col("score").asc(), F.col("id").asc())
    ref = {r.id: r.nt for r in df.withColumn("nt", F.ntile(7).over(w)).collect()}
    out, n = with_global_rank(df, ["score", "id"])
    got = {
        r.id: r.b
        for r in out.withColumn("b", ntile_by_rank(F.col("grank"), n, 7)).collect()
    }
    assert got == ref


def test_session_sequences_order_and_breaks(spark):
    """r8 X50: >gap breaks open a new session; sequences are in
    (ts, event_id) order; sess_id numbers per user from 1."""
    import datetime as dt

    from data_pipeline_bigquery_to_sftp_server_spark.operators.sessions import (
        session_sequences,
    )

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, 1, t0, "view"),
        (2, 1, t0 + dt.timedelta(minutes=5), "click"),
        (3, 1, t0 + dt.timedelta(minutes=50), "buy"),       # >30m -> new session
        (4, 2, t0, "view"),
        (5, 2, t0, "click"),                                # same ts -> event_id order
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        (r.user_id, r.sess_id): (r.n_events, r.seq)
        for r in session_sequences(ev).collect()
    }
    assert got == {
        (1, 1): (2, "view,click"),
        (1, 2): (1, "buy"),
        (2, 1): (2, "view,click"),
    }
