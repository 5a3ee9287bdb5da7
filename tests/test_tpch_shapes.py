"""Plan + semantics tests for the TPC-H-shaped breadth queries
(Q4/Q7/Q8/Q13/Q15/Q17/Q22, decimal agg, regex extract, RANGE frame).

Value parity with DuckDB is covered by the oracle harness
(tools/verify_local.py / driver CORRECTNESS); these tests pin the
*physical plan* properties that matter at 100 TB — broadcasts on the
dimension sides, partial aggregation before shuffles, no nested-loop
fallbacks — plus the semantic edge cases the oracles can't isolate.
"""

from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.plans import explain
from data_pipeline_bigquery_to_sftp_server_spark import queries as Q


def test_order_priority_check_is_semi_join(spark, sf_dir):
    """Q4 shape: one semi join, date conjunct as residual, no re-scan
    of lineitem per order."""
    df = Q.q_order_priority_check(spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert explain.has_partial_aggregation(df)


def test_volume_shipping_broadcasts_both_dim_sides(spark, sf_dir):
    """Q7 shape: supplier- and customer-side nation resolution must be
    broadcasts; the only big shuffle is lineitem⋈orders."""
    df = Q.q_volume_shipping(spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert explain.has_partial_aggregation(df)


def test_volume_shipping_covers_both_directions(spark, sf_dir):
    df = Q.q_volume_shipping(spark, sf_dir).select("supp_nation", "cust_nation").distinct()
    pairs = {tuple(r) for r in df.collect()}
    assert pairs == {("NATION_3", "NATION_8"), ("NATION_8", "NATION_3")}


def test_market_share_bounded_and_broadcast(spark, sf_dir):
    """Q8 shape: a share is in [0, 1]; dimension chain broadcasts."""
    df = Q.q_market_share(spark, sf_dir)
    assert explain.has_broadcast_join(df)
    rows = df.collect()
    assert rows and all(0.0 <= r.mkt_share <= 1.0 for r in rows)


def test_customer_distribution_preaggregates_orders(spark, sf_dir):
    """Q13 shape: orders must be reduced to per-custkey counts (partial
    agg) before the join with customer, and zero-order customers must
    survive the left join."""
    df = Q.q_customer_distribution(spark, sf_dir)
    assert explain.has_partial_aggregation(df)
    total = df.agg(F.sum("custdist")).first()[0]
    c = Q.load_table(spark, sf_dir, "customer")
    assert total == c.count()


def test_top_supplier_single_fact_pass(spark, sf_dir):
    """Q15 shape: lineitem is scanned once — the max() side reuses the
    per-supplier aggregate, it does not rescan the fact table."""
    df = Q.q_top_supplier(spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert plan.count("lineitem.parquet") <= 2  # agg + reused exchange, not 3+
    rows = df.collect()
    assert len(rows) >= 1
    assert len({r.total_revenue for r in rows}) == 1


def test_small_qty_revenue_broadcasts_part_prune(spark, sf_dir):
    """Q17 shape: the brand part-list and the per-part averages are both
    broadcast; lineitem never shuffles on partkey."""
    df = Q.q_small_qty_revenue(spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_sales_opportunity_anti_join(spark, sf_dir):
    """Q22 shape: NOT EXISTS becomes a single anti join over the
    date-pruned orders projection."""
    df = Q.q_sales_opportunity(spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_decimal_agg_is_exact_decimal(spark, sf_dir):
    """Decimal sums must carry decimal types end-to-end (exact money
    math), not fall back to double."""
    df = Q.q_decimal_agg(spark, sf_dir)
    kinds = dict(df.dtypes)
    assert kinds["sum_price"] == "decimal(18,2)"
    assert kinds["min_price"] == "decimal(18,2)"
    r = df.collect()
    assert r and all(row.sum_price >= row.max_price >= row.min_price for row in r)


def test_regex_extract_group_semantics(spark, sf_dir):
    """Group-1 extraction: first word is non-empty alpha, brand number
    round-trips from 'Brand#N'."""
    p = Q.load_table(spark, sf_dir, "part")
    df = p.select(
        "p_brand",
        F.regexp_extract("p_brand", r"(\d+)", 1).cast("long").alias("brand_num"),
    )
    for row in df.collect():
        assert row.p_brand == f"Brand#{row.brand_num}"


def test_returned_items_topk_and_prunes(spark, sf_dir):
    """Q10 shape: the global top-20 must compile to TakeOrderedAndProject
    (per-partition heaps, no full sort), and the returnflag filter must
    reach the lineitem scan as a pushed predicate."""
    df = Q.q_returned_items(spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert 0 < len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_window_range_frame_includes_peers(spark, sf_dir):
    """RANGE frame: rows with equal order dates must see the same
    trailing sum (peer rows are in each other's frames), regardless of
    tie-break order."""
    df = Q.q_window_range_frame(spark, sf_dir)
    o = Q.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    j = df.join(o, ["o_orderkey", "o_custkey"])
    peers = (
        j.groupBy("o_custkey", "o_orderdate")
        .agg(F.countDistinct("trailing_30d").alias("n_sums"), F.count("*").alias("n"))
        .where(F.col("n") > 1)
    )
    bad = peers.where(F.col("n_sums") > 1).count()
    assert bad == 0


def test_constraint_audit_detects_domain_violations(spark, sf_dir):
    """The audit's status-domain check must count exactly the rows
    outside the declared {O, F} domain; the structural checks (unique
    key, completeness, referential) are clean on the fixtures, so any
    nonzero there is a real regression."""
    rows = {r.constraint_name: r for r in Q.q_constraint_audit(spark, sf_dir).collect()}
    o = Q.load_table(spark, sf_dir, "orders")
    expected_bad = o.where(~F.col("o_orderstatus").isin("O", "F")).count()
    assert rows["status_in_domain"].violations == expected_bad
    for name in ("orderkey_unique", "orderkey_not_null", "custkey_references_customer"):
        assert rows[name].violations == 0, name
    for r in rows.values():
        assert 0.0 <= r.pass_rate <= 1.0
        assert r.checked == o.count()


def test_constraint_audit_plan_is_one_pass_plus_anti_join(spark, sf_dir):
    """Scale shape: the four scan-bound constraints share ONE aggregate
    over orders (no per-constraint rescan) and the referential probe is
    a broadcast anti-join — the plan must show exactly one anti join
    and partial aggregation, never a cartesian product."""
    df = Q.q_constraint_audit(spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin LeftAnti") == 1
    assert explain.has_partial_aggregation(df)


def test_bucketed_join_query_matches_shuffled_twin(spark, sf_dir):
    """The shuffle-free bucketed path must return exactly the rows the
    ordinary shuffled join produces (the in-query assert already pins
    the no-Exchange property; this pins the values)."""
    got = Q.q_bucketed_join(spark, sf_dir)
    o = Q.load_table(spark, sf_dir, "orders")
    li = Q.load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_h = F.round(F.col("l_discount") * 100).cast("long")
    twin = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(cents * (100 - disc_h)).alias("_rev_u"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .where(F.col("n_items") >= 6)
        .withColumn("revenue", F.expr("(_rev_u * 2 + 100) div 200") / 100.0)
        .drop("_rev_u")
    )
    assert got.count() == twin.count()
    assert got.select(*sorted(got.columns)).exceptAll(
        twin.select(*sorted(got.columns))
    ).count() == 0
