"""Approximate aggregates (A9): sketch results must track exact values
within documented tolerance — these can't be oracle-hash-checked, so
tolerance is pinned here."""

from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.catalog import load_table


def test_approx_count_distinct_within_5pct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact <= 0.05


def test_approx_percentile_brackets_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact <= 0.01


def test_hll_sketch_partials_merge_losslessly(spark, sf_dir):
    """The 100 TB distinct-count path: per-group HLL sketches merged
    with hll_union_agg must agree with a single global sketch to ~1%
    (the union is register-wise, but datasketches mode transitions can
    shift estimates slightly) and land within 2% of the exact count."""
    li = load_table(spark, sf_dir, "lineitem")
    merged = (
        li.groupBy("l_returnflag")
        .agg(F.hll_sketch_agg("l_orderkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()
        .est
    )
    single = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey")).alias("est")
    ).first().est
    exact = li.select("l_orderkey").distinct().count()
    assert abs(merged - single) / exact < 0.01
    assert abs(merged - exact) / exact < 0.02
    assert abs(single - exact) / exact < 0.02
