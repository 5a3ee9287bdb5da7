"""Runtime Bloom-filter join pruning: when a fact-fact join has a
selective build side, Spark injects a bloom filter on the probe side's
scan so non-matching rows die before the shuffle. The size thresholds
(10 GB probe scan by default) mean it only fires at real scale —
this test lowers them to pin that the engine session has the feature
on and the plan shape is as expected at 100 TB."""

from pyspark.sql import functions as F


def test_bloom_filter_prunes_probe_side_at_scale_thresholds(spark, sf_dir):
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        )
    }
    try:
        assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
        # Simulate 100 TB relative sizes: forbid broadcast, drop the
        # probe-scan size floor so the local parquet qualifies.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
            F.col("o_totalprice") > 400000
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
