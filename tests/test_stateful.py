"""applyInPandasWithState custom stateful operator + pandas UDAF."""

import uuid

import pandas as pd
from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.streaming import stateful


def test_errors_since_purchase_state(spark, tmp_path):
    src = str(tmp_path / "ev")
    rows = [
        (1, 100, 10, "error"),
        (2, 200, 10, "error"),
        (3, 300, 10, "error"),   # user 10: 3 errors -> alert
        (4, 400, 20, "error"),
        (5, 500, 20, "purchase"),  # user 20: reset -> no alert
        (6, 600, 30, "click"),
    ]
    df = spark.createDataFrame(rows, "event_id long, t long, user_id long, event_type string").select(
        "event_id", F.timestamp_seconds("t").alias("ts"), "user_id", "event_type"
    )
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    name = f"state_{uuid.uuid4().hex[:8]}"
    q = (
        stateful.errors_since_purchase(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.user_id: (r.n_errors_since_purchase, r.alert) for r in spark.table(name).collect()}
        assert got == {10: (3, True), 20: (0, False), 30: (0, False)}
    finally:
        q.stop()


def test_pandas_udaf_grouped_agg(spark):
    """UDAF surface (SURVEY §2.10): grouped-agg pandas UDF — geometric
    mean, not expressible with builtins, vectorized via Arrow."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v[v > 0]).mean()))

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 100.0), ("b", 4.0), ("b", 9.0)], "g string, v double"
    )
    got = {r.g: r.gm for r in df.groupBy("g").agg(geo_mean("v").alias("gm")).collect()}
    assert abs(got["a"] - 10.0) < 1e-9
    assert abs(got["b"] - 6.0) < 1e-9
