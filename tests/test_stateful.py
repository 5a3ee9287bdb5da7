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


def test_transitions_stateful_spans_batch_boundaries(spark, tmp_path):
    """The carried-state tier's exactness claim (r10 verdict #4):
    a user whose sequence is split ACROSS micro-batches must still
    yield every consecutive pair — including the pairs that span the
    batch boundary, which a per-batch lead() window drops."""
    import os

    src = str(tmp_path / "tiles")
    os.makedirs(src)
    # user 1: a->b->c->d split one-event-per-file; user 2: x->y split
    # 2/1 across files; user 3 entirely in the last file
    tiles = [
        [(1, 1, "a", 100), (2, 10, "x", 110)],
        [(1, 2, "b", 200), (2, 11, "x", 210)],
        [(1, 3, "c", 300), (2, 12, "y", 310)],
        [(1, 4, "d", 400), (3, 20, "q", 410), (3, 21, "q", 420)],
    ]
    schema = "user_id long, event_id long, event_type string, ts_us long"
    for k, rows in enumerate(tiles):
        df = spark.createDataFrame(rows, schema).coalesce(1)
        part = str(tmp_path / f"p{k}")
        df.write.mode("overwrite").parquet(part)
        (f,) = [x for x in os.listdir(part) if x.endswith(".parquet")]
        dst = f"{src}/{k:02d}.parquet"
        os.rename(f"{part}/{f}", dst)
        os.utime(dst, (1_700_000_000 + 60 * k,) * 2)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    name = f"trans_{uuid.uuid4().hex[:8]}"
    q = (
        stateful.transitions_stateful(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r.user_id, r.from_type, r.to_type)
            for r in spark.table(name).collect()
        )
    finally:
        q.stop()
    # every pair is cross-batch for user 1; user 2 has one in-batch
    # and one cross-batch pair; user 3 is one in-batch pair
    assert got == [
        (1, "a", "b"), (1, "b", "c"), (1, "c", "d"),
        (2, "x", "x"), (2, "x", "y"),
        (3, "q", "q"),
    ]


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


def test_transitions_tws_gate_names_the_missing_dependency(spark):
    """The transformWithState tier is environmentally gated (no
    google.protobuf in this container): the gate must raise the
    documented NotImplementedError naming the dependency and the
    tested fallback — never crash inside the streaming runner."""
    import pytest

    schema = "user_id long, event_id long, event_type string, ts_us long"
    df = spark.createDataFrame([], schema)
    try:
        from google.protobuf import descriptor  # noqa: F401
        pytest.skip("protobuf present — gate open, TWS path available")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="applyInPandasWithState"):
        stateful.transitions_stateful_tws(df)
