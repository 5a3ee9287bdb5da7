"""Structured Streaming surface (X7): deterministic file-stream tests
via memory sink + processAllAvailable, plus the foreachBatch upsert."""

import uuid

from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.catalog import load_table
from data_pipeline_bigquery_to_sftp_server_spark.operators import merge
from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W


def _events_stream(spark, sf_dir, tmp_path):
    """Re-write the events table as a plain-µs parquet dir (the harness
    file is ns-precision, unreadable by a bare stream reader), then
    stream it."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_stream")
    ev.write.mode("overwrite").parquet(path)
    schema = ev.schema
    return W.read_events_stream(spark, path, schema, max_files_per_trigger=4), ev


def test_tumbling_counts_match_batch(spark, sf_dir, tmp_path):
    stream, batch = _events_stream(spark, sf_dir, tmp_path)
    name = f"tumble_{uuid.uuid4().hex[:8]}"
    q = W.run_to_memory(
        W.tumbling_counts(stream, window_len="1 hour", watermark="2 hours"), name
    )
    try:
        got = {
            (r.window_start, r.event_type): (r.n, round(r.total_value, 6))
            for r in spark.table(name).collect()
        }
        exp_df = (
            batch.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
            .select(F.col("win.start").alias("ws"), "event_type", "n", "v")
        )
        exp = {(r.ws, r.event_type): (r.n, round(r.v, 6)) for r in exp_df.collect()}
        # Append mode only emits windows the watermark has passed; the
        # last open window(s) may be withheld. Everything emitted must
        # match batch exactly.
        assert got, "stream emitted nothing"
        for k, v in got.items():
            assert exp[k] == v
        assert len(got) >= len(exp) - 5
    finally:
        q.stop()


def test_session_window_counts(spark, sf_dir, tmp_path):
    stream, batch = _events_stream(spark, sf_dir, tmp_path)
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = W.run_to_memory(W.session_counts(stream, gap="30 minutes", watermark="2 hours"), name)
    try:
        rows = spark.table(name).collect()
        assert rows, "no sessions emitted"
        assert all(r.session_end > r.session_start for r in rows)
        assert all(r.n_events >= 1 for r in rows)
    finally:
        q.stop()


def test_streaming_dedup(spark, tmp_path):
    src = str(tmp_path / "dups")
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:01:00")],
        "event_id long, ts_s string",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = W.run_to_memory(W.streaming_dedup(stream, ("event_id",), "ts"), name)
    try:
        assert spark.table(name).count() == 2
    finally:
        q.stop()


def test_streaming_upsert_foreachbatch(spark, tmp_path):
    """Micro-batch MERGE: stream staging rows into a parquet 'target'
    (the streaming generalization of reference main.py:338-388)."""
    target_path = str(tmp_path / "target")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id long, name string, val double"
    ).write.mode("overwrite").parquet(target_path)

    staging_src = str(tmp_path / "staging")
    spark.createDataFrame(
        [(2, "B!", 99.0), (3, "c", 30.0)], "id long, name string, val double"
    ).write.mode("overwrite").parquet(staging_src)

    stream = spark.readStream.schema("id long, name string, val double").parquet(staging_src)

    def apply_batch(batch_df, epoch_id):
        target = batch_df.sparkSession.read.parquet(target_path)
        merged = merge.upsert_anti_union(target, batch_df, "id")
        # Overwrite-after-read requires a materialization barrier.
        merged.cache().count()
        merged.write.mode("overwrite").parquet(target_path)
        merged.unpersist()

    q = W.streaming_upsert(stream, apply_batch, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    final = {r.id: (r.name, r.val) for r in spark.read.parquet(target_path).collect()}
    assert final == {1: ("a", 10.0), 2: ("B!", 99.0), 3: ("c", 30.0)}


def test_stream_stream_join_equals_batch_join(spark, sf_dir):
    """Inner stream-stream join must converge to the batch join result
    (state eviction may only drop rows that can no longer match)."""
    from data_pipeline_bigquery_to_sftp_server_spark.queries import q_streaming_join

    got = q_streaming_join(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type") == "signup").alias("s")
    p = ev.where(F.col("event_type") == "purchase").alias("p")
    fmt = "yyyy-MM-dd HH:mm:ss"
    exp = (
        s.join(
            p,
            (F.col("s.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") > F.col("s.ts"))
            & (F.col("p.ts") <= F.col("s.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            F.col("s.user_id").alias("user_id"),
            F.col("s.event_id").alias("signup_id"),
            F.col("p.event_id").alias("purchase_id"),
            F.date_format(F.col("s.ts"), fmt).alias("signup_ts"),
            F.date_format(F.col("p.ts"), fmt).alias("purchase_ts"),
        )
    )
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_streaming_upsert_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    """Kill the query, add new files, restart from the SAME checkpoint:
    already-processed files must not re-apply (offsets come from the
    checkpoint), new files must. With an idempotent MERGE this is the
    effectively-exactly-once argument the reference's re-runnable job
    relied on, now surviving process restarts too. A value column
    accumulated via merge would double-count on replay — counting
    applied batch rows proves no replay happened."""
    target_path = str(tmp_path / "target")
    spark.createDataFrame([(1, "a")], "id long, name string").write.mode(
        "overwrite"
    ).parquet(target_path)
    staging_src = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([(2, "b")], "id long, name string").write.mode(
        "overwrite"
    ).parquet(staging_src)

    applied_rows = []

    def apply_batch(batch_df, epoch_id):
        rows = batch_df.collect()
        applied_rows.extend((r.id, r.name) for r in rows)
        target = batch_df.sparkSession.read.parquet(target_path)
        merged = merge.upsert_anti_union(target, batch_df, "id")
        merged.cache().count()
        merged.write.mode("overwrite").parquet(target_path)
        merged.unpersist()

    stream = spark.readStream.schema("id long, name string").parquet(staging_src)
    q = W.streaming_upsert(stream, apply_batch, ckpt)
    q.processAllAvailable()
    q.stop()
    first_applied = list(applied_rows)

    # New file lands while the query is down.
    spark.createDataFrame([(3, "c")], "id long, name string").write.mode(
        "append"
    ).parquet(staging_src)

    stream2 = spark.readStream.schema("id long, name string").parquet(staging_src)
    q2 = W.streaming_upsert(stream2, apply_batch, ckpt)
    q2.processAllAvailable()
    q2.stop()

    assert first_applied == [(2, "b")]
    # Restart applied ONLY the new file — no replay of (2, 'b').
    assert applied_rows == [(2, "b"), (3, "c")]
    final = {r.id: r.name for r in spark.read.parquet(target_path).collect()}
    assert final == {1: "a", 2: "b", 3: "c"}
