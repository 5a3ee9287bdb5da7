"""Streaming operators over the `events` shape (SURVEY §2.9, X7):
watermarked tumbling/sliding/session windows, streaming dedup, and the
foreachBatch streaming-upsert that generalizes the reference's
batch MERGE (J1) to a stream.

Test harness pattern: a parquet-backed file stream + memory sink +
``processAllAvailable()`` makes every streaming test deterministic
(no wall-clock dependence).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def read_events_stream(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based stream over a parquet directory. At scale this slot is
    Kafka/Kinesis; the transformation surface below is source-agnostic."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_len: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window counts+sums. Late rows beyond the
    watermark are dropped; state is bounded by (windows in watermark
    horizon) x (key cardinality)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_len).alias("win"), *keys)
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_len: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_len, slide).alias("win"), *keys)
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("window_start"), *keys, "n")
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key: str = "user_id",
) -> DataFrame:
    """Session windows: activity bursts per user separated by >= gap."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), key)
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            key,
            "n_events",
            "total_value",
        )
    )


def streaming_dedup(
    events: DataFrame, key_cols: tuple[str, ...] = ("event_id",), ts_col: str = "ts", watermark: str = "2 hours"
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon
    (X1's streaming form)."""
    return events.withWatermark(ts_col, watermark).dropDuplicates([*key_cols, ts_col])


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append") -> StreamingQuery:
    """Drive a streaming plan to completion against a memory sink —
    deterministic test executor."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    return q


def streaming_upsert(
    stream_df: DataFrame,
    apply_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
) -> StreamingQuery:
    """foreachBatch sink: each micro-batch is handed to a batch upsert
    (operators.merge) — the streaming generalization of the reference's
    staging+MERGE loop (main.py:338-388). Checkpointing gives at-least-
    once delivery; MERGE idempotence on the key upgrades it to
    effectively-exactly-once, the same argument the reference relied on."""
    return (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: pair each left event with
    right events on the same key that follow it within ``within``.

    Both sides are watermarked and the join condition carries the time
    bound, so Spark can size the join state: each side buffers only
    rows younger than watermark + within — without the time constraint
    a stream-stream join would have to keep every row forever. Inner
    join output is exactly the batch join over the same data (state
    eviction only drops rows that can no longer match), which is what
    makes the streaming query oracle-checkable against batch SQL.
    """
    l = left.withWatermark(ts_col, watermark).alias("l")
    r = right.withWatermark(ts_col, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{ts_col}") > F.col(f"l.{ts_col}"))
        & (F.col(f"r.{ts_col}") <= F.col(f"l.{ts_col}") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner")
