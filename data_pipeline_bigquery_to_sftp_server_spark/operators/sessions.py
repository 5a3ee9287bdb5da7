"""Batch sessionization -> training-sequence materialization (X50).

Event streams are the second data modality an LLM-era pipeline feeds
(behavioral/agentic sequence models): the unit of training is not a
document but a SESSION — a user's ordered actions between >gap
inactivity breaks. This module turns the raw events table into
per-session ordered action sequences, the exact analogue of what
encode_token_ids produces for text (and its output composes with the
same downstream packing / curriculum / shard operators, which only
need an id + a length).

Plan shape: ONE shuffle on user_id (the lag + running-sum
gaps-and-islands pattern — same machinery as q_sessionize), then ONE
(user, session)-keyed aggregation whose buffered state is one
session's events (session length, not corpus size, bounds executor
memory). The sequence rides an ordered comma-join so the DuckDB
oracle's string_agg(... ORDER BY) replays it including ORDER.

Reference: the reference syncs event-shaped records as flat rows
(main.py transform layer); sessionization is the training-side
structure it never needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_bigquery_to_sftp_server_spark.operators.scale import (
    ensure_parallelism,
)


def session_sequences(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per (user, session): ``(user_id, sess_id, n_events,
    seq)`` where ``sess_id`` numbers a user's sessions from 1 in time
    order and ``seq`` is the comma-joined event-type sequence in
    (ts, tiebreak) order. A session break is a gap > ``gap_minutes``.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev_ts = F.lag(ts_col).over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | (F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        ensure_parallelism(events)
        .withColumn("_ns", new_sess)
        .withColumn("sess_id", F.sum("_ns").over(run).cast("long"))
    )
    return (
        sess.groupBy(user_col, "sess_id")
        .agg(
            F.count("*").alias("n_events"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col(ts_col), F.col(order_tiebreak), F.col(type_col))
                        )
                    ),
                    lambda s: s[type_col],
                ),
            ).alias("seq"),
        )
        .select(user_col, "sess_id", "n_events", "seq")
    )
