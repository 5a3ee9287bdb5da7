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


def sequence_pattern(
    events: DataFrame,
    pattern: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """MATCH_RECOGNIZE-lite: regex matching over each key's ordered
    event sequence. Event types compress to their first character, the
    per-user character string is assembled in (ts, tiebreak) order
    (same one-shuffle collect as :func:`session_sequences`), and the
    pattern runs ONCE per user against that compact string — Spark has
    no MATCH_RECOGNIZE; this is the relational reduction: pattern
    evaluation becomes a scalar regex over a per-key aggregate, fully
    codegen'd, with non-overlapping left-to-right matches standing in
    for ONE ROW PER MATCH + SKIP PAST LAST ROW semantics.

    Returns ``(user_col, n_events, n_matches, converted, first_path,
    path_len)``. Scale shape: one shuffle keyed by user; per-user
    state is that user's events (sequence length bounds memory, not
    corpus size); the regex never leaves the JVM. Both engines use
    leftmost, non-overlapping match scanning, so n_matches and
    first_path replay exactly."""
    w_ok = (
        F.col(ts_col).isNotNull()
        & F.col(user_col).isNotNull()
        & F.col(type_col).isNotNull()
    )
    seq = F.concat_ws(
        "",
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col),
                        F.col(order_tiebreak),
                        F.substring(F.col(type_col), 1, 1).alias("_ch"),
                    )
                )
            ),
            lambda s: s["_ch"],
        ),
    )
    agg = (
        ensure_parallelism(events.where(w_ok))
        .groupBy(user_col)
        .agg(F.count("*").alias("n_events"), seq.alias("_seq"))
    )
    n_matches = F.size(F.regexp_extract_all(F.col("_seq"), F.lit(pattern), F.lit(0)))
    first = F.regexp_extract(F.col("_seq"), pattern, 0)
    return agg.select(
        user_col,
        "n_events",
        n_matches.cast("long").alias("n_matches"),
        (n_matches > 0).cast("long").alias("converted"),
        first.alias("first_path"),
        F.length(first).cast("long").alias("path_len"),
    )


def attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Multi-touch conversion attribution: every conversion event is
    linked to the touch events (``touch_types``) that preceded it since
    the user's previous conversion, with first-touch / last-touch flags
    and the exact linear-model weight as an integer rational
    ``(weight_num=1, weight_den=n_touches)`` — emitted as integers, not
    a float share, so any downstream rollup stays order-independent and
    oracle-exact.

    Mechanics: one window pass per user ordered by (ts, id) assigns
    every event the count of conversions STRICTLY before it — all
    touches between conversion k and k+1, and conversion k+1 itself,
    share attribution group k.  Touches and conversions split from that
    one windowed frame and re-join on (user, group): one user-keyed
    shuffle for the window, one (user, group) equi-join, no theta join,
    no fan-out (each group has exactly one conversion).  Conversions
    with zero preceding touches and trailing touches never followed by
    a conversion drop out (inner join).

    Output: (user, conv_event_id, conv_value, touch_event_id,
    touch_type, touch_rank, n_touches, is_first, is_last, weight_num,
    weight_den) — one row per (conversion, touch).
    """
    e = events.where(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isin(conversion_type, *touch_types)
    )
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    is_conv = (F.col(type_col) == conversion_type).cast("long")
    grouped = e.withColumn(
        "_grp",
        F.coalesce(
            F.sum(is_conv).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    convs = grouped.where(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("user"),
        F.col("_grp"),
        F.col(id_col).alias("conv_event_id"),
        F.col(value_col).alias("conv_value"),
    )
    tw = Window.partitionBy(user_col, "_grp").orderBy(ts_col, id_col)
    touches = (
        grouped.where(F.col(type_col) != conversion_type)
        .withColumn("touch_rank", F.row_number().over(tw))
        .withColumn(
            "n_touches",
            F.count(F.lit(1)).over(
                Window.partitionBy(user_col, "_grp")
            ),
        )
        .select(
            F.col(user_col).alias("user"),
            F.col("_grp"),
            F.col(id_col).alias("touch_event_id"),
            F.col(type_col).alias("touch_type"),
            "touch_rank",
            "n_touches",
        )
    )
    return (
        convs.join(touches, ["user", "_grp"])
        .select(
            "user",
            "conv_event_id",
            "conv_value",
            "touch_event_id",
            "touch_type",
            "touch_rank",
            "n_touches",
            (F.col("touch_rank") == 1).cast("long").alias("is_first"),
            (F.col("touch_rank") == F.col("n_touches"))
            .cast("long")
            .alias("is_last"),
            F.lit(1).alias("weight_num"),
            F.col("n_touches").alias("weight_den"),
        )
    )
