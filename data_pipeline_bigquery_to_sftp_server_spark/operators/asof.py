"""As-of and range (interval) joins — operators Spark lacks natively
(SURVEY §2.3 J5-J8), built as compositions of existing DataFrame ops.

As-of join (backward): for each left row, the single right row with the
largest right timestamp <= left timestamp (per key). Implemented with
the union + conditional window trick:

    tag both sides -> union -> window last_value(right cols) over
    (partition by key order by ts, side) -> keep left rows

One shuffle on (key), no pair explosion — the same shape a native
implementation would pick, and it scales linearly. The alternative
``pd.merge_asof`` inside applyInPandas needs the whole key group in
one pandas frame; the window form streams.

Range join: equi-bucketized inequality join — each side is assigned to
coarse time buckets, candidates meet only within bucket +/- 1, then the
exact predicate filters. Avoids the O(n*m) BroadcastNestedLoop plan
Spark would otherwise produce for a pure inequality condition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str] | None,
    suffix: str,
    direction: str,
    tolerance_s: int | None,
) -> DataFrame:
    """Shared union+window as-of core (backward = latest right
    at-or-before, forward = earliest right at-or-after; inclusive
    ties). ALL carried right columns ride ONE struct through a single
    ``last(..., ignorenulls=True)`` — per-column fills would mix rows
    whenever the nearest match holds a NULL in one column (the fill
    skips it and grabs that column from a FARTHER row; caught by the
    r9 review, pinned in test_asof_skew). ``tolerance_s`` discards
    matches farther than the bound (columns go NULL — merge_asof
    semantics), compared in integer microseconds on both engines.

    One shuffle on the key, per-row window state is one struct —
    no pair explosion; left-outer semantics."""
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    l_tag = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r_tag = (
        right.select(
            key,
            F.col(right_ts).alias("_rts"),
            *[F.col(c).alias(f"_v_{c}") for c in right_value_cols],
        )
        .withColumn("_side", F.lit(0))
        .withColumn("_ts", F.col("_rts"))
        .withColumn(
            "_pack",
            F.struct(
                F.col("_rts").alias("_rts"),
                *[F.col(f"_v_{c}").alias(f"_v_{c}") for c in right_value_cols],
            ),
        )
        .drop("_rts", *[f"_v_{c}" for c in right_value_cols])
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows order before left rows at equal _ts (side 0 < 1) in
    # BOTH directions, so same-instant rights are visible — the
    # inclusive tie rule
    ts_order = (
        F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    )
    # _pack as the final sort key (r9 advice): when multiple right rows
    # share (key, timestamp), the carried struct would otherwise be
    # partition-order-dependent — the packed struct itself is a total
    # deterministic order among same-instant rights (left rows hold a
    # NULL _pack, and _side already separates the sides), so every run
    # and engine resolves equal-timestamp ties identically: the
    # struct-largest right row wins.
    w = (
        Window.partitionBy(key)
        .orderBy(ts_order, F.col("_side").asc(), F.col("_pack").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "_m", F.last("_pack", ignorenulls=True).over(w)
    )
    matched_ts = F.col("_m._rts")
    gap_us = (
        F.unix_micros(matched_ts) - F.unix_micros(F.col("_ts"))
        if direction == "forward"
        else F.unix_micros(F.col("_ts")) - F.unix_micros(matched_ts)
    )
    in_tol = (
        F.lit(True)
        if tolerance_s is None
        else gap_us <= F.lit(int(tolerance_s) * 1_000_000)
    )
    out_cols = [c for c in left.columns] + [
        F.when(in_tol, matched_ts).alias(f"{right_ts}{suffix}")
    ] + [
        F.when(in_tol, F.col(f"_m._v_{c}")).alias(f"{c}{suffix}")
        for c in right_value_cols
    ]
    return filled.where(F.col("_side") == 1).select(*out_cols)


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance_s: int | None = None,
) -> DataFrame:
    """Backward as-of join: latest right row at-or-before each left row
    (left-outer; ties at the exact timestamp match — DuckDB
    ``ASOF LEFT JOIN`` / pandas ``merge_asof`` semantics). Optional
    ``tolerance_s`` discards matches older than the bound."""
    return _asof_join(
        left, right, key, left_ts, right_ts, right_value_cols, suffix,
        "backward", tolerance_s,
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance_s: int | None = None,
) -> DataFrame:
    """Forward as-of join: EARLIEST right row at-or-after each left row
    (pandas ``merge_asof(direction='forward')`` / DuckDB
    ``ASOF LEFT JOIN ... ON l.ts <= r.ts``); ``tolerance_s`` bounds the
    look-ahead — time-to-conversion analyses want "the next purchase
    within an hour", not "the next purchase ever"."""
    return _asof_join(
        left, right, key, left_ts, right_ts, right_value_cols, suffix,
        "forward", tolerance_s,
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: Column,
    right_ts: Column,
    lower_s: int,
    upper_s: int,
    bucket_s: int = 3600,
    extra_condition: Column | None = None,
) -> DataFrame:
    """Interval join: pairs where right_ts in [left_ts - lower_s,
    left_ts + upper_s] (bounds in seconds, inclusive).

    Bucketization: the left side gets one integer bucket id at
    ``bucket_s`` granularity; the right side explodes to every bucket
    its match window overlaps, so the join is an equi-join on bucket id
    (hash shuffle, whole-stage codegen) followed by the exact range
    filter. This replaces the O(n*m) BroadcastNestedLoop plan Spark
    would pick for a bare inequality condition. Choose ``bucket_s``
    near the window width: each right row then lands in <= 3 buckets.
    """
    # Bucket ids are computed on second-truncated longs (coarse candidate
    # pruning only); the exact predicate runs on the original timestamp
    # columns at full precision so boundaries match a reference engine.
    l = left.withColumn(
        "_bkl", (left_ts.cast("long") / F.lit(bucket_s)).cast("long")
    )
    r = right.withColumn(
        "_bkr",
        F.explode(
            F.sequence(
                ((right_ts.cast("long") - F.lit(upper_s) - 1) / F.lit(bucket_s)).cast("long"),
                ((right_ts.cast("long") + F.lit(lower_s) + 1) / F.lit(bucket_s)).cast("long"),
            )
        ),
    )
    cond = (
        (right_ts >= left_ts - F.expr(f"INTERVAL {int(lower_s)} SECONDS"))
        & (right_ts <= left_ts + F.expr(f"INTERVAL {int(upper_s)} SECONDS"))
    )
    if extra_condition is not None:
        cond = cond & extra_condition
    return (
        l.join(r, on=(F.col("_bkl") == F.col("_bkr")) & cond)
        .drop("_bkl", "_bkr")
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    cell_days: int = 7,
) -> DataFrame:
    """J14 interval-INTERVAL overlap join (r11): all (a, b) pairs whose
    DATE intervals overlap — ``a_start <= b_end AND b_start <= a_end``
    (inclusive; the schedule-conflict / concurrent-session /
    exposure-window join). The temporal sibling of the spatial grid
    join: a bare inequality-pair condition plans as a nested-loop
    cross product, so BOTH sides explode into the ``cell_days``-grid
    cells their interval covers and candidates co-locate under ONE
    cell-keyed equi-join. Two overlapping intervals share at least one
    covered cell, and the ``cell = greatest(cell_a, cell_b_start?)``
    dedup rule — keep only the pair's FIRST shared cell, i.e. the cell
    of ``greatest(a_start, b_start)`` — emits each qualifying pair
    exactly once with NO distinct pass (the spatial_join cell-delta
    argument, 1-D). Exact predicate re-checked in-stage on the real
    dates; fanout is bounded by interval length / cell_days per side;
    hot cells are ordinary join skew (AQE-splittable)."""
    day_a_s = F.datediff(F.col(a_start), F.lit("1970-01-01").cast("date"))
    day_a_e = F.datediff(F.col(a_end), F.lit("1970-01-01").cast("date"))
    day_b_s = F.datediff(F.col(b_start), F.lit("1970-01-01").cast("date"))
    day_b_e = F.datediff(F.col(b_end), F.lit("1970-01-01").cast("date"))
    cd = int(cell_days)
    ac = a.withColumn(
        "_cell",
        F.explode(
            F.sequence(
                F.call_function("div", day_a_s, F.lit(cd)),
                F.call_function("div", day_a_e, F.lit(cd)),
            )
        ),
    ).withColumn("_as_day", day_a_s)
    bc = b.withColumn(
        "_cell",
        F.explode(
            F.sequence(
                F.call_function("div", day_b_s, F.lit(cd)),
                F.call_function("div", day_b_e, F.lit(cd)),
            )
        ),
    ).withColumn("_bs_day", day_b_s)
    overlap = (F.col(a_start) <= F.col(b_end)) & (
        F.col(b_start) <= F.col(a_end)
    )
    # first-shared-cell rule: the overlap starts at max(starts); emit
    # the pair only from that cell
    first_cell = F.call_function(
        "div", F.greatest(F.col("_as_day"), F.col("_bs_day")), F.lit(cd)
    )
    return (
        ac.join(bc, "_cell")
        .where(overlap & (F.col("_cell") == first_cell))
        .drop("_cell", "_as_day", "_bs_day")
    )
