"""Pareto-frontier (skyline) queries — "best tradeoff" selection the
reference's BigQuery reports would express as a correlated NOT EXISTS
dominance scan (reference main.py:76-118 ships report queries as raw
SQL; the skyline is the canonical expensive one).

A naive dominance check is an all-pairs theta join — O(n²) and
unshippable at 100 TB.  :func:`skyline_2d` uses the classic sort-scan
reduction for the 2-D maximize/maximize case:

1. collapse to one row per distinct ``x`` keeping ``max(y)`` — a
   partial-aggregated one-shuffle groupBy whose output is bounded by
   ``|distinct x|`` (for count-like x this is thousands of rows no
   matter the input size);
2. one window pass over that collapsed frame in descending ``x``:
   a distinct-x group is on the frontier iff its ``max(y)`` strictly
   exceeds the running max of ``max(y)`` over all strictly-greater
   ``x`` (ties in both coordinates are mutually non-dominating and
   are kept);
3. semi-join the surviving (x, max-y) pairs back to the input —
   broadcastable, since the frontier is at most ``|distinct x|`` rows.

The single-partition window in step 2 runs over the COLLAPSED frame,
never the data — the same bounded-exchange shape the heavy-hitter and
histogram sketches use.  Dominance is evaluated on exact integers
(callers pass integer cents / counts), so the DuckDB NOT EXISTS oracle
replays the frontier bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Rows of ``df`` not dominated by any other row, where row *b*
    dominates row *a* iff ``b.x >= a.x`` and ``b.y >= a.y`` with at
    least one strict.  Both coordinates are maximized; NULL coordinates
    are excluded (NULL compares as unknown in every dominance pair).
    Exact-duplicate coordinate pairs are mutually non-dominating and
    all survive."""
    base = df.where(F.col(x).isNotNull() & F.col(y).isNotNull())
    per_x = base.groupBy(x).agg(F.max(y).alias("_gy"))
    w = Window.orderBy(F.col(x).desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier_keys = (
        per_x.withColumn("_best_above", F.max("_gy").over(w))
        .where(
            F.col("_best_above").isNull()
            | (F.col("_gy") > F.col("_best_above"))
        )
        .select(x, "_gy")
    )
    return (
        base.join(F.broadcast(frontier_keys), on=x)
        .where(F.col(y) == F.col("_gy"))
        .drop("_gy")
    )
