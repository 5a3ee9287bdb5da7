"""Spatial distance join — "all pairs of points within distance d"
without the O(n²) cross join, the grid-bucketing (fixed-radius near
neighbors) reduction:

1. each point lands in its home cell ``(x div cell, y div cell)``
   with ``cell >= d``, so any qualifying pair sits in the SAME or an
   ADJACENT cell;
2. one side is exploded to its 3×3 cell neighborhood (a 9× map-side
   fanout of (id, x, y) triples — bytes, not payloads);
3. an equi-join on the cell key co-locates candidates (hash shuffle,
   AQE-splittable if a cell is hot), and the exact predicate runs
   in-stage.

Each unordered pair is found EXACTLY once: the home-side row joins
the exploded side at one specific offset (the cell delta is a
function of the two fixed cells), and the ``id_a < id_b`` orientation
keeps one of the two mirror assignments.  All arithmetic is integer
(squared distance vs d² — never a sqrt, never libm), so the DuckDB
cross-join oracle replays every pair and distance bit-for-bit.

The same shape generalizes to the geohash/S2 joins a production
pipeline runs; integer planar cells stand in for the curved-surface
cell scheme with the join topology identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_distance_join(
    points: DataFrame,
    max_dist: int,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
    cell: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with squared Euclidean distance
    <= max_dist² over integer coordinates.  Returns
    ``(id_a, id_b, dist2)``.  ``cell`` defaults to ``max_dist`` and
    must be >= it (asserted) — the adjacency guarantee."""
    cell = int(cell if cell is not None else max_dist)
    if cell < max_dist:
        raise ValueError(
            "grid_distance_join: cell size below max_dist breaks the "
            "adjacent-cell guarantee"
        )
    home = points.select(
        F.col(id_col).alias("_ida"),
        F.col(x).alias("_xa"),
        F.col(y).alias("_ya"),
        F.expr(f"{x} div {cell}").alias("_cx"),
        F.expr(f"{y} div {cell}").alias("_cy"),
    )
    off = F.explode(
        F.array(*[F.lit(i) for i in (-1, 0, 1)])
    )
    probe = (
        points.select(
            F.col(id_col).alias("_idb"),
            F.col(x).alias("_xb"),
            F.col(y).alias("_yb"),
            F.expr(f"{x} div {cell}").alias("_bcx"),
            F.expr(f"{y} div {cell}").alias("_bcy"),
        )
        .withColumn("_dx", off)
        .withColumn("_dy", off)
        .select(
            "_idb",
            "_xb",
            "_yb",
            (F.col("_bcx") + F.col("_dx")).alias("_cx"),
            (F.col("_bcy") + F.col("_dy")).alias("_cy"),
        )
    )
    d2 = (
        (F.col("_xa") - F.col("_xb")) * (F.col("_xa") - F.col("_xb"))
        + (F.col("_ya") - F.col("_yb")) * (F.col("_ya") - F.col("_yb"))
    )
    return (
        home.join(probe, ["_cx", "_cy"])
        .where(F.col("_ida") < F.col("_idb"))
        .where(d2 <= F.lit(int(max_dist) * int(max_dist)))
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            d2.cast("long").alias("dist2"),
        )
    )
