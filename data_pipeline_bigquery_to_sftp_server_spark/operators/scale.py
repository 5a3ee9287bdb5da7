"""Parallelism-shaping helpers shared by CPU-heavy operators.

Small parquet inputs arrive as one (or few) partitions — file splitting
is byte-based (``spark.sql.files.maxPartitionBytes``), so a compact
table lands on a single core even on a 32-core executor. That is
correct for IO-bound scans but wrong for compute-bound stages
(shingling, SRP signatures, SimHash bit-sums, Arrow/numpy scoring),
whose cost is per-row, not per-byte.

``ensure_parallelism`` widens such inputs to the cluster's default
parallelism; when the scan is already at least that wide (the 100 TB
case — thousands of input splits) it is a no-op, so operators can apply
it unconditionally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to ``min_partitions`` (default:
    ``sparkContext.defaultParallelism``) iff it currently has fewer
    partitions. Never shrinks — wide inputs pass through untouched.

    The added exchange carries the raw input rows once; downstream
    per-row compute then runs on every core. Worth it exactly when
    compute-per-row >> shuffle-cost-per-row (text shingling, embedding
    scoring) — callers on pure-IO paths should not use this.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
