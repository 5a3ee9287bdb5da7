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
    # Plan-only width probe: ``df.inputFiles()`` resolves the leaf
    # scans' file index during analysis — no Spark job, no RDD
    # conversion of the unexecuted plan, and AQE keeps ownership of the
    # physical plan (``df.rdd.getNumPartitions()`` forfeits all three).
    # A file-backed scan with >= target files is already wide (large
    # files additionally split by ``maxPartitionBytes``); non-file
    # plans (in-memory frames) report zero files and get widened,
    # which is exactly the compute-bound-small-input case this helper
    # exists for.
    try:
        width = len(df.inputFiles())
    except Exception:  # non-file-backed plan — treat as narrow
        width = 0
    if width < target:
        return df.repartition(target)
    return df
