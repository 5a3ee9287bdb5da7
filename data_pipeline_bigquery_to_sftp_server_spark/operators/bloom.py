"""Bloom-filter membership screen — the compressed tier of the
incremental-dedup probe family.

Three membership tiers now exist, by corpus size:
- closure set (decontam.py eval grams): exact, tiny reference sets;
- Bloom bitmap (this module): ~1.2 bytes/item at 1% FPR — a 1B-doc
  corpus fingerprint set compresses to ~1.5 GB of bits, broadcastable
  where the exact fingerprint FRAME would need a distributed join;
  no false negatives, tunable false-positive rate;
- distributed fingerprint frame (dedup_state.py): exact, unbounded,
  one join per batch.

The production pattern pairs the Bloom tier with exact verification:
screen every arriving doc against the bitmap map-side (no join, no
shuffle), and send ONLY the maybe-duplicates (true dups + FPR-bounded
noise) into the exact fingerprint join — the join's probe side shrinks
from |batch| to |dups| + FPR*|batch|.

Implementation: k = ``num_hashes`` bit positions per value from
JVM-side ``xxhash64(value, seed_i) mod num_bits`` (no Python in the
position computation); the bitmap is OR-reduced from per-Arrow-batch
partial bitmaps (each task yields one packed-bytes row; the driver ORs
``n_batches`` of them — a bounded collect of n_batches * num_bits/8
bytes, asserted via ``max_build_mb``). The probe ships the bitmap in
the task closure and tests all k bits with vectorized numpy ops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.operators.scale import (
    ensure_parallelism,
)


def _positions(value: Column, num_bits: int, num_hashes: int, seed: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(value, F.lit(seed + i)), F.lit(num_bits)).cast("long")
        for i in range(num_hashes)
    ]


def build_bloom(
    df: DataFrame,
    value: Column,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    seed: int = 42,
    max_build_mb: int = 256,
) -> bytes:
    """Build the packed Bloom bitmap for ``value`` over ``df``.
    Returns ``num_bits/8`` bytes. Position hashing is JVM-side; bit
    setting is one Arrow-batched pass emitting a partial bitmap per
    batch, OR-reduced driver-side. ``max_build_mb`` asserts the
    driver-collect contract (n_batches * num_bits/8) up front."""
    if num_bits % 8:
        raise ValueError("build_bloom: num_bits must be a multiple of 8")
    pos_df = ensure_parallelism(df).select(
        *[
            p.alias(f"_p{i}")
            for i, p in enumerate(_positions(value, num_bits, num_hashes, seed))
        ]
    )
    n_parts = pos_df.rdd.getNumPartitions()
    est_mb = n_parts * (num_bits // 8) / 1e6
    if est_mb > max_build_mb:
        raise ValueError(
            f"build_bloom: ~{est_mb:.0f} MB of partial bitmaps would be "
            f"collected ({n_parts} partitions x {num_bits//8} bytes) > "
            f"max_build_mb={max_build_mb}. Lower num_bits, coalesce the "
            "input, or raise the ceiling explicitly."
        )
    nbytes = num_bits // 8

    def partial(batches):
        bm = np.zeros(nbytes, dtype=np.uint8)
        saw = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            saw = True
            pos = pdf.to_numpy(dtype=np.int64).ravel()
            np.bitwise_or.at(bm, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        if saw:
            yield pd.DataFrame({"bm": [bm.tobytes()]})

    parts = pos_df.mapInPandas(partial, "bm binary").collect()
    out = np.zeros(nbytes, dtype=np.uint8)
    for r in parts:
        out |= np.frombuffer(r.bm, dtype=np.uint8)
    return out.tobytes()


def bloom_flag(
    value: Column,
    bloom: bytes,
    num_hashes: int = 4,
    seed: int = 42,
) -> Column:
    """Boolean Column: all k bits set for ``value`` (possible member;
    false = DEFINITELY not in the build set). The bitmap rides the
    task closure; the k probed positions are computed JVM-side and
    only the bit test is an Arrow-batched pandas UDF."""
    from pyspark.sql.functions import pandas_udf

    bm = np.frombuffer(bloom, dtype=np.uint8)
    num_bits = len(bm) * 8

    @pandas_udf("boolean")
    def probe(pos_arr: pd.Series) -> pd.Series:
        P = np.vstack(pos_arr.to_numpy()).astype(np.int64)  # (rows, k)
        bits = (bm[P >> 3] >> (P & 7).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=1))

    return probe(F.array(*_positions(value, num_bits, num_hashes, seed)))
