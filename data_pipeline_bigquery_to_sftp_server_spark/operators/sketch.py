"""Sketch-based heavy hitters: approximate-then-verify frequent items.

A plain ``groupBy(token).count()`` already gets map-side partial
aggregation from Catalyst, but its shuffle carries one row per DISTINCT
token per partition — when token cardinality is huge (URLs, n-grams,
user ids at 100 TB), that per-partition distinct set is itself the
bottleneck. The sketch path bounds it:

- **Pass 1 (no token shuffle):** each Arrow batch runs a Misra-Gries
  summary with ``capacity`` counters via ``mapInPandas``; only the
  surviving candidate tokens (<= capacity per batch) leave the
  executors. Recall guarantee by averaging: any token with global
  frequency > N/capacity exceeds n_b/capacity in at least one batch, so
  it survives that batch's summary and reaches the candidate set.
- **Pass 2 (exact verify):** token occurrences are counted exactly but
  only for the (broadcast) candidate set, so the shuffle carries
  candidates only. Output counts are EXACT — the sketch only bounds
  which tokens can reach the final top-k.

The result equals exact top-k whenever the k-th item's true frequency
exceeds N/capacity (document/assert per use); the operator is therefore
oracle-checkable, unlike a raw sketch whose counts are approximate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.operators.scale import (
    ensure_parallelism,
)


def _misra_gries_batches(capacity: int):
    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts: dict[str, int] = {}
            for tok in pdf["token"]:
                if tok in counts:
                    counts[tok] += 1
                elif len(counts) < capacity:
                    counts[tok] = 1
                else:
                    # Decrement-all step: amortized O(1) per input item
                    # (each decrement pays back one prior increment).
                    dead = [t for t in counts if counts[t] == 1]
                    for t in counts:
                        counts[t] -= 1
                    for t in dead:
                        del counts[t]
            yield pd.DataFrame({"token": list(counts.keys())})

    return summarize


def heavy_hitters(
    df: DataFrame,
    token_col: Column,
    k: int = 20,
    capacity: int = 256,
) -> DataFrame:
    """Top-k most frequent tokens of ``token_col`` (an array<string>
    expression, e.g. ``text.tokenize(col)``) with EXACT counts, via the
    two-pass sketch-then-verify plan above. Returns (token, n) ordered
    by (n desc, token), k rows.

    Exact-equality condition: true frequency of the k-th item > N /
    capacity. Size ``capacity`` >= N / f_k; when unsure, oversize — the
    cost is executor memory (capacity counters) and candidate-set
    width, both tiny next to the corpus.
    """
    toks = ensure_parallelism(df).select(
        F.explode(token_col).alias("token")
    )
    candidates = (
        toks.mapInPandas(_misra_gries_batches(capacity), "token string")
        .distinct()
        .withColumnRenamed("token", "_cand")
    )
    return (
        toks.join(
            F.broadcast(candidates), toks.token == F.col("_cand"), "left_semi"
        )
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(k)
    )
