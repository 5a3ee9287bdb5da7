"""Sequence packing: group documents into fixed token-budget bins for
LLM training batches (concat-and-mask style), distributed.

Packing is inherently order-dependent, so a global optimum would
serialize on one node. The scalable shape used here: hash documents
into ``num_groups`` independent groups (deterministic, key-based — the
same shuffle any groupBy pays), then run first-fit-decreasing inside
each group via ``applyInPandas``. FFD within a group guarantees every
bin except possibly one per group is more than half full (classic FFD
bound: it uses <= 11/9 OPT + 1 bins), so global utilization stays high
while groups pack embarrassingly parallel. At 100 TB, raise
``num_groups`` so each group's document list fits comfortably in one
Arrow batch (the per-group work is O(docs x bins) python — the
explicit trade for an order-dependent algorithm no built-in operator
expresses).

Oversized documents (tokens > budget) get a dedicated bin each and are
flagged, never silently truncated — truncation policy belongs to the
caller.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GROUP_SHIFT = 32  # bin_id = group_id << 32 | local bin index


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    num_groups: int | None = None,
    group_expr: Column | None = None,
) -> DataFrame:
    """Assign each document to a bin: returns ``(id_col, tokens_col,
    bin_id, oversize)`` with one row per input document.

    Deterministic: group = xxhash64(id) mod num_groups (or the caller's
    ``group_expr``, an int column in [0, num_groups) — pass an
    engine-portable hash like ``pmod(conv(substring(md5(id),1,4),16,10),
    g)`` when the assignment must replay identically outside Spark, as
    the oracle harness does), FFD order = (tokens desc, id asc) within
    the group, so the same input always yields the same assignment
    regardless of partitioning.
    """
    if budget <= 0:
        raise ValueError(f"pack_sequences: budget must be positive, got {budget}")
    num_groups = num_groups or df.sparkSession.sparkContext.defaultParallelism
    # The id column passes through untouched, so its output type is
    # whatever the input declares (string doc ids are common in real
    # corpora — don't force long).
    id_type = df.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, {tokens_col} long, bin_id long, oversize boolean"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [tokens_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        group = int(pdf["_grp"].iloc[0]) << _GROUP_SHIFT
        remaining: list[int] = []  # capacity left per open bin
        bin_ids, oversize = [], []
        for t in pdf[tokens_col].astype("int64"):
            t = int(t)
            if t > budget:
                remaining.append(0)  # dedicated, already-full bin
                bin_ids.append(group | (len(remaining) - 1))
                oversize.append(True)
                continue
            for j, cap in enumerate(remaining):
                # cap > 0 keeps zero-token docs out of exactly-full
                # bins — in particular out of an oversized doc's
                # dedicated bin (cap == 0), preserving the
                # 'oversized docs sit alone' invariant.
                if cap >= t and cap > 0:
                    remaining[j] = cap - t
                    bin_ids.append(group | j)
                    break
            else:
                remaining.append(budget - t)
                bin_ids.append(group | (len(remaining) - 1))
            oversize.append(False)
        out = pdf[[id_col, tokens_col]].copy()
        out["bin_id"] = pd.Series(bin_ids, dtype="int64")
        out["oversize"] = pd.Series(oversize, dtype="bool")
        return out

    if group_expr is None:
        group_expr = F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_groups))
    grouped = df.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
        group_expr.cast("long").alias("_grp"),
    )
    return grouped.groupBy("_grp").applyInPandas(_pack, schema)


def packing_summary(assign: DataFrame, tokens_col: str = "n_tokens") -> DataFrame:
    """Per-bin rollup of a pack_sequences assignment: doc count, token
    fill, and whether the bin holds an oversized document."""
    return assign.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(tokens_col).alias("fill"),
        F.max("oversize").alias("oversize"),
    )


def assemble_bins(
    assign: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str = "n_tokens",
    sep: str = "\n\n",
) -> DataFrame:
    """Materialize the packed training sequences: join the
    pack_sequences assignment back to the documents and concatenate
    each bin's texts (deterministic member order: token count desc,
    id asc — the FFD insertion order) into one sequence per bin.

    Returns (bin_id, n_docs, fill, sequence). One doc-keyed broadcast-
    able join + one bin-keyed aggregation; the heavy strings move
    exactly once, straight into their output bin.
    """
    joined = assign.join(docs.select(id_col, text_col), id_col)
    member = F.struct(
        (-F.col(tokens_col)).alias("_neg_tokens"),
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_text"),
    )
    return (
        joined.groupBy("bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(tokens_col).alias("fill"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(member)), lambda s: s["_text"]
                ),
                sep,
            ).alias("sequence"),
        )
    )
