"""Lexical retrieval: BM25 scoring over a tokenized corpus.

The classic sparse-retrieval ranking (Robertson/Spärck Jones), built
entirely from relational primitives so Catalyst owns the plan:

- per-doc token explode -> doc lengths (one shuffle, key = doc id);
- term frequencies restricted to the query terms BEFORE any join (the
  `isin` filter is pushed into the scan-side projection, so the tf
  shuffle carries only query-term hits, not the corpus);
- document frequency and the corpus stats (N, avgdl) are tiny by
  construction -> broadcast; the one-row stats frame rides a broadcast
  cross join (same pattern as the window boundary frame);
- final score = groupBy(doc) sum of per-term weights, then top-k via
  TakeOrdered.

At 100 TB nothing here shuffles the corpus more than the one doc-keyed
aggregation; query-term cardinality (|q| << vocab) bounds everything
else. The aggregated per-doc frame (one row per document — orders of
magnitude smaller than the token stream) is persisted so the stats
branch reads the cache instead of re-running the explode subtree: ONE
corpus scan total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked
from data_pipeline_bigquery_to_sftp_server_spark.functions.text import tokenize
from data_pipeline_bigquery_to_sftp_server_spark.operators.scale import (
    ensure_parallelism,
)


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 score for a bag of query terms.

    Returns (id_col, bm25) ordered by (bm25 desc, id); scores rounded
    to 6dp BEFORE ranking so the ordering is engine-portable. Documents
    containing none of the query terms score 0 and are not returned.
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    # Single corpus pass: ONE explode + ONE doc-keyed aggregation
    # producing doc length and a pivoted per-query-term tf column
    # (|query_terms| is small by construction, so the pivot width is
    # bounded). The naive tf/df/doclen-as-separate-frames formulation
    # scans the corpus 4x; persisting per_doc (one row per doc) makes
    # the stats branch a cache read, so the explode subtree runs ONCE.
    # Lifecycle: the broadcast of `stats` materializes the cache before
    # the scoring pass reads it; the persist is tracked in the session
    # cache registry (cache.clear_operator_caches releases it — callers
    # rerunning bm25 with new terms rebuild per_doc anyway since the tf
    # pivot is term-specific).
    toks = ensure_parallelism(docs).select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("_t")
    )
    per_doc = toks.groupBy(id_col).agg(
        F.count("*").alias("_dl"),
        *[
            F.count(F.when(F.col("_t") == t, 1)).alias(f"_tf{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    per_doc = persist_tracked(per_doc)
    # Corpus stats + per-term document frequency in ONE one-row frame,
    # broadcast to the scorers.
    stats = per_doc.agg(
        F.count("*").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.count(F.when(F.col(f"_tf{i}") > 0, 1)).alias(f"_df{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    weight = None
    for i in range(len(query_terms)):
        idf = F.log(
            (F.col("_n") - F.col(f"_df{i}") + 0.5)
            / (F.col(f"_df{i}") + 0.5)
            + 1.0
        )
        w = idf * (
            F.col(f"_tf{i}")
            * (k1 + 1.0)
            / (
                F.col(f"_tf{i}")
                + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
            )
        )
        w = F.when(F.col(f"_tf{i}") > 0, w).otherwise(F.lit(0.0))
        weight = w if weight is None else weight + w
    return (
        scored.select(id_col, F.round(weight, 6).alias("bm25"))
        .where(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), id_col)
        .limit(k)
    )
