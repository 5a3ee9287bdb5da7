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

At 100 TB nothing here shuffles the corpus more than the two doc-keyed
aggregations; query-term cardinality (|q| << vocab) bounds everything
else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    toks = ensure_parallelism(docs).select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("_t")
    )
    doclen = toks.groupBy(id_col).agg(F.count("*").alias("_dl"))
    stats = doclen.agg(
        F.count("*").alias("_n"), F.avg("_dl").alias("_avgdl")
    )
    tf = (
        toks.where(F.col("_t").isin(list(query_terms)))
        .groupBy(id_col, "_t")
        .agg(F.count("*").alias("_tf"))
    )
    dfreq = tf.groupBy("_t").agg(F.count("*").alias("_df"))
    scored = (
        tf.join(F.broadcast(dfreq), "_t")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0
    )
    weight = idf * (
        F.col("_tf")
        * (k1 + 1.0)
        / (
            F.col("_tf")
            + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum(weight), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), id_col)
        .limit(k)
    )
