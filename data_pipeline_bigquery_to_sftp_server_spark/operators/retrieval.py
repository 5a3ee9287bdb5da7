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

from pyspark.sql import DataFrame, Window
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


def tfidf_doc_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.3,
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Lexical near-duplicate / similar-document pairs by TF-IDF
    cosine: every unordered doc pair whose cosine similarity over
    tf*idf-weighted token vectors meets ``threshold``. Complements the
    Jaccard family (set overlap, frequency-blind) with a
    frequency-AWARE lexical similarity — two docs sharing many rare
    terms rank far above two docs sharing boilerplate — and the
    embedding family with a model-free signal. Returns
    ``(id_a, id_b, cos_sim)`` with id_a < id_b and cos rounded to 6dp.

    Weights: ``w(d, t) = tf(d, t) * log2(N / df(t))``. Tokens present
    in more than ``max_df_frac`` of documents are dropped BEFORE
    weighting (and excluded from norms): the standard sklearn-style
    ``max_df`` cut. That prune is also the scale guard — the pair
    join is token-keyed, and its blowup is driven by exactly the
    high-df tokens the cut removes (a token in f docs contributes
    f^2/2 candidate pairs; capping f/N caps the quadratic term). The
    near-ubiquitous tokens it drops carry idf ~ 0 anyway.

    Plan shape at 100 TB: one corpus tokenize -> (doc, token, tf)
    aggregation; df + N are aggregates of THAT table (never a second
    corpus scan — the weighted table is tracked-persisted since the
    norm branch and the pair join both read it); per-doc norms are a
    doc-keyed rollup; the pair join shuffles only df-pruned weighted
    postings on the token key, and the dot-product rollup is
    map-side-combinable (SUM over (id_a, id_b)).
    """
    from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked

    toks = ensure_parallelism(docs).select(
        F.col(id_col).alias("_id"), F.explode(tokenize(F.col(text_col))).alias("_t")
    )
    tf = toks.groupBy("_id", "_t").agg(F.count("*").alias("_tf"))
    dfreq = tf.groupBy("_t").agg(F.count("*").alias("_df"))
    n_docs = tf.agg(F.count_distinct("_id").alias("_nd"))
    weighted = persist_tracked(
        tf.join(dfreq, "_t")
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("_df") <= F.lit(float(max_df_frac)) * F.col("_nd"))
        .select(
            "_id",
            "_t",
            (F.col("_tf") * F.log2(F.col("_nd") / F.col("_df"))).alias("_w"),
        )
    )
    norms = weighted.groupBy("_id").agg(
        F.sqrt(F.sum(F.col("_w") * F.col("_w"))).alias("_norm")
    )
    dots = (
        weighted.alias("a")
        .join(
            weighted.alias("b"),
            (F.col("a._t") == F.col("b._t")) & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.sum(F.col("a._w") * F.col("b._w")).alias("_dot"))
    )
    na = norms.select(F.col("_id").alias("id_a"), F.col("_norm").alias("_na"))
    nb_ = norms.select(F.col("_id").alias("id_b"), F.col("_norm").alias("_nb"))
    cos = F.col("_dot") / (F.col("_na") * F.col("_nb"))
    return (
        dots.join(na, "id_a")
        .join(nb_, "id_b")
        .where(cos >= F.lit(float(threshold)))
        .select("id_a", "id_b", F.round(cos, 6).alias("cos_sim"))
    )


def tfidf_query_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Top-k documents by TF-IDF cosine against a bag-of-terms query —
    the vector-space scorer next to BM25 (a genuinely different
    ranking: document-length-normalized cosine vs BM25's saturating
    tf), and the second input :func:`rrf_fuse` needs. Same weighting
    and ``max_df`` cut as :func:`tfidf_doc_pairs` (``w = tf *
    log2(N/df)``, the cut applied to weights AND norms); the query
    vector is ``idf(t)`` per term (tf_q = 1). Returns
    ``(id_col, tfidf_cos)`` rounded to 6dp before ranking.

    Plan: one corpus tokenize -> (doc, token, tf) aggregate (persisted
    — the norm branch and the query-dot branch both read it); the
    query side is |terms| rows, broadcast; per-doc norm is a doc-keyed
    rollup. One corpus-sized shuffle on the token key, like BM25."""
    from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked

    if not query_terms:
        raise ValueError("tfidf_query_topk: query_terms must be non-empty")
    toks = ensure_parallelism(docs).select(
        F.col(id_col).alias("_id"), F.explode(tokenize(F.col(text_col))).alias("_t")
    )
    tf = toks.groupBy("_id", "_t").agg(F.count("*").alias("_tf"))
    dfreq = tf.groupBy("_t").agg(F.count("*").alias("_df"))
    n_docs = tf.agg(F.count_distinct("_id").alias("_nd"))
    weighted = persist_tracked(
        tf.join(dfreq, "_t")
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("_df") <= F.lit(float(max_df_frac)) * F.col("_nd"))
        .select(
            "_id",
            "_t",
            (F.col("_tf") * F.log2(F.col("_nd") / F.col("_df"))).alias("_w"),
        )
    )
    norms = weighted.groupBy("_id").agg(
        F.sqrt(F.sum(F.col("_w") * F.col("_w"))).alias("_norm")
    )
    qv = (
        dfreq.crossJoin(F.broadcast(n_docs))
        .where(
            F.col("_t").isin(list(query_terms))
            & (F.col("_df") <= F.lit(float(max_df_frac)) * F.col("_nd"))
        )
        .select("_t", F.log2(F.col("_nd") / F.col("_df")).alias("_qw"))
    )
    qnorm = qv.agg(F.sqrt(F.sum(F.col("_qw") * F.col("_qw"))).alias("_qn"))
    dots = (
        weighted.join(F.broadcast(qv), "_t")
        .groupBy("_id")
        .agg(F.sum(F.col("_w") * F.col("_qw")).alias("_dot"))
    )
    cos = F.col("_dot") / (F.col("_norm") * F.col("_qn"))
    return (
        dots.join(norms, "_id")
        .crossJoin(F.broadcast(qnorm))
        .select(F.col("_id").alias(id_col), F.round(cos, 6).alias("tfidf_cos"))
        .orderBy(F.desc("tfidf_cos"), id_col)
        .limit(k)
    )


def rrf_fuse(
    systems: list[tuple[DataFrame, str]],
    id_col: str = "doc_id",
    k: int = 25,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack & Clarke's RRF) over N ranked
    systems: ``rrf(d) = sum_i 1/(c + rank_i(d))``, with a document
    absent from a system contributing 0 — the standard hybrid-retrieval
    combiner (lexical + semantic hard-negative mining runs exactly
    this). Each input is ``(top-k frame, score column)``; ranks are
    row_number over ``(score desc, id)`` — the frames are top-k-bounded
    by contract, so the single-partition rank windows are k-row sorts,
    never data-sized. The RRF terms are small-integer rationals summed
    in a FIXED left-to-right tree, so the emitted doubles are
    engine-identical unrounded. Returns
    ``(id_col, rank_0.., rank_{n-1}, rrf)`` top-k by (rrf desc, id)."""
    from functools import reduce as _reduce

    ranked = []
    for i, (df, score_col) in enumerate(systems):
        w = Window.orderBy(F.desc(score_col), id_col)
        ranked.append(
            df.select(id_col, F.row_number().over(w).alias(f"rank_{i}"))
        )
    joined = _reduce(lambda a, b: a.join(b, id_col, "full_outer"), ranked)
    rrf = None
    for i in range(len(ranked)):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(c)) + F.col(f"rank_{i}")), F.lit(0.0)
        )
        rrf = term if rrf is None else rrf + term
    return (
        joined.withColumn("rrf", rrf)
        .orderBy(F.desc("rrf"), id_col)
        .limit(k)
    )


def _ann_candidates(
    corpus: DataFrame,
    anchors: DataFrame,
    k_candidates: int,
    method: str,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    seed: int,
    ann_kwargs: dict,
) -> DataFrame:
    from data_pipeline_bigquery_to_sftp_server_spark.operators import similarity

    queries = anchors.select(query_id_col, query_vec_col)
    common = dict(
        k=k_candidates,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
        seed=seed,
    )
    if method == "lsh":
        return similarity.lsh_topk(corpus, queries, **common, **ann_kwargs)
    if method == "ivf":
        return similarity.ivf_topk(corpus, queries, **common, **ann_kwargs)
    raise ValueError(f"hard_negatives_ann: unknown method {method!r} (lsh|ivf)")


def hard_negatives_ann(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    k_candidates: int = 50,
    method: str = "lsh",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    query_label_col: str = "query_label",
    seed: int = 42,
    **ann_kwargs,
) -> DataFrame:
    """Hard-negative mining at corpus scale: ANN candidates
    (``k_candidates`` per anchor via SRP-LSH banding or IVF — the
    corpus never cross-joins the anchors) -> label filter -> exact
    cosine re-rank -> top ``k``. Same output contract as the exact
    broadcast-scan path in q_hard_negatives: ``(query_id, vec_id,
    cos_sim rounded 6dp BEFORE ranking, rnk)``. Recall is the ANN dial
    (a true hard negative outside every shared band/probed bucket is
    missed); every returned row is exact-scored, so precision is 1 —
    pinned vs the exact path in test_retrieval, including the
    full-probe IVF configuration that must EQUAL it (the X20d
    verification pattern). ``k_candidates`` must comfortably exceed
    ``k`` so the label filter leaves enough survivors (the published
    candidates-then-filter retrieval shape).

    Plan: candidate generation is the ANN operator's broadcast/bucket
    join (corpus scanned, never shuffled on anchors); the label join
    touches only |anchors| x k_candidates rows; the re-rank window
    shuffles that bounded set on the anchor key.
    """
    from pyspark.sql import Window

    cand = _ann_candidates(
        corpus, anchors, k_candidates, method,
        id_col, vec_col, query_id_col, query_vec_col, seed, ann_kwargs,
    )
    # the candidate set is bounded (|anchors| x k_candidates) -> it is
    # the broadcast side of the label join; the corpus label column is
    # scanned map-side, never shuffled on the candidate ids
    labeled = (
        corpus.select(id_col, label_col)
        .join(F.broadcast(cand), id_col)
        .join(
            F.broadcast(anchors.select(query_id_col, query_label_col)),
            query_id_col,
        )
        .where(F.col(label_col) != F.col(query_label_col))
        # round BEFORE the top-k window (round-before-rank rule)
        .select(query_id_col, id_col, F.round("cos_sim", 6).alias("cos_sim"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        labeled.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cos_sim", "rnk")
    )


def retrieval_mrr_ann(
    corpus: DataFrame,
    anchors: DataFrame,
    k_candidates: int = 50,
    method: str = "lsh",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    query_label_col: str = "query_label",
    seed: int = 42,
    **ann_kwargs,
) -> DataFrame:
    """MRR eval over ANN candidate lists — the scale twin of
    q_retrieval_mrr: rank the ``k_candidates`` retrieved per anchor
    (self excluded, cosine rounded 6dp before ranking), then the first
    same-label rank and its reciprocal. Ranks are WITHIN the candidate
    list; they equal the global ranks whenever the candidates cover
    the global top (guaranteed under full-probe IVF with
    ``k_candidates >= |corpus|`` — equality pinned in test_retrieval).
    An anchor whose candidates hold no same-label row emits no row
    (the eval's miss; the exact path can only miss when the corpus
    has no same-label vector at all)."""
    from pyspark.sql import Window

    cand = _ann_candidates(
        corpus, anchors, k_candidates, method,
        id_col, vec_col, query_id_col, query_vec_col, seed, ann_kwargs,
    )
    scored = (
        corpus.select(id_col, label_col)
        .join(
            F.broadcast(cand.where(F.col(id_col) != F.col(query_id_col))), id_col
        )
        .join(
            F.broadcast(anchors.select(query_id_col, query_label_col)),
            query_id_col,
        )
        .select(
            query_id_col,
            query_label_col,
            id_col,
            label_col,
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    ranked = scored.withColumn("rnk", F.row_number().over(w))
    return (
        ranked.where(F.col(label_col) == F.col(query_label_col))
        .groupBy(query_id_col)
        .agg(F.min("rnk").alias("first_rel_rank"))
        .select(
            query_id_col,
            "first_rel_rank",
            F.round(F.lit(1.0) / F.col("first_rel_rank"), 6).alias(
                "reciprocal_rank"
            ),
        )
    )


def contrastive_triplets(
    corpus: DataFrame,
    anchors: DataFrame,
    n_neg: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    query_label_col: str = "query_label",
) -> DataFrame:
    """Contrastive training-pair assembly (X46): for every anchor, the
    single hardest POSITIVE (most-similar same-label vector, self
    excluded — hard-positive mining) crossed with the ``n_neg``
    hardest NEGATIVES (most-similar different-label vectors) — the
    (anchor, positive, negative_1..k) rows an InfoNCE/triplet-loss
    batch builder consumes. One row per (anchor, negative) with the
    shared positive alongside, so downstream grouping by anchor
    reassembles the batch without re-joining.

    Plan: ONE broadcast-anchors corpus scan scores everything (cosine
    rounded 6dp BEFORE both windows — the round-before-rank rule);
    the same scored frame feeds the positive window (same-label) and
    the negative window (different-label), so Spark reuses the
    exchange. Fully relational -> the DuckDB oracle replays every row.
    Anchors whose label has no other member emit nothing (no
    positive exists — the degenerate case a batch builder must skip
    anyway).
    """
    from pyspark.sql import Window

    from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked
    from data_pipeline_bigquery_to_sftp_server_spark.operators import similarity
    from data_pipeline_bigquery_to_sftp_server_spark.operators.scale import (
        ensure_parallelism,
    )

    scored = persist_tracked(
        ensure_parallelism(corpus.select(id_col, vec_col, label_col))
        .crossJoin(
            F.broadcast(
                anchors.select(query_id_col, query_vec_col, query_label_col)
            )
        )
        .where(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            query_label_col,
            id_col,
            label_col,
            F.round(
                similarity.cosine(
                    F.col(vec_col).cast("array<double>"),
                    F.col(query_vec_col).cast("array<double>"),
                ),
                6,
            ).alias("_cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("_cos"), F.asc(id_col))
    pos = (
        scored.where(F.col(label_col) == F.col(query_label_col))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            query_id_col,
            F.col(id_col).alias("pos_id"),
            F.col("_cos").alias("pos_cos"),
        )
    )
    neg = (
        scored.where(F.col(label_col) != F.col(query_label_col))
        .withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= n_neg)
        .select(
            query_id_col,
            F.col(id_col).alias("neg_id"),
            F.col("_cos").alias("neg_cos"),
            "neg_rank",
        )
    )
    return pos.join(neg, query_id_col).select(
        query_id_col, "pos_id", "pos_cos", "neg_id", "neg_cos", "neg_rank"
    )
