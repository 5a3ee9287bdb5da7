"""Model-based document classification: multinomial Naive Bayes,
trained AND scored fully relationally.

The model-based quality/language classifier stage of LLM data
pipelines (CCNet/LLaMA use a fastText linear classifier; GPT-3's
quality filter is logistic regression): a learned model scores every
document, replacing hand-written rules. Naive Bayes is the member of
that family whose TRAINING is itself a relational aggregation — class
priors are a groupBy(label) count, token likelihoods are ONE
(label, token)-keyed count — so, unlike LR/fastText (iterative
gradient steps), the entire train+score pipeline stays declarative:
Catalyst owns it, it scales like any aggregation, and an external SQL
engine can replay it bit-for-bit, which is exactly what the oracle
harness does.

Plan shape (the 100 TB path): one token-keyed aggregation builds the
likelihood table ((label, token) cardinality = vocab x classes —
broadcast-sized); scoring joins the token stream to it on the token
key (all classes for a token ride one row via a pivoted map, so the
probe stays one join), rolls up per (doc, class), and takes a
deterministic argmax. Two shuffles total (token key, doc key) — the
same shape as the LM scorer, with Zipf skew neutralized by the
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.functions.text import tokenize
from data_pipeline_bigquery_to_sftp_server_spark.operators.scale import (
    ensure_parallelism,
)


def naive_bayes_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    smoothing: float = 1.0,
    train: DataFrame | None = None,
) -> DataFrame:
    """Multinomial NB with additive ``smoothing``: score every document
    against every training class and return the argmax. One row per
    scored document: ``(id_col, predicted, best_score)`` where
    ``best_score`` is the per-token-normalized log2 posterior
    ``(log2 prior + sum log2 P(token|class)) / n_tokens`` rounded to
    6dp (per-token normalization keeps scores comparable across doc
    lengths; rounding BEFORE the argmax makes the ranking
    engine-portable — same discipline as bm25). Ties break on class
    name ascending.

    ``train=None`` trains on the scored frame itself; pass ``train``
    for the production split (classify fresh docs against a labeled
    reference corpus). Unseen tokens back off to the zero-count
    smoothed likelihood of each class via the left join's NULL count.
    """
    scored_toks = ensure_parallelism(df).select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("_t")
    )
    tr = df if train is None else train
    tr_toks = ensure_parallelism(tr).select(
        F.col(label_col).alias("_cls"), F.explode(tokenize(F.col(text_col))).alias("_t")
    )
    # likelihood table: one (class, token) count; class totals + vocab
    # size + doc priors are tiny side aggregates that broadcast.
    ct = tr_toks.groupBy("_cls", "_t").agg(F.count("*").alias("_n"))
    totals = ct.groupBy("_cls").agg(F.sum("_n").alias("_tot"))
    vocab = ct.select("_t").distinct().agg(F.count("*").alias("_vsz"))
    priors = (
        tr.groupBy(F.col(label_col).alias("_cls"))
        .agg(F.count("*").alias("_docs"))
        .crossJoin(
            tr.agg(F.count("*").alias("_alldocs"))
        )
        .select("_cls", (F.col("_docs") / F.col("_alldocs")).alias("_prior"))
    )
    classes = priors.join(totals, "_cls").crossJoin(F.broadcast(vocab))
    # every (token occurrence, class) pair: left join keeps unseen
    # tokens (NULL count -> smoothed zero likelihood)
    pairs = (
        scored_toks.crossJoin(F.broadcast(classes.select("_cls")))
        .join(ct, ["_cls", "_t"], "left")
        .join(F.broadcast(classes), "_cls")
    )
    loglik = F.log2(
        (F.coalesce(F.col("_n"), F.lit(0)) + F.lit(smoothing))
        / (F.col("_tot") + F.lit(smoothing) * F.col("_vsz"))
    )
    per_class = (
        pairs.groupBy(id_col, "_cls")
        .agg(
            F.count("*").alias("_ntok"),
            F.sum(loglik).alias("_ll"),
            F.first("_prior").alias("_prior"),
        )
        .select(
            id_col,
            "_cls",
            F.round(
                (F.log2("_prior") + F.col("_ll")) / F.col("_ntok"), 6
            ).alias("_score"),
        )
    )
    # deterministic argmax: score desc, class asc — the same
    # row_number form the oracle replays
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("_score"), F.asc("_cls"))
    return (
        per_class.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            id_col,
            F.col("_cls").alias("predicted"),
            F.col("_score").alias("best_score"),
        )
    )
