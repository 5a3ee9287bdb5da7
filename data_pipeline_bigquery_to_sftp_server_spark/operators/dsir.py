"""Importance resampling for pretraining-data selection (DSIR-style).

Xie et al., "Data Selection for Language Models via Importance
Resampling" (NeurIPS 2023): score every raw document by the
log-likelihood ratio between a TARGET-domain language model and a
RAW-corpus language model, then sample k documents without replacement
with probability proportional to the importance weight via the Gumbel
top-k trick. Documents that look like the target domain (Wikipedia,
books, a curated seed set) get up-weighted; generic crawl text gets
down-weighted — the principled version of "select data that looks
like what you want to train on".

Relational reduction, same discipline as operators/lm.py: DSIR's
hashed-ngram feature space exists to keep model parameters fixed-size
in a single-machine NumPy implementation; a relational engine has no
such constraint, so the features here are raw unigrams and each LM is
a vocabulary-sized count table (two token-keyed aggregations). The
weight is

    log w(x) = sum over tokens t of [ln p_target(t) - ln p_raw(t)]

with additive smoothing over the SHARED vocabulary (union of both
sides — both distributions live on the same support, as DSIR's fixed
feature space guarantees by construction), and the Gumbel key is

    key(x) = log w(x) + g(x),   g = -ln(-ln(u)),
    u = first 48 bits of md5(id || ':' || salt) / 2^48

— u is the same engine-portable md5 uniform the sampling family uses
(bit-identical in Spark and DuckDB, so the oracle replays the exact
selection), making "sample k without replacement ∝ softmax(log w)"
a pure function of (id, salt): reproducible run-to-run and
engine-to-engine, no RNG state. Both log w and the key round to 6dp
BEFORE ranking (the repo's round-before-argmax rule — half-ulp ln()
disagreements between engines must not flip a rank), ties break on
id.

Plan shape at 100 TB: two token-keyed count aggregations (map-side
combinable; the target side is small by contract — it is a curated
domain sample), the scorer joins the raw token stream to two
vocabulary-sized LM tables (broadcast when they fit) + one one-row
stats frame, one per-doc rollup, and the global top-k is
TakeOrdered (orderBy+limit: per-partition partial top-k merged on the
driver — no single-partition global window over the corpus; the
rank-stamping window runs AFTER the limit, over k rows).

Reference: composes with the reference's sync loop (main.py fetch ->
screen -> upsert) as a select-before-ingest stage; no counterpart
exists there — this is part of the training-data surface this engine
adds (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_bigquery_to_sftp_server_spark.functions.text import tokenize
from data_pipeline_bigquery_to_sftp_server_spark.operators.scale import (
    ensure_parallelism,
)

_U48 = float(2**48)


def _md5_u01(id_col, salt: str):
    """Uniform in (0,1): first 12 hex chars of md5(id || ':' || salt)
    as a 48-bit integer / 2^48. 48 bits are exactly representable in a
    double, and DuckDB replays it verbatim via a '0x' hex cast."""
    h = F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(":" + salt))), 1, 12)
    return F.conv(h, 16, 10).cast("double") / F.lit(_U48)


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-document DSIR importance weights: one row per raw doc,
    ``(id_col, n_tokens, log_w)`` with log_w = the summed per-token
    ln-likelihood ratio (target over raw), rounded to 6dp. Null-text
    docs carry no tokens and get no row (same contract as the LM
    scorers). log_w SUMS over tokens (not mean) — per DSIR, the weight
    of a document is the product of its token ratios, so longer
    on-domain documents are proportionally more likely to be kept."""
    from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked

    s = float(smoothing)
    rtoks = ensure_parallelism(raw).select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("_t")
    )
    ttoks = ensure_parallelism(target).select(
        F.explode(tokenize(F.col(text_col))).alias("_t")
    )
    # The LM count tables feed three consumers each (vocab union,
    # totals, the scoring join); persisting them is vocabulary-sized
    # (safe at any corpus scale) and collapses what would be seven
    # corpus scans to three: tv build, rv build, and the score stream.
    # The remaining double raw scan (rv build + scoring) is deliberate
    # — caching the corpus-sized token arrays instead (lm.py's
    # self-train trade) may not fit storage at 100 TB, while two scans
    # always work.
    tv = persist_tracked(ttoks.groupBy("_t").agg(F.count("*").alias("_tn")))
    rv = persist_tracked(rtoks.groupBy("_t").agg(F.count("*").alias("_rn")))
    vocab = (
        tv.select("_t")
        .unionByName(rv.select("_t"))
        .distinct()
        .agg(F.count("*").alias("_vsz"))
    )
    stats = (
        vocab.crossJoin(tv.agg(F.sum("_tn").alias("_ttot")))
        .crossJoin(rv.agg(F.sum("_rn").alias("_rtot")))
        # in-plan contract assert (the sketch.py discipline): an empty
        # target corpus would propagate NULL totals into every weight
        # silently — fail loudly at execution instead, with no eager
        # count job at operator-construction time.
        .where(
            F.assert_true(
                F.col("_ttot").isNotNull(),
                F.lit(
                    "importance_weights: target corpus has no tokens — "
                    "DSIR needs a non-empty target-domain sample"
                ),
            ).isNull()
        )
    )
    # every raw token is in rv by construction (counted from the same
    # stream), so only the target side needs the unseen-token backoff
    llr = F.log(
        (F.coalesce(F.col("_tn"), F.lit(0)) + F.lit(s))
        / (F.col("_ttot") + F.lit(s) * F.col("_vsz"))
    ) - F.log((F.col("_rn") + F.lit(s)) / (F.col("_rtot") + F.lit(s) * F.col("_vsz")))
    return (
        rtoks.join(tv, "_t", "left")
        .join(rv, "_t")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum(llr), 6).alias("log_w"),
        )
    )


def importance_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 0.5,
    salt: str = "dsir",
) -> DataFrame:
    """Select ``k`` raw documents without replacement with probability
    proportional to their DSIR importance weight, deterministically:
    Gumbel top-k over ``log_w + g(id, salt)``. Returns
    ``(id_col, n_tokens, log_w, sel_key, rank)`` for the k selected
    docs, rank 1 = highest key. Rotate ``salt`` to draw an independent
    resample without touching the data."""
    w = importance_weights(raw, target, id_col, text_col, smoothing)
    u = _md5_u01(F.col(id_col), salt)
    keyed = w.withColumn("sel_key", F.round(F.col("log_w") + -F.log(-F.log(u)), 6))
    topk = keyed.orderBy(F.desc("sel_key"), F.asc(id_col)).limit(int(k))
    rank_w = Window.orderBy(F.desc("sel_key"), F.asc(id_col))
    return topk.withColumn("rank", F.row_number().over(rank_w))
