"""Language-model quality scoring: per-document negative log-likelihood
under a corpus-trained unigram LM.

The CCNet-style perplexity filter (Wenzek et al., "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data"), reduced to its
relational core: real systems score against a pretrained KenLM; with no
model artifacts in this container the LM is trained ON THE CORPUS
ITSELF in the same plan — a unigram model with additive smoothing.
Documents whose token distribution diverges from the corpus (boiler-
plate, gibberish, wrong-language text) score a high mean NLL and get
dropped by the caller's threshold, exactly like a perplexity cut.

Plan shape (the 100 TB path): ONE token-keyed aggregation builds the
LM (map-side combinable counts); the scorer joins the token stream
back to the LM on the token key and rolls up per document — two
shuffles total (token key, then doc key), no Python anywhere. The LM
table is vocabulary-sized (<< corpus) so Spark's size-based planner
broadcasts it when it fits; Zipf-skew in the join key is harmless
under a broadcast join (no shuffle of the hot key).

Storage trade for the self-train path (train=None), where the token
stream feeds BOTH the LM build and the scorer: what gets persisted is
the per-document token ARRAYS — corpus-text-sized, one row per doc —
not the exploded one-row-per-token stream, which is strictly larger
(per-token row overhead + the doc id duplicated onto every token) and
would thrash executor storage at corpus scale. The cache is tracked in
the session registry (cache.clear_operator_caches) so long-lived
sessions can release it; the two explodes re-run, but explode over a
cached array is pure map-side compute, no re-tokenize, no extra scan.
The production path (train= supplied) persists nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.functions.text import tokenize
from data_pipeline_bigquery_to_sftp_server_spark.operators.scale import (
    ensure_parallelism,
)


def unigram_nll_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 0.5,
    train: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean negative log2-likelihood under the corpus
    unigram distribution with additive ``smoothing``. Returns one row
    per document: ``(id_col, n_tokens, mean_nll)`` (6dp; lower = more
    typical text; perplexity = 2^mean_nll if a caller wants it).

    With ``train=None`` the LM is trained on the scored corpus itself
    (the in-container stand-in). Passing ``train`` builds the LM from
    that frame instead — the production shape, where fresh data is
    scored against a reference corpus — and tokens unseen in training
    back off to the zero-count smoothed probability
    ``smoothing / (N + smoothing * V)`` via the left join's NULL
    count. Identical plan either way: one token-keyed aggregation, a
    token join (vocabulary-sized LM, broadcast when it fits), one
    per-doc rollup.
    """
    if train is None:
        # Consumed twice (LM build + scoring): persist the per-doc
        # token arrays — corpus-text-sized, NOT token-row-sized (see
        # module docstring) — so both consumers cost one corpus scan.
        from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked

        arrays = persist_tracked(
            ensure_parallelism(df).select(
                F.col(id_col), tokenize(F.col(text_col)).alias("_ta")
            )
        )
        toks = arrays.select(id_col, F.explode("_ta").alias("_t"))
        lm_toks = toks
    else:
        toks = ensure_parallelism(df).select(
            F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("_t")
        )
        lm_toks = ensure_parallelism(train).select(
            F.explode(tokenize(F.col(text_col))).alias("_t")
        )
    lm = lm_toks.groupBy("_t").agg(F.count("*").alias("_n"))
    # N.B. Spark resolves column names case-insensitively by default,
    # so the totals get distinct names rather than _N/_V.
    stats = lm.agg(F.sum("_n").alias("_tot"), F.count("*").alias("_vsz"))
    nll = -F.log2(
        (F.coalesce(F.col("_n"), F.lit(0)) + F.lit(smoothing))
        / (F.col("_tot") + F.lit(smoothing) * F.col("_vsz"))
    )
    return (
        toks.join(lm, "_t", "left")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(nll), 6).alias("mean_nll"),
        )
    )
