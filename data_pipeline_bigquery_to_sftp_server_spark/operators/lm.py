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
under a broadcast join (no shuffle of the hot key). The exploded token
stream is persisted so LM build + scoring cost one corpus scan.
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
    toks = ensure_parallelism(df).select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("_t")
    )
    if train is None:
        # consumed twice (LM build + scoring): one corpus scan via cache
        toks = toks.persist()
        lm_toks = toks
    else:
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
