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


def _bigram_structs(arr):
    """array<struct<_prev,_cur>> of adjacent token pairs (empty for
    docs under 2 tokens — they carry no transition signal)."""
    n = F.size(arr)
    shifted = F.slice(arr, 2, F.greatest(n - 1, F.lit(1)))
    zipped = F.zip_with(
        arr, shifted, lambda a, b: F.struct(a.alias("_prev"), b.alias("_cur"))
    )
    return F.when(n >= 2, F.slice(zipped, 1, n - 1)).otherwise(
        F.array().cast("array<struct<_prev:string,_cur:string>>")
    )


def bigram_nll_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 0.5,
    alpha: float = 0.4,
    train: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean negative log2-likelihood over bigram
    transitions with stupid backoff (Brants et al., "Large Language
    Models in Machine Translation": score(w_i | w_{i-1}) =
    count(w_{i-1} w_i) / count(w_{i-1}) when the bigram was seen in
    training, else ``alpha`` x the additively-smoothed unigram
    probability of w_i). Returns one row per document with >= 2
    tokens: ``(id_col, n_bigrams, mean_nll)`` (6dp).

    This is the step from "CCNet-style" toward CCNet proper: a
    transition model catches shuffled-word and template-stitched text
    whose unigram distribution looks perfectly natural (pinned in
    test_lm). Still fully relational — bigrams are built map-side with
    one zip_with over shifted token slices (no Python, no extra scan),
    counted by ONE gram-keyed aggregation, and joined back to the gram
    stream alongside the unigram vocabulary; both LM tables are
    vocabulary-sized, so Spark's planner broadcasts them when they fit
    and Zipf skew in the join keys stays harmless.

    ``train=None`` trains on the scored corpus itself (per-doc token
    arrays cached once, as unigram_nll_scores); with ``train`` the
    counts come from the reference corpus instead — two passes over
    the training frame (token-keyed + gram-keyed aggregations), each a
    straight scan, deliberately not cached at corpus scale.
    """
    score_arrays = ensure_parallelism(df).select(
        F.col(id_col), tokenize(F.col(text_col)).alias("_ta")
    )
    if train is None:
        from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked

        score_arrays = persist_tracked(score_arrays)
        train_arrays = score_arrays
    else:
        train_arrays = ensure_parallelism(train).select(
            tokenize(F.col(text_col)).alias("_ta")
        )
    grams = score_arrays.select(
        id_col, F.explode(_bigram_structs(F.col("_ta"))).alias("_bg")
    ).select(id_col, F.col("_bg._prev").alias("_prev"), F.col("_bg._cur").alias("_cur"))
    uni = (
        train_arrays.select(F.explode("_ta").alias("_t"))
        .groupBy("_t")
        .agg(F.count("*").alias("_n"))
    )
    big = (
        train_arrays.select(F.explode(_bigram_structs(F.col("_ta"))).alias("_bg"))
        .select(F.col("_bg._prev").alias("_prev"), F.col("_bg._cur").alias("_cur"))
        .groupBy("_prev", "_cur")
        .agg(F.count("*").alias("_nb"))
    )
    stats = uni.agg(F.sum("_n").alias("_tot"), F.count("*").alias("_vsz"))
    up = uni.select(F.col("_t").alias("_prev"), F.col("_n").alias("_np"))
    uc = uni.select(F.col("_t").alias("_cur"), F.col("_n").alias("_nc"))
    backoff_p = (F.coalesce(F.col("_nc"), F.lit(0)) + F.lit(smoothing)) / (
        F.col("_tot") + F.lit(smoothing) * F.col("_vsz")
    )
    nll = F.when(
        F.col("_nb").isNotNull(), -F.log2(F.col("_nb") / F.col("_np"))
    ).otherwise(-F.log2(F.lit(alpha) * backoff_p))
    return (
        grams.join(big, ["_prev", "_cur"], "left")
        .join(up, "_prev", "left")
        .join(uc, "_cur", "left")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(nll), 6).alias("mean_nll"),
        )
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Collocation mining: corpus-level pointwise mutual information
    over adjacent token pairs —

        pmi(a, b) = log2( P(a b) / (P(a) * P(b)) )

    with P(a b) = bigram count / total bigrams and P(.) = unigram
    count / total tokens. High-PMI pairs are the corpus's multi-word
    expressions ("new york", "machine learning") — the statistic
    behind phrase detection in word2vec's preprocessing (Mikolov et
    al. 2013) and a standard input to tokenizer-merge and stop-phrase
    curation in LLM data pipelines. Returns one row per surviving
    bigram: ``(w1, w2, n_ab, pmi)`` with pmi rounded to 6dp;
    ``min_count`` drops the unstable low-frequency tail (PMI's known
    bias toward hapax pairs).

    Plan shape at 100 TB: the corpus is tokenized ONCE (per-doc arrays
    tracked-persisted — same storage trade as the LM scorers above);
    unigram and bigram counts are each one map-side-combinable
    aggregation over an explode of those arrays, the corpus totals are
    a one-row agg, and the final PMI math joins the (min_count-pruned,
    vocabulary-sized) bigram table to the unigram table twice on the
    token key. Corpus text never shuffles — only counts do.
    """
    from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked

    toks = persist_tracked(
        ensure_parallelism(df)
        .select(tokenize(F.col(text_col)).alias("_ta"))
        .where(F.col("_ta").isNotNull())
    )
    uni = toks.select(F.explode("_ta").alias("_w")).groupBy("_w").agg(
        F.count("*").alias("_c")
    )
    bi = (
        toks.select(F.explode(_bigram_structs(F.col("_ta"))).alias("_bg"))
        .select(F.col("_bg._prev").alias("w1"), F.col("_bg._cur").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= min_count)
    )
    # totals BEFORE the min_count prune: probabilities are over the
    # whole corpus, the prune only limits which pairs are reported
    totals = toks.agg(
        F.sum(F.size("_ta")).alias("_nu"),
        F.sum(F.greatest(F.size("_ta") - F.lit(1), F.lit(0))).alias("_nb"),
    )
    ua = uni.select(F.col("_w").alias("w1"), F.col("_c").alias("_ca"))
    ub = uni.select(F.col("_w").alias("w2"), F.col("_c").alias("_cb"))
    return (
        bi.join(ua, "w1")
        .join(ub, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "n_ab",
            F.round(
                F.log2(
                    (F.col("n_ab") / F.col("_nb"))
                    / ((F.col("_ca") / F.col("_nu")) * (F.col("_cb") / F.col("_nu")))
                ),
                6,
            ).alias("pmi"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    n_buckets: int = 3,
    smoothing: float = 0.5,
    train: DataFrame | None = None,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. §4.3): documents
    are ranked per language by LM score and cut into ``n_buckets``
    equal-population buckets — bucket 1 ("head") is the most fluent
    third, bucket ``n`` ("tail") the least; CCNet publishes the corpus
    partitioned this way so consumers pick their quality/volume
    trade-off instead of a fixed threshold.

    Returns one row per token-bearing doc:
    ``(id_col, lang_col, n_tokens, mean_nll, bucket)``. Ranking uses
    ``ntile`` over (mean_nll rounded 6dp, id) — fully deterministic,
    engine-portable (DuckDB's ntile has identical semantics), so the
    whole partition is oracle-replayable.

    Scale: the per-lang ntile is ONE window over doc-level rows (one
    row per document, not per token — the shuffle key is the language,
    and doc-level cardinality is what windows are sized for). Skewed
    language distribution (English ≫ rest) makes the en partition
    large; CCNet itself shards by language before ranking, and at
    100 TB the same applies — run per-language if one language's
    doc-level rows exceed a partition. LM choice follows
    unigram_nll_scores: self-trained by default, reference-corpus via
    ``train``.
    """
    from pyspark.sql.window import Window

    scores = unigram_nll_scores(df, id_col, text_col, smoothing, train=train)
    langs = df.select(F.col(id_col), F.col(lang_col))
    w = Window.partitionBy(lang_col).orderBy(F.asc("mean_nll"), F.asc(id_col))
    return (
        scores.join(langs, id_col)
        .withColumn("bucket", F.ntile(n_buckets).over(w))
        .select(id_col, lang_col, "n_tokens", "mean_nll", "bucket")
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    coverage: float = 0.8,
    min_count: int = 1,
) -> DataFrame:
    """Tokenizer-prep vocabulary table: the smallest frequency-ranked
    token prefix covering ``coverage`` of the corpus token mass — the
    standard first step of vocabulary construction (word-level vocab
    cut, wordpiece seed vocabulary, coverage-vs-size curves for
    choosing |V|). Returns ``(token, n, tok_rank, cum_share)`` for
    every token whose cumulative mass BEFORE it is still under the
    target (so the result always reaches >= coverage), ranked by
    (count desc, token asc).

    The cut condition compares exact integer ratios ((cum - n) / N) —
    no float rounding can move the boundary between engines; cum_share
    is rounded 6dp for output only.

    Scale: counts are one token-keyed aggregation (map-side
    combinable). The ranking window is GLOBAL but runs over the
    VOCABULARY, not the corpus — with a Zipf vocabulary and a
    ``min_count`` cut (hapaxes can never enter a sub-100% coverage
    prefix at corpus scale; cut them before the sort) the ranked frame
    is millions of rows, a single-partition sort Spark handles
    routinely. For corpora where even that overflows, pre-filter with
    a count threshold from a first pass (sketch.py's heavy-hitter
    two-pass is the same discipline).
    """
    from pyspark.sql.window import Window

    counts_all = (
        ensure_parallelism(df)
        .select(F.explode(tokenize(F.col(text_col))).alias("_t"))
        .groupBy("_t")
        .agg(F.count("*").alias("_n"))
    )
    # coverage is of the FULL corpus token mass — the min_count cut
    # shrinks the ranked frame, never the denominator
    total = counts_all.agg(F.sum("_n").alias("_tot"))
    counts = counts_all.where(F.col("_n") >= int(min_count))
    order = [F.desc("_n"), F.asc("_t")]
    w_cum = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    w_rank = Window.orderBy(*order)
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("_cum", F.sum("_n").over(w_cum))
        .withColumn("tok_rank", F.row_number().over(w_rank))
        .where((F.col("_cum") - F.col("_n")) / F.col("_tot") < F.lit(float(coverage)))
        .select(
            F.col("_t").alias("token"),
            F.col("_n").alias("n"),
            "tok_rank",
            F.round(F.col("_cum") / F.col("_tot"), 6).alias("cum_share"),
        )
    )


def encode_token_ids(
    df: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    unk_id: int = 0,
) -> DataFrame:
    """Tokenizer APPLICATION (X48): materialize every document as its
    integer token-id sequence under a corpus-derived word-level
    vocabulary — the step between vocabulary construction
    (:func:`vocab_coverage`) and training-shard writing (packing /
    curriculum / shuffle_shards all consume token counts; this emits
    the ids themselves). The vocabulary is the top ``vocab_size``
    tokens by (count desc, token asc) with ids 1..vocab_size in rank
    order; out-of-vocabulary tokens encode as ``unk_id``.

    Returns ``(id_col, n_tokens, n_oov, ids)`` with ``ids`` the
    comma-joined id sequence IN DOCUMENT ORDER — a string, not an
    array, so the row (order included) hash-compares across engines
    (DuckDB replays it with ``string_agg(... ORDER BY pos)``).

    Plan: one token-keyed count aggregation; the ranking window runs
    over the VOCABULARY (bounded by ``vocab_size`` after a cheap
    top-(vocab_size) TakeOrdered-style cut — never the corpus); the
    encode join is posexplode -> broadcast vocab join -> doc-keyed
    reassembly via array_sort over (pos, id) structs. Two shuffles
    total: token counts, per-doc reassembly. The reassembly buffers
    ONE DOCUMENT's ids per aggregation group — document length (not
    corpus size) bounds executor memory; chunk pathological megadocs
    upstream (chunk_documents) before encoding, the same per-row bound
    every doc-granular operator here carries.
    """
    from pyspark.sql.window import Window

    if 1 <= int(unk_id) <= int(vocab_size):
        raise ValueError(
            f"encode_token_ids: unk_id={unk_id} collides with the vocab id "
            f"range 1..{vocab_size} — n_oov would count real tokens."
        )
    toks = (
        ensure_parallelism(df)
        .select(F.col(id_col), F.posexplode(tokenize(F.col(text_col))).alias("pos", "_t"))
    )
    counts = toks.groupBy("_t").agg(F.count("*").alias("_n"))
    # bound the global ranking window's input to vocab_size rows first:
    # orderBy+limit compiles to TakeOrdered (per-partition heaps), so
    # the single-partition window only ever sees vocab_size rows
    top = counts.orderBy(F.desc("_n"), F.asc("_t")).limit(int(vocab_size))
    w = Window.orderBy(F.desc("_n"), F.asc("_t"))
    vocab = top.withColumn("tok_id", F.row_number().over(w)).select("_t", "tok_id")
    encoded = toks.join(F.broadcast(vocab), "_t", "left").select(
        id_col,
        "pos",
        F.coalesce("tok_id", F.lit(int(unk_id))).alias("_id"),
    )
    return (
        encoded.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum((F.col("_id") == unk_id).cast("int")).alias("n_oov"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("_id")))
                    ),
                    lambda s: s["_id"].cast("string"),
                ),
            ).alias("ids"),
        )
        .select(id_col, "n_tokens", "n_oov", "ids")
    )
