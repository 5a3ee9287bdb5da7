"""Unigram-LM NLL quality scoring (operators/lm.py): exact small-case
math, ordering property (rare-token docs score higher), and the
empty-doc edge."""

import math

from data_pipeline_bigquery_to_sftp_server_spark.operators import lm


def test_unigram_nll_exact_small_case(spark):
    # corpus: "a a b" and "a b" -> counts a=3, b=2; N=5, V=2
    rows = [(1, "a a b"), (2, "a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in lm.unigram_nll_scores(df, smoothing=0.5).collect()}
    p_a = (3 + 0.5) / (5 + 0.5 * 2)
    p_b = (2 + 0.5) / (5 + 0.5 * 2)
    nll_a, nll_b = -math.log2(p_a), -math.log2(p_b)
    assert out[1].n_tokens == 3
    assert out[1].mean_nll == round((2 * nll_a + nll_b) / 3, 6)
    assert out[2].n_tokens == 2
    assert out[2].mean_nll == round((nll_a + nll_b) / 2, 6)


def test_unigram_nll_rare_tokens_score_higher(spark):
    common = "the quick brown fox " * 10
    rows = [(i, common) for i in range(1, 9)]
    rows.append((9, "zyx wvu tsr qpo nml"))  # all-rare doc
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.mean_nll for r in lm.unigram_nll_scores(df).collect()}
    assert out[9] > out[1]  # atypical doc scores strictly higher
    assert all(out[i] == out[1] for i in range(2, 9))  # identical docs tie


def test_unigram_nll_foreign_corpus_with_unseen_fallback(spark):
    """LM trained on one frame scores another; a token absent from
    training gets exactly the zero-count smoothed probability."""
    train = spark.createDataFrame([(10, "a a b"), (11, "a b")], "doc_id long, text string")
    scored = spark.createDataFrame([(1, "a zzz")], "doc_id long, text string")
    out = lm.unigram_nll_scores(scored, smoothing=0.5, train=train).collect()
    # train counts: a=3, b=2; N=5, V=2
    p_a = (3 + 0.5) / (5 + 0.5 * 2)
    p_unseen = (0 + 0.5) / (5 + 0.5 * 2)
    want = round((-math.log2(p_a) - math.log2(p_unseen)) / 2, 6)
    assert out[0].n_tokens == 2 and out[0].mean_nll == want
