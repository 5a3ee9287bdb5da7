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


def test_bigram_nll_exact_small_case(spark):
    """Exact math on a 2-doc corpus, self-trained: every bigram seen,
    so every transition scores -log2(count(prev cur)/count(prev))."""
    rows = [(1, "a b a b"), (2, "a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in lm.bigram_nll_scores(df, smoothing=0.5).collect()}
    # bigram counts: (a,b)=3, (b,a)=1; unigram: a=3, b=3
    nll_ab = -math.log2(3 / 3)
    nll_ba = -math.log2(1 / 3)
    assert out[1].n_bigrams == 3
    assert out[1].mean_nll == round((2 * nll_ab + nll_ba) / 3, 6)
    assert out[2].n_bigrams == 1
    assert out[2].mean_nll == round(nll_ab, 6)


def test_bigram_nll_backoff_on_unseen_transition(spark):
    """An unseen bigram backs off to alpha x smoothed unigram p(cur);
    an unseen token also exercises the zero-count coalesce."""
    train = spark.createDataFrame(
        [(10, "a b a b"), (11, "b c")], "doc_id long, text string"
    )
    scored = spark.createDataFrame([(1, "c a zzz")], "doc_id long, text string")
    out = lm.bigram_nll_scores(scored, smoothing=0.5, alpha=0.4, train=train).collect()
    # train: uni a=2,b=3,c=1 -> N=6,V=3; bigrams (a,b)=2,(b,a)=1,(b,c)=1
    p_a = (2 + 0.5) / (6 + 0.5 * 3)
    p_zzz = (0 + 0.5) / (6 + 0.5 * 3)
    want = round((-math.log2(0.4 * p_a) - math.log2(0.4 * p_zzz)) / 2, 6)
    assert out[0].n_bigrams == 2 and out[0].mean_nll == want


def test_bigram_nll_separates_shuffled_text_where_unigram_cannot(spark):
    """A word-shuffled document has the exact same unigram NLL as its
    natural original (same token multiset) but a strictly higher
    bigram NLL — the signal that justifies the transition model."""
    natural = "the quick brown fox jumps over the lazy dog and the quick brown fox runs"
    toks = natural.split()
    # deterministic derangement-ish shuffle: reverse, which breaks
    # every adjacent pair of this sentence
    shuffled = " ".join(reversed(toks))
    train_rows = [(i, natural) for i in range(10, 20)]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    scored = spark.createDataFrame(
        [(1, natural), (2, shuffled)], "doc_id long, text string"
    )
    uni = {r.doc_id: r.mean_nll for r in lm.unigram_nll_scores(scored, train=train).collect()}
    big = {r.doc_id: r.mean_nll for r in lm.bigram_nll_scores(scored, train=train).collect()}
    assert uni[1] == uni[2]  # unigram model is blind to word order
    assert big[2] > big[1]  # transition model catches it


def test_bigram_nll_drops_sub_two_token_docs(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "a b")], "doc_id long, text string"
    )
    out = lm.bigram_nll_scores(df).collect()
    assert {r.doc_id for r in out} == {3}


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


def test_pmi_collocations_hand_computed(spark):
    """Four docs: 'new york' always adjacent (a true collocation);
    'the cat' adjacent only once among many 'the'/'cat' uses."""
    df = spark.createDataFrame(
        [
            (1, "new york is big the cat sat"),
            (2, "new york has the subway the cat"),
            (3, "in new york the people the cat ran"),
            (4, "new york new york the end"),
        ],
        "doc_id long, text string",
    )
    out = {(r.w1, r.w2): (r.n_ab, r.pmi) for r in
           lm.pmi_collocations(df, min_count=2).collect()}
    assert ("new", "york") in out
    n_uni = sum(len(t.split()) for _, t in
                [(1, "new york is big the cat sat"),
                 (2, "new york has the subway the cat"),
                 (3, "in new york the people the cat ran"),
                 (4, "new york new york the end")])
    n_bi = n_uni - 4
    n_ab, pmi = out[("new", "york")]
    assert n_ab == 5
    want = round(math.log2((5 / n_bi) / ((5 / n_uni) * (5 / n_uni))), 6)
    assert pmi == want
    # every reported pair respects min_count
    assert all(n >= 2 for n, _ in out.values())


def test_pmi_collocations_null_text_ignored(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, None)], "doc_id long, text string"
    )
    out = lm.pmi_collocations(df, min_count=3).collect()
    assert {(r.w1, r.w2) for r in out} == {("a", "b")}


def test_perplexity_buckets_equal_population_and_ordering(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators import lm as lm_mod

    rows = [(i, "en" if i <= 6 else "de", t) for i, t in enumerate([
        "the quick brown fox", "the lazy dog", "the quick dog",
        "zzz qqq xxx", "the brown dog runs", "quick brown quick",
        "ein kleiner hund", "ein grosser hund", "ein hund laeuft",
    ], start=1)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = lm_mod.perplexity_buckets(df, "doc_id", "text", "lang", n_buckets=3)
    pdf = out.toPandas()
    # ntile(3) over 6 en docs -> 2 per bucket; 3 de docs -> 1 per bucket
    en = pdf[pdf.lang == "en"].groupby("bucket").size()
    de = pdf[pdf.lang == "de"].groupby("bucket").size()
    assert list(en) == [2, 2, 2] and list(de) == [1, 1, 1]
    # bucket ordering follows mean_nll within a language
    for _, g in pdf.groupby("lang"):
        g = g.sort_values(["mean_nll", "doc_id"]).reset_index(drop=True)
        assert list(g.bucket) == sorted(g.bucket)
    # the gibberish doc lands in the en tail
    assert int(pdf[pdf.doc_id == 4].bucket.iloc[0]) == 3


def test_vocab_coverage_prefix_reaches_target(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators import lm as lm_mod

    df = spark.createDataFrame(
        [(1, "a a a a b b b c c d")], "doc_id long, text string"
    )
    # mass: a=4/10, b=3/10, c=2/10, d=1/10
    out = lm_mod.vocab_coverage(df, "text", coverage=0.8).toPandas()
    assert list(out.token) == ["a", "b", "c"]          # 0.9 cum >= 0.8
    assert list(out.tok_rank) == [1, 2, 3]
    assert list(out.cum_share) == [0.4, 0.7, 0.9]
    # exactly-at-target boundary: prefix stops once coverage reached
    out2 = lm_mod.vocab_coverage(df, "text", coverage=0.7).toPandas()
    assert list(out2.token) == ["a", "b"]


def test_vocab_coverage_min_count_keeps_full_denominator(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators import lm as lm_mod

    df = spark.createDataFrame(
        [(1, "a a a a b b b c c d")], "doc_id long, text string"
    )
    out = lm_mod.vocab_coverage(df, "text", coverage=0.95, min_count=2).toPandas()
    # d (hapax) is cut from the ranked frame, but shares still divide
    # by the full 10-token mass
    assert "d" not in set(out.token)
    assert list(out.cum_share) == [0.4, 0.7, 0.9]


def test_encode_token_ids_order_vocab_and_guard(spark):
    """r8 X48: ids follow frequency rank (1 = most frequent, ties by
    token asc), OOV -> unk, sequence order preserved; unk colliding
    with the vocab range fails loudly."""
    import pytest
    from pyspark.sql import functions as F

    from data_pipeline_bigquery_to_sftp_server_spark.operators.lm import (
        encode_token_ids,
    )

    df = spark.createDataFrame(
        [
            (1, "b a b c b a"),
            (2, "a c d"),
        ],
        "doc_id long, text string",
    )
    # counts: b=3, a=3, c=2, d=1 -> vocab_size=3: a->1 (tie b/a by token), b->2, c->3; d OOV
    out = {r.doc_id: r for r in encode_token_ids(df, vocab_size=3).collect()}
    assert out[1].ids == "2,1,2,3,2,1" and out[1].n_oov == 0 and out[1].n_tokens == 6
    assert out[2].ids == "1,3,0" and out[2].n_oov == 1
    with pytest.raises(ValueError, match="collides"):
        encode_token_ids(df, vocab_size=3, unk_id=2)
