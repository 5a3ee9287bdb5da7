"""BM25 (operators/retrieval.py): scores must equal a direct python
computation of the Robertson formula on a hand-built corpus."""

import math

from data_pipeline_bigquery_to_sftp_server_spark.operators import retrieval


def test_bm25_matches_hand_computation(spark):
    corpus = {
        1: "join join filter scan",
        2: "merge filter",
        3: "scan scan scan scan scan scan",
        4: "join merge filter join",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in corpus.items()], "doc_id long, text string"
    )
    terms, k1, b = ["join", "filter"], 1.2, 0.75

    docs = {i: t.split() for i, t in corpus.items()}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    expected = {}
    for i, words in docs.items():
        score = 0.0
        for t in terms:
            tf = words.count(t)
            if tf == 0:
                continue
            dfreq = sum(1 for w in docs.values() if t in w)
            idf = math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(words) / avgdl))
        if score > 0:
            expected[i] = round(score, 6)

    got = {
        r.doc_id: r.bm25
        for r in retrieval.bm25_topk(df, terms, k=10, k1=k1, b=b).collect()
    }
    assert got == expected
    # ranking: doc 4 (two joins + filter, short) must beat doc 3 (no terms)
    assert 3 not in got


def test_bm25_rejects_empty_query(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="query_terms"):
        retrieval.bm25_topk(df, [])


def test_tfidf_pairs_rare_term_overlap_beats_common(spark):
    """Docs 1/2 share rare terms -> pair reported; docs 3/4 share only
    a token present in every doc (pruned by max_df) -> no pair."""
    df = spark.createDataFrame(
        [
            (1, "zebra quark flume common"),
            (2, "zebra quark flume common extra"),
            (3, "common alpha beta"),
            (4, "common gamma delta"),
        ],
        "doc_id long, text string",
    )
    out = {(r.id_a, r.id_b): r.cos_sim
           for r in retrieval.tfidf_doc_pairs(df, threshold=0.3).collect()}
    # shared zebra/quark/flume each df=2 -> idf=1; doc 2's 'extra'
    # df=1 -> idf=2: cos = 3 / (sqrt(3) * sqrt(3 + 4))
    assert (1, 2) in out and out[(1, 2)] == round(3 / math.sqrt(21), 6)
    assert (3, 4) not in out


def test_tfidf_pairs_identical_docs_cosine_one(spark):
    """Identical docs cosine to exactly 1.0; their shared tokens (2 of
    6 docs) survive the 50% max_df cut."""
    df = spark.createDataFrame(
        [(1, "x y z w"), (2, "x y z w"), (3, "p q r s"),
         (4, "t u v"), (5, "m n o"), (6, "g h i")],
        "doc_id long, text string",
    )
    out = retrieval.tfidf_doc_pairs(df, threshold=0.5).collect()
    assert [(r.id_a, r.id_b, r.cos_sim) for r in out] == [(1, 2, 1.0)]
