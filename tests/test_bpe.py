"""BPE merge training (X59): Sennrich example pin + greedy-run edges."""

from data_pipeline_bigquery_to_sftp_server_spark.operators.bpe import bpe_train


def _train(spark, text, n):
    df = spark.createDataFrame([(1, text)], "id long, text string")
    m, s = bpe_train(df, n_merges=n)
    merges = [(r.left, r.right) for r in m.orderBy("rank").collect()]
    seg = {r.word: r.segmentation for r in s.collect()}
    return merges, seg


def test_bpe_sennrich_example(spark):
    # the canonical corpus from Sennrich et al. 2016 (counts 5/2/6/3)
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    merges, seg = _train(spark, text, 6)
    assert merges == [
        ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("e", "w"), ("ew", "est"),
    ]
    assert seg["low"] == "low"
    assert seg["lower"] == "low e r"
    assert seg["newest"] == "n ewest"
    assert seg["widest"] == "w i d est"


def test_bpe_equal_pair_greedy_run_parity(spark):
    # 'aaaaa': the (a,a) candidates at pos 0..3 form one run; greedy
    # left-to-right merges positions 0 and 2 -> 'aa aa a'
    merges, seg = _train(spark, "aaaaa", 1)
    assert merges == [("a", "a")]
    assert seg["aaaaa"] == "aa aa a"


def test_bpe_merged_symbol_can_merge_again(spark):
    # round 2 must treat round 1's 'aa' as one symbol: 'aaaa' -> 'aaaa'
    merges, seg = _train(spark, "aaaa aaaa ab", 2)
    assert merges[0] == ("a", "a")
    assert merges[1] == ("aa", "aa")
    assert seg["aaaa"] == "aaaa"


def test_bpe_tie_breaks_on_symbol_order(spark):
    # 'xy' and 'yz' pairs both appear twice -> tie broken (l, r) asc
    merges, _ = _train(spark, "xy xy yz yz", 1)
    assert merges == [("x", "y")]


def test_bpe_exhausted_pairs_is_noop_not_wipe(spark):
    # corpus fully merged before the budget runs out: the empty argmax
    # round must be a no-op (r9 review: a crossJoin against the empty
    # top frame silently wiped the symbol table)
    merges, seg = _train(spark, "ab ab", 3)
    assert merges == [("a", "b")]
    assert seg == {"ab": "ab"}


def test_apply_merges_matches_training_segmentation(spark):
    # inference on the TRAINING vocabulary must reproduce the trained
    # segmentations exactly (same merges, same greedy application)
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(1, text)], "id long, text string")
    merges, seg = bpe_train(df, n_merges=6)
    from data_pipeline_bigquery_to_sftp_server_spark.operators.bpe import (
        apply_merges,
    )

    words = seg.select("word")
    applied = {
        r.word: r.segmentation
        for r in apply_merges(words, merges, n_merges=6).collect()
    }
    trained = {r.word: r.segmentation for r in seg.collect()}
    assert applied == trained
    # and an UNSEEN word segments under the learned merges: 'slower'
    # contains the trained 'lo'+'w' -> 'low' merges
    new = spark.createDataFrame([("slowest",)], "word string")
    out = apply_merges(new, merges, n_merges=6).collect()[0]
    assert out.segmentation == "s low est"
