"""BPE merge training (X59): Sennrich example pin + greedy-run edges.

Every training case runs through BOTH tiers: the relational oracle twin
(bpe_train) and the vocab-scale driver-side trainer (bpe_train_fast),
which must be row-identical at equal n_merges — that equality is what
certifies the fast tier, since only the relational one is
DuckDB-replayable."""

import pytest

from data_pipeline_bigquery_to_sftp_server_spark.operators.bpe import (
    bpe_train,
    bpe_train_fast,
)


def _train(spark, text, n, trainer=bpe_train):
    df = spark.createDataFrame([(1, text)], "id long, text string")
    m, s = trainer(df, n_merges=n)
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


@pytest.mark.parametrize(
    "text,n",
    [
        (" ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3), 6),
        ("aaaaa", 1),
        ("aaaa aaaa ab", 2),
        ("xy xy yz yz", 1),
        ("ab ab", 3),  # budget exceeds available merges
    ],
)
def test_fast_tier_row_identical_to_relational(spark, text, n):
    slow_m, slow_s = _train(spark, text, n)
    fast_m, fast_s = _train(spark, text, n, trainer=bpe_train_fast)
    assert fast_m == slow_m
    assert fast_s == slow_s


def test_fast_tier_pair_counts_match_relational(spark, sf_dir):
    # full contract on real data: (rank, left, right, pair_count) rows
    # AND the segmented vocabulary, identical at n_merges=6
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    slow_m, slow_s = bpe_train(d, n_merges=6)
    fast_m, fast_s = bpe_train_fast(d, n_merges=6)
    assert [tuple(r) for r in slow_m.orderBy("rank").collect()] == [
        tuple(r) for r in fast_m.orderBy("rank").collect()
    ]
    assert sorted(map(tuple, slow_s.collect())) == sorted(
        map(tuple, fast_s.collect())
    )


def test_fast_tier_reaches_real_merge_counts(spark, sf_dir):
    # the point of the tier: a merge budget the relational trainer's
    # two-jobs-per-round shape cannot reach. 512 rounds over the
    # fixture corpus; ranks must be dense from 1 and the train must
    # stop CLEANLY when the vocabulary is fully merged (the sf0.001
    # synthetic vocabulary supports 89 merges — budget exhaustion is
    # the expected production edge, not an error). Determinism pinned
    # by a second run.
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m1, _ = bpe_train_fast(d, n_merges=512)
    rows = m1.orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) > 50  # far past the relational tier's 6-round shape
    m2, _ = bpe_train_fast(d, n_merges=512)
    assert [tuple(r) for r in rows] == [
        tuple(r) for r in m2.orderBy("rank").collect()
    ]


def test_fast_tier_vocab_ceiling_raises(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError, match="max_vocab_rows"):
        bpe_train_fast(d, n_merges=2, max_vocab_rows=10)


def test_encode_fast_matches_apply_merges(spark):
    # the fast encoder's lowest-rank-present loop must equal the
    # relational rank-sequential application on seen, unseen, and
    # degenerate words
    from data_pipeline_bigquery_to_sftp_server_spark.operators.bpe import (
        apply_merges,
        encode_words_fast,
    )

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(1, text)], "id long, text string")
    merges, _ = bpe_train(df, n_merges=6)
    words = spark.createDataFrame(
        [("slowest",), ("low",), ("newest",), ("zzz",), ("wilder",)],
        "word string",
    )
    slow = {r.word: r.segmentation for r in apply_merges(words, merges, 6).collect()}
    fast = {
        r.word: r.segmentation for r in encode_words_fast(words, merges, 6).collect()
    }
    assert fast == slow


def test_encode_fast_deep_matches_training_segmentation(spark, sf_dir):
    # at a deep budget the fast encoder must reproduce the fast
    # trainer's own final segmentation of its training vocabulary —
    # the encode/train consistency contract at budgets the relational
    # twin cannot reach
    from data_pipeline_bigquery_to_sftp_server_spark.operators.bpe import (
        encode_words_fast,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges, seg = bpe_train_fast(d, n_merges=512)
    enc = {
        r.word: r.segmentation
        for r in encode_words_fast(seg.select("word"), merges, 512).collect()
    }
    trained = {r.word: r.segmentation for r in seg.collect()}
    assert enc == trained


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


def test_encode_fast_drops_null_words_like_relational(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators.bpe import (
        apply_merges,
        encode_words_fast,
    )

    df = spark.createDataFrame([(1, "ab ab")], "id long, text string")
    merges, _ = bpe_train(df, n_merges=1)
    words = spark.createDataFrame([("ab",), (None,), ("ba",)], "word string")
    slow = {r.word: r.segmentation for r in apply_merges(words, merges, 1).collect()}
    fast = {
        r.word: r.segmentation for r in encode_words_fast(words, merges, 1).collect()
    }
    assert fast == slow
    assert None not in fast
