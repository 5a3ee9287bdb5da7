"""Text-analysis functions (X5)."""

from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.functions import text


def test_tokenize_and_counts(spark):
    df = spark.createDataFrame([("The  quick   brown fox",)], "t string")
    row = df.select(
        text.tokenize(F.col("t")).alias("toks"),
        text.token_count(F.col("t")).alias("n"),
    ).first()
    assert row.toks == ["the", "quick", "brown", "fox"]
    assert row.n == 4


def test_bpe_ish_counts_more_than_whitespace(spark):
    df = spark.createDataFrame([("don't stop, it's 2024!",)], "t string")
    row = df.select(
        text.token_count(F.col("t")).alias("ws"),
        text.bpe_ish_token_count(F.col("t")).alias("bpe"),
    ).first()
    assert row.bpe > row.ws  # punctuation & contractions split


def test_stopword_and_punct_ratios(spark):
    df = spark.createDataFrame([("the cat and the dog",), ("!!!",)], "t string")
    rows = df.select(
        text.stopword_ratio(F.col("t")).alias("sw"),
        text.punct_ratio(F.col("t")).alias("p"),
    ).collect()
    assert abs(rows[0].sw - 3 / 5) < 1e-12  # the, and, the
    assert rows[0].p == 0.0
    assert rows[1].p == 1.0


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [("the cat is on the mat",), ("el gato que los perros",), ("xyzzy plugh",)],
        "t string",
    )
    got = [r.l for r in df.select(text.lang_id(F.col("t")).alias("l")).collect()]
    assert got == ["en", "es", "und"]


def test_quality_score_bounds(spark, sf_dir):
    from data_pipeline_bigquery_to_sftp_server_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    stats = d.select(text.quality_score(F.col("text")).alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    ).first()
    assert 0.0 <= stats.lo <= stats.hi <= 1.0


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [("hello   world",), ("Hello world",), ("goodbye world",)], "t string"
    )
    fps = [r.f for r in df.select(text.fingerprint(F.col("t")).alias("f")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_repetition_ratio_flags_degenerate_docs(spark, sf_dir):
    """'spam spam spam spam' must score 1.0 (all bigrams identical);
    an all-distinct-bigram sentence scores 1/n_bigrams."""
    from data_pipeline_bigquery_to_sftp_server_spark.queries import q_repetition_scores
    import tempfile, os

    out = tempfile.mkdtemp(prefix="repdocs_")
    spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "the quick brown fox jumps")],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    rows = {r.doc_id: r for r in q_repetition_scores(spark, out).collect()}
    assert rows[1].rep_ratio == 1.0 and rows[1].n_bigrams == 3
    assert rows[2].rep_ratio == round(1 / 4, 6) and rows[2].n_bigrams == 4


def test_redact_pii_and_counts(spark):
    rows = [
        (1, "mail a.b+c@ex-ample.co.uk and 10.20.30.40 then 25-989-741-2988"),
        (2, "no pii here at all"),
        (3, "two mails x@y.io z@w.ai ip 1.2.3.4 tel 123-456-7890"),
        (4, "card 1234-5678-9012-3456 or 5234567890123456 acct DE89370400440532013000"),
        (5, "not a card 123-456 not an iban DE12short"),
        (6, "amex 378282246310005 visa13 4222222222222 id 12345678901234567890"),
        (7, "ts 1723600000123 said 1234567890123456 done"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    e, cc, ib, p, i = text.pii_counts(F.col("t"))
    out = {
        r.id: r
        for r in df.select(
            "id",
            text.redact_pii(F.col("t")).alias("r"),
            e.alias("e"),
            cc.alias("cc"),
            ib.alias("ib"),
            p.alias("p"),
            i.alias("i"),
        ).collect()
    }
    assert out[1].r == "mail <EMAIL> and <IP> then <PHONE>"
    assert (out[1].e, out[1].cc, out[1].ib, out[1].p, out[1].i) == (1, 0, 0, 1, 1)
    assert out[2].r == "no pii here at all"
    assert (out[2].e, out[2].cc, out[2].ib, out[2].p, out[2].i) == (0, 0, 0, 0, 0)
    assert out[3].r == "two mails <EMAIL> <EMAIL> ip <IP> tel <PHONE>"
    assert (out[3].e, out[3].cc, out[3].ib, out[3].p, out[3].i) == (2, 0, 0, 1, 1)
    assert out[4].r == "card <CC> or <CC> acct <IBAN>"
    assert (out[4].e, out[4].cc, out[4].ib, out[4].p, out[4].i) == (0, 2, 1, 0, 0)
    # near-misses must survive: short digit runs, short pseudo-IBANs
    assert out[5].r == "not a card 123-456 not an iban DE12short"
    assert (out[5].e, out[5].cc, out[5].ib, out[5].p, out[5].i) == (0, 0, 0, 0, 0)
    # 13-19 digit PAN range: 15-digit Amex and 13-digit legacy Visa
    # redact; a 20-digit id is NOT a card and survives
    assert out[6].r == "amex <CC> visa13 <CC> id 12345678901234567890"
    assert (out[6].e, out[6].cc, out[6].ib, out[6].p, out[6].i) == (0, 2, 0, 0, 0)
    # MII gate: 13-digit epoch-ms timestamps (leading 1) and other
    # 0/1/7-9-prefixed long numeric ids are NOT cards and survive
    assert out[7].r == "ts 1723600000123 said 1234567890123456 done"
    assert (out[7].e, out[7].cc, out[7].ib, out[7].p, out[7].i) == (0, 0, 0, 0, 0)


def test_chunk_documents_window_semantics(spark, tmp_path):
    """Pin the sliding-window rule on a hand-built doc: 85 tokens with
    size=32/stride=24 -> starts 0,24,48,72; last chunk short (13); a
    short doc -> exactly one chunk."""
    import os

    from data_pipeline_bigquery_to_sftp_server_spark.queries import (
        q_chunk_documents,
    )

    words = " ".join(f"w{i}" for i in range(85))
    df = spark.createDataFrame(
        [(1, words, "en", 10, "t"), (2, "only three tokens", "en", 10, "t")],
        "doc_id long, text string, lang string, n_chars long, source string",
    )
    path = str(tmp_path / "docs")
    df.write.parquet(os.path.join(path, "documents.parquet"))
    out = q_chunk_documents(spark, path).collect()
    d1 = sorted((r.chunk_idx, r.chunk_tokens) for r in out if r.doc_id == 1)
    assert d1 == [(0, 32), (1, 32), (2, 32), (3, 13)]
    chunks = {r.chunk_idx: r.chunk for r in out if r.doc_id == 1}
    assert chunks[0].split(" ")[0] == "w0"
    assert chunks[1].split(" ")[0] == "w24"  # 8-token overlap
    assert chunks[3] == " ".join(f"w{i}" for i in range(72, 85))
    d2 = [(r.chunk_idx, r.chunk_tokens, r.chunk) for r in out if r.doc_id == 2]
    assert d2 == [(0, 3, "only three tokens")]


def test_gopher_flags_rule_battery(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.functions.text import gopher_flags
    from pyspark.sql import functions as F

    good = "the quick brown fox jumps over the lazy dog and that have with " * 5
    short = "the and of"                                  # fails word count
    symbols = "the of and that have " + "# " * 20          # fails symbol ratio
    bullets = "\n".join(["- item the of and that have"] * 10)  # all lines bulleted
    numeric = "the of 111 222 333 444 555 666 777 888 " * 8   # fails alpha frac
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols), (4, bullets), (5, numeric)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in df.select("doc_id", gopher_flags(F.col("text")).alias("g"))
        .select("doc_id", "g.*")
        .collect()
    }
    assert out[1].keep
    assert not out[2].ok_words and not out[2].keep
    assert not out[3].ok_sym and not out[3].keep
    assert not out[4].ok_bullet and out[4].bullet_frac == 1.0
    assert not out[5].ok_alpha and not out[5].keep
    # measurements come back rounded and sane
    assert out[1].n_words == 65 and 3 <= out[1].mean_word_len <= 10
    assert out[1].stop_hits >= 2


def test_quality_ensemble_rank_normalization(spark, sf_dir):
    """r8 X49: the fused score is the mean of three rank-normalized
    signals — monotone in each signal holding the others fixed, and
    bounded in (0, 1]."""
    from data_pipeline_bigquery_to_sftp_server_spark.queries import (
        q_quality_ensemble,
    )

    rows = q_quality_ensemble(spark, sf_dir).collect()
    assert rows and all(0 < r.quality_score <= 1.0 for r in rows)
    # reconstruct the three ranks and re-derive the score for 10 docs
    n = len(rows)
    by_lm = sorted(rows, key=lambda r: (-r.mean_nll, r.doc_id))
    by_gp = sorted(rows, key=lambda r: (r.n_passed, r.doc_id))
    by_pr = sorted(rows, key=lambda r: (r.pr, r.doc_id))
    r_lm = {r.doc_id: i + 1 for i, r in enumerate(by_lm)}
    r_gp = {r.doc_id: i + 1 for i, r in enumerate(by_gp)}
    r_pr = {r.doc_id: i + 1 for i, r in enumerate(by_pr)}
    for r in rows[:10]:
        expect = round((r_lm[r.doc_id] + r_gp[r.doc_id] + r_pr[r.doc_id]) / (3.0 * n), 6)
        assert abs(r.quality_score - expect) < 1e-9
