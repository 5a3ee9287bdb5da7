"""Line-level cleaning (X36): C4 per-line rules and corpus-wide
duplicate-line removal."""

from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.operators import lines as L


def test_c4_line_filter_keeps_terminal_sentences(spark):
    df = spark.createDataFrame(
        [
            (1, "This is a proper sentence with enough words.\nshort\nAnother good long line ends here!"),
            (2, "no terminal punctuation on this line at all\nid 42"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in L.c4_line_filter(df).collect()}
    assert out[1].n_lines == 3 and out[1].n_kept == 2
    assert out[1].text.splitlines() == [
        "This is a proper sentence with enough words.",
        "Another good long line ends here!",
    ]
    # doc 2: no line survives -> dropped; doc 3: null text -> dropped
    assert set(out) == {1}


def test_c4_line_filter_without_terminal_rule(spark):
    df = spark.createDataFrame(
        [(1, "five words are right here\nfour words only here")],
        "doc_id long, text string",
    )
    out = L.c4_line_filter(df, min_words=5, require_terminal=False).collect()[0]
    assert out.n_kept == 1 and out.text == "five words are right here"


def test_corpus_line_dedup_removes_cross_doc_boilerplate(spark):
    df = spark.createDataFrame(
        [
            (1, "SHARED FOOTER\nunique one"),
            (2, "shared   footer\nunique two"),  # same after normalization
            (3, "only unique three"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in L.corpus_line_dedup(df).collect()}
    # the footer (normalized-equal across docs 1+2) is removed everywhere
    assert out[1].text == "unique one" and out[1].n_kept == 1
    assert out[2].text == "unique two" and out[2].n_kept == 1
    assert out[3].text == "only unique three" and out[3].n_lines == 1
    # order preserved when multiple lines survive
    df2 = spark.createDataFrame(
        [(1, "dup\nfirst keep\ndup\nsecond keep"), (2, "dup")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in L.corpus_line_dedup(df2).collect()}
    assert got[1].text == "first keep\nsecond keep"
    assert got[2].n_kept == 0 and got[2].text == ""


def test_dup_line_signals_fractions(spark):
    df = spark.createDataFrame(
        [
            # normalized dups: 'a b' x2 (case/space variant) + unique 'c'
            (1, "a b\nA  b\nc"),
            (2, "x\ny\nz"),          # no dups
            (3, "same\nsame\nsame"),  # all dup
            (4, None),                # dropped
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in L.dup_line_signals(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_lines == 3
    assert out[1].dup_line_frac == round(2 / 3, 6)
    # chars over normalized lines: 'a b'(3)*2 dup, total 3+3+1
    assert out[1].dup_char_frac == round(6 / 7, 6)
    assert out[2].dup_line_frac == 0.0 and out[2].dup_char_frac == 0.0
    assert out[3].dup_line_frac == 1.0 and out[3].dup_char_frac == 1.0


def test_dup_line_signals_empty_lines_no_nan(spark):
    # all-empty lines: char total is 0 -> dup_char_frac must be 0.0,
    # never NULL/NaN (the division guard)
    df = spark.createDataFrame([(1, "\n\n")], "doc_id long, text string")
    r = L.dup_line_signals(df).collect()[0]
    assert r.n_lines == 3 and r.dup_line_frac == 1.0 and r.dup_char_frac == 0.0
