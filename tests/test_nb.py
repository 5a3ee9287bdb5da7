"""Relational Naive Bayes classifier (operators/nb.py): exact
small-case math, held-out separation on class-conditional vocab,
unseen-token backoff, and deterministic tie-breaking."""

import math

from data_pipeline_bigquery_to_sftp_server_spark.operators import nb


def test_nb_exact_small_case(spark):
    # train: class x = "a a b" (1 doc), class y = "b b" (1 doc)
    # counts: x: a=2,b=1 tot=3 | y: b=2 tot=2; V=2; priors 0.5/0.5
    train = spark.createDataFrame(
        [(10, "a a b", "x"), (11, "b b", "y")],
        "doc_id long, text string, lang string",
    )
    scored = spark.createDataFrame(
        [(1, "a b")], "doc_id long, text string"
    )
    out = nb.naive_bayes_scores(scored, train=train).collect()
    p_a_x, p_b_x = (2 + 1) / (3 + 2), (1 + 1) / (3 + 2)
    p_a_y, p_b_y = (0 + 1) / (2 + 2), (2 + 1) / (2 + 2)
    s_x = round((math.log2(0.5) + math.log2(p_a_x) + math.log2(p_b_x)) / 2, 6)
    s_y = round((math.log2(0.5) + math.log2(p_a_y) + math.log2(p_b_y)) / 2, 6)
    assert len(out) == 1
    want = ("x", s_x) if s_x >= s_y else ("y", s_y)
    assert (out[0].predicted, out[0].best_score) == want


def test_nb_separates_class_conditional_vocab(spark):
    """Docs drawn from disjoint class vocabularies must classify
    perfectly on a held-out split, self-train or foreign."""
    rows = []
    for i in range(40):
        rows.append((i * 2, "spark scala jvm shuffle executor " * 3, "tech"))
        rows.append((i * 2 + 1, "sonnet stanza rhyme meter verse " * 3, "poetry"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    train = df.where("doc_id < 60")
    held = df.where("doc_id >= 60")
    out = nb.naive_bayes_scores(held, train=train).collect()
    truth = {r[0]: r[2] for r in rows}
    assert len(out) == 20
    assert all(r.predicted == truth[r.doc_id] for r in out)


def test_nb_unseen_tokens_back_off_not_crash(spark):
    train = spark.createDataFrame(
        [(10, "alpha alpha", "x"), (11, "beta beta", "y")],
        "doc_id long, text string, lang string",
    )
    scored = spark.createDataFrame(
        [(1, "zzz qqq alpha")], "doc_id long, text string"
    )
    out = nb.naive_bayes_scores(scored, train=train).collect()
    # the one seen token decides the class; unseen tokens contribute
    # the same smoothed mass to both classes (equal totals here)
    assert out[0].predicted == "x"


def test_nb_tie_breaks_on_class_name(spark):
    """Symmetric classes + a doc equidistant from both -> identical
    rounded scores -> the lexicographically smaller class wins."""
    train = spark.createDataFrame(
        [(10, "aa bb", "c1"), (11, "cc dd", "c2")],
        "doc_id long, text string, lang string",
    )
    scored = spark.createDataFrame(
        [(1, "aa cc")], "doc_id long, text string"
    )
    out = nb.naive_bayes_scores(scored, train=train).collect()
    assert out[0].predicted == "c1"


def test_nb_closure_deployment_equals_batch(spark, sf_dir):
    """classify_stateless with a collected model must reproduce the
    relational naive_bayes_scores output exactly (same rounding, same
    tie-breaks), and its plan must be a pure map (no Exchange) — the
    property that lets it deploy to a stream."""
    from pyspark.sql import functions as F

    from data_pipeline_bigquery_to_sftp_server_spark.catalog import load_table
    from data_pipeline_bigquery_to_sftp_server_spark.plans import explain

    d = load_table(spark, sf_dir, "documents")
    train = d.where(F.col("doc_id") % 5 != 0)
    scored = d.where(F.col("doc_id") % 5 == 0)
    batch = sorted(
        map(tuple, nb.naive_bayes_scores(scored, train=train).collect())
    )
    model = nb.collect_nb_model(train)
    closure_df = nb.classify_stateless(scored, model)
    assert sorted(map(tuple, closure_df.collect())) == batch
    assert "Exchange" not in explain.formatted_plan(closure_df)


def test_nb_classify_stateless_null_text_dropped_not_crashed(spark):
    """A NULL-text record must not kill the (streaming-deployable)
    stateless scorer: it is dropped, matching the batch twin where
    explode of the NULL token array emits no rows (ADVICE r6)."""
    train = spark.createDataFrame(
        [(10, "alpha alpha", "x"), (11, "beta beta", "y")],
        "doc_id long, text string, lang string",
    )
    scored = spark.createDataFrame(
        [(1, "alpha beta"), (2, None), (3, "beta")],
        "doc_id long, text string",
    )
    model = nb.collect_nb_model(train)
    out = {r.doc_id: r for r in nb.classify_stateless(scored, model).collect()}
    assert set(out) == {1, 3}
    batch = {
        r.doc_id: r
        for r in nb.naive_bayes_scores(scored, train=train).collect()
    }
    assert set(batch) == {1, 3}
    assert all(
        (out[i].predicted, out[i].best_score)
        == (batch[i].predicted, batch[i].best_score)
        for i in (1, 3)
    )


def test_nb_all_unseen_doc_scores_backoff_only(spark):
    """A doc whose EVERY token is unseen exercises the empty-sums
    path: score = (log2 prior + n * backoff[c]) / n for each class."""
    import math

    train = spark.createDataFrame(
        [(10, "alpha alpha", "x"), (11, "beta", "y")],
        "doc_id long, text string, lang string",
    )
    scored = spark.createDataFrame([(1, "zzz qqq")], "doc_id long, text string")
    out = nb.naive_bayes_scores(scored, train=train).collect()[0]
    # counts: x: alpha=2 (tot 2), y: beta=1 (tot 1); vocab=2; priors 1/2 each
    sx = (math.log2(0.5) + 2 * math.log2(1.0 / (2 + 2))) / 2
    sy = (math.log2(0.5) + 2 * math.log2(1.0 / (1 + 2))) / 2
    assert out.predicted == ("x" if round(sx, 6) > round(sy, 6) else "y")
    assert out.best_score == round(max(sx, sy), 6)
