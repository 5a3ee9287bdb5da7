"""DSIR-style importance resampling (X27): weight direction,
deterministic Gumbel top-k selection, salt independence."""

from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.operators import dsir


def _corpus(spark):
    # target domain speaks "alpha beta gamma"; off-domain speaks
    # "zeta eta theta"; mixed docs sit in between
    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma alpha beta") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha"),
            (2, "alpha beta zeta eta"),
            (3, "zeta eta theta zeta"),
            (4, "theta zeta eta theta"),
            (5, "gamma alpha beta gamma"),
        ],
        "doc_id long, text string",
    )
    return raw, target


def test_weights_rank_on_domain_docs_higher(spark):
    raw, target = _corpus(spark)
    w = {
        r.doc_id: r.log_w
        for r in dsir.importance_weights(raw, target).collect()
    }
    # pure target-vocabulary docs beat mixed docs beat off-domain docs
    assert w[1] > w[2] > w[3]
    assert w[5] > w[2]
    assert w[3] < 0 and w[1] > 0


def test_resample_is_deterministic_topk(spark):
    raw, target = _corpus(spark)
    a = dsir.importance_resample(raw, target, k=3, salt="s1").collect()
    b = dsir.importance_resample(raw, target, k=3, salt="s1").collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    assert [r.rank for r in a] == [1, 2, 3]
    assert len(a) == 3
    # keys strictly ordered with the rank
    keys = [r.sel_key for r in a]
    assert keys == sorted(keys, reverse=True)


def test_salt_rotates_the_draw_but_not_the_weights(spark):
    raw, target = _corpus(spark)
    a = dsir.importance_resample(raw, target, k=5, salt="s1").collect()
    b = dsir.importance_resample(raw, target, k=5, salt="s2").collect()
    # same weights either way (weights are salt-free) ...
    assert {r.doc_id: r.log_w for r in a} == {r.doc_id: r.log_w for r in b}
    # ... different Gumbel keys (independent draw)
    assert {r.doc_id: r.sel_key for r in a} != {r.doc_id: r.sel_key for r in b}


def test_null_text_docs_are_not_selected(spark):
    raw, target = _corpus(spark)
    raw = raw.unionByName(
        spark.createDataFrame([(99, None)], "doc_id long, text string")
    )
    got = dsir.importance_resample(raw, target, k=10, salt="s1").collect()
    assert 99 not in {r.doc_id for r in got}
    assert len(got) == 5  # only token-bearing docs compete
