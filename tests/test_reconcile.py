"""Checksum table reconciliation — operators/reconcile.py."""

from data_pipeline_bigquery_to_sftp_server_spark.operators.reconcile import (
    reconcile_tables,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, attr string, cents long")


def test_reconcile_classifies_all_three_statuses(spark):
    a = _mk(spark, [(1, "x", 100), (2, "y", 200), (3, "z", 300)])
    b = _mk(spark, [(1, "x", 100), (2, "y", 999), (4, "new", 50)])
    out = {
        r["k"]: r["status"]
        for r in reconcile_tables(a, b, "k", ["attr", "cents"], 8).collect()
    }
    assert out == {2: "changed", 3: "missing_b", 4: "missing_a"}


def test_reconcile_identical_tables_empty(spark):
    a = _mk(spark, [(i, "x", i * 10) for i in range(50)])
    b = _mk(spark, [(i, "x", i * 10) for i in range(50)])
    assert reconcile_tables(a, b, "k", ["attr", "cents"], 8).count() == 0


def test_reconcile_bucket_is_md5_prefix_of_key(spark):
    import hashlib

    a = _mk(spark, [(13, "x", 1)])
    b = _mk(spark, [(13, "x", 2)])
    (r,) = reconcile_tables(a, b, "k", ["attr", "cents"], 8).collect()
    want = int(hashlib.md5(b"13").hexdigest()[:4], 16) % 8
    assert r["bucket"] == want and r["status"] == "changed"


def test_reconcile_string_keys(spark):
    # replica primary keys are routinely strings/UUIDs — key % n would
    # cast-error (ANSI) or silently NULL-bucket (lax); hashing must not
    a = spark.createDataFrame(
        [("u-1", 1), ("u-2", 2)], "k string, cents long"
    )
    b = spark.createDataFrame(
        [("u-1", 1), ("u-2", 99)], "k string, cents long"
    )
    out = {r["k"]: r["status"] for r in
           reconcile_tables(a, b, "k", ["cents"], 8).collect()}
    assert out == {"u-2": "changed"}


def test_reconcile_null_shift_detected(spark):
    # (NULL,'x') vs ('x',NULL) — concat_ws would SKIP the NULL and hash
    # both rows identically, hiding a real change (r10 advice); the
    # length-prefixed '#N' encoding must classify the row as changed
    av = spark.createDataFrame([(1, None, "x"), (2, "y", "y")],
                               "k long, c1 string, c2 string")
    bv = spark.createDataFrame([(1, "x", None), (2, "y", "y")],
                               "k long, c1 string, c2 string")
    out = {r["k"]: r["status"] for r in
           reconcile_tables(av, bv, "k", ["c1", "c2"], 8).collect()}
    assert out == {1: "changed"}


def test_field_encoding_injective_on_delimiters(spark):
    # values containing the old '|' delimiter must not merge fields:
    # ('a|b','c') vs ('a','b|c') are different rows
    a = spark.createDataFrame([(1, "a|b", "c")], "k long, c1 string, c2 string")
    b = spark.createDataFrame([(1, "a", "b|c")], "k long, c1 string, c2 string")
    out = {r["k"]: r["status"] for r in
           reconcile_tables(a, b, "k", ["c1", "c2"], 8).collect()}
    assert out == {1: "changed"}


def test_absorb_summary_equals_one_shot(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators.reconcile import (
        absorb_summary,
        bucket_summary,
        row_signature,
    )

    full = _mk(spark, [(i, "x", i * 3) for i in range(40)])
    part1 = full.where("k < 25")
    part2 = full.where("k >= 25")
    one_shot = bucket_summary(row_signature(full, "k", ["attr", "cents"], 8))
    streamed = absorb_summary(
        bucket_summary(row_signature(part1, "k", ["attr", "cents"], 8)),
        bucket_summary(row_signature(part2, "k", ["attr", "cents"], 8)),
    )
    rows = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert rows(streamed) == rows(one_shot)
