"""Write-time CHECK constraints (operators/constraints.py): the gate
the reference pipeline never had — its MERGE absorbs any malformed row
(main.py:349-358). Error mode fails the commit BEFORE any write;
quarantine mode routes violating rows to the per-version quarantine
ledger; NULL passes (SQL-standard CHECK); every versioned committer
enforces the gate."""

from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.operators import (
    constraints as C,
    merge,
)


def _table(spark, tmp_path, name="t"):
    path = str(tmp_path / name)
    merge.versioned_layout_write(
        spark.range(50).selectExpr("id AS k", "CAST(id AS LONG) AS v"),
        "k", path, 4,
    )
    return path


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, v long")


def test_set_get_and_clear_constraints(spark, tmp_path):
    path = _table(spark, tmp_path)
    assert C.get_constraints(spark, path) == {}
    C.set_constraints(spark, path, {"v_pos": "v >= 0"})
    assert C.get_constraints(spark, path) == {"v_pos": "v >= 0"}
    C.set_constraints(spark, path, {})
    assert C.get_constraints(spark, path) == {}


def test_error_mode_fails_before_any_write(spark, tmp_path):
    """A violating batch raises with per-constraint counts and leaves
    the version list untouched — the gate sits before the intent
    marker, so the loser contaminates nothing."""
    path = _table(spark, tmp_path)
    C.set_constraints(spark, path, {"v_pos": "v >= 0", "k_small": "k < 1000"})
    before = merge._list_versions(spark, f"{path}/_manifest")
    try:
        merge.upsert_versioned(
            spark, path, _batch(spark, [(1, -5), (2, -6), (2000, 1)]), "k"
        )
        raise AssertionError("expected ConstraintViolation")
    except C.ConstraintViolation as e:
        assert e.counts == {"v_pos": 2, "k_small": 1}
    assert merge._list_versions(spark, f"{path}/_manifest") == before


def test_all_versioned_committers_enforce(spark, tmp_path):
    """COW upsert, MOR upsert, and the multi-arm MERGE all refuse a
    violating write; the arms gate sees the rows the arms PRODUCE, so
    an update arm violates even when only its column subset is bad."""
    path = _table(spark, tmp_path)
    C.set_constraints(spark, path, {"v_pos": "v >= 0"})
    bad = _batch(spark, [(1, -1)])
    for op in (merge.upsert_versioned, merge.upsert_versioned_dv):
        try:
            op(spark, path, bad, "k")
            raise AssertionError("expected ConstraintViolation")
        except C.ConstraintViolation:
            pass
    try:
        merge.merge_arms_versioned_dv(
            spark, path, bad, "k", matched=[(None, "update", ["v"])]
        )
        raise AssertionError("expected ConstraintViolation")
    except C.ConstraintViolation:
        pass
    # a DELETE arm writes nothing: the same bad staging values commit
    out = merge.merge_arms_versioned_dv(
        spark, path, bad, "k", matched=[(None, "delete")]
    )
    assert out.n_deleted == 1


def test_null_passes_sql_standard_check(spark, tmp_path):
    """UNKNOWN (NULL) satisfies CHECK, exactly as in Delta: rejecting
    NULL requires saying so (IS NOT NULL) in the expression."""
    path = _table(spark, tmp_path)
    C.set_constraints(spark, path, {"v_pos": "v >= 0"})
    merge.upsert_versioned(spark, path, _batch(spark, [(1, None)]), "k")
    C.set_constraints(
        spark, path, {"v_req": "v IS NOT NULL AND v >= 0"}
    )
    try:
        merge.upsert_versioned(spark, path, _batch(spark, [(2, None)]), "k")
        raise AssertionError("expected ConstraintViolation")
    except C.ConstraintViolation as e:
        assert e.counts == {"v_req": 1}


def test_quarantine_mode_splits_and_ledgers(spark, tmp_path):
    """Quarantine commits the clean remainder, parks violators (with
    their violation name) under the commit's own version, and the
    classification is deterministic first-match in sorted-name order."""
    path = _table(spark, tmp_path)
    C.set_constraints(
        spark, path, {"a_v_pos": "v >= 0", "b_k_small": "k < 1000"}
    )
    out = C.upsert_versioned_checked(
        spark, path,
        _batch(spark, [(1, 10), (2, -2), (3000, -3), (4, 40)]),
        "k", mode="quarantine",
    )
    assert out.n_quarantined == 2
    q = {r.k: r._violation for r in C.read_quarantine(
        spark, path, out.version
    ).collect()}
    # k=3000 violates BOTH; first match in sorted-name order is a_v_pos
    assert q == {2: "a_v_pos", 3000: "a_v_pos"}
    live = {r.k: r.v for r in merge.read_version(spark, path).collect()}
    assert live[1] == 10 and live[4] == 40
    assert 2 not in live or live[2] != -2
    assert 3000 not in live


def test_quarantine_all_bad_is_noop_commit(spark, tmp_path):
    """A batch stripped to nothing still commits (a zero-data no-op
    version) so the quarantine ledger has a version to hang off."""
    path = _table(spark, tmp_path)
    C.set_constraints(spark, path, {"v_pos": "v >= 0"})
    before = {r.k: r.v for r in merge.read_version(spark, path).collect()}
    out = C.upsert_versioned_checked(
        spark, path, _batch(spark, [(7, -7), (8, -8)]), "k",
        mode="quarantine",
    )
    assert out.n_quarantined == 2
    assert {
        r.k: r.v for r in merge.read_version(spark, path).collect()
    } == before
    assert C.read_quarantine(spark, path, out.version).count() == 2


def test_unconstrained_commit_pays_nothing_and_passes(spark, tmp_path):
    path = _table(spark, tmp_path)
    out = C.upsert_versioned_checked(
        spark, path, _batch(spark, [(1, -1)]), "k", mode="quarantine"
    )
    assert out.n_quarantined == 0
    assert {
        r.v for r in merge.read_version(spark, path).where("k = 1").collect()
    } == {-1}


def test_constraint_on_missing_column_fails_loudly(spark, tmp_path):
    """Schema enforcement: a batch omitting a constrained column is an
    analysis error, never a silently skipped check."""
    path = _table(spark, tmp_path)
    C.set_constraints(spark, path, {"w_pos": "w >= 0"})
    try:
        merge.upsert_versioned(
            spark, path, _batch(spark, [(1, 1)]), "k"
        )
        raise AssertionError("expected analysis error")
    except C.ConstraintViolation:
        raise AssertionError("must not classify, must fail analysis")
    except Exception:
        pass


def test_quarantine_mor_tier_prices_like_dv_upsert(spark, tmp_path):
    """tier='mor' routes the clean remainder through the merge-on-read
    committer: pre-existing generation directories are untouched (no
    copy-on-write rewrite) while the quarantine ledger and live
    contents match the cow tier's semantics."""
    import os

    path = _table(spark, tmp_path)
    C.set_constraints(spark, path, {"v_pos": "v >= 0"})

    def data_tree():
        out = set()
        for b in os.listdir(f"{path}/data"):
            if b.startswith("_kr="):
                for g in os.listdir(f"{path}/data/{b}"):
                    out.add((b, g))
        return out

    before = data_tree()
    out = C.upsert_versioned_checked(
        spark, path, _batch(spark, [(1, 11), (2, -2), (60, 66)]), "k",
        mode="quarantine", tier="mor",
    )
    assert out.n_quarantined == 1
    after = data_tree()
    assert before <= after  # nothing rewritten, only fresh gen added
    assert all(g == f"_gen={out.version}" for (b, g) in after - before)
    live = {r.k: r.v for r in merge.read_version(spark, path).collect()}
    assert live[1] == 11 and live[60] == 66 and live[2] == 2  # old kept
    q = C.read_quarantine(spark, path, out.version)
    assert [(r.k, r._violation) for r in q.collect()] == [(2, "v_pos")]
    assert merge.commit_operations(spark, path)[out.version] == "MERGE"


def test_clone_carries_constraints(spark, tmp_path):
    """A shallow clone of a constrained table is constrained (Delta
    clones table metadata): the same violating batch the source
    refuses, the clone refuses too."""
    src = _table(spark, tmp_path, "csrc")
    C.set_constraints(spark, src, {"v_pos": "v >= 0"})
    dst = str(tmp_path / "cdst")
    merge.clone_table(spark, src, dst)
    assert C.get_constraints(spark, dst) == {"v_pos": "v >= 0"}
    try:
        merge.upsert_versioned(spark, dst, _batch(spark, [(1, -1)]), "k")
        raise AssertionError("expected ConstraintViolation")
    except C.ConstraintViolation:
        pass
    # constraints diverge independently after the fork
    C.set_constraints(spark, dst, {})
    merge.upsert_versioned(spark, dst, _batch(spark, [(1, -1)]), "k")
    try:
        merge.upsert_versioned(spark, src, _batch(spark, [(1, -1)]), "k")
        raise AssertionError("source must still be constrained")
    except C.ConstraintViolation:
        pass


def test_vacuum_reclaims_expired_quarantine(spark, tmp_path):
    """An expired version's quarantine ledger is vacuumed with it —
    screened CDC tables must not leak bad-row files forever."""
    import os

    path = _table(spark, tmp_path, "vq")
    C.set_constraints(spark, path, {"v_pos": "v >= 0"})
    out = C.upsert_versioned_checked(
        spark, path, _batch(spark, [(1, 1), (2, -2)]), "k",
        mode="quarantine",
    )
    qdir = f"{path}/_quarantine/v={out.version}"
    assert os.path.isdir(qdir)
    merge.upsert_versioned(spark, path, _batch(spark, [(3, 3)]), "k")
    merge.upsert_versioned(spark, path, _batch(spark, [(4, 4)]), "k")
    merge.vacuum_versions(spark, path, keep_last=1)
    assert not os.path.exists(qdir)


def test_quarantine_staged_before_commit_and_heals(spark, tmp_path):
    """The quarantine ledger's rows hit disk BEFORE the commit (r14):
    a crash between the commit and a post-commit ledger write can no
    longer lose them — the staged writer-scoped directory survives,
    and finalize_staged_quarantine promotes it to the commit's ledger
    slot idempotently (the retry-heal path)."""
    import os

    path = _table(spark, tmp_path, "qs")
    C.set_constraints(spark, path, {"v_pos": "v >= 0"})
    # normal path: staged dir is gone, ledger is in place
    out = C.upsert_versioned_checked(
        spark, path, _batch(spark, [(1, 1), (2, -2)]), "k",
        mode="quarantine", writer="W1",
    )
    assert os.path.isdir(f"{path}/_quarantine/v={out.version}")
    assert not os.path.exists(f"{path}/_quarantine/_staged-W1")
    # crash simulation: a staged dir exists (written pre-commit) but
    # the rename never ran — the retry heals it into the version slot
    staged = f"{path}/_quarantine/_staged-W2"
    _batch(spark, [(9, -9)]).withColumn(
        "_violation", F.lit("v_pos")
    ).coalesce(1).write.parquet(staged)
    v_target = out.version + 1
    assert C.finalize_staged_quarantine(spark, path, "W2", v_target)
    assert not os.path.exists(staged)
    got = C.read_quarantine(spark, path, v_target)
    assert [(r.k, r._violation) for r in got.collect()] == [(9, "v_pos")]
    # idempotent re-heal: staged gone + ledger present -> True, no-op
    assert C.finalize_staged_quarantine(spark, path, "W2", v_target)
    # both present (rename raced a duplicate stage): ledger wins,
    # stale staging dir is dropped
    _batch(spark, [(8, -8)]).withColumn(
        "_violation", F.lit("v_pos")
    ).coalesce(1).write.parquet(staged)
    assert C.finalize_staged_quarantine(spark, path, "W2", v_target)
    assert not os.path.exists(staged)
    assert [(r.k, r._violation) for r in C.read_quarantine(
        spark, path, v_target
    ).collect()] == [(9, "v_pos")]


def test_quarantine_failed_commit_drops_staging(spark, tmp_path):
    """When the commit itself fails (here: a concurrent writer holds
    the version's intent marker), the pre-commit staging directory is
    cleaned up — no commit, no audit gap, no orphan."""
    import os

    path = _table(spark, tmp_path, "qf")
    C.set_constraints(spark, path, {"v_pos": "v >= 0"})
    v = merge._list_versions(spark, f"{path}/_manifest")[-1]
    merge._begin_commit(spark, path, v + 1, "OTHER")  # rival in flight
    try:
        C.upsert_versioned_checked(
            spark, path, _batch(spark, [(1, 1), (2, -2)]), "k",
            mode="quarantine", writer="LOSER",
        )
        raise AssertionError("expected ConcurrentWriteError")
    except merge.ConcurrentWriteError:
        pass
    assert not os.path.exists(f"{path}/_quarantine/_staged-LOSER")


def test_vacuum_reclaims_aged_orphan_staging(spark, tmp_path):
    """An orphaned quarantine STAGING dir (hard-crashed writer) is
    reclaimed by an age-retention vacuum once it predates the horizon;
    fresh staging dirs survive (a crashed-after-commit retry may still
    heal them into their version slot), and keep_last-only vacuums
    never touch them."""
    import os

    path = _table(spark, tmp_path, "vos")
    staged = f"{path}/_quarantine/_staged-DEAD"
    _batch(spark, [(9, -9)]).withColumn(
        "_violation", F.lit("v_pos")
    ).coalesce(1).write.parquet(staged)
    merge.upsert_versioned(spark, path, _batch(spark, [(1, 1)]), "k")
    # keep_last-only vacuum: staging dirs are not its to judge
    merge.vacuum_versions(spark, path, keep_last=1)
    assert os.path.isdir(staged)
    # age vacuum with a wide horizon: still inside the heal window
    merge.vacuum_versions(spark, path, keep_last=1, retention_ms=3_600_000)
    assert os.path.isdir(staged)
    # age the dir past the horizon: reclaimed (and previewed first)
    os.utime(staged, (1, 1))
    planned = merge.vacuum_versions(
        spark, path, keep_last=1, retention_ms=60_000, dry_run=True
    )
    assert any("_staged-DEAD" in p for p in planned)
    assert os.path.isdir(staged)
    gone = merge.vacuum_versions(
        spark, path, keep_last=1, retention_ms=60_000
    )
    assert any("_staged-DEAD" in p for p in gone)
    assert not os.path.exists(staged)
