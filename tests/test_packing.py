"""Sequence packing (operators/packing.py): FFD bin assignment must be
a partition of the input, respect the budget, isolate oversized docs,
be deterministic, and meet the FFD fill bound."""

from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.catalog import load_table
from data_pipeline_bigquery_to_sftp_server_spark.functions import text
from data_pipeline_bigquery_to_sftp_server_spark.operators import packing

BUDGET = 128


def _docs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", text.bpe_ish_token_count(F.col("text")).alias("n_tokens")
    )


def test_pack_is_partition_and_respects_budget(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    n_docs = docs.count()
    assign = packing.pack_sequences(docs, budget=BUDGET, num_groups=4)
    rows = assign.collect()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs  # each doc exactly once
    fills: dict[int, int] = {}
    members: dict[int, list] = {}
    for r in rows:
        fills[r.bin_id] = fills.get(r.bin_id, 0) + r.n_tokens
        members.setdefault(r.bin_id, []).append(r)
    for bin_id, fill in fills.items():
        over = [r for r in members[bin_id] if r.oversize]
        if over:
            # oversized docs sit alone in a dedicated bin
            assert len(members[bin_id]) == 1
            assert over[0].n_tokens > BUDGET
        else:
            assert fill <= BUDGET, (bin_id, fill)


def test_pack_ffd_fill_bound(spark, sf_dir):
    """FFD can open at most one bin per group that is <= half full (any
    two half-empty bins would have been merged by first-fit), so the
    bin count is bounded by total/(budget/2) + groups + oversize."""
    docs = _docs(spark, sf_dir)
    num_groups = 4
    assign = packing.pack_sequences(docs, budget=BUDGET, num_groups=num_groups)
    summary = packing.packing_summary(assign).collect()
    regular = [r for r in summary if not r.oversize]
    n_oversize = len(summary) - len(regular)
    total = sum(r.fill for r in regular)
    assert len(regular) <= total / (BUDGET / 2) + num_groups


def test_pack_deterministic_and_partitioning_invariant(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = sorted(map(tuple, packing.pack_sequences(docs, budget=BUDGET).collect()))
    b = sorted(
        map(
            tuple,
            packing.pack_sequences(docs.repartition(7), budget=BUDGET).collect(),
        )
    )
    assert a == b


def test_pack_rejects_bad_budget(spark):
    import pytest

    df = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="budget"):
        packing.pack_sequences(df, budget=0)


def test_pack_string_ids(spark):
    """The id column's type is derived from the input schema — string
    doc ids (common in real corpora) must pass through unchanged."""
    rows = [(f"doc-{i}", 10 + i) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id string, n_tokens long")
    out = packing.pack_sequences(df, budget=64, num_groups=2).collect()
    assert len(out) == 20
    assert {r.doc_id for r in out} == {f"doc-{i}" for i in range(20)}
    assert all(isinstance(r.doc_id, str) for r in out)


def test_pack_zero_token_doc_avoids_oversize_bins(spark):
    """A zero-token doc must not slip into an oversized doc's dedicated
    (exactly-full) bin: every oversize bin still holds exactly one doc."""
    rows = [(1, 999), (2, 0), (3, 0), (4, 5)]  # budget 10: doc 1 oversize
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = packing.pack_sequences(df, budget=10, num_groups=1).collect()
    by_bin: dict[int, list] = {}
    for r in out:
        by_bin.setdefault(r.bin_id, []).append(r)
    for members in by_bin.values():
        if any(m.oversize for m in members):
            assert len(members) == 1
    assert len(out) == 4 and len({r.doc_id for r in out}) == 4


def test_assemble_bins_reconstructs_every_doc_once(spark, sf_dir):
    """Every document's text appears in exactly one packed sequence,
    and per-bin stats agree with packing_summary."""
    docs = _docs(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    assign = packing.pack_sequences(docs, budget=BUDGET, num_groups=4)
    bins = packing.assemble_bins(assign, d).collect()
    summary = {r.bin_id: (r.n_docs, r.fill) for r in packing.packing_summary(assign).collect()}
    texts = {r.doc_id: r.text for r in d.collect()}
    seen = 0
    for r in bins:
        assert summary[r.bin_id] == (r.n_docs, r.fill)
        parts = r.sequence.split("\n\n")
        seen += len(parts)
    # documents contain no double-newlines at test scale, so the split
    # count equals the member count
    assert seen == len(texts)
    assert not any("\n\n" in t for t in texts.values())


def test_pack_portable_grouping_matches_python_ffd(spark):
    """With the engine-portable md5 group_expr (the configuration the
    recursive-CTE oracle replays), the full assignment — groups, bin
    ids, oversize flags — must equal a direct Python FFD simulation,
    including oversize and zero-token docs."""
    import hashlib

    from pyspark.sql import functions as F

    from data_pipeline_bigquery_to_sftp_server_spark.queries import (
        _portable_pack_group,
    )

    budget, groups = 100, 4
    rows = [(i, [5, 40, 40, 30, 0, 250, 100, 60, 7, 93][i % 10] + i % 3) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r.doc_id: (r.bin_id, r.oversize)
        for r in packing.pack_sequences(
            df,
            budget=budget,
            num_groups=groups,
            group_expr=_portable_pack_group("doc_id", groups),
        ).collect()
    }

    def grp(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % groups

    per_group = {}
    for doc_id, t in rows:
        per_group.setdefault(grp(doc_id), []).append((doc_id, t))
    want = {}
    for g, docs in per_group.items():
        docs.sort(key=lambda x: (-x[1], x[0]))
        remaining = []
        for doc_id, t in docs:
            if t > budget:
                remaining.append(0)
                want[doc_id] = ((g << 32) | (len(remaining) - 1), True)
                continue
            for j, cap in enumerate(remaining):
                if cap >= t and cap > 0:
                    remaining[j] = cap - t
                    want[doc_id] = ((g << 32) | j, False)
                    break
            else:
                remaining.append(budget - t)
                want[doc_id] = ((g << 32) | (len(remaining) - 1), False)
    assert got == want
    assert any(o for _, o in want.values())  # oversize branch exercised
