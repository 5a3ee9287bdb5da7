"""Registry consistency: the rotation treadmill's invariants, pinned
so a future edit can't silently break the driver window, the bench
headline, or the oracle mapping."""

import bench
from data_pipeline_bigquery_to_sftp_server_spark.queries import ORACLES, QUERIES


def test_driver_window_is_fully_oracle_checked():
    window = list(QUERIES)[:50]
    assert len(window) == 50
    missing = [q for q in window if q not in ORACLES]
    assert not missing, f"slot-1..50 queries without oracles: {missing}"


def test_every_oracle_has_a_query():
    dangling = sorted(set(ORACLES) - set(QUERIES))
    assert not dangling, f"oracles without queries: {dangling}"


def test_bench_headline_names_exist_and_are_unique():
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
    unknown = sorted(set(bench.HEADLINE) - set(QUERIES))
    assert not unknown, f"bench headline names not in QUERIES: {unknown}"


def test_rows_only_queries_are_the_documented_set():
    # every rows-only query must be approximate/stateful BY CONSTRUCTION
    # (hash-seeded banding, float k-means/codebooks, HTMLParser parity,
    # deep-budget twins) — adding an oracle-expressible query without an
    # oracle should fail here, not at judging
    rows_only = sorted(set(QUERIES) - set(ORACLES))
    documented = {
        "lsh_topk",
        "ivf_topk",
        "ivf_topk_prebuilt",
        "lsh_topk_prebuilt",
        "pq_topk",
        "ivfpq_topk",
        "minhash_pairs",
        "simhash_near_pairs",
        "simhash_groups",
        "embedding_dups",
        "incremental_embedding_dups_banded",
        "hard_negatives_ann",
        "retrieval_mrr_ann",
        "cluster_documents",
        "semantic_dedup_clustered",
        "semantic_dedup_pca",
        "pca_project",
        "html_clean",
        "bpe_fast_deep",
    }
    assert set(rows_only) == documented, (
        f"rows-only drift: +{sorted(set(rows_only) - documented)} "
        f"-{sorted(documented - set(rows_only))}"
    )
