"""Benchmark harness: runs the headline query suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "suite_seconds", "value": N, "unit": "sec",
     "queries": {"pricing_summary": sec, ...}, "sf": 0.1}

Each query is materialized with the noop sink (full execution, no
driver-side collect overhead). One warmup run of the flagship query
absorbs JVM/codegen startup so per-query numbers reflect steady state.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_bigquery_to_sftp_server_spark.queries import (
    QUERIES,
    _events_stream_src,
    clear_ann_index_cache,
    clear_bpe_cache,
    clear_pair_cache,
    clear_pq_index_cache,
    clear_stream_src_cache,
    shared_ann_index,
    shared_bpe_train,
    shared_jaccard_pairs,
    shared_pq_index,
)
from data_pipeline_bigquery_to_sftp_server_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "star_join",
    "top_customers",
    "window_rank",
    "merge_upsert",
    "dedup_exact",
    "jaccard_pairs",
    "minhash_pairs",
    "cosine_topk",
    "token_topk",
    "text_stats",
    "sessionize",
    "hourly_rollup",
    "json_extract",
    "cosine_topk_np",
    "asof_join",
    "range_join",
    "window_suite",
    "percentiles",
    "shipping_priority",
    "ivf_topk",
    "media_features",
    "exists_subquery",
    "promo_share",
    "salted_join",
    "big_orders",
    "disjunctive_rev",
    "order_priority_check",
    "volume_shipping",
    "market_share",
    "customer_distribution",
    "top_supplier",
    "returned_items",
    "variant_extract",
    "hash_split",
    "quota_sample",
    "repetition_scores",
    "dedup_clusters",
    "curation_pipeline",
    "sync_pipeline",
    "streaming_tumbling",
    "decontaminate",
    "pii_redaction",
    "pack_sequences",
    "heavy_hitters",
    "bm25_topk",
    "chunk_documents",
    "media_frames",
    "media_resize",
    "streaming_pii",
    "assemble_bins",
    "dup_ngram_spans",
    "remove_dup_spans",
    "incremental_dedup",
    "incremental_embedding_dups",
    "semantic_dedup",
    "mixture_sample",
    "mixture_upsample",
    "lm_scores",
    "lm_scores_bigram",
    "nb_classify",
    "streaming_decontam",
    "streaming_classify",
    "recipe_pipeline",
    "embedding_dups_exact",
    "embedding_dups",
    "lsh_topk",
    "stateful_dedup",
    "pmi_collocations",
    "tfidf_pairs",
    "streaming_incremental_dedup",
    "importance_resample",
    "ccnet_buckets",
    "vocab_coverage",
    "temperature_sample",
    "gopher_rules",
    "cluster_documents",
    "semantic_dedup_clustered",
    "shuffle_shards",
    "selection_pipeline",
    "c4_line_filter",
    "line_dedup",
    "snapshot_diff",
    "scd2_apply",
    "pagerank",
    "bloom_screen",
    "hard_negatives",
    "corpus_report",
    "streaming_quality_gate",
    "ingest_pipeline",
    "retrieval_mrr",
    "hard_negatives_ann",
    "retrieval_mrr_ann",
    "streaming_scd2",
    "priority_dedup",
    "contrastive_triplets",
    "curriculum_shards",
    "winnow_fingerprints",
    "winnow_pairs",
    "encode_token_ids",
    "quality_ensemble",
    "session_sequences",
    "dup_line_signals",
    "iqr_outliers",
    "funnel_conversion",
    "embedding_covariance",
    "pca_project",
    "bpe_merges",
    "bpe_segment",
    "semantic_dedup_pca",
    "streaming_iqr_gate",
    "bpe_encode",
    "cohort_retention",
    "incremental_covariance",
    "kmv_distinct",
    "pivot_report",
    "asof_forward",
    "bpe_encode_new",
    "streaming_kmv",
    "window_dist",
    "bpe_fast_merges",
    "bpe_fast_deep",
    "streaming_covariance",
    "ivf_topk_prebuilt",
    "lsh_topk_prebuilt",
    "curriculum_packing",
    "bpe_encode_fast",
    "streaming_ann_absorb",
    "pq_topk",
    "ivfpq_topk",
    "semantic_decontam",
    "resample_ffill",
    "resample_interp",
    "triangle_counts",
    "sorted_neighborhood",
    "streaming_resample",
    "bucketed_join",
    "constraint_audit",
    "kmv_set_ops",
    "weighted_sample",
    "rolling_anomaly",
    "schema_evolution",
    "hist_quantiles",
    "hist_drift",
    "streaming_hist",
    "rolling_active",
    "hll_distinct",
    "cms_counts",
    "zorder_layout",
    "profile_table",
    "sequence_pattern",
    "streaming_hll",
    "skyline_customers",
    "target_encode",
    "impute_missing",
    "pit_join",
    "attribution",
    "bfs_reachability",
    "ivm_aggregate",
    "streaming_ivm",
    "entity_resolution",
    "k_anonymity",
    "quantile_calibration",
    "event_transitions",
    "rfm_segments",
    "scd3_apply",
    "surrogate_keys",
    "fk_integrity",
    "shortest_paths",
    "revenue_trend",
    "streaming_transitions",
    "python_datasource",
    "media_dedup",
    "spatial_join",
    "table_reconcile",
    "benford_audit",
    "streaming_reconcile",
    "basket_rules",
    "streaming_transitions_state",
    "cc_star",
    "merge_fileskip",
    "data_health",
    "rrf_fusion",
    "time_travel",
    "version_diff",
    "retrieval_ndcg",
    "l_diversity",
    "readability",
    "interval_join",
    "winsorize",
    "robust_zscore",
    "stratified_sample",
    "merge_dv",
    "column_prune",
    "streaming_versioned",
    "versioned_evolve",
    "merge_sync",
    "versioned_zorder",
    # r13: lakehouse maintenance + conditional MERGE surface
    "restore_table",
    "point_lookup",
    "merge_arms",
    "merge_arms_dv",
    "merge_arms_sync",
    "table_history",
    "streaming_cdf",
    "table_replication",
    "rebucket",
    "compact_binpack",
    # late r13: constraints, shallow clone, timestamp travel, tags
    "constraint_gate",
    "shallow_clone",
    "as_of_timestamp",
    "tagged_read",
    # r14: oracle-replayable exact configurations of the held-ANN family
    "ivf_prebuilt_full_probe",
    "pq_full_rerank",
    "ivfpq_full_probe",
    # r14: SQL front door routing MERGE INTO / RESTORE / DESCRIBE HISTORY
    "lakehouse_sql",
    # r14: retrieval ANN twins at their exactness anchors
    "hard_negatives_full_probe",
    "retrieval_mrr_full_probe",
    # r15: SQL time-travel reads through the front door; incremental
    # liquid-clustering-style OPTIMIZE; DELETE FROM / UPDATE statements
    "sql_time_travel",
    "incremental_optimize",
    "sql_update_delete",
    "table_changes_batch",
    # r16: persisted table metadata + key-free SQL DML; OPTIMIZE ZORDER
    # BY; timestamp-endpoint batch CDF; disjoint-bucket concurrent
    # commits; SQL CTAS/INSERT; Delta-vocabulary batch CDF; column
    # mapping; REORG PURGE
    "sql_table_meta",
    "optimize_zorder_sql",
    "table_changes_ts",
    "concurrent_commits",
    "sql_ctas_insert",
    "table_changes_delta",
    "column_mapping",
    "reorg_purge",
    "schema_evolution_merge",
    "scoped_optimize",
]


def _py_warm(batches):
    import numpy  # noqa: F401  — preload the heavy imports UDFs use
    import pandas  # noqa: F401

    yield from batches


def run_one(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def _jvm_hygiene(spark, base_views: set[str]) -> None:
    """Between-query JVM-state reset (r13 verdict #2: shared-JVM
    pressure inflated late-suite numbers by up to ±25% — pq_topk
    measured 1.96 s isolated vs 4.45–6.74 s deep in a 200+-item run).
    Three leaks accumulate across a long suite: temp views queries
    register and abandon, py4j proxies pinning JVM-side plans/RDDs,
    and localCheckpoint block stores that free only when their RDD is
    garbage-collected IN THE JVM. So: drop the views this query added,
    collect Python (releases the proxies), and ask the JVM to collect
    (lets ContextCleaner reap the now-unreachable checkpoint blocks).
    Deliberately NOT spark.catalog.clearCache(): the shared pair/BPE/
    ANN/PQ-index caches are priced once as *_materialize line items and
    the suite's steady-state entries measure the cached-read path by
    design."""
    import gc

    try:
        for t in spark.catalog.listTables():
            if t.isTemporary and t.name not in base_views:
                spark.catalog.dropTempView(t.name)
    except Exception:
        pass
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def main() -> None:
    import argparse

    # --runs N codifies the min-of-N comparator SCALING.md adopted for
    # cross-round claims (r14: same-binary suite spread measured 1.28x
    # max/min from host weather alone; per-query min-of-N + the 100x
    # scale curves are the honest signals). The default stays the
    # driver's best-of-2; --out redirects the full payload so a
    # min-of-3 snapshot can live beside BENCH_LOCAL.json.
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--runs", type=int, default=2,
        help="per-query runs; the reported number is the min (default 2)",
    )
    ap.add_argument(
        "--out", default="BENCH_LOCAL.json",
        help="file (repo-relative) for the full per-query JSON payload",
    )
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="bench")
    run_one(spark, "pricing_summary", sf_dir)  # warmup: JVM + codegen + file listing
    # Warm the Python worker pool too (fork + numpy/pandas import per
    # core) so Arrow-UDF queries measure steady state like JVM ones.
    spark.range(0, 32, 1, 32).mapInPandas(
        _py_warm, "id long"
    ).write.mode("overwrite").format("noop").save()

    # The dedup family (jaccard_pairs, dedup_clusters, curation_pipeline)
    # consumes one shared materialized pair set per session; best-of-2
    # min() below would discard its one-time build cost entirely, so the
    # materialization is timed explicitly as its own line item — the
    # suite total then includes the build exactly once (how a production
    # pipeline pays for a shared intermediate) and the family's entries
    # honestly measure the cached-read path they actually take.
    timings: dict[str, float] = {}
    clear_pair_cache()
    t0 = time.perf_counter()
    shared_jaccard_pairs(spark, sf_dir)  # eagerly builds + persists
    timings["pair_materialize"] = round(time.perf_counter() - t0, 3)

    # Same honesty rule for the streaming queries' shared file-stream
    # staging copy: its one-time write is a visible line item, and the
    # streaming entries then measure stream execution only.
    clear_stream_src_cache()
    t0 = time.perf_counter()
    _events_stream_src(spark, sf_dir)
    timings["stream_stage_materialize"] = round(time.perf_counter() - t0, 3)

    # Same rule for the BPE family's shared trained tokenizer: the
    # 6-round train is timed once (how production pays for it), and
    # bpe_merges / bpe_segment / bpe_encode then measure their actual
    # cached-read + downstream-join paths.
    clear_bpe_cache()
    t0 = time.perf_counter()
    shared_bpe_train(spark, sf_dir)
    timings["bpe_train_materialize"] = round(time.perf_counter() - t0, 3)

    # Same rule for the held ANN index: the one-time build (quantizer
    # train + corpus assign/sign pass) is its own line item, and the
    # *_prebuilt queries measure the steady-state probe path.
    clear_ann_index_cache()
    t0 = time.perf_counter()
    shared_ann_index(spark, sf_dir)
    timings["ann_index_materialize"] = round(time.perf_counter() - t0, 3)

    # Same rule for the held PQ index (r17): codebook train + corpus
    # encode priced once as its own line item; the four PQ queries
    # then measure the steady-state ADC probe path.
    clear_pq_index_cache()
    t0 = time.perf_counter()
    shared_pq_index(spark, sf_dir)
    timings["pq_index_materialize"] = round(time.perf_counter() - t0, 3)

    # Best of two runs per query: the second run re-executes the full
    # plan (noop sink caches nothing), so min() filters transient
    # machine-load noise without hiding real per-query cost. Between
    # queries, _jvm_hygiene resets the shared-JVM state so an item's
    # number doesn't depend on its suite position.
    base_views = set()
    try:
        base_views = {
            t.name for t in spark.catalog.listTables() if t.isTemporary
        }
    except Exception:
        pass
    for name in HEADLINE:
        timings[name] = min(
            run_one(spark, name, sf_dir) for _ in range(max(1, args.runs))
        )
        _jvm_hygiene(spark, base_views)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs": max(1, args.runs),
    }
    line = json.dumps(payload, separators=(",", ":"))
    # Truncation-proofing (r7/r9/r10 verdicts: the driver's tail capture
    # clipped the full suite line THREE rounds running — at ~180 line
    # items the per-query dict alone is ~4.3 KB, larger than the capture
    # window, so printing it first AND last cannot help). The fix per
    # the r10 verdict: the LAST stdout line is a SHORT summary —
    # {"metric","value","unit","sf","n_queries"} only, a few dozen
    # bytes that survive any tail window — while the full per-query
    # payload goes to BENCH_LOCAL.json (committed in-tree) and to an
    # EARLIER stdout line for humans running it interactively.
    # spark.stop() runs before the final print so JVM shutdown logging
    # cannot land after it.
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), args.out
    )
    with open(out_path, "w") as f:
        f.write(line + "\n")
    print(line, flush=True)
    summary = json.dumps(
        {
            "metric": "suite_seconds",
            "value": total,
            "unit": "sec",
            "sf": sf,
            # r11 ADVICE: count queries only — the four *_materialize
            # prep items are suite-shared setup, not HEADLINE entries.
            "n_queries": sum(
                1 for k in timings if not k.endswith("_materialize")
            ),
            "n_items": len(timings),
        },
        separators=(",", ":"),
    )
    spark.stop()
    print(summary, flush=True)


if __name__ == "__main__":
    main()
