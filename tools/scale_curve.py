"""Scaling-curve runner (SCALING.md): time the documents-family
queries at an arbitrary corpus directory — in particular the derived
10x corpus from tools/make_scaled_docs.py — and print one JSON line
per run, same measurement discipline as bench.py (noop sink, warmup,
python-worker prefork, explicit pair_materialize line item, min-of-2).

Usage: python tools/scale_curve.py [sf_dir] [query ...]
       (default dir /root/repo/.scratch/sf1x, default queries below)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_bigquery_to_sftp_server_spark.queries import (
    QUERIES,
    clear_pair_cache,
    shared_jaccard_pairs,
)
from data_pipeline_bigquery_to_sftp_server_spark.session import get_spark

DEFAULT = [
    "jaccard_pairs",
    "dedup_clusters",
    "decontaminate",
    "bm25_topk",
    "heavy_hitters",
    "chunk_documents",
    "pack_sequences",
    "text_stats",
    "token_topk",
    "dedup_exact",
    "dup_ngram_spans",
    "mixture_sample",
    "lm_scores",
    "lm_scores_bigram",
    "mixture_upsample",
    "recipe_pipeline",
]

# The embeddings family (needs {sf_dir}/embeddings.parquet — derive the
# 10x corpus with tools/make_scaled_embeddings.py). Invoke as:
#   python tools/scale_curve.py <dir> EMB
EMBEDDINGS = [
    "cosine_topk_np",
    "lsh_topk",
    "ivf_topk",
    "embedding_dups",
    "embedding_dups_exact",
    "hard_negatives",
    "cluster_documents",
    "semantic_dedup_clustered",
]


def _py_warm(batches):
    import numpy  # noqa: F401
    import pandas  # noqa: F401

    yield from batches


def run_one(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1x"
    names = sys.argv[2:] or DEFAULT
    if names == ["EMB"]:
        names = EMBEDDINGS
    spark = get_spark(app_name="scale_curve")
    warm = "cosine_topk_np" if set(names) <= set(EMBEDDINGS) else "text_stats"
    run_one(spark, warm, sf_dir)  # warmup: JVM + codegen
    spark.range(0, 32, 1, 32).mapInPandas(_py_warm, "id long").write.mode(
        "overwrite"
    ).format("noop").save()

    timings: dict[str, float] = {}
    if {"jaccard_pairs", "dedup_clusters"} & set(names):
        clear_pair_cache()
        t0 = time.perf_counter()
        shared_jaccard_pairs(spark, sf_dir)
        timings["pair_materialize"] = round(time.perf_counter() - t0, 3)
    for name in names:
        timings[name] = min(run_one(spark, name, sf_dir) for _ in range(2))
    print(
        json.dumps(
            {"dir": sf_dir, "queries": timings, "total": round(sum(timings.values()), 3)}
        )
    )


if __name__ == "__main__":
    main()
