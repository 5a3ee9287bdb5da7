"""Cross-scale curve for the r14 additions (SCALING.md): time each
query at sf0.001 / sf0.01 / sf0.1 — two decades of input growth — and
print one JSON line per scale plus per-query 100x ratios. Same
measurement discipline as bench.py (noop sink, warmup, min-of-2).

The interesting shapes this round: streaming_cdf and table_replication
now run on the PARTITION-BASED CDF reader (executor-side parquet, the
r13 verdict's driver-bound gap closed) with table_replication's apply
DataFrame-native — both were flat at 0.96x/0.99x on the driver-side
tier and must stay flat here; lakehouse_sql is the statement
dispatcher over existing committers (parse cost is O(statement), the
scene prices one MERGE + RESTORE + history read); the three promoted
ANN exactness anchors are corpus-linear by construction (full probe /
full re-rank = the exact brute-force shape, which is the point).

Usage: python tools/scale_r14.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_bigquery_to_sftp_server_spark.queries import QUERIES
from data_pipeline_bigquery_to_sftp_server_spark.session import get_spark

DEFAULT = [
    "streaming_cdf",
    "table_replication",
    "lakehouse_sql",
    "ivf_prebuilt_full_probe",
    "pq_full_rerank",
    "ivfpq_full_probe",
    "hard_negatives_full_probe",
    "retrieval_mrr_full_probe",
]
SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def run_one(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="scale_r14")
    run_one(spark, "pricing_summary", SF_DIRS[0])  # JVM/codegen warmup
    results: dict[str, dict[str, float]] = {n: {} for n in names}
    for sf_dir in SF_DIRS:
        timings = {}
        for n in names:
            timings[n] = min(run_one(spark, n, sf_dir) for _ in range(2))
            results[n][sf_dir.rsplit("sf", 1)[1]] = timings[n]
        print(
            json.dumps(
                {"metric": "r14_scale_seconds", "sf_dir": sf_dir, "queries": timings},
                separators=(",", ":"),
            ),
            flush=True,
        )
    ratios = {
        n: round(v["0.1"] / max(v["0.001"], 1e-9), 2) for n, v in results.items()
    }
    print(
        json.dumps(
            {"metric": "r14_scale_ratio_100x", "ratios": ratios},
            separators=(",", ":"),
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
