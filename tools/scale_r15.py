"""Cross-scale curve for the r15 additions (SCALING.md): time each
query at sf0.001 / sf0.01 / sf0.1 — two decades of input growth — and
print one JSON line per scale plus per-query 100x ratios. Same
measurement discipline as bench.py (noop sink, warmup, min-of-2).

The interesting shapes this round: sql_time_travel is three
time-travel reads through the SQL front door over a COW-committed
table (each read is read_version's one-manifest plan — cost tracks
the table, not the history); incremental_optimize is the
liquid-clustering OPTIMIZE scene whose rewrite cost is O(touched
buckets' bytes) — the band scales with the input so the curve tracks
the CDC volume, never the cold buckets; streaming_cdf and
table_replication re-run here because this round moved their
PLANNING to commit-time metadata (changed_buckets sidecar stamps) and
their DV layout to bucket-partitioned — both were flat (0.85x/0.89x)
on the r14 tiers and must stay flat on the r15 ones.

Usage: python tools/scale_r15.py [query ...]
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
    "sql_time_travel",
    "incremental_optimize",
    "streaming_cdf",
    "table_replication",
    "merge_dv",
    "merge_arms_dv",
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
    spark = get_spark(app_name="scale_r15")
    run_one(spark, "pricing_summary", SF_DIRS[0])  # JVM/codegen warmup
    results: dict[str, dict[str, float]] = {n: {} for n in names}
    for sf_dir in SF_DIRS:
        timings = {}
        for n in names:
            timings[n] = min(run_one(spark, n, sf_dir) for _ in range(2))
            results[n][sf_dir.rsplit("sf", 1)[1]] = timings[n]
        print(
            json.dumps(
                {"metric": "r15_scale_seconds", "sf_dir": sf_dir, "queries": timings},
                separators=(",", ":"),
            ),
            flush=True,
        )
    ratios = {
        n: round(v["0.1"] / max(v["0.001"], 1e-9), 2) for n, v in results.items()
    }
    print(
        json.dumps(
            {"metric": "r15_scale_ratio_100x", "ratios": ratios},
            separators=(",", ":"),
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
