"""Cross-scale curve for the r13 lakehouse additions (SCALING.md):
time each query at sf0.001 / sf0.01 / sf0.1 — two decades of input
growth — and print one JSON line per scale plus per-query 100x ratios.
Same measurement discipline as bench.py (noop sink, warmup, min-of-2).

The interesting shapes: restore_table's RESTORE step is O(manifest)
(the bootstrap + two merges dominate its line); point_lookup's probes
are k hash calls + a manifest bit test + ONE directory's scan per hit
regardless of table size; merge_arms is one full-outer join (the
upsert shuffle shape, arms are free); merge_arms_dv and
compact_binpack write O(|claimed batch|) / O(|small generations|),
never O(table).

Usage: python tools/scale_r13.py [query ...]
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
    "restore_table",
    "point_lookup",
    "merge_arms",
    "merge_arms_dv",
    "merge_arms_sync",
    "table_history",
    "compact_binpack",
    # late-r13 additions (all flat across 100x — see SCALING.md)
    "constraint_gate",
    "shallow_clone",
    "as_of_timestamp",
    "tagged_read",
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
    spark = get_spark(app_name="scale_r13")
    run_one(spark, "pricing_summary", SF_DIRS[0])  # JVM/codegen warmup
    results: dict[str, dict[str, float]] = {n: {} for n in names}
    for sf_dir in SF_DIRS:
        timings = {}
        for n in names:
            timings[n] = min(run_one(spark, n, sf_dir) for _ in range(2))
            results[n][sf_dir.rsplit("sf", 1)[1]] = timings[n]
        print(
            json.dumps(
                {"metric": "r13_scale_seconds", "sf_dir": sf_dir, "queries": timings},
                separators=(",", ":"),
            ),
            flush=True,
        )
    ratios = {
        n: round(v["0.1"] / max(v["0.001"], 1e-9), 2) for n, v in results.items()
    }
    print(
        json.dumps(
            {"metric": "r13_scale_ratio_100x", "ratios": ratios},
            separators=(",", ":"),
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
