"""Deterministic Spark-job counter for optimization claims (r16
verdict #5 / r17 brief #10: the 1154->814 job-count methodology must be
reproducible from the tree).

Wall-clock on this sandbox moves +-12% per query between identical-code
runs (host weather), so round-over-round claims about REMOVED WORK are
backed by a deterministic metric instead: the number of Spark jobs a
query schedules, read off the DAGScheduler's monotonically increasing
job-id counter before and after the query's noop-sink materialization.
Two runs of the same code always produce the same count (modulo
speculative/retried tasks, which this local sandbox never produces),
so a drop is a real removed job, not noise.

Usage:
    python tools/job_count.py [query ...] [--sf-dir DIR] [--out FILE]

With no query names, counts the 16-query lakehouse set the r16/r17
rounds optimize (the per-commit fixed-overhead family). Prints one JSON
object {query: n_jobs} plus a total.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_bigquery_to_sftp_server_spark.queries import QUERIES
from data_pipeline_bigquery_to_sftp_server_spark.session import get_spark

# the versioned-table family whose cost is per-commit fixed overhead —
# the set the r16 round measured 1154 -> 814 on
LAKEHOUSE_SET = [
    "time_travel",
    "version_diff",
    "merge_dv",
    "restore_table",
    "point_lookup",
    "merge_arms_dv",
    "table_history",
    "streaming_cdf",
    "table_replication",
    "rebucket",
    "compact_binpack",
    "lakehouse_sql",
    "sql_table_meta",
    "table_changes_ts",
    "column_mapping",
    "incremental_optimize",
]


def _next_job_id(spark) -> int:
    """Current value of the DAGScheduler's job-id counter (the id the
    NEXT submitted job will take) — public Spark internals, stable
    across 3.x/4.x (py4j unwraps the AtomicInteger to an int)."""
    return int(spark.sparkContext._jsc.sc().dagScheduler().nextJobId())


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    ap.add_argument("--out", default=None, help="also write JSON here")
    args = ap.parse_args()
    names = args.queries or LAKEHOUSE_SET
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="job_count")
    # warmup absorbs one-time JVM/codegen/catalog jobs so counts are
    # steady-state per query
    QUERIES["pricing_summary"](spark, args.sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()

    import time

    counts: dict[str, dict] = {}
    for name in names:
        before = _next_job_id(spark)
        t0 = time.perf_counter()
        QUERIES[name](spark, args.sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        counts[name] = {
            "jobs": _next_job_id(spark) - before,
            "wall": round(time.perf_counter() - t0, 2),
        }
    payload = {
        "queries": counts,
        "total_jobs": sum(c["jobs"] for c in counts.values()),
        "sf_dir": args.sf_dir,
    }
    line = json.dumps(payload, indent=2, sort_keys=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
