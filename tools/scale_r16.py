"""Cross-scale curve for the r16 additions (SCALING.md): time each
query at sf0.001 / sf0.01 / sf0.1 — two decades of input growth — and
print one JSON line per scale plus per-query 100x ratios. Same
measurement discipline as bench.py (noop sink, warmup, min-of-2).

The interesting shapes this round: sql_table_meta is a five-statement
key-free DML lifecycle (metadata resolution adds one tiny JSON read
per statement — the curve must track the table, not the statement
count); optimize_zorder_sql's rewrite is one bounded bucket exchange
plus in-task Morton sorts (O(table) rewrite by design, so the curve
tracks input size ~linearly — the claim is NO superlinear term from
the sort, which is per-bucket); table_changes_ts is endpoint
resolution (O(versions) sidecar reads) + an O(changes) feed — commit
counts are scale-invariant here, so the curve tracks the change sets;
concurrent_commits carries a fixed ~1 s race choreography (sleep +
poll) on top of two O(|staging|=5 rows) MOR commits — the curve must
be FLAT (the race cost is size-independent). streaming_cdf re-runs
as the regression sentinel for the pyarrow-fs routing (r16 moved
every CDF path onto the FileSystem layer — the abstraction must not
bend the r15 curve).

Late-r16 additions: sql_ctas_insert (SQL bootstrap + keyed INSERT —
curve tracks the CTAS input); table_changes_delta (delta-vocabulary
batch CDF: one pruned v-1 read of the CHANGED buckets per version —
the curve tracks the change sets, not the table); column_mapping (a
9-version DDL lifecycle whose schema commits are O(manifest) — the
curve must track only the three MOR writes riding along);
reorg_purge (DV-debt purge: O(debt buckets) rewrite — the curve
tracks the churned key range, and the clean-bucket mtime pin in
test_merge is the no-superlinear-term witness).

Usage: python tools/scale_r16.py [query ...]
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
    "sql_table_meta",
    "optimize_zorder_sql",
    "table_changes_ts",
    "concurrent_commits",
    "streaming_cdf",
    "sql_ctas_insert",
    "table_changes_delta",
    "column_mapping",
    "reorg_purge",
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
    spark = get_spark(app_name="scale_r16")
    run_one(spark, "pricing_summary", SF_DIRS[0])  # JVM/codegen warmup
    results: dict[str, dict[str, float]] = {n: {} for n in names}
    for sf_dir in SF_DIRS:
        timings = {}
        for n in names:
            timings[n] = min(run_one(spark, n, sf_dir) for _ in range(2))
            results[n][sf_dir.rsplit("sf", 1)[1]] = timings[n]
        print(
            json.dumps(
                {"metric": "r16_scale_seconds", "sf_dir": sf_dir, "queries": timings},
                separators=(",", ":"),
            ),
            flush=True,
        )
    ratios = {
        n: round(v["0.1"] / max(v["0.001"], 1e-9), 2) for n, v in results.items()
    }
    print(
        json.dumps(
            {"metric": "r16_scale_ratio_100x", "ratios": ratios},
            separators=(",", ":"),
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
