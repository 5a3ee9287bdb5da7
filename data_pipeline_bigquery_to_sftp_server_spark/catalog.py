"""Table catalog over the harness parquet directories.

The reference addressed tables as ``project.dataset.table`` strings
(reference main.py:76); the engine's catalog is a directory of parquet
files, one per table, registered as temp views so both the DataFrame API
and ``spark.sql`` front doors see the same relations.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Runtime-settable confs the engine's semantics depend on, pinned here so
# queries stay correct even under a SparkSession the harness built without
# session.get_spark (e.g. the driver's own session):
# - UTC: every date/time formatting rule (and the DuckDB oracle) assumes it
# - nanosAsLong: the events table is TIMESTAMP(NANOS) parquet, unreadable
#   by Spark otherwise; load_table converts the long back to a timestamp
# - Arrow: pandas-UDF/mapInPandas transport
_REQUIRED_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_engine_confs(spark: SparkSession) -> None:
    for k, v in _REQUIRED_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:  # pragma: no cover - static conf in exotic deploys
            pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan for one table (SURVEY §2.1 S10).

    A plain ``spark.read.parquet`` keeps Catalyst's predicate pushdown and
    column pruning available to every downstream operator.
    """
    ensure_engine_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Nanosecond-precision timestamps (events.ts) have no native Spark
    # type; normalize to microsecond TIMESTAMP whichever way this Spark
    # surfaces them (both floor to µs, like DuckDB's display):
    # - long nanos under spark.sql.legacy.parquet.nanosAsLong (≤4.1.1);
    # - TIMESTAMP_NTZ, µs-truncated (4.1.2+ ignores the legacy conf) —
    #   under the pinned UTC session TZ the NTZ→TIMESTAMP cast keeps the
    #   wall clock, i.e. the same instant the writer recorded.
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, types.LongType):
            # Integer division — float division would round-trip through
            # double and lose microseconds at epoch-nano magnitudes.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.name == "ts" and isinstance(field.dataType, types.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register every table as a temp view (SQL front door)."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
