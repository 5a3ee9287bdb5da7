"""Physical-plan assertions — the engine's "did Catalyst do what we
designed for?" checks (SURVEY §4). Used in tests to pin scale-critical
plan properties: parquet filter pushdown, column pruning, broadcast
joins for dimension tables, whole-stage codegen coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> str:
    """Return the PushedFilters lines of the formatted plan (empty string
    when nothing pushed — a red flag for selective scans)."""
    plan = formatted_plan(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def read_schema(df: DataFrame) -> str:
    """ReadSchema lines — verifies column pruning reached the scan."""
    plan = formatted_plan(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "ReadSchema" in line)


def codegen_stage_count(df: DataFrame) -> int:
    """Count whole-stage-codegen subtrees. Uses the 'codegen' explain
    mode because under AQE the formatted plan hides codegen annotations
    until execution."""
    text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    return text.count("WholeStageCodegen subtree")


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when the plan contains a map-side partial aggregate before
    the exchange — the scale-critical shape for groupBy at 100 TB."""
    return "partial_" in formatted_plan(df)
