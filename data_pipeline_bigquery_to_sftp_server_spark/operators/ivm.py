"""Incremental view maintenance (IVM): keep a grouped-aggregate
materialized view current by folding CDC deltas into a held state
instead of recomputing from the base table — the incremental upgrade
of the reference's full-refresh reporting flow (main.py re-loads the
whole staging table and MERGEs it every sync; at 100 TB the recompute
IS the cost, the delta is not).

State = one row per group: ``(keys..., n_rows, sum_cents)`` — count
and an exact integer-cents sum, the self-maintainable aggregate pair
(count/sum/avg all derive from it; min/max are NOT self-maintainable
under deletes and stay on the recompute path).  A CDC delta arrives as
rows tagged ``op`` ∈ {'I','D'} (an update is modeled as D(old) + I(new),
the standard CDC decomposition), and absorption is pure integer
arithmetic:

    state' = state ⊎ Σ_group ( +1/-1 rows, ±cents )

so absorb(absorb(s, d1), d2) == absorb(s, d1 ∪ d2) == full recompute —
EXACTLY, not approximately, which is what lets the DuckDB oracle
replay the incrementally-maintained view as one full-recompute SQL and
the streaming foreachBatch deployment reuse the batch oracle verbatim.

Deployment caveat: foreachBatch is at-least-once, and an ADDITIVE
absorb is NOT replay-idempotent (a re-delivered batch double-counts —
unlike register-max sketch merges).  Streaming callers must gate the
absorb on ``epoch_id`` (see q_streaming_ivm) or persist a last-applied
epoch alongside the saved state.

Plan shape: the delta is grouped/summed BEFORE it touches the state
(partial aggregation on the small side), then one full-outer join on
the group keys — state-sized, never base-table-sized.  Groups whose
count reaches zero are dropped (a full recompute would not show them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_state(df: DataFrame, keys: list[str], amount: str) -> DataFrame:
    """Build the view state from the base table: one row per group with
    ``n_rows`` and ``sum_cents`` (exact ``round(amount*100)`` longs)."""
    cents = F.round(F.col(amount) * 100).cast("long")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents).alias("sum_cents"),
    )


def delta_group(delta: DataFrame, keys: list[str], amount: str, op: str = "op") -> DataFrame:
    """Collapse a CDC delta to per-group net effects: +1/-1 per 'I'/'D'
    row and the signed cents sum.  Rejects unknown op tags loudly (a
    silent skip would desynchronize the view)."""
    sign = (
        F.when(F.col(op) == "I", F.lit(1))
        .when(F.col(op) == "D", F.lit(-1))
        .otherwise(
            F.raise_error(
                F.concat(F.lit("ivm: unknown CDC op tag "), F.col(op))
            )
        )
    ).cast("long")
    cents = F.round(F.col(amount) * 100).cast("long")
    return delta.groupBy(*keys).agg(
        F.sum(sign).alias("_d_n"),
        F.sum(sign * cents).alias("_d_cents"),
    )


def absorb_delta(state: DataFrame, delta_grouped: DataFrame, keys: list[str]) -> DataFrame:
    """Fold a grouped delta (:func:`delta_group`) into the state: one
    full-outer join on the group keys, coalesced integer adds, zero-
    count groups dropped."""
    merged = state.join(delta_grouped, keys, "full_outer").select(
        *keys,
        (
            F.coalesce(F.col("n_rows"), F.lit(0))
            + F.coalesce(F.col("_d_n"), F.lit(0))
        ).alias("n_rows"),
        (
            F.coalesce(F.col("sum_cents"), F.lit(0))
            + F.coalesce(F.col("_d_cents"), F.lit(0))
        ).alias("sum_cents"),
    )
    return merged.where(F.col("n_rows") > 0)


def save_state(state: DataFrame, path: str) -> None:
    """Persist the maintained view state (the held-state lifecycle
    every expensive artifact follows — dedup_state, KMV, moments, ANN
    index): the state is plain rows, so parquet IS the serialization,
    and a reloaded state absorbs deltas indistinguishably from the
    in-session one (pinned in test_ivm)."""
    state.write.mode("overwrite").parquet(path)


def load_state(spark, path: str) -> DataFrame:
    """Reload a saved view state for further absorption or serving."""
    return spark.read.parquet(path)
