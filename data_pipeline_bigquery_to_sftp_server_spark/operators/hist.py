"""Mergeable fixed-width histogram sketch for distributed quantiles.

The quantile-state member of the held-state family (DedupState, KMV,
moment state, resample cells): a per-group histogram over INTEGER
micro-unit buckets whose counts are exact longs — so the state is

- MERGEABLE by construction (absorb = union + re-sum; arrival order
  and batching provably can't move a count),
- ENGINE-PORTABLE and oracle-checkable (bucket = integer division of
  round(value * unit), no float bin edges — ln/floor-of-double bin
  schemes diverge between engines at exact powers; integer division
  cannot),
- TINY: (groups x occupied buckets) rows regardless of corpus size —
  the 100 TB state for a 5-unit-wide bucket over a bounded metric is
  a few hundred rows per group.

Quantile estimates interpolate linearly inside the target bucket from
exact integer ranks (type-1 / inverse-CDF target t = ceil(p*n/100),
computed as (p*n + 99) div 100 — pure integer), so every emitted
double is one exact-int addition + one division in a mirrored order:
bit-identical in Spark and DuckDB. Estimation error is bounded by the
bucket width; the exact order-statistic twin in queries.py publishes
the realized error per cell.

Unlike t-digest/KLL (implementation-defined centroid/compaction
state), this sketch trades adaptivity for replayability — the same
trade the KMV family makes against HLL, and the right one for an
engine whose correctness gate is cell-for-cell SQL replay.

The reference pipeline has no sketch surface (BigQuery delegates
quantiles to approx_quantiles); this is an engine extension
(SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_UNIT = 1_000_000  # micro-units per 1.0 of the metric
DEFAULT_WIDTH = 5_000_000  # bucket width in micro-units (5.0 units)


def hist_state(
    df: DataFrame,
    value_col: str,
    group_col: str,
    unit: int = DEFAULT_UNIT,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Build per-group histogram state ``(group, bucket, n)``. One
    partial+final count aggregation — the only corpus-sized step in
    the family. Non-negative metrics only (asserted in-plan): Spark's
    ``div`` truncates toward zero while SQL ``//`` floors, so signed
    domains must be shifted by the caller rather than silently
    mis-bucketed at the engines' disagreement point."""
    m = F.round(F.col(value_col) * int(unit)).cast("long")
    rows = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col), m.alias("_m")
    )
    rows = rows.where(
        F.assert_true(
            F.col("_m") >= 0,
            F.lit(
                "hist_state: negative micro-units — integer-division "
                "bucketing diverges between engines below zero; shift "
                "the metric first"
            ),
        ).isNull()
    )
    return (
        rows.withColumn("bucket", F.expr(f"_m div {int(width)}"))
        .groupBy(group_col, "bucket")
        .agg(F.count("*").alias("n"))
    )


def derive_hist_width(
    df: DataFrame,
    value_col: str,
    group_col: str,
    unit: int = DEFAULT_UNIT,
    buckets_per_iqr: int = 16,
) -> int:
    """Auto-derive the bucket width from the data's spread — the
    documented accuracy tier for HEAVY-TAILED metrics (r10 verdict #7).

    Fixed-width buckets bound the quantile error by the bucket width,
    which is useless when the distribution is Zipf-like: a 5-unit
    bucket over a metric whose p25..p95 all live below 1.0 puts the
    entire body in bucket 0 and every mid quantile interpolates to the
    same smeared estimate (realized error ~ the bucket width, measured
    on the Zipf fixture in test_hist). The fix is Freedman-Diaconis in
    spirit: width = IQR/buckets_per_iqr, so the distribution BODY
    spans ~2*buckets_per_iqr buckets and mid-quantile error is bounded
    by IQR/buckets_per_iqr regardless of the tail's reach.

    One approx-percentile aggregate per group (the same
    approx-at-scale swap as iqr_outliers' exact=False tier — width
    derivation needs spread, not exactness), then the MIN width across
    groups so the narrowest group keeps resolution; one bounded
    one-row collect. Tail buckets stay sparse-but-present (state rows
    exist only for OCCUPIED buckets, so a 1000x tail adds at most its
    own occupied-bucket count, not 1000x rows). Returns an int width
    in micro-units (>= 1) to pass to :func:`hist_state`."""
    q = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(group_col)
        .agg(F.percentile_approx(value_col, [0.25, 0.75]).alias("_q"))
        .select(
            (
                (F.element_at("_q", 2) - F.element_at("_q", 1))
                * float(int(unit))
                / float(int(buckets_per_iqr))
            ).alias("_w")
        )
    )
    (row,) = q.agg(F.min("_w").alias("w")).collect()
    return max(1, int(row.w))


def hist_absorb(state_a: DataFrame, state_b: DataFrame, group_col: str) -> DataFrame:
    """Merge two histogram states: union + re-sum. Counts are exact
    longs, so absorb is associative/commutative — the streamed
    end-state replays the one-shot batch build cell-for-cell."""
    return (
        state_a.select(group_col, "bucket", "n")
        .unionByName(state_b.select(group_col, "bucket", "n"))
        .groupBy(group_col, "bucket")
        .agg(F.sum("n").alias("n"))
    )


def hist_quantiles(
    state: DataFrame,
    group_col: str,
    ps: list[int] | None = None,
    unit: int = DEFAULT_UNIT,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Quantile estimates from histogram state: for each integer
    percentile p, target rank t = ceil(p*n/100) (exact integer), the
    bucket where the cumulative count first reaches t, and a linear
    interpolation inside it:

        est = (bucket*W + W*(t - cum_before)/n_bucket) / unit

    — exact ints everywhere except two mirrored IEEE divisions, so a
    SQL engine replays every cell. The state is (groups x buckets)
    rows; everything here is arithmetic on that, never on data."""
    ps = ps or [25, 50, 75, 95]
    w = (
        Window.partitionBy(group_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = state.select(
        group_col,
        "bucket",
        "n",
        F.sum("n").over(w).alias("_cum"),
    ).withColumn("_cum_before", F.col("_cum") - F.col("n"))
    totals = state.groupBy(group_col).agg(F.sum("n").alias("n_total"))
    targets = totals.select(
        group_col,
        "n_total",
        F.explode(F.array(*[F.lit(int(p)) for p in ps])).alias("p"),
    ).withColumn("t", F.expr("(p * n_total + 99) div 100"))
    hit = targets.join(cum, group_col).where(
        (F.col("_cum_before") < F.col("t")) & (F.col("t") <= F.col("_cum"))
    )
    west = (
        F.col("bucket").cast("double") * float(int(width))
        + float(int(width))
        * (F.col("t") - F.col("_cum_before")).cast("double")
        / F.col("n").cast("double")
    ) / float(int(unit))
    return hit.select(
        group_col,
        F.col("p").cast("int").alias("p"),
        west.alias("est"),
        F.col("n_total").cast("bigint").alias("n_total"),
    )


def save_hist_state(
    state: DataFrame,
    path: str,
    value_col: str,
    group_col: str,
    unit: int = DEFAULT_UNIT,
    width: int = DEFAULT_WIDTH,
) -> None:
    """Persist state + sketch params (the KMV durability shape): the
    params row makes later absorbs safe — states built with different
    (unit, width) would merge into nonsense, so the loader hands back
    the recorded params for callers to reuse."""
    spark = state.sparkSession
    spark.createDataFrame(
        [(value_col, group_col, int(unit), int(width))],
        "value_col string, group_col string, unit long, width long",
    ).write.mode("overwrite").parquet(f"{path}/params")
    state.select(group_col, "bucket", "n").write.mode("overwrite").parquet(
        f"{path}/state"
    )


def load_hist_state(
    spark: SparkSession, path: str
) -> tuple[DataFrame, str, str, int, int]:
    """Re-open a saved histogram sketch:
    ``(state, value_col, group_col, unit, width)``."""
    p = spark.read.parquet(f"{path}/params").collect()[0]
    state = spark.read.parquet(f"{path}/state").repartition(p.group_col)
    return state, p.value_col, p.group_col, int(p.unit), int(p.width)


def hist_drift(
    state_a: DataFrame, state_b: DataFrame, group_col: str
) -> DataFrame:
    """Distribution-drift metric between two histogram states (the
    snapshot-monitoring question: "did this metric's distribution move
    between corpus versions?"): per-group TOTAL VARIATION DISTANCE

        TVD = (1/2) * sum_i |p_i - q_i|
            = sum_i |n_a_i * Nb - n_b_i * Na|  /  (2 * Na * Nb)

    The numerator is an EXACT integer sum (cross-multiplied counts, no
    per-bucket division), so unlike PSI/KL — whose ln() terms differ in
    the last ulp between libms and whose float sums are order-dependent
    — TVD from integer histograms is ORACLE-CHECKABLE: one final
    division of exact integers, identical in any engine. Also emitted:
    the worst bucket's deviation (same integer construction) and both
    totals. Cost: one outer-merge of two (groups x buckets) frames —
    state-sized, never corpus-sized. Counts are held in decimal(38)
    for the cross products (DuckDB's HUGEINT promotion, mirrored), so
    billion-row snapshots don't overflow."""
    a = state_a.select(group_col, "bucket", F.col("n").alias("na"))
    b = state_b.select(group_col, "bucket", F.col("n").alias("nb"))
    cells = (
        a.join(b, [group_col, "bucket"], "full_outer")
        .na.fill({"na": 0, "nb": 0})
    )
    tot = cells.groupBy(group_col).agg(
        F.sum("na").alias("n_a"), F.sum("nb").alias("n_b")
    )
    j = cells.join(tot, group_col)
    dev = F.abs(
        F.col("na").cast("decimal(38,0)") * F.col("n_b").cast("decimal(38,0)")
        - F.col("nb").cast("decimal(38,0)") * F.col("n_a").cast("decimal(38,0)")
    )
    agg = j.groupBy(group_col).agg(
        F.sum(dev).alias("_s"),
        F.max(dev).alias("_mx"),
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
    )
    den = (
        F.lit(2).cast("decimal(38,0)")
        * F.col("n_a").cast("decimal(38,0)")
        * F.col("n_b").cast("decimal(38,0)")
    )
    den_half = (
        F.col("n_a").cast("decimal(38,0)") * F.col("n_b").cast("decimal(38,0)")
    )
    return agg.select(
        group_col,
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        (F.col("_s").cast("double") / den.cast("double")).alias("tvd"),
        (F.col("_mx").cast("double") / den_half.cast("double")).alias(
            "max_bucket_dev"
        ),
    )
