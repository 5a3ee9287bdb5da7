"""Feature-engineering transforms for training-data pipelines —
category encodings computed as relational aggregates (the step the
reference's transform stage performs row-by-row in pandas,
main.py:270-320, re-expressed as distributed SQL).

:func:`target_encode` is smoothed mean-target (a.k.a. James-Stein /
"bayesian" target) encoding:

    te(c) = (pos_c + m * prior) / (n_c + m),   prior = pos / n

One partial-aggregated groupBy builds the per-category counts; the
global prior is a one-row aggregate broadcast via crossJoin — no
driver collect, no second scan.  All inputs to the float expression
are exact integer counts and the expression tree is written
identically in Spark and the DuckDB oracle, so the unrounded doubles
are bit-identical across engines (the KMV-jaccard determinism rule).

:func:`impute_group_mean` fills NULLs in a numeric column with the
per-group mean computed over integer micro-units (cents), the exact
arithmetic discipline of timeseries.py — the imputed value is ONE
division of two exact integers, deterministic on every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def target_encode(
    df: DataFrame, category: str, target: Column, m: float = 10.0
) -> DataFrame:
    """Per-category smoothed target encoding.  ``target`` must be an
    integer 0/1 column expression.  Returns one row per category:
    ``(category, n_rows, n_pos, prior, te)`` with ``prior``/``te``
    unrounded doubles (bit-stable; see module docstring)."""
    overall = df.agg(
        F.sum(target).alias("_gpos"), F.count(F.lit(1)).alias("_gn")
    )
    stats = df.groupBy(category).agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum(target).alias("n_pos")
    )
    prior = F.col("_gpos") / F.col("_gn")
    return stats.crossJoin(F.broadcast(overall)).select(
        category,
        "n_rows",
        "n_pos",
        prior.alias("prior"),
        (
            (F.col("n_pos") + F.lit(float(m)) * prior)
            / (F.col("n_rows") + F.lit(float(m)))
        ).alias("te"),
    )


def impute_group_mean(
    df: DataFrame, group: str, value: str, out: str | None = None
) -> DataFrame:
    """Fill NULL ``value`` rows with the group's mean of the non-NULL
    rows, computed exactly: sum of cents (long) over count, one
    division.  Groups that are entirely NULL stay NULL.  Adds column
    ``out`` (default ``value + '_filled'``) as a double of cents/100.
    Zero extra scans beyond one groupBy + one broadcast join (group
    cardinality bounded)."""
    out = out or f"{value}_filled"
    cents = F.round(F.col(value) * 100).cast("long")
    means = df.groupBy(group).agg(
        F.sum(cents).alias("_sum_c"),
        F.count(value).alias("_n_v"),
    )
    fill = F.col("_sum_c") / F.col("_n_v") / F.lit(100.0)
    return (
        df.join(F.broadcast(means), on=group, how="left")
        .withColumn(
            out,
            F.when(F.col(value).isNotNull(), F.col(value).cast("double"))
            .when(F.col("_n_v") > 0, fill)
            .otherwise(F.lit(None).cast("double")),
        )
        .drop("_sum_c", "_n_v")
    )


def rank_quantile_score(
    df: DataFrame,
    value_col: str,
    id_col: str,
    q: int,
    out: str,
) -> DataFrame:
    """Tie-stable q-quantile score (1..q) of ``value_col`` across the
    WHOLE frame — percent_rank semantics (equal values share a score)
    without the single-partition ``Window.orderBy`` scale trap: the
    global rank comes from the range-repartitioned
    :func:`~...relational.with_global_rank` plan under the
    (value, id) total order, collapsed to rank() semantics by taking
    the per-value MIN rank (= 1 + count of strictly-smaller rows),
    then percent_rank = (rank-1)/(n-1) and score =
    floor(pr*q) capped at q-1, plus 1.  Three bounded shuffles per
    call (range sort + distinct-value agg + value equi-join back);
    the division is one double op over exact longs, so the DuckDB
    ``percent_rank()`` window replays the scores bit-for-bit.
    Contract: ``value_col`` must be non-NULL (the value equi-join
    back would silently drop NULL rows) — aggregate outputs, the
    intended inputs, always are."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators.relational import (
        with_global_rank,
    )

    ranked, n = with_global_rank(df, [value_col, id_col], rank_col="_grk")
    tie = ranked.groupBy(F.col(value_col).alias("_tv")).agg(
        F.min("_grk").alias("_trank")
    )
    pr = (F.col("_trank") - F.lit(1)) / F.lit(float(max(n - 1, 1)))
    scored = df.join(tie, df[value_col] == tie["_tv"]).withColumn(
        out,
        (F.least(F.floor(pr * q), F.lit(q - 1)) + 1).cast("long"),
    )
    return scored.drop("_tv", "_trank")


def grouped_ols(
    df: DataFrame, group_cols: list[str], x: str, y: str
) -> DataFrame:
    """Per-group closed-form least-squares line fit of integer ``y``
    on integer ``x`` — the trend statistic (revenue trajectory per
    segment, quality drift per source) computed as ONE grouped
    aggregation of exact sums, never an iterative solver:

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n
        r² = num² / (den · (n·Σy² − (Σy)²))

    The five sums ride decimal(19)→decimal(38) products (the
    rolling_anomaly overflow discipline — never a long square), so
    numerator and denominator are EXACT integers on every engine and
    each emitted statistic is a fixed tree of IEEE ops over them —
    the DuckDB HUGEINT mirror replays slope/intercept/r² bit-for-bit.
    Groups with a degenerate x spread (den = 0) emit NULLs."""
    xd = F.col(x).cast("decimal(19,0)")
    yd = F.col(y).cast("decimal(19,0)")
    g = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("_sx"),
        F.sum(yd).alias("_sy"),
        F.sum(xd * yd).alias("_sxy"),
        F.sum(xd * xd).alias("_sxx"),
        F.sum(yd * yd).alias("_syy"),
    )
    n_dec = F.col("n").cast("decimal(38,0)")
    num = (n_dec * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("double")
    den = (n_dec * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("double")
    deny = (n_dec * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast("double")
    slope = F.when(den > 0, num / den)
    intercept = F.when(
        den > 0,
        (F.col("_sy").cast("double") - (num / den) * F.col("_sx").cast("double"))
        / F.col("n").cast("double"),
    )
    r2 = F.when((den > 0) & (deny > 0), (num * num) / (den * deny))
    return g.select(
        *group_cols,
        "n",
        F.col("_sx").cast("long").alias("sum_x"),
        F.col("_sy").cast("long").alias("sum_y"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )
