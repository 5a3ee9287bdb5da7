"""One-pass table profiler — the "what is in this table" report every
ingestion step runs before trusting a new dataset (SURVEY §2.11 /
reference main.py's implicit contract that staged frames match the
destination schema, generalized to any frame).

``profile_table`` builds its plan DYNAMICALLY from ``df.dtypes`` (the
F16 discipline: the plan is a function of the schema, not hand-written
per table) and computes every column's statistics in ONE aggregate over
ONE scan — n_rows, per-column null count, distinct count, and
type-appropriate min/max:

- numeric (and boolean) columns -> ``min_num``/``max_num`` doubles;
- temporal columns -> epoch micros (timestamps) / epoch days (dates)
  as doubles — integer-valued, so engine-exact;
- string columns -> ``min_str``/``max_str`` (binary collation on both
  engines).

The single wide agg means Catalyst computes all statistics with one
partial+final pass; the exact distinct counts ride Spark's EXPAND
(one shuffle carrying n_cols replicas — the price of exactness). The
100 TB swap is IN CODE, not a docstring: ``exact=False`` switches every
distinct count to ``approx_count_distinct`` (HLL++, no EXPAND, pure
partial agg), keeping the rest of the profile identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def _min_max(col: str, dtype: str) -> tuple[Column, Column, Column, Column]:
    """(min_num, max_num, min_str, max_str) aggregate expressions for
    one column — the pair not applicable to the type stays NULL."""
    c = F.col(col)
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    base = dtype.split("(")[0]
    if base in _NUMERIC or base == "decimal":
        return (
            F.round(F.min(c).cast("double"), 6),
            F.round(F.max(c).cast("double"), 6),
            null_s,
            null_s,
        )
    if base == "boolean":
        return (
            F.min(c.cast("int")).cast("double"),
            F.max(c.cast("int")).cast("double"),
            null_s,
            null_s,
        )
    if base in ("timestamp", "timestamp_ntz"):
        # session tz is pinned UTC, so ntz -> instant is the identity
        # mapping DuckDB's naive-timestamp epoch_us uses
        ts = lambda x: F.unix_micros(x.cast("timestamp"))  # noqa: E731
        return (
            ts(F.min(c)).cast("double"),
            ts(F.max(c)).cast("double"),
            null_s,
            null_s,
        )
    if base == "date":
        epoch = F.lit("1970-01-01").cast("date")
        return (
            F.datediff(F.min(c), epoch).cast("double"),
            F.datediff(F.max(c), epoch).cast("double"),
            null_s,
            null_s,
        )
    if base == "string":
        return (null_d, null_d, F.min(c), F.max(c))
    # arrays/structs/maps/binary: min/max is not meaningful
    return (null_d, null_d, null_s, null_s)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Profile ``columns`` (default: all) in one aggregate pass.
    Returns one row per column:
    ``(col_name, dtype, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str)``. ``exact=False`` estimates n_distinct with
    ``approx_count_distinct(rsd)`` — the at-scale tier."""
    dtypes = dict(df.dtypes)
    cols = list(columns) if columns is not None else list(df.columns)
    unknown = [c for c in cols if c not in dtypes]
    if unknown:
        raise ValueError(f"profile_table: unknown columns {unknown}")
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        nd = (
            F.countDistinct(F.col(c))
            if exact
            else F.approx_count_distinct(c, rsd)
        )
        mn, mx, mns, mxs = _min_max(c, dtypes[c])
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nn_{c}"),
            nd.cast("long").alias(f"__nd_{c}"),
            mn.alias(f"__mn_{c}"),
            mx.alias(f"__mx_{c}"),
            mns.alias(f"__mns_{c}"),
            mxs.alias(f"__mxs_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.lit(dtypes[c]).alias("dtype"),
                    F.col("__n").alias("n_rows"),
                    F.col(f"__nn_{c}").alias("n_nulls"),
                    F.col(f"__nd_{c}").alias("n_distinct"),
                    F.col(f"__mn_{c}").alias("min_num"),
                    F.col(f"__mx_{c}").alias("max_num"),
                    F.col(f"__mns_{c}").alias("min_str"),
                    F.col(f"__mxs_{c}").alias("max_str"),
                )
                for c in cols
            ]
        )
    )
    return one.select(rows.alias("_r")).select("_r.*")
