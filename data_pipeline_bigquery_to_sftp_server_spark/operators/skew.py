"""Skew-handling join: key salting (SURVEY §4; 100 TB design note).

AQE's skew-join handling (enabled in session.py) covers most cases by
splitting oversized partitions at runtime. Salting is the explicit
fallback when one side's hot keys are known and the other side is
small enough to replicate: the hot side gets a random salt in
[0, factor), the small side is exploded across all salt values, and
the join runs on (key, salt) — spreading each hot key over ``factor``
reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed fact side to a replicable dimension side on ``key``
    with ``factor``-way salting.

    The salt is derived deterministically from a uniform hash of the
    whole row (monotonically_increasing_id would break on retries), so
    re-executed tasks produce identical output.
    """
    salted_l = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(factor))
    )
    salted_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(factor - 1).cast("long")))
    )
    return (
        salted_l.join(salted_r, on=[key, "_salt"], how=how).drop("_salt")
    )
