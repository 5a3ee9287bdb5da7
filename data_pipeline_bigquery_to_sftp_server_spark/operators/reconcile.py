"""Checksum-based table reconciliation — "are these two 100 TB
replicas equal, and if not, exactly which rows differ?" without
shipping either table: the Merkle-repair pattern (Cassandra
anti-entropy, DynamoDB cross-region verify) in two relational steps:

1. **summary exchange**: each side reduces to ``n_buckets`` rows —
   (bucket, row-hash sum, row count) with bucket = key mod n_buckets
   and the row hash an md5-prefix integer over the pipe-joined tracked
   columns (the engine-portable sketch-family uniform).  Comparing
   replicas now costs exchanging ~64 rows, not 100 TB.
2. **targeted drill**: only buckets whose (sum, count) pair differs
   are re-scanned — a broadcast semi-join prunes both sides to the
   suspect buckets, then ONE key-keyed full-outer join classifies each
   differing key as ``changed`` / ``missing_a`` / ``missing_b``.

The drill is gated on the summary, so a (cosmically unlikely) sum
cancellation hides its bucket on BOTH the Spark and the oracle side —
the two engines compute identical answers by construction because the
oracle replays the same two-level plan, not an idealized diff.

Cost at scale: two full scans (one per replica, map-side hashing +
partial agg), then work proportional to the DIFFERING buckets only —
reconciling near-identical replicas touches almost nothing twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _field_enc(col: str):
    """Injective NULL-safe field encoding: ``#<len>:<value>`` with NULL
    as the distinct marker ``#N``.  Length-prefixing (not a delimiter)
    makes the row encoding collision-free for values containing any
    delimiter, and NULL never equals a real value — ``concat_ws`` would
    silently SKIP NULLs, making (NULL,'x') hash equal to ('x',NULL)
    (r10 advice).  Mirrored verbatim in the DuckDB oracles."""
    s = F.col(col).cast("string")
    return F.when(s.isNull(), F.lit("#N")).otherwise(
        F.concat(F.lit("#"), F.length(s).cast("string"), F.lit(":"), s)
    )


def row_signature(
    df: DataFrame, key: str, cols: list[str], n_buckets: int = 64
) -> DataFrame:
    """(key, bucket, rhash): 48-bit md5-prefix row hash over the
    length-prefixed NULL-safe encoding of key+columns (callers pass
    integer/string columns — encode money as cents upstream; raw
    doubles stringify differently across engines).  The bucket is a
    16-bit md5 prefix of the KEY STRING mod n_buckets — never
    ``key % n`` (string/UUID primary keys, the common replica case,
    would cast-error under ANSI or, worse, NULL-bucket silently under
    lax mode)."""
    joined = F.concat(_field_enc(key), *[_field_enc(c) for c in cols])
    rhash = F.conv(F.substring(F.md5(joined), 1, 12), 16, 10).cast("long")
    bucket = (
        F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 4), 16, 10)
        .cast("long")
        % n_buckets
    )
    return df.select(
        F.col(key).alias("_rk"),
        bucket.alias("bucket"),
        rhash.alias("_rhash"),
    )


def reconcile_tables(
    a: DataFrame,
    b: DataFrame,
    key: str,
    cols: list[str],
    n_buckets: int = 64,
) -> DataFrame:
    """Rows where replica ``b`` disagrees with replica ``a``:
    ``(bucket, key, status)`` with status ∈ {'changed', 'missing_a',
    'missing_b'} — computed via the summary-then-drill plan above."""
    sa = row_signature(a, key, cols, n_buckets)
    sb = row_signature(b, key, cols, n_buckets)
    suspects = summary_diff(bucket_summary(sa), bucket_summary(sb))
    return drill(sa, sb, suspects, key)


def bucket_summary(sig: DataFrame) -> DataFrame:
    """The held reconciliation state: one (bucket, hash sum, count)
    row per bucket over a :func:`row_signature` frame.  ADDITIVE over
    disjoint row sets (sum and count both add), so an append-only
    replica maintains it incrementally via :func:`absorb_summary` —
    reconciliation then starts from ~64 held rows, never a fresh
    full-table hash scan.  Additive ⇒ NOT replay-idempotent: streaming
    absorbs must gate on epoch_id (the ivm.py caveat)."""
    return sig.groupBy("bucket").agg(
        F.sum("_rhash").alias("hsum"), F.count(F.lit(1)).alias("n")
    )


def absorb_summary(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold an appended batch's :func:`bucket_summary` into the held
    state: full-outer on bucket, coalesced adds — exactly equal to a
    one-shot summary over the union (pinned in test_reconcile)."""
    d = delta.select(
        "bucket",
        F.col("hsum").alias("_dh"),
        F.col("n").alias("_dn"),
    )
    return state.join(d, "bucket", "full_outer").select(
        "bucket",
        (
            F.coalesce(F.col("hsum"), F.lit(0))
            + F.coalesce(F.col("_dh"), F.lit(0))
        ).alias("hsum"),
        (
            F.coalesce(F.col("n"), F.lit(0))
            + F.coalesce(F.col("_dn"), F.lit(0))
        ).alias("n"),
    )


def summary_diff(ga: DataFrame, gb: DataFrame) -> DataFrame:
    """Buckets whose (hash sum, count) pair differs between the two
    summaries — the only buckets the drill re-scans."""
    a = ga.select(
        "bucket", F.col("hsum").alias("_ha"), F.col("n").alias("_na")
    )
    b = gb.select(
        "bucket", F.col("hsum").alias("_hb"), F.col("n").alias("_nb")
    )
    return (
        a.join(b, "bucket", "full_outer")
        .where(
            ~(
                F.col("_ha").eqNullSafe(F.col("_hb"))
                & F.col("_na").eqNullSafe(F.col("_nb"))
            )
        )
        .select("bucket")
    )


def drill(
    sa: DataFrame, sb: DataFrame, suspects: DataFrame, key: str
) -> DataFrame:
    """Row-level classification within the suspect buckets only."""
    da = sa.join(F.broadcast(suspects), "bucket", "left_semi")
    db = sb.join(F.broadcast(suspects), "bucket", "left_semi").select(
        F.col("_rk").alias("_rkb"),
        F.col("bucket").alias("_bucketb"),
        F.col("_rhash").alias("_rhashb"),
    )
    j = da.join(db, da["_rk"] == db["_rkb"], "full_outer")
    status = (
        F.when(F.col("_rkb").isNull(), F.lit("missing_b"))
        .when(F.col("_rk").isNull(), F.lit("missing_a"))
        .when(F.col("_rhash") != F.col("_rhashb"), F.lit("changed"))
    )
    return (
        j.select(
            F.coalesce(F.col("bucket"), F.col("_bucketb")).alias("bucket"),
            F.coalesce(F.col("_rk"), F.col("_rkb")).alias(key),
            status.alias("status"),
        )
        .where(F.col("status").isNotNull())
    )
