"""Query corpus: one entry per implemented SURVEY §2 operator, each with
a DuckDB-equivalent oracle (driver contract, __spark_entry__.py).

Conventions for oracle parity:
- every computed column is aliased identically in Spark and SQL;
- double aggregates are rounded (2-6 dp) so parallel-summation-order
  FP noise can't flip the value hash;
- int-ish computed columns are cast to bigint on both sides;
- timestamps that pass through window/trunc logic are formatted to
  strings on both sides (DuckDB reads the ns-precision events table as
  TIMESTAMP_NS; Spark truncates to microseconds).

Each function takes (spark, sf_dir) and returns a lazy DataFrame; the
oracle dict maps the same key to ANSI SQL over the pre-registered
DuckDB views of the identical parquet files.
"""

from __future__ import annotations

import atexit
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_bigquery_to_sftp_server_spark.catalog import load_table, register_views
from data_pipeline_bigquery_to_sftp_server_spark.functions import scalar, text
from data_pipeline_bigquery_to_sftp_server_spark.operators import (
    asof,
    constraints,
    dedup,
    merge,
    relational,
    similarity,
    skew,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

# ---------------------------------------------------------------------------
# A: aggregation family
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (TPC-H Q1 shape; SURVEY §2.4 A6-A9): wide grouped agg
    with partial aggregation + pushdown-able date filter."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 4)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_grouped_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 outcome tallies (reference main.py:323-329 success/failed
    counters, generalized)."""
    ev = load_table(spark, sf_dir, "events")
    return relational.grouped_counts(ev, "event_type")


_ORACLE_GROUPED_COUNTS = "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A9 distinct-aggregate: exact count(DISTINCT) per group."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


_ORACLE_COUNT_DISTINCT = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 hierarchical rollup (subtotals + grand total)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n"),
    )


_ORACLE_ROLLUP = """
SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 cube (all grouping-set combinations)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


_ORACLE_CUBE = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# P/J: projection, filters, joins
# ---------------------------------------------------------------------------


def q_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2+A1: the reference's get_existing_ticket_ids
    (SELECT DISTINCT _id WHERE _id IS NOT NULL, main.py:85-89)."""
    o = load_table(spark, sf_dir, "orders")
    return relational.distinct_keys(o, "o_custkey")


_ORACLE_DISTINCT_KEYS = (
    "SELECT DISTINCT o_custkey FROM orders WHERE o_custkey IS NOT NULL"
)


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: 'new' split — customers with no orders (main.py:409)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return relational.anti_join(
        c.select("c_custkey", "c_name"),
        o.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
    )


_ORACLE_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: 'existing' split — customers that do have orders (main.py:410)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return relational.semi_join(
        c.select("c_custkey", "c_mktsegment"),
        o.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
    )


_ORACLE_SEMI_JOIN = """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def q_membership_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+J3 in one frame: the reference's new-vs-existing id split
    (main.py:409-410) — anti-join rows tagged 'new', semi-join rows
    tagged 'existing'. One scan per side feeds both joins; at scale
    both decorrelate to the same broadcast/shuffled hash join on the
    key, and the union is append-only (no extra shuffle)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    keys = o.select(F.col("o_custkey").alias("c_custkey"))
    new = relational.anti_join(c.select("c_custkey"), keys, "c_custkey")
    existing = relational.semi_join(c.select("c_custkey"), keys, "c_custkey")
    return new.withColumn("split", F.lit("new")).unionByName(
        existing.withColumn("split", F.lit("existing"))
    )


_ORACLE_MEMBERSHIP_SPLIT = """
SELECT c_custkey, 'new' AS split FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT c_custkey, 'existing' AS split FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 + multi-way star join (TPC-H Q5 shape): revenue per nation in
    ASIA.

    Plan shape at scale: the selective dimension chain
    (region->nation->customer) reduces ORDERS via broadcast joins
    BEFORE the fact-fact shuffle, so the one unavoidable shuffle
    (lineitem⋈orders on orderkey) carries only ASIA orders projected to
    (o_orderkey, n_name) — ~1/5 the rows and 2 columns instead of the
    full orders table. Catalyst does not reorder user joins without
    CBO stats, so the reduction is stated explicitly. Broadcasts
    verified in tests."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(
            F.broadcast(r.where(F.col("r_name") == "ASIA")),
            n.n_regionkey == r.r_regionkey,
        )
        .select("c_custkey", "n_name")
    )
    o_asia = o.join(F.broadcast(dims), o.o_custkey == dims.c_custkey).select(
        "o_orderkey", "n_name"
    )
    return (
        li.join(o_asia, li.l_orderkey == o_asia.o_orderkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


_ORACLE_STAR_JOIN = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# O: sort / limit / top-k / pagination; window functions
# ---------------------------------------------------------------------------


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 global top-k (TakeOrderedAndProject — per-partition k-heaps,
    no global sort; reference 'k most recent', main.py:130-139)."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )
    return relational.top_k(agg, [F.desc("revenue"), F.asc("o_custkey")], 10)


_ORACLE_TOP_CUSTOMERS = """
SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders GROUP BY o_custkey
ORDER BY revenue DESC, o_custkey LIMIT 10
"""


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 windows: top-3 orders per customer by price (row_number
    with deterministic tiebreaker)."""
    o = load_table(spark, sf_dir, "orders")
    return relational.top_k_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        3,
        rank_col="rn",
    ).withColumn("rn", F.col("rn").cast("long"))


_ORACLE_WINDOW_RANK = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""


def q_window_lag_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 frames: lag + running sum over a per-customer order timeline."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.round(F.sum("o_totalprice").over(run), 2).alias("running_total"),
    )


_ORACLE_WINDOW_LAG = """
SELECT o_custkey, o_orderkey,
       lag(o_totalprice) OVER w AS prev_price,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_paginate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 both ways, returning the SAME page 3 through each strategy:

    - ``offset``: global limit+offset via a row_number window
      (main.py:130-137 semantics) — single-partition window by
      construction, the report-page path;
    - ``seek``: keyset pagination — the 100 TB path: filter on the
      page-2 boundary key, then orderBy+limit (pushed filter +
      TakeOrderedAndProject, no global window). The boundary row is
      derived in-plan (the offset page's last row), so the whole query
      stays one lazy plan.

    Identical page contents under both tags is itself the correctness
    statement: seek == offset for a total order.
    """
    o = load_table(spark, sf_dir, "orders")
    proj = o.select("o_orderkey", "o_orderdate", "o_totalprice")
    order = [F.desc("o_orderdate"), F.asc("o_orderkey")]
    offset_page = relational.paginate(proj, order, page=3, per_page=50)

    # Page-2 boundary = global row 100 (the row the seek page starts
    # after), derived via the same window machinery and cross-joined as
    # a one-row boundary frame.
    boundary = (
        relational.paginate(proj, order, page=2, per_page=50)
        .orderBy(F.asc("o_orderdate"), F.desc("o_orderkey"))
        .limit(1)
        .select(
            F.col("o_orderdate").alias("_bd"), F.col("o_orderkey").alias("_bk")
        )
    )
    after = (F.col("o_orderdate") < F.col("_bd")) | (
        (F.col("o_orderdate") == F.col("_bd"))
        & (F.col("o_orderkey") > F.col("_bk"))
    )
    seek_page = relational.paginate_keyed(
        proj.crossJoin(F.broadcast(boundary)), after, order, per_page=50
    ).drop("_bd", "_bk")

    return offset_page.withColumn("method", F.lit("offset")).unionByName(
        seek_page.withColumn("method", F.lit("seek"))
    )


_ORACLE_PAGINATE = """
WITH page AS (
  SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
  ORDER BY o_orderdate DESC, o_orderkey LIMIT 50 OFFSET 100
)
SELECT o_orderkey, o_orderdate, o_totalprice, 'offset' AS method FROM page
UNION ALL
SELECT o_orderkey, o_orderdate, o_totalprice, 'seek' AS method FROM page
"""


# ---------------------------------------------------------------------------
# Set operations (§2.7)
# ---------------------------------------------------------------------------


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT ∘ EXCEPT: building-segment customers plus
    high-balance customers, minus those with an open ('O') order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("custkey"))
    rich = c.where(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("custkey"))
    open_orders = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    ue = relational.except_(relational.union_all(building, rich).distinct(), open_orders)
    both = relational.intersect(
        o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey")),
        open_orders,
    )
    return ue.withColumn("op", F.lit("union_except")).unionByName(
        both.withColumn("op", F.lit("intersect"))
    )


_ORACLE_SET_OPS = """
SELECT custkey, 'union_except' AS op FROM (
  (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
   UNION
   SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
)
UNION ALL
SELECT custkey, 'intersect' AS op FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
)
"""


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers who placed both 'F' and 'O' status orders."""
    o = load_table(spark, sf_dir, "orders")
    f_cust = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o_cust = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return relational.intersect(f_cust, o_cust)


_ORACLE_INTERSECT = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


# ---------------------------------------------------------------------------
# F: scalar-function parity (reference transform semantics)
# ---------------------------------------------------------------------------


def q_epoch_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F6/F1: epoch-seconds -> datetime/date strings, epoch kept as a
    string — the reference's createdTimestamp family (main.py:280-283).
    Epochs derived from o_orderdate so both engines see identical input."""
    o = load_table(spark, sf_dir, "orders")
    epoch = F.unix_timestamp("o_orderdate")
    return o.select(
        "o_orderkey",
        scalar.to_str(epoch).alias("created_ts_str"),
        scalar.seconds_to_readable(epoch).alias("created_datetime"),
        scalar.seconds_to_date_only(epoch).alias("created_date"),
    )


_ORACLE_EPOCH_DATES = """
SELECT o_orderkey,
       CAST(CAST(epoch(o_orderdate) AS BIGINT) AS VARCHAR) AS created_ts_str,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')          AS created_datetime,
       strftime(o_orderdate, '%Y-%m-%d')                   AS created_date
FROM orders
"""


def q_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4+F14: whitespace collapse + empty->NULL (main.py:116, 292),
    plus a substring truncate (F17, main.py:454)."""
    d = load_table(spark, sf_dir, "documents")
    cleaned = scalar.empty_to_null(scalar.collapse_whitespace(F.col("text")))
    return d.select(
        "doc_id",
        cleaned.alias("clean_text"),
        scalar.truncate(cleaned, 50).alias("subject_prefix"),
        F.length(cleaned).cast("long").alias("clean_len"),
    )


# RE2's \s is ASCII-only while the Spark side uses (?U)\s — the
# replace(chr(160)) pre-normalization keeps parity on NBSP (the common
# HTML-derived Unicode whitespace) for non-ASCII corpora; see
# functions/scalar.py collapse_whitespace for the full divergence note.
_ORACLE_CLEAN_TEXT = r"""
WITH n AS (
  SELECT doc_id, replace(text, chr(160), ' ') AS t FROM documents
)
SELECT doc_id,
       nullif(trim(regexp_replace(t, '\s+', ' ', 'g')), '')               AS clean_text,
       substring(nullif(trim(regexp_replace(t, '\s+', ' ', 'g')), ''), 1, 50) AS subject_prefix,
       CAST(length(nullif(trim(regexp_replace(t, '\s+', ' ', 'g')), '')) AS BIGINT) AS clean_len
FROM n
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 lenient JSON parse (main.py:215-222): extract props.k, aggregate."""
    ev = load_table(spark, sf_dir, "events")
    k = scalar.json_parse(F.col("props"), "k INT")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.count("k").alias("n_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


_ORACLE_JSON_EXTRACT = """
SELECT event_type,
       round(avg(k), 4) AS avg_k,
       count(k) AS n_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k FROM events)
GROUP BY event_type
"""


def q_bool_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12/F13 coercion-with-default + F11 empty-array->NULL shape:
    derive flags the way the reference coerced ticket fields
    (main.py:286, 301-308)."""
    ev = load_table(spark, sf_dir, "events")
    is_error = F.when(F.col("event_type") == "error", F.lit(True)).otherwise(F.lit(None).cast("boolean"))
    return ev.select(
        "event_id",
        scalar.bool_with_default(is_error, False).alias("is_error"),
        scalar.default_on_missing(F.col("value"), 0.0).alias("value_or_zero"),
        scalar.py_bool_str(scalar.bool_with_default(is_error, False)).alias("is_error_pystr"),
    )


_ORACLE_BOOL_DEFAULTS = """
SELECT event_id,
       coalesce(CASE WHEN event_type = 'error' THEN TRUE ELSE NULL END, FALSE) AS is_error,
       coalesce(value, 0.0) AS value_or_zero,
       CASE WHEN coalesce(CASE WHEN event_type = 'error' THEN TRUE ELSE NULL END, FALSE)
            THEN 'True' ELSE 'False' END AS is_error_pystr
FROM events
"""


# ---------------------------------------------------------------------------
# J1: MERGE/upsert — the reference's crown jewel
# ---------------------------------------------------------------------------


def _staged_orders(o: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Deterministic staging batch: every 7th order repriced (update arm),
    every 97th re-keyed +100M (insert arm). The reprice is an exact FP
    addition — a multiply would need a round(), and Spark/DuckDB disagree
    on half-boundary rounding of doubles."""
    updates = o.where(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(100.0)
    )
    inserts = o.where(F.col("o_orderkey") % 97 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(100000000)
    )
    return updates, inserts


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 MERGE rewrite (reference main.py:349-358): matched rows take
    all staging columns, unmatched are inserted (anti-join + union)."""
    o = load_table(spark, sf_dir, "orders")
    updates, inserts = _staged_orders(o)
    staging = updates.unionByName(inserts)
    return merge.upsert_anti_union(o, staging, "o_orderkey")


_ORACLE_MERGE_UPSERT = """
WITH updates AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 100.0 AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 7 = 0
), inserts AS (
  SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 = 0
), staging AS (
  SELECT * FROM updates UNION ALL SELECT * FROM inserts
)
SELECT o.* FROM orders o WHERE NOT EXISTS (SELECT 1 FROM staging s WHERE s.o_orderkey = o.o_orderkey)
UNION ALL
SELECT * FROM staging
"""


def q_merge_upsert_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 MERGE rewrite #2: full-outer + per-column coalesce. Same
    result as anti+union when staging has no NULLs (these staged rows
    don't), oracle-checked independently."""
    o = load_table(spark, sf_dir, "orders")
    updates, inserts = _staged_orders(o)
    staging = updates.unionByName(inserts)
    return merge.upsert_full_outer(o, staging, "o_orderkey")


def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7+F8 round trip: parse props, re-serialize via to_json with the
    empty->NULL rule (reference main.py:215-222, 309)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = scalar.json_parse(F.col("props"), "k INT")
    return ev.select(
        "event_id",
        scalar.json_serialize(parsed).alias("props_norm"),
    )


_ORACLE_JSON_ROUNDTRIP = """
SELECT event_id,
       CASE WHEN CAST(json_extract(props, '$.k') AS INT) IS NULL THEN NULL
            ELSE '{"k":' || CAST(json_extract(props, '$.k') AS INT) || '}'
       END AS props_norm
FROM events
"""


def q_merge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4: the reference's inserted/updated report (main.py:323-329)."""
    o = load_table(spark, sf_dir, "orders")
    updates, inserts = _staged_orders(o)
    staging = updates.unionByName(inserts)
    return merge.merge_counts(o, staging, "o_orderkey")


_ORACLE_MERGE_COUNTS = """
WITH staging AS (
  SELECT o_orderkey FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + 100000000 FROM orders WHERE o_orderkey % 97 = 0
)
SELECT count(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = s.o_orderkey)) AS inserted,
       count(*) FILTER (WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = s.o_orderkey))     AS updated
FROM staging s
"""


# ---------------------------------------------------------------------------
# X1/X2: dedup
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: exact content dedup via normalized sha2 fingerprint."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.dedup_by_content_hash(d, "text")


_ORACLE_DEDUP_EXACT = r"""
SELECT sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_fp,
       min(doc_id) AS keep_doc_id,
       count(*) AS dup_count
FROM documents GROUP BY 1
"""


# The exact trigram-Jaccard pair set over `documents` is consumed by
# three queries (jaccard_pairs, dedup_clusters, curation_pipeline).
# It is a session-scoped materialized view: computed once per
# (application, sf_dir) with the prefix-filter join, persisted as the
# sparse pair set (the heavyweight shingle cache is released inside
# jaccard_pairs_complete_materialized), and reused by every consumer —
# the same shape as materializing a shared intermediate table in a
# production pipeline instead of re-deriving it per report.
_PAIR_CACHE: dict[tuple[str, str], DataFrame] = {}


def shared_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    pairs = _PAIR_CACHE.get(key)
    if pairs is None:
        d = load_table(spark, sf_dir, "documents")
        pairs = dedup.jaccard_pairs_complete_materialized(
            d, "doc_id", "text", ngram=3, threshold=0.5
        )
        _PAIR_CACHE[key] = pairs
    return pairs


def clear_pair_cache() -> None:
    """Release every cached pair frame (tests / long-lived sessions)."""
    while _PAIR_CACHE:
        _, pairs = _PAIR_CACHE.popitem()
        pairs.unpersist()


# The BPE family (bpe_merges / bpe_segment / bpe_encode) consumes one
# shared trained tokenizer per session — the same production shape as
# the jaccard pair set above: train once, read many. Cached per
# (application, sf_dir); bench.py times the build as its own explicit
# line item (`bpe_train_materialize`) so per-query timings honestly
# measure the cached-read path they actually take.
_BPE_CACHE: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}


def shared_bpe_train(spark: SparkSession, sf_dir: str):
    """(merges, segmented) for the documents corpus, trained once per
    session and persisted (both frames are vocabulary-sized)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import bpe

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _BPE_CACHE.get(key)
    if cached is None:
        d = load_table(spark, sf_dir, "documents")
        merges, seg = bpe.bpe_train(d, "text", n_merges=6)
        merges = merges.persist()
        seg = seg.persist()
        merges.count()
        seg.count()
        _BPE_CACHE[key] = cached = (merges, seg)
    return cached


def clear_bpe_cache() -> None:
    """Release every cached trained tokenizer."""
    while _BPE_CACHE:
        _, (merges, seg) = _BPE_CACHE.popitem()
        merges.unpersist()
        seg.unpersist()


# The streaming queries read `events` through a file-stream source,
# which needs a staging directory copy — pure test scaffolding (in
# production the stream tails the table's own directory). Cached per
# (application, sf_dir) so the four plain-copy streaming queries pay
# the copy once and their timings measure the STREAM, not the setup
# write.
_STREAM_SRC_CACHE: dict[tuple[str, str, str], str] = {}


def _events_stream_src(spark: SparkSession, sf_dir: str, table: str = "events"):
    """(path, schema) of the session-cached staging copy of ``table``."""
    import tempfile

    df = load_table(spark, sf_dir, table)
    key = (spark.sparkContext.applicationId, sf_dir, table)
    path = _STREAM_SRC_CACHE.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix=f"{table}_stream_src_")
        df.write.mode("overwrite").parquet(path)
        _STREAM_SRC_CACHE[key] = path
    return path, df.schema


def clear_stream_src_cache() -> None:
    """Delete and forget cached staging copies (bench uses this so the
    copy cost is measured explicitly; also registered atexit so
    repeated sessions don't accumulate parquet copies in /tmp)."""
    import shutil

    while _STREAM_SRC_CACHE:
        _, path = _STREAM_SRC_CACHE.popitem()
        shutil.rmtree(path, ignore_errors=True)


atexit.register(clear_stream_src_cache)


# Every other query fixture that needs a scratch directory (CSV/ORC
# round-trips, partition-prune staging, per-query stream sources and
# checkpoints) allocates it here: one registry, removed atexit, so a
# repeated verify+bench session leaves /tmp flat.
_SCRATCH_DIRS: list[str] = []


def _scratch_dir(prefix: str) -> str:
    import tempfile

    path = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH_DIRS.append(path)
    return path


def clear_scratch_dirs() -> None:
    import shutil

    while _SCRATCH_DIRS:
        shutil.rmtree(_SCRATCH_DIRS.pop(), ignore_errors=True)


atexit.register(clear_scratch_dirs)


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2c: ALL trigram-shingle Jaccard near-dup pairs at threshold 0.5
    — exact and complete via prefix filtering (rarity-ordered prefix
    shingles as the join key; recall-complete by the prefix-filter
    theorem). The oracle is blocking-free brute force, so this query
    pins the scale path's EXACTNESS, not just its candidates. The
    shuffle key is a rare shingle (cardinality grows with the corpus)
    — no broadcast, no hot first-token bucket. Same shingling +
    threshold as q_minhash_pairs, so this is also minhash's exact
    recall anchor. Pair generation is the shared materialized
    intermediate (shared_jaccard_pairs), paid once per session across
    this query, dedup_clusters, and curation_pipeline."""
    return shared_jaccard_pairs(spark, sf_dir).withColumn(
        "jaccard_sim", F.round("jaccard_sim", 6)
    )


# Trigram shingle set per doc; docs under 3 tokens use their whole
# normalized text as the single shingle (matching dedup.shingle_hashes).
_SQL_TRIGRAM_BASE = r"""
  SELECT doc_id AS _id,
         CASE WHEN len(w) < 3 THEN [norm]
              ELSE list_distinct(list_transform(range(1, len(w) - 1),
                                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         END AS sh
  FROM (SELECT doc_id,
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
               string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
        FROM {src})
"""

_ORACLE_JACCARD_PAIRS = (
    "WITH base AS (" + _SQL_TRIGRAM_BASE.format(src="documents") + r""")
SELECT l._id AS id_a, r._id AS id_b,
       round(CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE) /
             CAST(len(list_distinct(list_concat(l.sh, r.sh))) AS DOUBLE), 6) AS jaccard_sim
FROM base l JOIN base r ON l._id < r._id
WHERE CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE) /
      CAST(len(list_distinct(list_concat(l.sh, r.sh))) AS DOUBLE) >= 0.5
"""
)


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2g incremental ingestion screen, ORACLE-CHECKED: an incoming
    batch (doc_id % 10 == 0) is deduplicated AGAINST the existing
    corpus (the rest) — exact content-fingerprint membership plus
    complete cross-side trigram-Jaccard stats with a deterministic
    best-match ranking (operators/dedup.py incremental_dedup_report).
    The content-level analogue of the reference's new-vs-existing key
    sync, and the shape ingestion needs at 100 TB: dedup the delta,
    not the corpus. Oracle replays exact membership on normalized
    STRINGS and the pair stats by brute-force cross Jaccard."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import dedup

    d = load_table(spark, sf_dir, "documents")
    new = d.where(F.col("doc_id") % 10 == 0)
    corpus = d.where(F.col("doc_id") % 10 != 0)
    return dedup.incremental_dedup_report(new, corpus, "doc_id", "text")


def q_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X20 persisted-corpus-state tier of the incremental screen: the
    corpus's fingerprints, shingle base, and hash-order prefix table
    are built ONCE (operators/dedup_state.py build_dedup_state) and
    the batch is screened against the held state — the steady-state
    ingest shape where the 100 TB side is never recomputed per batch.
    The hash-order prefix filter is complete, so the report is
    bit-identical to q_incremental_dedup and the SAME oracle replays
    it (parity also pinned in test_dedup_state)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import dedup_state

    d = load_table(spark, sf_dir, "documents")
    new = d.where(F.col("doc_id") % 10 == 0)
    corpus = d.where(F.col("doc_id") % 10 != 0)
    state = dedup_state.build_dedup_state(corpus, "doc_id", "text")
    return dedup_state.screen_against_state(new, state)


_ORACLE_INCREMENTAL_DEDUP = (
    "WITH basen AS ("
    + _SQL_TRIGRAM_BASE.format(src="(SELECT * FROM documents WHERE doc_id % 10 = 0)")
    + "), basec AS ("
    + _SQL_TRIGRAM_BASE.format(src="(SELECT * FROM documents WHERE doc_id % 10 != 0)")
    + r""")
, pairs AS (
  SELECT n._id AS nid, c._id AS cid,
         round(CAST(len(list_intersect(n.sh, c.sh)) AS DOUBLE) /
               CAST(len(list_distinct(list_concat(n.sh, c.sh))) AS DOUBLE), 6) AS j
  FROM basen n JOIN basec c
    ON CAST(len(list_intersect(n.sh, c.sh)) AS DOUBLE) /
       CAST(len(list_distinct(list_concat(n.sh, c.sh))) AS DOUBLE) >= 0.5
), best AS (
  SELECT nid, cid, j,
         row_number() OVER (PARTITION BY nid ORDER BY j DESC, cid ASC) AS rn
  FROM pairs
), cnt AS (
  SELECT nid, count(*) AS n_near_dups FROM pairs GROUP BY nid
), cfp AS (
  SELECT DISTINCT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nm
  FROM documents WHERE doc_id % 10 != 0
)
SELECT d.doc_id,
       trim(regexp_replace(lower(d.text), '\s+', ' ', 'g')) IN (SELECT nm FROM cfp) AS exact_dup,
       coalesce(cnt.n_near_dups, 0) AS n_near_dups,
       b.cid AS best_match_id,
       b.j AS best_jaccard
FROM documents d
LEFT JOIN cnt ON cnt.nid = d.doc_id
LEFT JOIN (SELECT nid, cid, j FROM best WHERE rn = 1) b ON b.nid = d.doc_id
WHERE d.doc_id % 10 = 0
"""
)


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2a: MinHash+LSH near-dup candidates, Jaccard-verified.
    No SQL oracle (signature permutations aren't SQL-expressible);
    driver records rows-only. Verified in pytest against brute force."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_pairs_df(d)


def minhash_pairs_df(d: DataFrame) -> DataFrame:
    # Default shuffle pair-join on (band, band_hash) buckets — the 100 TB
    # shape. broadcast_right stays available as a small-corpus opt-in but
    # is never hardcoded in the query corpus.
    return dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_hashes=32, bands=8, ngram=3,
        jaccard_threshold=0.5,
    )


def q_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2b: SimHash collision groups (rows-only check)."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.dedup_simhash(d, "doc_id", "text")


def q_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2b: ALL pairs within SimHash Hamming distance <= 3 via the
    pigeonhole band join (recall-complete by construction; rows-only —
    the 64-bit sign-sum fingerprint isn't SQL-expressible — completeness
    vs brute-force XOR popcount pinned in test_dedup)."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.simhash_near_pairs(d, "doc_id", "text", k=3)


# ---------------------------------------------------------------------------
# X3/X4: similarity search
# ---------------------------------------------------------------------------


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: brute-force cosine top-10 for 5 query vectors (exact baseline).
    Both engines do double-precision sequential dot products; scores
    rounded to 6dp."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity.brute_force_topk(e, queries, k=10)
    return out.select(
        "query_id",
        "vec_id",
        F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("long").alias("rank"),
    )


_ORACLE_COSINE_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, c.vec_id,
         list_dot_product(c.embedding::DOUBLE[], q.qv) /
         (sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])) *
          sqrt(list_dot_product(q.qv, q.qv))) AS cos
  FROM embeddings c CROSS JOIN q
), ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, round(cos, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
"""


def q_cosine_topk_np(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 vectorized path: identical semantics to cosine_topk but scored
    via Arrow->numpy BLAS with map-side partial top-k (the 100 TB scoring
    shape). Shares cosine_topk's oracle."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity.brute_force_topk_np(e, queries, k=10)
    return out.select(
        "query_id",
        "vec_id",
        F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2e: embedding-cosine near-dup pairs via SRP-LSH (approximate;
    rows-only check — recall verified against brute force in pytest).
    The synthetic embeddings are near-orthogonal random vectors (max
    pairwise cosine ~0.48), so the 'near-dup' threshold here is 0.35 to
    produce a non-empty, checkable result; production dedup would use
    ~0.95."""
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup_pairs(e, threshold=0.35, dim=64)


def q_embedding_dups_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2e correctness anchor, ORACLE-CHECKED: ALL exact pairwise
    cosine near-dup pairs (id_a < id_b, cos >= 0.35), BLAS-blocked —
    each Arrow batch computes its (batch x corpus) similarity block in
    one float64 matmul and emits only above-threshold pairs (r6: was a
    broadcast nested-loop self-join with per-pair interpreted folds,
    80 s at sf0.1; now ~1 s, and the gap grows quadratically).
    Quadratic compute by construction — this is the ground truth the
    LSH variant (embedding_dups) trades recall against; at 100 TB it
    runs on samples to measure LSH/IVF recall. The threshold filter
    runs on the unrounded score; the rounded score is the output
    (DuckDB list_cosine_similarity on DOUBLE[] agrees to well past 4
    decimals)."""
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.exact_near_dup_pairs_np(e, threshold=0.35)


_ORACLE_EMBEDDING_DUPS_EXACT = """
SELECT id_a, id_b, round(cos, 4) AS cos_sim
FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
WHERE cos >= 0.35
"""


def _ann_with_recall(
    approx: DataFrame, e: DataFrame, queries: DataFrame, k: int
) -> DataFrame:
    """Attach per-query ``recall_vs_exact`` to an ANN result by joining
    against the brute-force top-k computed in the same plan — the
    rows-only driver record then pins result QUALITY, not just row
    count. Cost: one extra exact scoring pass (same O(corpus) shape as
    the ANN re-rank; query count is small by construction)."""
    exact = similarity.brute_force_topk(e, queries, k=k)
    hits = approx.alias("a").join(
        exact.select(
            F.col("query_id").alias("_eq"), F.col("vec_id").alias("_ev")
        ),
        (F.col("a.query_id") == F.col("_eq")) & (F.col("a.vec_id") == F.col("_ev")),
        "left",
    )
    rec = hits.groupBy(F.col("a.query_id").alias("query_id")).agg(
        F.round(F.count("_ev") / F.lit(k), 4).alias("recall_vs_exact")
    )
    return approx.join(rec, "query_id")


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 scale path: SRP-LSH bucketed ANN top-k (approximate; the
    rows-only record carries a self-certifying per-query
    recall_vs_exact column, asserted >= threshold in pytest)."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    approx = similarity.lsh_topk(e, queries, k=10, dim=64, num_planes=16, bands=8)
    return _ann_with_recall(approx, e, queries, k=10)


def q_incremental_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2e/X20 composition, ORACLE-CHECKED: incremental embedding-side
    dedup — an incoming batch (vec_id % 10 == 0) screened against the
    existing corpus (the rest) for cosine >= 0.35 pairs, BLAS-blocked
    with the corpus matrix shipped once and only the delta streamed
    (operators/similarity.py cross_near_dup_pairs_np). The embedding
    counterpart of incremental_dedup."""
    e = load_table(spark, sf_dir, "embeddings")
    new = e.where(F.col("vec_id") % 10 == 0)
    corpus = e.where(F.col("vec_id") % 10 != 0)
    return similarity.cross_near_dup_pairs_np(new, corpus, threshold=0.35)


_ORACLE_INCREMENTAL_EMBEDDING_DUPS = """
SELECT id_new, id_corpus, round(cos, 4) AS cos_sim
FROM (
  SELECT n.vec_id AS id_new, c.vec_id AS id_corpus,
         list_cosine_similarity(CAST(n.embedding AS DOUBLE[]),
                                CAST(c.embedding AS DOUBLE[])) AS cos
  FROM (SELECT * FROM embeddings WHERE vec_id % 10 = 0) n
  CROSS JOIN (SELECT * FROM embeddings WHERE vec_id % 10 != 0) c
)
WHERE cos >= 0.35
"""


def q_incremental_embedding_dups_banded(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X20b scale tier (r7): the SRP-banded (new ⋈ corpus) screen —
    the corpus never leaves the cluster (broadcast-delta candidate
    join, exact BLAS verify per bucket), the shape that survives when
    the corpus matrix no longer fits a driver (similarity.py
    cross_near_dup_pairs_banded). Approximate by the LSH contract, so
    rows-only — but self-certifying: every row carries
    ``recall_vs_exact`` (banded pairs are a verified SUBSET of the
    exact twin's pairs, so recall = n_banded/n_exact, computed
    in-plan from the oracle-checked exact path), and subset+recall are
    pinned in test_similarity."""
    e = load_table(spark, sf_dir, "embeddings")
    new = e.where(F.col("vec_id") % 10 == 0)
    corpus = e.where(F.col("vec_id") % 10 != 0)
    banded = similarity.cross_near_dup_pairs_banded(
        new, corpus, threshold=0.35, dim=64, num_planes=16, bands=8
    )
    exact_n = similarity.cross_near_dup_pairs_np(
        new, corpus, threshold=0.35
    ).agg(F.count("*").alias("_n_exact"))
    stats = banded.agg(F.count("*").alias("_n_banded")).crossJoin(
        F.broadcast(exact_n)
    )
    return banded.crossJoin(F.broadcast(stats)).select(
        "id_new",
        "id_corpus",
        "cos_sim",
        F.round(F.col("_n_banded") / F.greatest("_n_exact", F.lit(1)), 4).alias(
            "recall_vs_exact"
        ),
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2e endgame, ORACLE-CHECKED: SemDeDup-style semantic
    deduplication — embedding near-dup pairs (exact BLAS all-pairs at
    cos >= 0.35) chained into connected components with a
    keep-smallest-id representative per cluster, so transitively
    similar groups A~B~C collapse to one kept document. The exact
    variant runs on samples at 100 TB with the SRP-banded pair
    generator substituting for the all-pairs step (identical
    downstream plan); the oracle replays pairs + transitive closure
    recursively (operators/similarity.py exact_near_dup_pairs_np +
    operators/dedup.py connected components)."""
    e = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.exact_near_dup_pairs_np(e, threshold=0.35).select(
        "id_a", "id_b"
    )
    clusters = dedup.dedup_clusters(pairs)
    return clusters.select(
        "keep_id",
        "n_members",
        F.concat_ws(",", F.col("members")).alias("members"),
    ).orderBy("keep_id")


_ORACLE_SEMANTIC_DEDUP = """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.35
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
), reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
), labels AS (
  SELECT a AS node, least(a, min(b)) AS component
  FROM reach GROUP BY a
)
SELECT component AS keep_id,
       count(*) AS n_members,
       array_to_string(list_sort(list(node)), ',') AS members
FROM labels
GROUP BY component
ORDER BY keep_id
"""


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 scale path #2: IVF ANN top-k — k-means coarse quantizer,
    probe-nearest-centroid candidates, exact re-rank (approximate;
    rows-only record carries per-query recall_vs_exact; full-probe ==
    exact and partial-probe recall are pinned in pytest)."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    approx = similarity.ivf_topk(e, queries, k=10, n_centroids=16, n_probe=6)
    return _ann_with_recall(approx, e, queries, k=10)


def q_ivf_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: IVF at ``n_probe == n_centroids`` probes every inverted list,
    so the candidate set is the whole corpus and the exact re-rank makes
    the result provably identical to brute force (similarity.ivf_topk
    docstring; equality pinned in test_similarity). This gives the IVF
    family an ORACLE-CHECKED driver row — the same _ORACLE_COSINE_TOPK
    as the exact scorers — while the partial-probe variant stays
    recall-certified rows-only."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity.ivf_topk(e, queries, k=10, n_centroids=16, n_probe=16)
    return out.select(
        "query_id",
        "vec_id",
        F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("long").alias("rank"),
    )


# The ANN family's held index (r10): built once per session like the
# jaccard pair set / trained tokenizer — the production shape (index
# built and materialized once, queried many times). bench.py times the
# build as its own explicit line item (`ann_index_materialize`) so the
# *_prebuilt queries honestly measure the steady-state probe path.
_ANN_INDEX_CACHE: dict[tuple[str, str], object] = {}


def shared_ann_index(spark: SparkSession, sf_dir: str):
    """The session's held AnnIndex over the embeddings corpus (params
    chosen to match the rebuild queries: 16 planes / 8 bands / 16
    centroids), assignment materialized."""
    key = (spark.sparkContext.applicationId, sf_dir)
    idx = _ANN_INDEX_CACHE.get(key)
    if idx is None:
        e = load_table(spark, sf_dir, "embeddings")
        idx = similarity.build_ann_index(
            e, dim=64, n_centroids=16, num_planes=16, bands=8
        )
        idx.assigned.count()  # materialize the persisted assignment
        _ANN_INDEX_CACHE[key] = idx
    return idx


def clear_ann_index_cache() -> None:
    """Release every cached ANN index."""
    while _ANN_INDEX_CACHE:
        _, idx = _ANN_INDEX_CACHE.popitem()
        idx.assigned.unpersist()


# The PQ family's held index (r17 — the r16 verdict's ivfpq audit):
# four queries (pq_topk, ivfpq_topk, pq_full_rerank, ivfpq_full_probe)
# each re-trained the IDENTICAL codebooks (deterministic seeded sample,
# driver k-means x8 subspaces) and re-encoded the corpus per call.
# Like the AnnIndex/pair-set/tokenizer, the build is now once per
# session and priced as its own bench line item
# (`pq_index_materialize`), so the query entries honestly measure the
# steady-state ADC probe path a serving deployment runs. Results are
# unchanged: the build is deterministic, so the shared index equals
# each query's private rebuild bit-for-bit (pinned in test_pq).
_PQ_INDEX_CACHE: dict[tuple[str, str], object] = {}


def shared_pq_index(spark: SparkSession, sf_dir: str):
    """The session's held PqIndex over the embeddings corpus (the
    params every PQ query uses: dim=64, m=8, ksub=256), codes
    materialized."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import pq

    key = (spark.sparkContext.applicationId, sf_dir)
    idx = _PQ_INDEX_CACHE.get(key)
    if idx is None:
        e = load_table(spark, sf_dir, "embeddings")
        idx = pq.build_pq_index(e, dim=64, m=8, ksub=256)
        idx.codes.count()  # materialize the persisted code table
        _PQ_INDEX_CACHE[key] = idx
    return idx


def clear_pq_index_cache() -> None:
    """Release every cached PQ index."""
    while _PQ_INDEX_CACHE:
        _, idx = _PQ_INDEX_CACHE.popitem()
        idx.codes.unpersist()


def q_ivf_topk_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 steady-state tier (r10): IVF top-k against the session's HELD
    AnnIndex — no quantizer train, no assignment pass; the probe joins
    the stored bucket column directly. Rows-only like its rebuild twin
    (approximate by construction), self-certifying recall column, and
    pinned result-identical to the rebuild path + a loaded index copy
    in test_ann_index (operators/similarity.py build_ann_index /
    ivf_topk(index=))."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    idx = shared_ann_index(spark, sf_dir)
    approx = similarity.ivf_topk(e, queries, k=10, n_probe=6, index=idx)
    return _ann_with_recall(approx, e, queries, k=10)


def q_lsh_topk_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 steady-state tier (r10), LSH side: band-slices the index's
    STORED signatures (JVM-side slice+hash — the corpus projection
    pass is gone); only the 5 query vectors are signatured fresh.
    Rows-only + recall column like the rebuild twin; result equality
    pinned in test_ann_index (operators/similarity.py
    lsh_topk(index=))."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    idx = shared_ann_index(spark, sf_dir)
    approx = similarity.lsh_topk(e, queries, k=10, index=idx)
    return _ann_with_recall(approx, e, queries, k=10)


def q_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8b semantic decontamination, ORACLE-CHECKED: the embedding-side
    twin of the n-gram decontaminate screen — train-set vectors whose
    cosine against ANY eval-set vector reaches the threshold are
    flagged (paraphrased eval leakage that exact n-gram overlap
    misses; the screen modern pipelines run next to the lexical one).
    Eval side is 5% of the corpus (the bounded side — screened via the
    BLAS cross-pair scorer with the eval matrix shipped once, the
    train side streamed through Arrow batches, never shuffled); output
    is every train vector with its contamination flag. At 100 TB the
    SRP-banded cross screen (X20d) substitutes for the pair step with
    the identical downstream plan (operators/similarity.py
    cross_near_dup_pairs_np)."""
    e = load_table(spark, sf_dir, "embeddings")
    eval_set = e.where(F.col("vec_id") % 20 == 0)
    train = e.where(F.col("vec_id") % 20 != 0)
    # sides matter: the EVAL set is the bounded `corpus` argument
    # (collected + shipped once), the unbounded train side streams as
    # `new` — swapped sides would collect the train corpus driver-side
    # (caught by the r10 review; flags are symmetric, the plan is not)
    pairs = similarity.cross_near_dup_pairs_np(train, eval_set, threshold=0.3)
    contaminated = pairs.select(
        F.col("id_new").alias("vec_id")
    ).dropDuplicates(["vec_id"])
    return (
        train.select("vec_id")
        .join(
            F.broadcast(contaminated.withColumn("_c", F.lit(True))),
            "vec_id",
            "left",
        )
        .select(
            "vec_id", F.coalesce(F.col("_c"), F.lit(False)).alias("contaminated")
        )
        .orderBy("vec_id")
    )


_ORACLE_SEMANTIC_DECONTAM = """
SELECT t.vec_id,
       EXISTS (
         SELECT 1 FROM embeddings ev
         WHERE ev.vec_id % 20 = 0
           AND list_cosine_similarity(CAST(t.embedding AS DOUBLE[]),
                                      CAST(ev.embedding AS DOUBLE[])) >= 0.3
       ) AS contaminated
FROM embeddings t
WHERE t.vec_id % 20 != 0
ORDER BY t.vec_id
"""


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 MEMORY tier (r10): product-quantized top-k — the corpus
    scanned as 8 one-byte codes per vector (32x fewer bytes than raw
    float32) with ADC lookup-table scoring per Arrow batch, map-side
    partial top-k, and an exact re-rank of the 50 survivors per query
    so every returned score is the true cosine. Rows-only like its
    LSH/IVF siblings (float k-means codebooks are not SQL-expressible)
    with the family's self-certifying recall column; the exactness
    anchor (ksub >= corpus => EQUAL to brute force), score precision,
    absorb/save/load, and the byte-narrow code contract are pinned in
    test_pq (operators/pq.py)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import pq

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    idx = shared_pq_index(spark, sf_dir)
    approx = pq.pq_topk(e, queries, idx, k=10, rerank=50)
    return _ann_with_recall(approx, e, queries, k=10)


def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 IVF-PQ (r10): the two held states composed — the session's
    AnnIndex prunes to 4 probed buckets per query (broadcast join on
    the stored bucket column), the PQ code table scores only those
    candidates via byte-code lookups, exact re-rank returns true
    cosines. Both the scan-pruning and bytes-per-row multipliers apply:
    the FAISS-style billion-scale recipe as a pure DataFrame plan.
    Rows-only + recall column like the family; the double anchor (full
    probe + exact codebooks == brute force) is pinned in test_pq
    (operators/pq.py ivfpq_topk)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import pq

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    ann = shared_ann_index(spark, sf_dir)
    pidx = shared_pq_index(spark, sf_dir)
    approx = pq.ivfpq_topk(e, queries, ann, pidx, k=10, n_probe=6, rerank=50)
    return _ann_with_recall(approx, e, queries, k=10)


# -- r14 (verdict #6): ORACLE-REPLAYABLE configurations of the held-ANN
# family. The approximate variants above stay rows-only (seeded floats
# by nature), but each family has a setting where its result is
# PROVABLY equal to exact brute force — the ivf_full_probe precedent —
# so the machinery (held index probe joins, PQ byte-code ADC scan,
# exact re-rank) earns driver-attestable rows under the same
# _ORACLE_COSINE_TOPK as the exact scorers, retiring three entries from
# the weakest evidence tier.


def q_ivf_prebuilt_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 steady-state tier, ORACLE-CHECKED: top-k through the
    session's HELD AnnIndex at ``n_probe == n_centroids`` — every
    inverted list is probed, so the candidate set is the whole corpus
    and the exact re-rank makes the result identical to brute force
    (the q_ivf_full_probe anchor, now exercised through the PREBUILT
    index path: stored bucket column, no quantizer train, no
    assignment pass — what a serving deployment actually runs)."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    idx = shared_ann_index(spark, sf_dir)
    out = similarity.ivf_topk(e, queries, k=10, n_probe=16, index=idx)
    return out.select(
        "query_id",
        "vec_id",
        F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_pq_full_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 memory tier, ORACLE-CHECKED: the PQ searcher with
    ``rerank >= |corpus|`` — the ADC byte-code scan still runs (codes
    decoded, per-batch lookup-table scoring, map-side partial top-k),
    but every candidate survives to the exact re-rank, so the returned
    top-k equals brute force REGARDLESS of codebook quality (the
    test_pq exactness anchor as a driver row; the production
    rerank=50 configuration stays rows-only with its recall
    column)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import pq

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    idx = shared_pq_index(spark, sf_dir)
    out = pq.pq_topk(e, queries, idx, k=10, rerank=1 << 30)
    return out.select(
        "query_id",
        "vec_id",
        F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_ivfpq_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 IVF-PQ, ORACLE-CHECKED: the composed billion-scale recipe at
    its double exactness anchor — full probe (every bucket's code list
    scanned) and full re-rank (every scanned candidate exactly
    scored), so the two pruning dials are wide open and the result
    must equal brute force. One driver row certifying the ENTIRE
    compose-probe-score-rerank pipeline; the pruned configuration
    stays rows-only with recall."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import pq

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    ann = shared_ann_index(spark, sf_dir)
    pidx = shared_pq_index(spark, sf_dir)
    out = pq.ivfpq_topk(
        e, queries, ann, pidx, k=10, n_probe=16, rerank=1 << 30
    )
    return out.select(
        "query_id",
        "vec_id",
        F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_streaming_ann_absorb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4c ANN index maintained ON INGEST, ORACLE-CHECKED: held index
    built from 90% of the corpus, the remaining vectors arrive as 4
    micro-batches and each batch is absorbed under the frozen model
    (assign+sign against the existing centroids/planes, lineage cut per
    batch — the foreachBatch pattern every held state in this engine
    uses). Because bucket membership is a pure function of the model,
    FULL-PROBE top-k over the streamed end-state must equal exact brute
    force over the WHOLE corpus — so the exact-cosine oracle replays the
    streamed result cell-for-cell, batching and arrival order
    notwithstanding (operators/similarity.py absorb_ann_index)."""
    from dataclasses import replace as dc_replace

    from data_pipeline_bigquery_to_sftp_server_spark.cache import CheckpointChain
    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    e = load_table(spark, sf_dir, "embeddings")
    held = e.where(F.col("vec_id") % 10 != 0)
    arriving = e.where(F.col("vec_id") % 10 == 0)
    src = _scratch_dir("ann_stream_src_")
    ckpt = _scratch_dir("ann_stream_ckpt_")
    arriving.repartition(4, "vec_id").write.mode("overwrite").parquet(src)

    chain = CheckpointChain()  # lineage cut + previous-batch block release
    idx0 = similarity.build_ann_index(
        held, dim=64, n_centroids=16, num_planes=16, bands=8, persist=False
    )
    state = {
        "idx": dc_replace(idx0, assigned=chain.step(idx0.assigned)),
        "epochs": set(),
    }

    def absorb(batch_df: DataFrame, epoch_id: int) -> None:
        # the absorb APPENDS assigned rows — NOT replay-idempotent, so an
        # at-least-once redelivery would duplicate code rows; gate on
        # epoch_id (the q_streaming_ivm pattern, mandatory per ivm.py)
        if epoch_id in state["epochs"]:
            return
        state["epochs"].add(epoch_id)
        grown = similarity.absorb_ann_index(
            state["idx"], batch_df, persist=False
        )
        state["idx"] = dc_replace(grown, assigned=chain.step(grown.assigned))

    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = W.streaming_upsert(stream, absorb, ckpt)
    q.processAllAvailable()
    q.stop()
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity.ivf_topk(e, queries, k=10, n_probe=16, index=state["idx"])
    return out.select(
        "query_id",
        "vec_id",
        F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("long").alias("rank"),
    )


# ---------------------------------------------------------------------------
# X5: text analysis
# ---------------------------------------------------------------------------


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 sliding-window chunking: split each document into 32-token
    chunks with stride 24 (8-token overlap) — the standard long-document
    preprocessing for a fixed context length. Pure map-side: tokenize ->
    sequence of window starts -> posexplode -> slice + rejoin; no
    shuffle, no UDF, scales as a projection. Short docs yield exactly
    one (possibly sub-window) chunk."""
    size, stride = 32, 24
    d = load_table(spark, sf_dir, "documents")
    toks = text.tokenize(F.col("text"))
    n = F.size(toks)
    # window starts: 0, stride, 2*stride, ... while start < n (at least
    # one chunk even for empty-ish docs); last window may be short.
    n_chunks = F.greatest(
        F.ceil((n - F.lit(size)) / F.lit(stride)) + 1, F.lit(1)
    ).cast("int")
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    return (
        d.select("doc_id", toks.alias("_t"), F.posexplode(starts))
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("chunk_idx"),
            F.concat_ws(
                " ", F.slice("_t", F.col("col") + 1, size)
            ).alias("chunk"),
            F.least(F.size("_t") - F.col("col"), F.lit(size))
            .cast("long")
            .alias("chunk_tokens"),
        )
    )


_ORACLE_CHUNK_DOCUMENTS = r"""
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), n AS (
  SELECT doc_id, w, len(w) AS nt,
         greatest(CAST(ceil((len(w) - 32) / 24.0) AS INT) + 1, 1) AS nc
  FROM t
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       array_to_string(list_slice(w, i * 24 + 1, i * 24 + 32), ' ') AS chunk,
       CAST(least(nt - i * 24, 32) AS BIGINT) AS chunk_tokens
FROM n, unnest(range(0, nc)) AS u(i)
"""


def q_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: corpus token frequencies, top 100."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(text.tokenize(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(100)
    )


_ORACLE_TOKEN_TOPK = r"""
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
      FROM documents)
GROUP BY token ORDER BY n DESC, token LIMIT 100
"""


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: per-document stats — token count, char count, punctuation
    ratio, mean word length (identical closed-form on both engines)."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    n_tok = F.size(F.split(norm, " ")).cast("long")
    n_char = F.length(F.col("text")).cast("long")
    punct = (F.length(F.col("text")) - F.length(F.regexp_replace(F.col("text"), r"[^\w\s]", ""))).cast("double")
    mwl = (F.length(norm) - (n_tok - 1)).cast("double") / n_tok.cast("double")
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_char.alias("n_chars_actual"),
        F.round(punct / n_char.cast("double"), 6).alias("punct_ratio"),
        F.round(mwl, 6).alias("mean_word_len"),
    )


_ORACLE_TEXT_STATS = r"""
WITH t AS (
  SELECT doc_id, text, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id,
       CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_actual,
       round(CAST(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS DOUBLE)
             / CAST(length(text) AS DOUBLE), 6) AS punct_ratio,
       round(CAST(length(norm) - (len(string_split(norm, ' ')) - 1) AS DOUBLE)
             / CAST(len(string_split(norm, ' ')) AS DOUBLE), 6) AS mean_word_len
FROM t
"""


def q_lang_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 language-ID building block: per-language marker-token hit
    counts (occurrence-counting, duplicates included)."""
    d = load_table(spark, sf_dir, "documents")
    toks = text.tokenize(F.col("text"))
    markers = {
        "en_hits": ["the", "and", "of", "to", "is"],
        "es_hits": ["el", "la", "de", "que", "los"],
        "de_hits": ["der", "die", "und", "das", "ist"],
        "fr_hits": ["le", "la", "les", "est", "une"],
    }
    cols = [
        F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long").alias(name)
        for name, words in markers.items()
    ]
    return d.select("doc_id", "lang", *cols)


_ORACLE_LANG_MARKERS = r"""
WITH t AS (
  SELECT doc_id, lang,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
)
SELECT doc_id, lang,
       CAST(len(list_filter(toks, t -> t IN ('the','and','of','to','is')))   AS BIGINT) AS en_hits,
       CAST(len(list_filter(toks, t -> t IN ('el','la','de','que','los')))   AS BIGINT) AS es_hits,
       CAST(len(list_filter(toks, t -> t IN ('der','die','und','das','ist'))) AS BIGINT) AS de_hits,
       CAST(len(list_filter(toks, t -> t IN ('le','la','les','est','une')))  AS BIGINT) AS fr_hits
FROM t
"""


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 quality gate: docs passing simple Gopher-ish rules (token count
    in range, mean word length in range), with the scoring columns."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    n_tok = F.size(F.split(norm, " ")).cast("long")
    mwl = (F.length(norm) - (n_tok - 1)).cast("double") / n_tok.cast("double")
    return (
        d.select("doc_id", "lang", n_tok.alias("n_tokens"), F.round(mwl, 6).alias("mean_word_len"))
        .where((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 500))
        .where((F.col("mean_word_len") >= 2.0) & (F.col("mean_word_len") <= 10.0))
    )


_ORACLE_QUALITY_FILTER = r"""
WITH t AS (
  SELECT doc_id, lang, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM documents
), s AS (
  SELECT doc_id, lang,
         CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens,
         round(CAST(length(norm) - (len(string_split(norm, ' ')) - 1) AS DOUBLE)
               / CAST(len(string_split(norm, ' ')) AS DOUBLE), 6) AS mean_word_len
  FROM t
)
SELECT * FROM s
WHERE n_tokens BETWEEN 10 AND 500 AND mean_word_len BETWEEN 2.0 AND 10.0
"""


# ---------------------------------------------------------------------------
# Sessionization & time windows over events (batch forms of X7)
# ---------------------------------------------------------------------------


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a session break is a >30-minute gap
    (lag + running-sum window pattern)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_sess = F.when(
        prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.withColumn("new_sess", new_sess).withColumn(
        "sess_id", F.sum("new_sess").over(run)
    )
    return sess.groupBy("user_id").agg(
        F.max("sess_id").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


_ORACLE_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM g
)
SELECT user_id, CAST(max(sess_id) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM s GROUP BY user_id
"""


def q_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window agg, batch form (hypertable-style time rollup).
    Window start formatted to string on both sides (DuckDB reads the
    events table at ns precision; Spark at µs)."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
    return (
        ev.groupBy(hour.alias("hour_start"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


_ORACLE_HOURLY_ROLLUP = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type, count(*) AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2
"""


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: quantity by returnflag × linestatus as columns."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


_ORACLE_PIVOT = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS "O",
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS "F"
FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# TPC-H shapes beyond Q1 (J*/A*/O* composition benchmarks)
# ---------------------------------------------------------------------------


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: two-fact join + filter + grouped agg + top-10."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    return (
        li.where(F.col("l_shipdate") > cutoff)
        .join(o.where(F.col("o_orderdate") < cutoff), li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(c.where(F.col("c_mktsegment") == "BUILDING")),
            o.o_custkey == c.c_custkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


_ORACLE_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate (pushdown showcase —
    every predicate reaches the parquet reader)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


_ORACLE_FORECAST_REVENUE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS through the SQL front door (spark.sql is co-equal
    with the DataFrame API; SURVEY §3 E2)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


_ORACLE_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 full window surface in one query: rank, dense_rank, ntile,
    lead, first over a per-segment price ordering, plus a value-based
    RANGE frame (acctbal within 1000 below the current row) — peers
    aggregate identically regardless of tie order, keeping the hash
    deterministic."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    wr = (
        Window.partitionBy("c_mktsegment")
        .orderBy("c_acctbal")
        .rangeBetween(-1000, 0)
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.lead("c_custkey").over(w).alias("next_cust"),
        F.first("c_custkey").over(w).alias("richest"),
        F.count("*").over(wr).cast("long").alias("n_within_1000"),
    )


_ORACLE_WINDOW_SUITE = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       CAST(rank()       OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(ntile(4)     OVER w AS BIGINT) AS quartile,
       lead(c_custkey)   OVER w AS next_cust,
       first_value(c_custkey) OVER w AS richest,
       CAST(count(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal
            RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_within_1000
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
"""


# ---------------------------------------------------------------------------
# As-of / range joins (J5-J8 — operators Spark lacks natively)
# ---------------------------------------------------------------------------


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each event matched to the user's latest
    purchase at-or-before it (union+window composition; one shuffle on
    user_id, no pair explosion). Oracle: DuckDB native ASOF LEFT JOIN."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    out = asof.asof_join_backward(
        ev.select("event_id", "user_id", "ts", "event_type"),
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["purchase_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts_asof").alias("purchase_ts"),
        F.col("purchase_value_asof").alias("purchase_value"),
    )


_ORACLE_ASOF_JOIN = """
SELECT l.event_id, l.user_id, l.event_type,
       r.ts AS purchase_ts, r.value AS purchase_value
FROM events l
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join via bucketized equi-join: clicks within ±5 minutes
    of an error by the same user (the plan is a hash join on coarse
    time buckets + exact filter — never a nested-loop cross product)."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("user_id").alias("e_user"), F.col("ts").alias("ets")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"), F.col("ts").alias("cts")
    )
    out = asof.range_join(
        errors,
        clicks,
        left_ts=F.col("ets"),
        right_ts=F.col("cts"),
        lower_s=300,
        upper_s=300,
        bucket_s=600,
        extra_condition=F.col("e_user") == F.col("c_user"),
    )
    return out.select("error_id", "click_id", F.col("e_user").alias("user_id"))


_ORACLE_RANGE_JOIN = """
SELECT e.event_id AS error_id, c.event_id AS click_id, e.user_id
FROM (SELECT * FROM events WHERE event_type = 'error') e
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id
 AND c.ts >= e.ts - INTERVAL 5 MINUTE
 AND c.ts <= e.ts + INTERVAL 5 MINUTE
"""


def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF surface (§2.10): positional explode — token with its
    position per document (generator function, lateral-view shape)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.where(F.col("doc_id") < 50)
        .select("doc_id", F.posexplode(text.tokenize(F.col("text"))).alias("pos", "token"))
        .withColumn("pos", F.col("pos").cast("long"))
    )


_ORACLE_POSEXPLODE = r"""
SELECT doc_id,
       CAST(unnest(range(len(toks))) AS BIGINT) AS pos,
       unnest(toks) AS token
FROM (SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
      FROM documents WHERE doc_id < 50)
"""


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation salted join (SURVEY §4): lineitem (hot side,
    deterministic row-hash salt) ⋈ supplier (replicated across salts),
    then per-nation totals. Salting must be invisible in the result —
    the oracle is the plain join, which is exactly the property that
    makes salting safe to deploy on a hot key at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").withColumnRenamed("s_suppkey", "l_suppkey")
    joined = skew.salted_join(li, s, key="l_suppkey", factor=8)
    return (
        joined.groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
        .orderBy("s_nationkey")
    )


_ORACLE_SALTED_JOIN = """
SELECT s_nationkey,
       count(*) AS n_items,
       round(sum(l_extendedprice), 2) AS total_price
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
ORDER BY s_nationkey
"""


def q_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF surface (§2.10): grouped-agg pandas UDF (Arrow-vectorized)
    computing a geometric mean — not expressible with builtins — and
    oracle-checked via exp(avg(ln(x)))."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v[v > 0]).mean()))

    # Spark disallows mixing pandas and builtin aggregates in one agg
    # (INVALID_PANDAS_UDF_PLACEMENT), so the count is a pandas agg too.
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return int(v.size)

    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(geo_mean("o_totalprice"), 2).alias("geo_mean_price"),
            n_rows("o_totalprice").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


_ORACLE_UDAF_GEOMEAN = """
SELECT o_orderpriority,
       round(exp(avg(ln(o_totalprice))), 2) AS geo_mean_price,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF surface (§2.10): a python table function (one input row ->
    N output rows, lateral-join shape) splitting documents into indexed
    sentences. Kept off hot paths by design (row-at-a-time python);
    posexplode/explode cover the vectorized generator case."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string")
    class SplitSentences:
        def eval(self, text: str):
            parts = [p.strip() for p in (text or "").split(".")]
            i = 0
            for p in parts:
                if p:
                    yield i, p
                    i += 1

    spark.udtf.register("split_sentences", SplitSentences)
    d = load_table(spark, sf_dir, "documents")
    d.where(F.col("doc_id") < 100).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT doc_id, s.sent_idx, s.sentence "
        "FROM _udtf_docs, LATERAL split_sentences(text) s"
    )


_ORACLE_UDTF_SENTENCES = """
WITH t AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, '.'),
                     s -> trim(s, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))),
                     s -> s <> '') AS sents
  FROM documents WHERE doc_id < 100
)
SELECT doc_id,
       CAST(unnest(range(len(sents))) AS INTEGER) AS sent_idx,
       unnest(sents) AS sentence
FROM t
"""


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar + correlated subqueries through the SQL front door:
    customers above the global average balance, with their order count."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal,
               (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        """
    )


_ORACLE_SCALAR_SUBQUERY = """
SELECT c_custkey, c_acctbal,
       (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
"""


def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — correlated EXISTS with a non-equi conjunct,
    decorrelated to a left-semi join (orders with at least one line
    shipped after the order date), counted per priority. The semi join
    hashes on the equi key and evaluates the date conjunct as a
    residual, so it broadcast/shuffle-plans like any equi join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


_ORACLE_EXISTS_SUBQUERY = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_priority_case_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — conditional CASE aggregation: per linestatus,
    how many lineitems belong to urgent/high- vs lower-priority orders.
    The CASE folds into the partial (map-side) aggregate, so the
    shuffle carries 2 longs per linestatus, not the joined rows."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


_ORACLE_PRIORITY_CASE = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — conditional-ratio aggregate: the share of
    revenue from PROMO-type parts per returnflag. Single pass: both
    the conditional and total revenue are partial aggregates of the
    same join; no second scan, no self-join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_share_pct"),
            F.count("*").alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


_ORACLE_PROMO_SHARE = """
SELECT l_returnflag,
       round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1.0 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1.0 - l_discount)), 4) AS promo_share_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long), the inverse of q_pivot."""
    wide = q_pivot(spark, sf_dir)
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["O", "F"],
        variableColumnName="l_linestatus",
        valueColumnName="sum_qty",
    )


_ORACLE_UNPIVOT = """
WITH wide AS (
  SELECT l_returnflag,
         round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS o_qty,
         round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS f_qty
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'O' AS l_linestatus, o_qty AS sum_qty FROM wide
UNION ALL
SELECT l_returnflag, 'F' AS l_linestatus, f_qty AS sum_qty FROM wide
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 exact quantiles: continuous-interpolation percentile per group
    (matches DuckDB quantile_cont). approx_percentile is the at-scale
    variant (sketch-based; tested for tolerance in pytest, not oracled)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 6).alias("price_p99"),
    )


_ORACLE_PERCENTILES = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6)       AS p50,
       round(quantile_cont(l_quantity, 0.9), 6)       AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 6) AS price_p99
FROM lineitem GROUP BY l_returnflag
"""


def q_ratio_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 ratio/percent over aggregates (the reference's progress %
    arithmetic, main.py:450): share of each order status."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    # One lazy plan: the grand total rides a window over the grouped
    # counts (sums |groups| rows, not |orders|) instead of a separate
    # driver-side count() action.
    total = F.sum("n").over(Window.partitionBy())
    return counts.select(
        "o_orderstatus",
        "n",
        F.round(F.col("n") / total.cast("double") * 100.0, 4).alias("pct"),
    )


_ORACLE_RATIO_REPORT = """
SELECT o_orderstatus, count(*) AS n,
       round(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM orders) * 100.0, 4) AS pct
FROM orders GROUP BY o_orderstatus
"""


def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — HAVING filter over a grouped fact, then join
    back to dimensions. The heavy groupBy runs FIRST on the narrow
    (l_orderkey, l_quantity) projection; only the few surviving keys
    join to orders/customer, so the dimension joins are broadcast-size
    regardless of fact cardinality."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # HAVING on the UNROUNDED sum (matching the oracle exactly); rounding
    # is presentation-only in the projected column.
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .where(F.col("raw_qty") > 300)
        .select("l_orderkey", F.round("raw_qty", 2).alias("total_qty"))
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
    )


_ORACLE_BIG_ORDERS = """
SELECT c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o_totalprice, 2)            AS totalprice,
       total_qty
FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice DESC, o_orderkey
"""


def q_disjunctive_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — revenue under OR-of-conjunct predicate groups
    spanning both join sides. The shared equi key still drives a hash
    join (part broadcast); the disjunction is a residual filter, so no
    nested-loop fallback. Only the 5 referenced columns are scanned."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_type") == "PROMO")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_type") == "ECONOMY")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | ((F.col("p_brand") == "Brand#9") & (F.col("l_quantity") >= 25))
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


_ORACLE_DISJUNCTIVE_REV = """
SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_type = 'PROMO'   AND p_size BETWEEN 1 AND 15  AND l_quantity BETWEEN 1 AND 20)
   OR (p_type = 'ECONOMY' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#9' AND l_quantity >= 25)
"""


def q_sync_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1/E3 end-to-end, ORACLE-CHECKED: the reference's ENTIRE sync
    flow (main.py:391-471) — paginated id scan -> new/existing split ->
    distributed mapInPandas detail fetch -> the full 44-field-style
    transform (0-epoch->NULL, HTML clean, Python-repr tags, lenient
    JSON, bool defaults, struct shaping) -> anti+union MERGE into a
    stale target -> final table. The ticket corpus is derived
    DETERMINISTICALLY from `documents` (doc_id < 300), so DuckDB can
    rebuild the expected post-merge table purely in SQL: transformed
    rows for every scanned id plus the target-only rows the MERGE must
    preserve. Struct output is compared as to_json. The driver-side
    fetcher dict is the stand-in for the remote API and is bounded by
    the reference's own page cap (2,000 ids/run, main.py:130-134)."""
    from data_pipeline_bigquery_to_sftp_server_spark import pipeline

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    cts = (
        F.when(F.col("doc_id") % 97 == 0, F.lit(0))
        .otherwise(F.lit(1700000000) + F.col("doc_id") * 3600)
        .cast("long")
    )
    raw = d.select(
        F.col("doc_id").cast("string").alias("_id"),
        F.substring("text", 1, 30).alias("subject"),
        # Every 11th doc separates with NBSP + narrow-NBSP (Unicode
        # whitespace): proves the HTML clean's (?U)/Python-\s collapse
        # against the oracle's explicit Unicode-whitespace class — the
        # parity the old ASCII-only corpus never exercised.
        F.concat(
            F.lit("<p>"),
            F.col("text"),
            F.when(F.col("doc_id") % 11 == 0, F.lit("\u00a0\u202f "))
            .otherwise(F.lit(" ")),
            F.lit("&amp; more</p>"),
        ).alias("description"),
        cts.alias("createdTimestamp"),
        (F.lit(1700000500) + F.col("doc_id") * 3600).cast("long").alias(
            "updatedTimestamp"
        ),
        F.when(F.col("doc_id") % 5 == 0, F.lit(None).cast("boolean"))
        .otherwise(F.col("doc_id") % 3 == 0)
        .alias("deleted"),
        F.concat(F.lit("u"), F.col("doc_id"), F.lit("@example.com")).alias(
            "fromEmail"
        ),
        F.concat(F.lit("User "), F.col("doc_id")).alias("fromName"),
        F.array().cast("array<string>").alias("toEmails"),
        F.when(F.col("doc_id") % 2 == 1, F.array("lang", "source"))
        .otherwise(F.array().cast("array<string>"))
        .alias("tags"),
        F.when(
            F.col("doc_id") % 4 != 0,
            F.concat(
                F.lit('{"k":"'),
                F.col("lang"),
                F.lit('","v":"'),
                F.col("source"),
                F.lit('"}'),
            ),
        )
        .otherwise(F.lit("not json"))
        .alias("meta"),
        (F.col("doc_id") % 7).cast("long").alias("sendEmailFailureCount"),
        # list-of-struct field the reference flattens via str(list)
        # (main.py:305 `discounts`) — every 6th doc has none (exercises
        # the .get('discounts', []) -> '[]' default), odd docs get two.
        F.when(
            F.col("doc_id") % 6 == 0,
            F.lit(None).cast(
                "array<struct<code:string,amount:bigint>>"
            ),
        )
        .otherwise(
            F.when(
                F.col("doc_id") % 2 == 1,
                F.array(
                    F.struct(
                        F.concat(F.lit("C"), (F.col("doc_id") % 5)).alias("code"),
                        (F.col("doc_id") % 20).alias("amount"),
                    ),
                    F.struct(
                        F.lit("WELCOME").alias("code"),
                        F.lit(10).cast("bigint").alias("amount"),
                    ),
                ),
            ).otherwise(
                F.array(
                    F.struct(
                        F.concat(F.lit("C"), (F.col("doc_id") % 5)).alias("code"),
                        (F.col("doc_id") % 20).alias("amount"),
                    )
                )
            )
        )
        .alias("discounts"),
    )

    # The "remote API": a bounded driver-side dict (the reference's own
    # scan cap bounds this at 2,000 ids/run).
    records = {r["_id"]: r.asDict() for r in raw.collect()}

    def page_fetcher(page: int, per_page: int) -> list[dict]:
        ids = sorted(records)[(page - 1) * per_page : page * per_page]
        return [{"_id": i} for i in ids]

    def detail_fetcher(tid: str) -> dict | None:
        return records.get(tid)

    # Stale target: ids < 150 carry an outdated subject (MERGE must
    # overwrite), plus X-prefixed target-only rows (MERGE must keep).
    stale = raw.where(F.col("_id").cast("int") < 150).withColumn(
        "subject", F.lit("OLD")
    )
    extra = (
        raw.where(F.col("_id").cast("int") < 20)
        .withColumn("_id", F.concat(F.lit("X"), "_id"))
        .withColumn("subject", F.lit("OLD"))
    )
    target = pipeline.transform_tickets(stale.unionByName(extra))

    merged, _report = pipeline.sync_tickets(
        spark, target, page_fetcher, detail_fetcher
    )
    return merged.select(
        "_id",
        "subject",
        "description",
        "createdTimestamp",
        "createdDatetime",
        "createdDate",
        "updatedDatetime",
        "deleted",
        F.to_json("fromEmail").alias("fromEmail_json"),
        "tags",
        "meta",
        "sendEmailFailureCount",
        "discounts",
    )


# PARITY NOTE: the oracle replays the engine's HTML clean on
# `description` as: rebuild the post-unescape inner text (the <p> tags
# and &amp; decoding are structural, so they reduce to `text || <sep>
# || '& more'`), then collapse runs of Unicode whitespace with an
# explicit RE2 character class covering the White_Space set that
# Python's `\\s` (the clean_html pandas UDF) and Java's `(?U)\\s`
# (clean_html_native) both match — RE2's own `\\s` is ASCII-only.
# Every 11th doc carries NBSP/U+202F separators, so this parity is
# exercised, not assumed. Remaining documented divergence: U+001C-1F
# (Python-ws, not Java-ws) — absent from the corpus.
_WS_CLASS_SQL = ("[ \t\n\x0b\x0c\r\x85\xa0\u1680\u2000-\u200a"
                 "\u2028\u2029\u202f\u205f\u3000]+")

_ORACLE_SYNC_PIPELINE = """
WITH t AS (
  SELECT doc_id, text, lang, source,
         CASE WHEN doc_id % 97 = 0 THEN 0
              ELSE 1700000000 + doc_id * 3600 END AS cts,
         1700000500 + doc_id * 3600               AS uts
  FROM documents WHERE doc_id < 300
), x AS (
  SELECT doc_id,
         CAST(doc_id AS VARCHAR)                  AS _id,
         substr(text, 1, 30)                      AS subject,
         nullif(trim(regexp_replace(
             text || CASE WHEN doc_id % 11 = 0
                          THEN chr(160) || chr(8239) || ' '
                          ELSE ' ' END || '& more',
             '{ws}', ' ', 'g')), '')              AS description,""".replace(
    "{ws}", _WS_CLASS_SQL
) + """
         CAST(cts AS VARCHAR)                     AS createdTimestamp,
         CASE WHEN cts = 0 THEN NULL
              ELSE strftime(make_timestamp(cts * 1000000),
                            '%Y-%m-%d %H:%M:%S') END AS createdDatetime,
         CASE WHEN cts = 0 THEN NULL
              ELSE strftime(make_timestamp(cts * 1000000),
                            '%Y-%m-%d') END          AS createdDate,
         strftime(make_timestamp(uts * 1000000),
                  '%Y-%m-%d %H:%M:%S')               AS updatedDatetime,
         CASE WHEN doc_id % 5 = 0 THEN FALSE
              ELSE doc_id % 3 = 0 END                AS deleted,
         '{"email":"u' || doc_id || '@example.com","name":"User '
             || doc_id || '"}'                       AS fromEmail_json,
         CASE WHEN doc_id % 2 = 1
              THEN '[''' || lang || ''', ''' || source || ''']'
              ELSE '[]' END                          AS tags,
         CASE WHEN doc_id % 4 <> 0
              THEN '{"k":"' || lang || '","v":"' || source || '"}'
              ELSE NULL END                          AS meta,
         CAST(doc_id % 7 AS VARCHAR)                 AS sendEmailFailureCount,
         CASE WHEN doc_id % 6 = 0 THEN '[]'
              WHEN doc_id % 2 = 1
              THEN '[{''code'': ''C' || (doc_id % 5) || ''', ''amount'': '
                   || (doc_id % 20)
                   || '}, {''code'': ''WELCOME'', ''amount'': 10}]'
              ELSE '[{''code'': ''C' || (doc_id % 5) || ''', ''amount'': '
                   || (doc_id % 20) || '}]'
         END                                         AS discounts
  FROM t
)
SELECT _id, subject, description, createdTimestamp, createdDatetime,
       createdDate, updatedDatetime, deleted, fromEmail_json, tags, meta,
       sendEmailFailureCount, discounts
FROM x
UNION ALL
SELECT 'X' || _id, 'OLD', description, createdTimestamp, createdDatetime,
       createdDate, updatedDatetime, deleted, fromEmail_json, tags, meta,
       sendEmailFailureCount, discounts
FROM x WHERE doc_id < 20
"""


def q_sql_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 SQL front door (SURVEY §3): a multi-CTE statement with a
    window over an aggregate, submitted as TEXT to spark.sql — the
    engine's parser/analyzer/Catalyst replace the remote BigQuery the
    reference shipped SQL strings to (main.py:85-89, 349-358). The
    same text (modulo QUALIFY, which OSS Spark lacks) runs on DuckDB
    as the oracle, so the two parsers' semantics are compared
    directly."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        WITH cust_rev AS (
          SELECT c_custkey, c_mktsegment, round(sum(o_totalprice), 2) AS revenue
          FROM customer JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey, c_mktsegment
        ), ranked AS (
          SELECT c_mktsegment, c_custkey, revenue,
                 CAST(rank() OVER (PARTITION BY c_mktsegment
                                   ORDER BY revenue DESC, c_custkey) AS BIGINT) AS rnk
          FROM cust_rev
        )
        SELECT * FROM ranked WHERE rnk <= 5
        ORDER BY c_mktsegment, rnk, c_custkey
        """
    )


_ORACLE_SQL_CTE = """
WITH cust_rev AS (
  SELECT c_custkey, c_mktsegment, round(sum(o_totalprice), 2) AS revenue
  FROM customer JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey, c_mktsegment
), ranked AS (
  SELECT c_mktsegment, c_custkey, revenue,
         CAST(rank() OVER (PARTITION BY c_mktsegment
                           ORDER BY revenue DESC, c_custkey) AS BIGINT) AS rnk
  FROM cust_rev
)
SELECT * FROM ranked WHERE rnk <= 5
ORDER BY c_mktsegment, rnk, c_custkey
"""


def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 F19 (math/date arithmetic beyond epoch formatting): ship
    delay in days, calendar truncation, month-offset due dates —
    year/quarter extraction drives the grouped agg. All native
    expressions inside whole-stage codegen; the join is the same
    broadcast-able equi join as priority_case_counts."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    return (
        j.select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.quarter("o_orderdate").cast("long").alias("o_quarter"),
            F.datediff("l_shipdate", "o_orderdate").alias("delay"),
            F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM-dd").alias(
                "ship_month"
            ),
            F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias(
                "due_date"
            ),
        )
        .groupBy("o_year", "o_quarter")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.avg("delay"), 4).alias("avg_ship_delay_days"),
            F.min("ship_month").alias("first_ship_month"),
            F.max("due_date").alias("last_due_date"),
        )
        .orderBy("o_year", "o_quarter")
    )


_ORACLE_DATE_ARITHMETIC = """
SELECT CAST(extract(year FROM o_orderdate) AS BIGINT)    AS o_year,
       CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS o_quarter,
       count(*)                                          AS n_lines,
       round(avg(date_diff('day', o_orderdate, l_shipdate)), 4)
                                                         AS avg_ship_delay_days,
       min(strftime(date_trunc('month', l_shipdate), '%Y-%m-%d'))
                                                         AS first_ship_month,
       max(strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d'))
                                                         AS last_due_date
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8/X3 higher-order-function surface over array columns:
    per-vector L2 norm (aggregate fold), positive-component count
    (filter), max |x| (transform + array_max) — all JVM-side lambda
    expressions, no Python, evaluated in one pass per row with zero
    shuffle. This is the declarative path the similarity operators
    build on when numpy batching isn't warranted."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    l2 = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    n_pos = F.size(F.filter(v, lambda x: x > F.lit(0.0))).cast("long")
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    return e.select(
        "vec_id",
        F.round(l2, 4).alias("l2_norm"),
        n_pos.alias("n_pos"),
        F.round(max_abs, 4).alias("max_abs"),
    )


_ORACLE_ARRAY_HOF = """
SELECT vec_id,
       round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                          x -> x * x))), 4)        AS l2_norm,
       CAST(len(list_filter(CAST(embedding AS DOUBLE[]),
                            x -> x > 0)) AS BIGINT)                AS n_pos,
       round(list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                     x -> abs(x))), 4)             AS max_abs
FROM embeddings
"""


def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 lexical variant — edit-distance fuzzy matching: pairs of
    DISTINCT part names within levenshtein <= 2. Dedup-to-vocabulary
    first (the name vocabulary is tiny and bounded even when part is
    huge), so the quadratic compare runs on the vocab, not the table —
    the same collapse-then-compare shape as dedup-by-key at 100 TB."""
    p = load_table(spark, sf_dir, "part")
    names = p.select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    return (
        a.join(b, F.col("name_a") < F.col("name_b"))
        .select(
            "name_a", "name_b", F.levenshtein("name_a", "name_b").alias("edit_dist")
        )
        .where(F.col("edit_dist") <= 2)
    )


_ORACLE_FUZZY_NAME_PAIRS = """
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
FROM names a JOIN names b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


# ---------------------------------------------------------------------------
# Rows-only extras: exact-parity HTML UDF, composite text scores,
# streaming window (X7) — not SQL-expressible for the DuckDB oracle
# ---------------------------------------------------------------------------


def q_html_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F3 exact-parity HTML cleaning (pandas UDF; SAX semantics).
    Rows-only: DuckDB can't run the reference's HTMLParser pipeline."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", scalar.clean_html(F.col("text")).alias("clean"))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 language-ID heuristic (argmax over marker hits). Oracle
    mirrors the argmax as list_aggregate(max) over (hits, lang) structs
    — both engines break hit ties toward the lexicographically larger
    language code (struct comparison is field-order lexicographic)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", text.lang_id(F.col("text")).alias("lang_pred"))


_ORACLE_LANG_ID = r"""
WITH t AS (
  SELECT doc_id, lang,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), s AS (
  SELECT doc_id, lang, list_aggregate([
    {'hits': len(list_intersect(toks, ['the','and','of','to','is'])), 'lang': 'en'},
    {'hits': len(list_intersect(toks, ['el','la','de','que','los'])), 'lang': 'es'},
    {'hits': len(list_intersect(toks, ['der','die','und','das','ist'])), 'lang': 'de'},
    {'hits': len(list_intersect(toks, ['le','la','les','est','une'])), 'lang': 'fr'}
  ], 'max') AS best
  FROM t
)
SELECT doc_id, lang,
       CASE WHEN best.hits > 0 THEN best.lang ELSE 'und' END AS lang_pred
FROM s
"""


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 composite quality score in [0,1] (Gopher-rule flavored).
    Every signal (token/punct/stopword/word-length ratios, BPE-ish
    token count) is a native expression, so the whole heuristic is
    SQL-expressible and hash-checked against DuckDB."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(text.quality_score(F.col("text")), 6).alias("quality"),
        F.round(text.stopword_ratio(F.col("text")), 6).alias("stopword_ratio"),
        text.bpe_ish_token_count(F.col("text")).cast("long").alias("bpe_tokens"),
    )


# Mirrors functions/text.py exactly: same stopword list, same regexes
# (RE2 and Java agree on these classes), same CASE thresholds/weights.
_ORACLE_QUALITY_SCORES = r"""
WITH t AS (
  SELECT doc_id, text,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
  FROM documents
), m AS (
  SELECT doc_id, text,
         len(toks) AS n_tok,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(len(list_filter(toks, x -> x IN
                ('the','a','an','and','or','of','to','in','is','are','was','were',
                 'be','been','it','this','that','for','on','with','as','at','by',
                 'from','not'))) AS DOUBLE) / len(toks) END AS sw_ratio,
         CASE WHEN len(text) = 0 THEN 0.0
              ELSE CAST(len(text) - len(regexp_replace(text, '[^\w\s]', '', 'g')) AS DOUBLE)
                   / len(text) END AS p_ratio,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                   / len(toks) END AS mwl,
         len(regexp_extract_all(text,
             '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+')) AS bpe
  FROM t
)
SELECT doc_id,
       round(
         (CASE WHEN n_tok BETWEEN 5 AND 10000 THEN 1.0 ELSE 0.0 END) * 0.4 +
         (CASE WHEN p_ratio <= 0.2 THEN 1.0 ELSE 1.0 - p_ratio END)  * 0.2 +
         (CASE WHEN mwl BETWEEN 2 AND 12 THEN 1.0 ELSE 0.5 END)      * 0.2 +
         (CASE WHEN sw_ratio >= 0.05 THEN 1.0 ELSE 0.5 END)          * 0.2, 6) AS quality,
       round(sw_ratio, 6) AS stopword_ratio,
       CAST(bpe AS BIGINT) AS bpe_tokens
FROM m
"""


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5d readability scoring (r11), ORACLE-CHECKED: Flesch reading
    ease per document from three INTEGER counts — words (whitespace
    tokens), sentences (terminal-punctuation runs, floored at 1), and
    syllables (vowel-group count; groups never span whitespace, so one
    regexp_count over the whole text equals the per-word sum — no
    explode, no shuffle, the whole query is a map-side projection).
    The formula's constants are literals in both engines and the score
    is a fixed linear tree over two exact-integer divisions, so the
    6dp-rounded doubles hash-match. The quality-battery member that
    ranks documents by sentence complexity rather than composition
    ratios (X31/X5's axis)."""
    d = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    n_words = F.size(text.tokenize(F.col("text"))).cast("long")
    n_sent = F.greatest(
        F.lit(1).cast("long"), F.regexp_count(F.col("text"), F.lit(r"[.!?]+"))
    )
    n_syll = F.regexp_count(low, F.lit("[aeiouy]+")).cast("long")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sent.cast("double"))
        - F.lit(84.6) * (n_syll.cast("double") / n_words.cast("double"))
    )
    return (
        d.where(F.col("text").isNotNull())
        .select(
            "doc_id",
            n_words.alias("n_words"),
            n_sent.alias("n_sentences"),
            n_syll.alias("n_syllables"),
            F.round(flesch, 6).alias("flesch"),
        )
        .where(F.col("n_words") > 0)
        .orderBy("doc_id")
    )


_ORACLE_READABILITY = r"""
WITH m AS (
  SELECT doc_id,
         CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
              AS BIGINT) AS n_words,
         greatest(CAST(1 AS BIGINT),
                  CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
           AS n_sentences,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
           AS n_syllables
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       round(206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)),
             6) AS flesch
FROM m WHERE n_words > 0
ORDER BY doc_id
"""


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 document fingerprinting: xxhash64 of canonical text as the
    dedup-join key; output is the per-fingerprint group profile
    (first_doc, n_docs). The raw hash is engine-specific so it stays
    out of the result; the oracle groups by the canonical text itself,
    equivalent absent 64-bit collisions (none at test scale)."""
    d = load_table(spark, sf_dir, "documents")
    fp = d.select("doc_id", text.fingerprint(F.col("text")).alias("fp"))
    return (
        fp.groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .select("first_doc", "n_docs")
    )


_ORACLE_FINGERPRINTS = r"""
SELECT min(doc_id) AS first_doc, count(*) AS n_docs
FROM documents
GROUP BY trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5/X1 benchmark decontamination: per-training-doc 4-gram overlap
    against an eval split (docs with doc_id % 20 == 0 stand in for the
    benchmark corpus). Broadcast left outer join on hashed grams with a
    single per-doc rollup counting totals and hits — the training
    corpus never shuffles (operators/decontam.py). Counts are
    over hashed grams in Spark vs string grams in the oracle —
    identical absent 32-bit collisions (same parity argument as
    jaccard_pairs)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import decontam

    d = load_table(spark, sf_dir, "documents")
    eval_df = d.where(F.col("doc_id") % 20 == 0)
    train = d.where(F.col("doc_id") % 20 != 0)
    return decontam.ngram_contamination(train, eval_df, "doc_id", "text", n=4)


_ORACLE_DECONTAMINATE = r"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN len(w) < 4 THEN [norm]
              ELSE list_distinct(list_transform(range(1, len(w) - 2),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))
         END AS gs
  FROM (SELECT doc_id,
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
               string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
        FROM documents)
), ev AS (
  SELECT DISTINCT unnest(gs) AS g FROM base WHERE doc_id % 20 = 0
), tr AS (
  SELECT doc_id, gs FROM base WHERE doc_id % 20 != 0
), hits AS (
  SELECT doc_id, count(*) AS n_contaminated
  FROM (SELECT doc_id, unnest(gs) AS g FROM tr) t
  WHERE g IN (SELECT g FROM ev)
  GROUP BY doc_id
)
SELECT tr.doc_id,
       len(tr.gs) AS n_grams,
       coalesce(h.n_contaminated, 0) AS n_contaminated,
       round(CAST(coalesce(h.n_contaminated, 0) AS DOUBLE) / len(tr.gs), 6)
         AS contamination_ratio
FROM tr LEFT JOIN hits h ON tr.doc_id = h.doc_id
"""


def q_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13b span REMOVAL, ORACLE-CHECKED: the actionable transform on
    top of the substring-duplication signal — every token position
    covered by a cross-document duplicated 20-gram is dropped and the
    normalized text rebuilt (operators/dedup.py remove_duplicate_spans,
    Lee-et-al dedup's transform step). The oracle replays the whole
    chain on gram STRINGS — including the rebuilt clean_text, compared
    verbatim cell-for-cell — so both engines must drop exactly the
    same positions from exactly the same documents."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import dedup

    d = load_table(spark, sf_dir, "documents")
    return dedup.remove_duplicate_spans(d, "doc_id", "text", n=20)


_ORACLE_REMOVE_DUP_SPANS = r"""
WITH d AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), g AS (
  SELECT doc_id, u.i AS pos, array_to_string(w[u.i:u.i+19], ' ') AS gm
  FROM d, unnest(range(1, len(w) - 18)) AS u(i)
  WHERE len(w) >= 20
), dup AS (
  SELECT gm FROM (SELECT gm, count(DISTINCT doc_id) AS c FROM g GROUP BY gm)
  WHERE c > 1
), cov AS (
  SELECT DISTINCT doc_id, p
  FROM g JOIN dup USING (gm), unnest(range(pos, pos + 20)) AS t(p)
), covl AS (
  SELECT doc_id, list_sort(list(p)) AS cv FROM cov GROUP BY doc_id
)
SELECT d.doc_id,
       len(d.w) AS n_tokens,
       coalesce(len(c.cv), 0) AS n_removed,
       coalesce(array_to_string(
         list_filter(d.w, (x, i) -> NOT list_contains(coalesce(c.cv, CAST([] AS BIGINT[])), i)),
         ' '), '') AS clean_text
FROM d LEFT JOIN covl c ON d.doc_id = c.doc_id
"""


def q_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2f exact substring-duplication spans, ORACLE-CHECKED: per
    document, the token positions covered by a 20-gram occurring
    verbatim in another document (the word-level Lee-et-al substring
    dedup signal; operators/dedup.py duplicate_ngram_spans). Spark
    compares xxhash64-chained grams, the oracle compares gram STRINGS —
    identical absent 64-bit collisions, the same parity argument as
    jaccard_pairs/decontaminate."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import dedup

    d = load_table(spark, sf_dir, "documents")
    return dedup.duplicate_ngram_spans(d, "doc_id", "text", n=20)


_ORACLE_DUP_NGRAM_SPANS = r"""
WITH d AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), g AS (
  SELECT doc_id, u.i AS pos, array_to_string(w[u.i:u.i+19], ' ') AS gm
  FROM d, unnest(range(1, len(w) - 18)) AS u(i)
  WHERE len(w) >= 20
), dup AS (
  SELECT gm FROM (SELECT gm, count(DISTINCT doc_id) AS c FROM g GROUP BY gm)
  WHERE c > 1
), cov AS (
  SELECT DISTINCT doc_id, p
  FROM g JOIN dup USING (gm), unnest(range(pos, pos + 20)) AS t(p)
), covn AS (
  SELECT doc_id, count(*) AS n_dup_tokens FROM cov GROUP BY doc_id
)
SELECT d.doc_id,
       len(d.w) AS n_tokens,
       coalesce(c.n_dup_tokens, 0) AS n_dup_tokens,
       round(CAST(coalesce(c.n_dup_tokens, 0) AS DOUBLE)
             / greatest(len(d.w), 1), 6) AS dup_ratio
FROM d LEFT JOIN covn c ON d.doc_id = c.doc_id
"""


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 lexical retrieval: BM25 top-25 for a fixed 3-term query,
    ORACLE-CHECKED — the whole ranking (tf, df, doc length, corpus
    stats, Robertson idf) is relational, so DuckDB replays it exactly;
    scores rounded to 6dp before ranking on both engines."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import retrieval

    d = load_table(spark, sf_dir, "documents")
    return retrieval.bm25_topk(d, ["join", "filter", "merge"], k=25)


_ORACLE_BM25_TOPK = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
  FROM documents
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, t, count(*) AS tf FROM toks
  WHERE t IN ('join', 'filter', 'merge') GROUP BY doc_id, t
), dfq AS (
  SELECT t, count(*) AS df FROM tf GROUP BY t
), sc AS (
  SELECT tf.doc_id,
         ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
         * (tf.tf * (1.2 + 1.0))
         / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS w
  FROM tf JOIN dfq USING (t) JOIN dl USING (doc_id) CROSS JOIN stats
)
SELECT doc_id, round(sum(w), 6) AS bm25
FROM sc GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 25
"""


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X90 hybrid-retrieval rank fusion (r11), ORACLE-CHECKED:
    reciprocal-rank fusion of two genuinely different rankers for the
    same 3-term query — BM25 (saturating tf, Robertson idf) and TF-IDF
    cosine (length-normalized vector space) — the combiner hybrid
    retrieval and hard-negative mining pipelines run over lexical +
    semantic lists. Both systems' top-50 lists rank by 6dp-rounded
    scores with id tiebreaks (engine-portable order), and the RRF
    terms 1/(60+rank) are small-integer rationals summed in a fixed
    tree, so the fused scores hash-match UNROUNDED. Scale: each ranker
    is one corpus-pass + token-keyed shuffle; the fusion itself is a
    full-outer join of two 50-row frames (operators/retrieval.py
    rrf_fuse, tfidf_query_topk)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import retrieval

    d = load_table(spark, sf_dir, "documents")
    terms = ["join", "filter", "merge"]
    bm = retrieval.bm25_topk(d, terms, k=50)
    tq = retrieval.tfidf_query_topk(d, terms, k=50)
    fused = retrieval.rrf_fuse([(bm, "bm25"), (tq, "tfidf_cos")], k=25)
    return fused.select(
        "doc_id",
        F.col("rank_0").cast("int").alias("rank_bm25"),
        F.col("rank_1").cast("int").alias("rank_tfidf"),
        "rrf",
    )


_ORACLE_RRF_FUSION = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
  FROM documents
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, t, count(*) AS tf FROM toks
  WHERE t IN ('join', 'filter', 'merge') GROUP BY doc_id, t
), dfq AS (
  SELECT t, count(*) AS df FROM tf GROUP BY t
), sc AS (
  SELECT tf.doc_id,
         ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
         * (tf.tf * (1.2 + 1.0))
         / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS w
  FROM tf JOIN dfq USING (t) JOIN dl USING (doc_id) CROSS JOIN stats
), bmr AS (
  SELECT doc_id, round(sum(w), 6) AS bm25
  FROM sc GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 50
), tfa AS (
  SELECT doc_id, t, count(*) AS tf FROM toks GROUP BY doc_id, t
), dfa AS (
  SELECT t, count(*) AS df FROM tfa GROUP BY t
), nd AS (
  SELECT count(DISTINCT doc_id) AS n FROM tfa
), wtab AS (
  SELECT doc_id, t, tf * log2(CAST(n AS DOUBLE) / df) AS w
  FROM tfa JOIN dfa USING (t) CROSS JOIN nd
  WHERE df <= 0.5 * n
), norms AS (
  SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM wtab GROUP BY doc_id
), qv AS (
  SELECT t, log2(CAST(n AS DOUBLE) / df) AS qw
  FROM dfa CROSS JOIN nd
  WHERE t IN ('join', 'filter', 'merge') AND df <= 0.5 * n
), qn AS (
  SELECT sqrt(sum(qw * qw)) AS qnorm FROM qv
), cosr AS (
  SELECT d.doc_id,
         round(d.dot / (norms.nrm * qn.qnorm), 6) AS tfidf_cos
  FROM (
    SELECT doc_id, sum(w * qw) AS dot
    FROM wtab JOIN qv USING (t) GROUP BY doc_id
  ) d JOIN norms USING (doc_id) CROSS JOIN qn
  ORDER BY tfidf_cos DESC, doc_id LIMIT 50
), ra AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r FROM bmr
), rb AS (
  SELECT doc_id, row_number() OVER (ORDER BY tfidf_cos DESC, doc_id) AS r
  FROM cosr
)
SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
       CAST(ra.r AS INTEGER) AS rank_bm25,
       CAST(rb.r AS INTEGER) AS rank_tfidf,
       coalesce(1.0 / (60.0 + ra.r), 0.0)
       + coalesce(1.0 / (60.0 + rb.r), 0.0) AS rrf
FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
ORDER BY rrf DESC, doc_id LIMIT 25
"""


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X24 collocation mining, ORACLE-CHECKED: top-100 adjacent token
    pairs by corpus-level pointwise mutual information (min bigram
    count 5, pmi rounded to 6dp before ranking; ties on the words) —
    the phrase-detection statistic of word2vec preprocessing, used for
    tokenizer-merge and stop-phrase curation
    (operators/lm.py pmi_collocations)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import lm

    d = load_table(spark, sf_dir, "documents")
    return (
        lm.pmi_collocations(d, "text", min_count=5)
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(100)
    )


_ORACLE_PMI_COLLOCATIONS = r"""
WITH t AS (
  SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), bg AS (
  SELECT unnest(list_transform(w[2:], (x,i) -> w[i] || ' ' || x)) AS g FROM t
), uc AS (
  SELECT tok, count(*) AS c FROM (SELECT unnest(w) AS tok FROM t) GROUP BY tok
), bc AS (
  SELECT g, count(*) AS n FROM bg GROUP BY g HAVING count(*) >= 5
), s AS (
  SELECT (SELECT count(*) FROM (SELECT unnest(w) FROM t)) AS nu,
         (SELECT count(*) FROM bg) AS nb
)
SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2, n AS n_ab,
       round(log2((n / CAST(s.nb AS DOUBLE))
                  / ((ua.c / CAST(s.nu AS DOUBLE)) * (ub.c / CAST(s.nu AS DOUBLE)))), 6) AS pmi
FROM bc
JOIN uc ua ON ua.tok = split_part(g, ' ', 1)
JOIN uc ub ON ub.tok = split_part(g, ' ', 2)
CROSS JOIN s
ORDER BY pmi DESC, w1, w2 LIMIT 100
"""


def q_tfidf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X25 frequency-aware lexical similarity, ORACLE-CHECKED: all doc
    pairs with TF-IDF cosine >= 0.35 (max_df cut at 50%) — the sparse
    sibling of the embedding near-dup screen and the tf-aware
    complement of the Jaccard family; the whole weighting (tf, df,
    idf, norms, token-keyed dot product) is relational, so DuckDB
    replays it exactly (operators/retrieval.py tfidf_doc_pairs)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import retrieval

    d = load_table(spark, sf_dir, "documents")
    return retrieval.tfidf_doc_pairs(d, "doc_id", "text", threshold=0.35)


_ORACLE_TFIDF_PAIRS = r"""
WITH t AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
  FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY doc_id, tok
), dfq AS (
  SELECT tok, count(*) AS df FROM tf GROUP BY tok
), nd AS (
  SELECT count(DISTINCT doc_id) AS n FROM tf
), w AS (
  SELECT doc_id, tok, tf * log2(CAST(nd.n AS DOUBLE) / dfq.df) AS w
  FROM tf JOIN dfq USING (tok) CROSS JOIN nd
  WHERE dfq.df <= 0.5 * nd.n
), nrm AS (
  SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id
), d AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, round(dot / (x.nrm * y.nrm), 6) AS cos_sim
FROM d JOIN nrm x ON x.doc_id = d.id_a JOIN nrm y ON y.doc_id = d.id_b
WHERE dot / (x.nrm * y.nrm) >= 0.35
"""


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11 sketch-then-verify heavy hitters: vectorized per-batch
    frequency-threshold candidate generation (token stream never
    shuffles, no per-token Python) + exact count verify restricted to
    the broadcast candidate set. Counts are exact (the sketch only
    bounds candidacy), so this IS oracle-checkable: equality holds
    because the k-th token's frequency (~8x N/capacity here) clears the
    bound, and the default check_exact guard asserts exactly that AT
    RUNTIME inside the plan (operators/sketch.py; guard trip exercised
    in test_sketch)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sketch

    d = load_table(spark, sf_dir, "documents")
    return sketch.heavy_hitters(d, text.tokenize(F.col("text")), k=20, capacity=256)


_ORACLE_HEAVY_HITTERS = r"""
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
      FROM documents)
GROUP BY token ORDER BY n DESC, token LIMIT 20
"""


def _portable_pack_group(id_col: str, num_groups: int) -> F.Column:
    """Engine-portable packing group: first 4 md5 hex chars of the id,
    parsed as an int, mod num_groups — bit-identical in Spark
    (conv(hex,16,10)) and DuckDB (CAST('0x'||hex AS INTEGER)), so the
    oracle can replay the FFD grouping exactly."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
        ).cast("int"),
        F.lit(num_groups),
    )


def _packed_assignment(spark: SparkSession, sf_dir: str):
    """Shared input shape for the two X10 queries: documents with the
    BPE-ish token budget, FFD-packed into 512-token bins across 8
    engine-portable hash groups."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import packing

    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", text.bpe_ish_token_count(F.col("text")).alias("n_tokens")
    )
    assign = packing.pack_sequences(
        docs,
        budget=512,
        num_groups=8,
        group_expr=_portable_pack_group("doc_id", 8),
    )
    return d, assign


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 sequence packing, ORACLE-CHECKED: documents FFD-packed into
    512-token bins, reported per bin. FFD is order-dependent but fully
    DETERMINISTIC (group = portable md5 hash, insertion order = tokens
    desc then id asc), so the oracle replays the exact first-fit-
    decreasing state machine in SQL: a recursive CTE walks each group's
    insertion order carrying the open-bin remainders as a LIST column,
    computing the same first-fit index the Arrow-batched _pack loop
    computes (operators/packing.py). Every bin's (membership, fill,
    oversize flag) must therefore match bit-for-bit — algorithm
    invariants (no bin over budget, FFD half-full bound) stay pinned in
    test_packing."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import packing

    _, assign = _packed_assignment(spark, sf_dir)
    return packing.packing_summary(assign).orderBy("bin_id")


def q_assemble_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 packed-sequence materialization, ORACLE-CHECKED (the actual
    training artifact): join the FFD assignment back to the documents
    and concatenate each bin's texts in deterministic member order —
    one doc-keyed join + one bin-keyed aggregation; the heavy strings
    move exactly once, straight into their output bin
    (operators/packing.py assemble_bins). The oracle replays the FFD
    assignment via the same recursive CTE as pack_sequences and checks
    the assembled length per bin (sum of member text lengths plus the
    two-char joiner between members); the long sequence string itself
    is reported as a length, keeping the verify payload sane, and the
    exact concatenation order/content invariants are pinned in
    test_packing."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import packing

    d, assign = _packed_assignment(spark, sf_dir)
    bins = packing.assemble_bins(assign, d.select("doc_id", "text"))
    return bins.select(
        "bin_id",
        "n_docs",
        "fill",
        F.length("sequence").alias("seq_chars"),
    ).orderBy("bin_id")


# The FFD state machine replayed in SQL. `rem` is the open-bin
# remainder list for the group; each recursion step inserts the group's
# rn-th document (insertion order = tokens desc, id asc — identical to
# the Arrow _pack loop) and emits its bin index. The first-fit index
# expression appears three times because the recursive member can't
# name a lateral alias.
_FFD_FIT = (
    "list_filter(list_transform(f.rem, (x,i) -> "
    "CASE WHEN x >= o.n_tokens AND x > 0 THEN i END), "
    "v -> v IS NOT NULL)[1]"
)
# the BPE-ish pre-tokenizer regex with the SQL-literal quote doubled
_BPE_PAT_SQL = (
    "''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\\sa-zA-Z0-9]+"
)


def _ffd_oracle_cte(base_sql: str, budget: int) -> str:
    """Recursive-CTE FFD replay over ``base_sql``, which must yield
    (doc_id, n_tokens, grp). Produces the ``assign`` CTE with one row
    per input doc: (bin_id, doc_id, n_tokens, oversize) — identical to
    pack_sequences' Arrow _pack loop given the same grouping and
    budget."""
    return f"""
WITH RECURSIVE
tok AS ({base_sql}),
ordered AS (
  SELECT doc_id, n_tokens, grp,
         row_number() OVER (PARTITION BY grp ORDER BY n_tokens DESC, doc_id ASC) AS rn
  FROM tok
),
ffd AS (
  SELECT grp, 0 AS step,
         CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS n_tokens,
         CAST(NULL AS INTEGER) AS bin_idx, CAST(NULL AS BOOLEAN) AS oversize,
         CAST([] AS BIGINT[]) AS rem
  FROM (SELECT DISTINCT grp FROM ordered)
  UNION ALL
  SELECT o.grp, f.step + 1, o.doc_id, o.n_tokens,
         CASE WHEN o.n_tokens > {budget} THEN len(f.rem)
              WHEN {_FFD_FIT} IS NOT NULL THEN {_FFD_FIT} - 1
              ELSE len(f.rem) END AS bin_idx,
         o.n_tokens > {budget} AS oversize,
         CASE WHEN o.n_tokens > {budget} THEN list_append(f.rem, 0)
              WHEN {_FFD_FIT} IS NOT NULL THEN
                   list_transform(f.rem, (x,i) -> CASE WHEN i = {_FFD_FIT} THEN x - o.n_tokens ELSE x END)
              ELSE list_append(f.rem, {budget} - o.n_tokens) END AS rem
  FROM ffd f JOIN ordered o ON o.grp = f.grp AND o.rn = f.step + 1
),
assign AS (
  SELECT CAST(grp AS BIGINT) * 4294967296 + bin_idx AS bin_id,
         doc_id, n_tokens, oversize
  FROM ffd WHERE step > 0
)
"""


_FFD_CTE = _ffd_oracle_cte(
    f"""
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{_BPE_PAT_SQL}')) AS BIGINT) AS n_tokens,
         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) % 8 AS grp
  FROM documents
""",
    budget=512,
)

_ORACLE_PACK_SEQUENCES = (
    _FFD_CTE
    + """
SELECT bin_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS fill,
       max(oversize) AS oversize
FROM assign
GROUP BY bin_id ORDER BY bin_id
"""
)

_ORACLE_ASSEMBLE_BINS = (
    _FFD_CTE
    + """
SELECT bin_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS fill,
       CAST(sum(length(d.text)) + 2 * (count(*) - 1) AS INTEGER) AS seq_chars
FROM assign JOIN documents d USING (doc_id)
GROUP BY bin_id ORDER BY bin_id
"""
)


def q_recipe_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship-adjacent composite, ORACLE-CHECKED end-to-end: the
    data-RECIPE side of a training run, chaining the X-family operators
    the way a corpus build actually uses them —

      1. source-mixture resampling with UPsampling (src0 x2, src5 x1,
         src10 x0.5, src15 x0.25; Pile/LLaMA-style weights) with a
         copy index so replicas stay addressable;
      2. a Gopher-ish quality gate (token count and mean word length
         in range — the same closed form as quality_filter);
      3. FFD sequence packing of the surviving (doc, copy) replicas
         into 256-token training bins (portable grouping, so the
         oracle replays the exact bin assignment).

    Output: per-bin (bin_id, n_docs, fill, oversize). Every stage is
    deterministic and engine-portable, so DuckDB replays the WHOLE
    chain — mixture via range+unnest, the gate as a predicate, packing
    via the recursive-CTE FFD state machine. The curation_pipeline
    composite covers the dedup/split side; this covers the recipe side
    (operators/sampling.py, operators/packing.py)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import packing, sampling

    d = load_table(spark, sf_dir, "documents")
    mixed = sampling.mixture_sample(
        d,
        {"src0": 2.0, "src5": 1.0, "src10": 0.5, "src15": 0.25},
        salt="recipe",
        copy_col="copy_idx",
    )
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    n_tok = F.size(F.split(norm, " ")).cast("long")
    mwl = (F.length(norm) - (n_tok - 1)).cast("double") / n_tok.cast("double")
    gated = (
        mixed.select(
            (F.col("doc_id") * 4 + F.col("copy_idx")).alias("uid"),
            n_tok.alias("n_tokens"),
            F.round(mwl, 6).alias("_mwl"),
        )
        .where((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 500))
        .where((F.col("_mwl") >= 2.0) & (F.col("_mwl") <= 10.0))
    )
    assign = packing.pack_sequences(
        gated.select("uid", "n_tokens"),
        id_col="uid",
        tokens_col="n_tokens",
        budget=256,
        num_groups=8,
        group_expr=_portable_pack_group("uid", 8),
    )
    return packing.packing_summary(assign).orderBy("bin_id")


_ORACLE_RECIPE_PIPELINE = (
    _ffd_oracle_cte(
        r"""
  SELECT doc_id * 4 + i AS doc_id, n_tokens,
         CAST('0x' || substring(md5(CAST(doc_id * 4 + i AS VARCHAR)), 1, 4) AS INTEGER) % 8 AS grp
  FROM (
    SELECT doc_id,
           CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens,
           round(CAST(length(norm) - (len(string_split(norm, ' ')) - 1) AS DOUBLE)
                 / CAST(len(string_split(norm, ' ')) AS DOUBLE), 6) AS mwl,
           CASE WHEN source = 'src0' THEN 2
                WHEN source = 'src5' THEN 1
                WHEN source = 'src10'
                  THEN CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':recipe'), 1, 4) < '8000'
                            THEN 1 ELSE 0 END
                WHEN source = 'src15'
                  THEN CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':recipe'), 1, 4) < '4000'
                            THEN 1 ELSE 0 END
                ELSE 0 END AS copies
    FROM (SELECT doc_id, source,
                 trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
          FROM documents)
  ), unnest(range(0, copies)) AS u(i)
  WHERE n_tokens BETWEEN 10 AND 500 AND mwl BETWEEN 2.0 AND 10.0
""",
        budget=256,
    )
    + """
SELECT bin_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS fill,
       max(oversize) AS oversize
FROM assign
GROUP BY bin_id ORDER BY bin_id
"""
)


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 PII scrubbing: typed placeholder substitution (<EMAIL>, <CC>,
    <IBAN>, <PHONE>, <IP>) plus per-class match counts, all native
    regexp — map-side projection, the right shape for scrubbing 100 TB.
    The documents corpus is synthetic word soup with no PII, so the
    query plants all five classes deterministically from customer
    fields (name -> email, custkey -> card/IBAN/phone/IP) and both
    engines redact the same text (patterns restricted to the regex
    subset RE2 and java.util.regex read identically)."""
    c = load_table(spark, sf_dir, "customer")
    return _pii_projection(c)


def _pii_projection(c: DataFrame) -> DataFrame:
    """The PII-scrub projection over the customer shape — pure Column
    expressions, so it applies unchanged to batch frames AND streams
    (q_streaming_pii). Plants all five PII classes (email, payment
    card, IBAN, phone, IPv4) deterministically from customer fields so
    both engines scrub the identical text."""
    key = F.col("c_custkey")
    phone = F.concat_ws(
        "-",
        (key % 90 + 10).cast("string"),
        F.lpad((key % 1000).cast("string"), 3, "0"),
        F.lpad(((key * 7) % 1000).cast("string"), 3, "0"),
        F.lpad(((key * 13) % 10000).cast("string"), 4, "0"),
    )
    card = F.concat_ws(
        "-",
        F.lpad(((key * 3) % 10000).cast("string"), 4, "0"),
        F.lpad(((key * 7) % 10000).cast("string"), 4, "0"),
        F.lpad(((key * 11) % 10000).cast("string"), 4, "0"),
        F.lpad(((key * 17) % 10000).cast("string"), 4, "0"),
    )
    iban = F.concat(
        F.lit("DE"),
        F.lpad((key % 100).cast("string"), 2, "0"),
        F.lpad(((key * 31) % 1000000000).cast("string"), 9, "0"),
        F.lpad(((key * 37) % 1000000000).cast("string"), 9, "0"),
    )
    synth = F.concat(
        F.col("c_mktsegment"),
        F.lit(" customer "),
        F.lower(F.regexp_replace(F.col("c_name"), "[^A-Za-z0-9]", "")),
        F.lit("@example.com tel "),
        phone,
        F.lit(" card "),
        card,
        F.lit(" iban "),
        iban,
        F.lit(" ip 10.0."),
        (key % 256).cast("string"),
        F.lit(".1 end"),
    )
    n_emails, n_ccs, n_ibans, n_phones, n_ips = text.pii_counts(synth)
    return c.select(
        "c_custkey",
        text.redact_pii(synth).alias("redacted"),
        n_emails.alias("n_emails"),
        n_ccs.alias("n_ccs"),
        n_ibans.alias("n_ibans"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
    )


def q_streaming_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7+X9 composition, ORACLE-CHECKED: the PII-scrub projection is a
    stateless streaming stage — applied to a file stream of the
    customer table, driven to completion in append mode, the sink holds
    exactly the batch projection (same _ORACLE_PII_REDACTION). Proves
    the hygiene layer composes with Structured Streaming unchanged; at
    scale this is the scrub-on-ingest topology (no second pass over
    stored data)."""
    import uuid

    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    path, schema = _events_stream_src(spark, sf_dir, table="customer")
    stream = W.read_events_stream(spark, path, schema, max_files_per_trigger=4)
    name = f"q_pii_stream_{uuid.uuid4().hex[:8]}"
    q = W.run_to_memory(_pii_projection(stream), name, output_mode="append")
    q.stop()
    return spark.table(name)


def q_streaming_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7+X8 composition, ORACLE-CHECKED: benchmark decontamination as
    a stateless streaming stage. The eval corpus's hashed 4-gram set is
    built once batch-side (bounded driver collect — benchmarks are
    tiny) and shipped as a broadcast literal; each arriving training
    document probes it with array_intersect over its own gram array —
    no join, no aggregation, no state — so the stage runs in append
    mode and the sink holds exactly the batch decontamination report
    (same _ORACLE_DECONTAMINATE as q_decontaminate). At scale this is
    contamination-screening-on-ingest: fresh crawl data is scored
    against the benchmark set before it ever lands in the corpus
    (operators/decontam.py contamination_stateless)."""
    import uuid

    from data_pipeline_bigquery_to_sftp_server_spark.operators import decontam
    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    d = load_table(spark, sf_dir, "documents")
    eval_grams = decontam.collect_eval_grams(
        d.where(F.col("doc_id") % 20 == 0), "text", n=4
    )
    path, schema = _events_stream_src(spark, sf_dir, table="documents")
    stream = W.read_events_stream(spark, path, schema, max_files_per_trigger=4)
    train_stream = stream.where(F.col("doc_id") % 20 != 0)
    report = decontam.contamination_stateless(
        train_stream, eval_grams, "doc_id", "text", n=4
    )
    name = f"q_decontam_stream_{uuid.uuid4().hex[:8]}"
    q = W.run_to_memory(report, name, output_mode="append")
    q.stop()
    return spark.table(name)


def q_streaming_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7+X21 composition, ORACLE-CHECKED: the trained NB model
    deployed to a stream — collected once batch-side (vocab x classes,
    MBs) and shipped as a task closure; each arriving document scores
    against it with no join, no aggregation, no state, so the stage
    runs in append mode and the sink holds exactly the batch
    classification (same _ORACLE_NB_CLASSIFY as q_nb_classify). The
    classify-on-ingest deployment shape of a learned quality/language
    filter (operators/nb.py classify_stateless)."""
    import uuid

    from data_pipeline_bigquery_to_sftp_server_spark.operators import nb
    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    d = load_table(spark, sf_dir, "documents")
    model = nb.collect_nb_model(d.where(F.col("doc_id") % 5 != 0), "text", "lang", 1.0)
    path, schema = _events_stream_src(spark, sf_dir, table="documents")
    stream = W.read_events_stream(spark, path, schema, max_files_per_trigger=4)
    scored = nb.classify_stateless(
        stream.where(F.col("doc_id") % 5 == 0), model, "doc_id", "text"
    )
    name = f"q_classify_stream_{uuid.uuid4().hex[:8]}"
    q = W.run_to_memory(scored, name, output_mode="append")
    q.stop()
    return spark.table(name)


def q_streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7+X20 composition, ORACLE-CHECKED: exact-dedup screen-on-ingest
    as a stream. The corpus dedup state is built once batch-side
    (operators/dedup_state.py build_dedup_state), then the incoming
    docs (doc_id % 10 == 0) arrive as a file stream and each
    micro-batch probes the state's DISTRIBUTED fingerprint frame via a
    stream-static left outer join — stateless, append-mode, and unlike
    the X17/X22 closure deployments the corpus side is never collected
    (it is the unbounded side of this operator). The sink holds
    exactly the batch twin's exact_dup column: the same membership
    semantics the oracle replays for q_incremental_dedup /
    q_stateful_dedup, restricted to (doc_id, exact_dup)."""
    import uuid

    from data_pipeline_bigquery_to_sftp_server_spark.operators import dedup_state
    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    # NULL text is filtered on BOTH sides (matching the oracle's
    # text IS NOT NULL): xxhash64(normalize_text(NULL)) would collapse
    # every NULL-text doc onto one constant fingerprint while SQL's
    # IN-subquery yields NULL — a latent divergence even though the
    # fixture has no NULL texts today.
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # with_bloom=False: the stream-static exact screen probes the
    # distributed fingerprint frame directly, so the bloom tier's eager
    # build pass would be paid for nothing here
    state = dedup_state.build_dedup_state(
        d.where(F.col("doc_id") % 10 != 0), "doc_id", "text", with_bloom=False
    )
    path, schema = _events_stream_src(spark, sf_dir, table="documents")
    stream = W.read_events_stream(spark, path, schema, max_files_per_trigger=4)
    screened = dedup_state.exact_screen_stream(
        stream.where((F.col("doc_id") % 10 == 0) & F.col("text").isNotNull()), state
    )
    name = f"q_incdedup_stream_{uuid.uuid4().hex[:8]}"
    q = W.run_to_memory(screened, name, output_mode="append")
    q.stop()
    return spark.table(name)


def q_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X41 INGEST LIFECYCLE COMPOSITE, ORACLE-CHECKED: the reference's
    sync loop (fetch → screen-against-existing → upsert, main.py's
    existing-ids membership) at content level, through the full
    three-tier machinery: Bloom prefilter (map-side, no join) → exact
    fingerprint verify against the held DedupState (only
    maybe-duplicates reach the join) → absorb the accepted batch into
    the state → RE-SCREEN the whole batch against the absorbed state.
    Output per batch doc: ``(doc_id, exact_dup, dup_after_absorb)``.
    The oracle replays exact_dup as corpus membership and pins the
    lifecycle invariant the re-screen must produce: after absorb,
    EVERY batch doc's content is in the state (original dups were
    already there; accepted docs were just folded in), so
    dup_after_absorb is uniformly true — computed the long way through
    absorb_batch + a second screen on the Spark side."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import bloom, dedup_state
    from data_pipeline_bigquery_to_sftp_server_spark.operators.dedup import (
        normalize_text,
    )

    # NULL-text filter on both sides, matching the oracle (see
    # q_streaming_incremental_dedup's note on the constant-fingerprint
    # collapse a NULL would cause).
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    batch = d.where(F.col("doc_id") % 10 == 0)
    corpus = d.where(F.col("doc_id") % 10 != 0)
    # r8: the bloom tier is a MEMBER of the state (built once with it,
    # OR-folded on absorb) — the probe reads state.bloom instead of
    # rebuilding a separate bitmap per run
    state = dedup_state.build_dedup_state(corpus, "doc_id", "text")
    fp = batch.select(
        "doc_id",
        "text",
        F.xxhash64(normalize_text(F.col("text"))).alias("_fp"),
        bloom.bloom_flag(
            normalize_text(F.col("text")),
            state.bloom,
            num_hashes=state.bloom_num_hashes,
            seed=state.bloom_seed,
        ).alias("_maybe"),
    )
    store = state.fingerprints.dropDuplicates(["_fp"])
    dup_ids = (
        fp.where(F.col("_maybe"))
        .join(store, "_fp", "left_semi")
        .select(F.col("doc_id").alias("_did"))
        .withColumn("_e", F.lit(1))
    )
    accepted = batch.join(
        dup_ids, batch["doc_id"] == dup_ids["_did"], "left_anti"
    )
    state2 = dedup_state.absorb_batch(state, accepted)
    after_ids = (
        fp.join(state2.fingerprints.dropDuplicates(["_fp"]), "_fp", "left_semi")
        .select(F.col("doc_id").alias("_aid"))
        .withColumn("_a", F.lit(1))
    )
    return (
        batch.select("doc_id")
        .join(dup_ids, F.col("doc_id") == F.col("_did"), "left")
        .join(after_ids, F.col("doc_id") == F.col("_aid"), "left")
        .select(
            "doc_id",
            F.col("_e").isNotNull().alias("exact_dup"),
            F.col("_a").isNotNull().alias("dup_after_absorb"),
        )
    )


_ORACLE_INGEST_PIPELINE = r"""
WITH cfp AS (
  SELECT DISTINCT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nm
  FROM documents WHERE doc_id % 10 != 0 AND text IS NOT NULL
)
SELECT d.doc_id,
       trim(regexp_replace(lower(d.text), '\s+', ' ', 'g')) IN (SELECT nm FROM cfp) AS exact_dup,
       TRUE AS dup_after_absorb
FROM documents d
WHERE d.doc_id % 10 = 0 AND d.text IS NOT NULL
"""


def q_streaming_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7+X31 composition, ORACLE-CHECKED: the Gopher rule battery as
    a quality-gate-on-ingest streaming stage — gopher_flags is a pure
    zero-shuffle projection, so it lifts to an append-mode stream
    unchanged and the sink holds exactly the batch report (same
    _ORACLE_GOPHER_RULES restricted to the streamed slice). The
    production deployment of a quality filter: score documents BEFORE
    they land in the corpus, not in a second pass over stored data."""
    import uuid

    from data_pipeline_bigquery_to_sftp_server_spark.functions.text import gopher_flags
    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    path, schema = _events_stream_src(spark, sf_dir, table="documents")
    stream = W.read_events_stream(spark, path, schema, max_files_per_trigger=4)
    flagged = (
        stream.where(F.col("text").isNotNull() & (F.col("doc_id") % 4 == 0))
        .select("doc_id", gopher_flags(F.col("text")).alias("g"))
        .select("doc_id", "g.*")
    )
    name = f"q_quality_stream_{uuid.uuid4().hex[:8]}"
    q = W.run_to_memory(flagged, name, output_mode="append")
    q.stop()
    return spark.table(name)


_ORACLE_STREAMING_INCREMENTAL_DEDUP = r"""
WITH cfp AS (
  SELECT DISTINCT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nm
  FROM documents WHERE doc_id % 10 != 0 AND text IS NOT NULL
)
SELECT d.doc_id,
       trim(regexp_replace(lower(d.text), '\s+', ' ', 'g')) IN (SELECT nm FROM cfp) AS exact_dup
FROM documents d
WHERE d.doc_id % 10 = 0 AND d.text IS NOT NULL
"""


_ORACLE_PII_REDACTION = r"""
WITH t AS (
  SELECT c_custkey,
         c_mktsegment || ' customer ' ||
         lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g')) ||
         '@example.com tel ' ||
         CAST(c_custkey % 90 + 10 AS VARCHAR) || '-' ||
         lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
         lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0') || '-' ||
         lpad(CAST((c_custkey * 13) % 10000 AS VARCHAR), 4, '0') ||
         ' card ' ||
         lpad(CAST((c_custkey * 3) % 10000 AS VARCHAR), 4, '0') || '-' ||
         lpad(CAST((c_custkey * 7) % 10000 AS VARCHAR), 4, '0') || '-' ||
         lpad(CAST((c_custkey * 11) % 10000 AS VARCHAR), 4, '0') || '-' ||
         lpad(CAST((c_custkey * 17) % 10000 AS VARCHAR), 4, '0') ||
         ' iban DE' || lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0') ||
         lpad(CAST((c_custkey * 31) % 1000000000 AS VARCHAR), 9, '0') ||
         lpad(CAST((c_custkey * 37) % 1000000000 AS VARCHAR), 9, '0') ||
         ' ip 10.0.' || CAST(c_custkey % 256 AS VARCHAR) || '.1 end' AS txt
  FROM customer
), s AS (
  SELECT c_custkey, txt,
         regexp_replace(txt,
           '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
           '<EMAIL>', 'g') AS after_email
  FROM t
), s2 AS (
  SELECT c_custkey, txt, after_email,
         regexp_replace(after_email,
           '\b(?:[0-9]{4}[- ]){3}[0-9]{4}\b|\b[2-6][0-9]{12,18}\b',
           '<CC>', 'g') AS after_cc
  FROM s
), s3 AS (
  SELECT *, regexp_replace(after_cc,
           '\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\b',
           '<IBAN>', 'g') AS after_iban
  FROM s2
), s4 AS (
  SELECT *, regexp_replace(after_iban,
           '\b[0-9]{2,3}-[0-9]{3}-[0-9]{3,4}(-[0-9]{4})?\b',
           '<PHONE>', 'g') AS after_phone
  FROM s3
)
SELECT c_custkey,
       regexp_replace(after_phone, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b',
                      '<IP>', 'g') AS redacted,
       len(regexp_extract_all(txt,
           '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}')) AS n_emails,
       len(regexp_extract_all(after_email,
           '\b(?:[0-9]{4}[- ]){3}[0-9]{4}\b|\b[2-6][0-9]{12,18}\b')) AS n_ccs,
       len(regexp_extract_all(after_cc,
           '\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\b')) AS n_ibans,
       len(regexp_extract_all(after_iban,
           '\b[0-9]{2,3}-[0-9]{3}-[0-9]{3,4}(-[0-9]{4})?\b')) AS n_phones,
       len(regexp_extract_all(after_phone,
           '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ips
FROM s4
"""


def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/S6: CSV sink + glob source roundtrip (the reference's
    SFTP↔storage CSV flows, README.md:110-112), oracle-checked: export
    supplier as header CSV, read it back through the glob reader with
    the original explicit schema, aggregate per nation. Proves the CSV
    codec preserves types/values, not just that files appear."""
    import tempfile

    from data_pipeline_bigquery_to_sftp_server_spark.sources import files

    s = load_table(spark, sf_dir, "supplier")
    out = _scratch_dir("csv_roundtrip_")
    files.write_csv_single(s, out)
    back = files.read_csv(spark, f"{out}/*.csv", schema=s.schema)
    return (
        back.groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_acctbal"),
            F.min("s_name").alias("first_name"),
        )
        .orderBy("s_nationkey")
    )


_ORACLE_CSV_ROUNDTRIP = """
SELECT s_nationkey,
       count(*) AS n_suppliers,
       round(sum(s_acctbal), 2) AS total_acctbal,
       min(s_name) AS first_name
FROM supplier
GROUP BY s_nationkey
ORDER BY s_nationkey
"""


def q_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 at scale — hive-partitioned parquet sink + partition-pruned
    scan, ORACLE-CHECKED: write orders partitioned by order month, read
    back filtering to Q1-1995; the month predicate is satisfied by
    directory pruning (PartitionFilters in the plan — asserted in
    pytest), so only 3 of ~90 month directories are listed or read.
    This is the layout that makes the 100 TB time-range query cheap:
    cost scales with months touched, not table size."""
    import tempfile

    from data_pipeline_bigquery_to_sftp_server_spark.sources import files

    o = load_table(spark, sf_dir, "orders")
    out = _scratch_dir("part_prune_")
    files.write_parquet(
        o.withColumn("o_month", F.date_format("o_orderdate", "yyyy-MM")),
        out,
        partition_by=["o_month"],
    )
    back = spark.read.parquet(out)
    return (
        back.where(F.col("o_month").isin("1995-01", "1995-02", "1995-03"))
        .groupBy("o_month", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("o_month", "o_orderstatus")
    )


_ORACLE_PARTITIONED_PRUNE = """
SELECT strftime(o_orderdate, '%Y-%m') AS o_month, o_orderstatus,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
WHERE strftime(o_orderdate, '%Y-%m') IN ('1995-01', '1995-02', '1995-03')
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_streaming_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7/§2.9: watermarked session_window streaming agg driven to
    completion on a file stream of events — ORACLE-CHECKED: append mode
    emits exactly the sessions the final watermark (global max event
    time − 2 h, independent of micro-batch boundaries) has closed, so
    the finished stream is deterministic and DuckDB replays it as a
    gaps-and-islands CTE filtered to watermark-closed sessions.
    Session-break parity pin: ``session_window`` windows are half-open
    [start, last_event + gap), so an event at exactly last + gap opens
    a NEW session — the oracle's island rule is ``ts >= prev + gap``,
    not ``>``."""
    import uuid

    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    path, schema = _events_stream_src(spark, sf_dir)
    stream = W.read_events_stream(spark, path, schema, max_files_per_trigger=8)
    name = f"q_sess_stream_{uuid.uuid4().hex[:8]}"
    q = W.run_to_memory(
        W.session_counts(stream, gap="30 minutes", watermark="2 hours"), name
    )
    q.stop()
    return spark.table(name).select(
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_start"
        ),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_end"
        ),
        "user_id",
        "n_events",
        F.round("total_value", 4).alias("total_value"),
    )


_ORACLE_STREAMING_SESSION = """
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS sess_id
  FROM g
), agg AS (
  SELECT user_id, min(ts) AS s0, max(ts) + INTERVAL 30 MINUTE AS s1,
         count(*) AS n_events, round(sum(value), 4) AS total_value
  FROM s GROUP BY user_id, sess_id
)
SELECT strftime(s0, '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(s1, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       user_id, n_events, total_value
FROM agg
WHERE s1 <= (SELECT max(ts) FROM events) - INTERVAL 2 HOUR
"""


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 multimodal plumbing, end-to-end and oracle-checked: documents
    become opaque binary payloads (UTF-8 bytes stand in for image/audio
    blobs), the Arrow-batched ``mapInPandas`` decode/feature stage runs
    for real, and the SQL-expressible outputs (byte count, payload
    digest) hash-match DuckDB. The fake-decoded feature vector itself is
    covered by tests/test_multimodal.py."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import multimodal

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("doc").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    feats = multimodal.extract_features(media, dim=8, algo="sha256")
    return feats.select("media_id", "n_bytes", "digest")


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 video frame sampling, ORACLE-CHECKED: documents stand in as
    videos with a deterministic duration; the ``mapInPandas`` flatMap
    row explosion (one output row per sampled frame) runs for real and
    the SQL-expressible outputs — frame index, timestamp, sampled-frame
    byte count — hash-match DuckDB's range() expansion. The frame
    payload bytes themselves are stub-decoded (codecs absent) and
    pinned in tests/test_multimodal.py."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import multimodal

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("video/fake").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        ((F.col("doc_id") % 10 + 1) * 1000).cast("long").alias("duration_ms"),
    )
    frames = multimodal.sample_frames(media, every_ms=750)
    return frames.select(
        "media_id",
        "frame_idx",
        "ts_ms",
        F.length("frame").cast("long").alias("frame_bytes"),
    )


_ORACLE_MEDIA_FRAMES = """
SELECT doc_id AS media_id,
       CAST(i AS INT) AS frame_idx,
       CAST(i * 750 AS BIGINT) AS ts_ms,
       CAST(least(octet_length(CAST(text AS BLOB)), 64) AS BIGINT) AS frame_bytes
FROM documents,
     unnest(range(0, CAST(ceil(((doc_id % 10 + 1) * 1000) / 750.0) AS BIGINT))) AS u(i)
"""


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 image resize stage, ORACLE-CHECKED: documents stand in as
    images; metadata edits stay JVM-side and the stub resampler's
    byte-count contract (payload truncated to max(32, w*h/64)) is
    SQL-replayable, so before/after byte counts hash-match DuckDB.
    Real pixel resampling is the stubbed codec slot
    (tests/test_multimodal.py pins the plumbing)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import multimodal

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("mime"),
        (64 + (F.col("doc_id") % 8) * 16).cast("int").alias("width"),
        (64 + (F.col("doc_id") % 5) * 16).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    before = media.select(
        "media_id", F.length("payload").cast("long").alias("n_bytes_before")
    )
    resized = multimodal.resize_images(media, width=64, height=64)
    return (
        resized.select(
            "media_id",
            "width",
            "height",
            F.length("payload").cast("long").alias("n_bytes_after"),
        )
        .join(before, "media_id")
    )


_ORACLE_MEDIA_RESIZE = """
SELECT doc_id AS media_id,
       CAST(64 AS INT) AS width,
       CAST(64 AS INT) AS height,
       CAST(least(octet_length(CAST(text AS BLOB)), 64) AS BIGINT) AS n_bytes_after,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes_before
FROM documents
"""


# DuckDB sha256(varchar) digests the UTF-8 bytes — exactly the payload
# the Spark side hashes.
_ORACLE_MEDIA_FEATURES = """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS digest
FROM documents
"""


def q_curation_pipeline(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """Flagship X-family composite — the full training-data curation
    chain in ONE lazy plan, every stage individually oracle-proven
    elsewhere in this corpus:

      1. quality filter: >= 5 tokens and bigram repetition ratio < 0.6
         (q_repetition_scores semantics)
      2. near-dup dedup: exact-Jaccard pair graph -> connected
         components -> keep only each cluster's minimum-id member
         (q_dedup_clusters semantics); unpaired docs survive
      3. deterministic split: md5-hash train/val/test 80/10/10
         (q_hash_split semantics)
      4. rollup: per (split, lang) doc counts + mean chars

    Scale: stages 1 and 3 are map-side; stage 2 restricts the shared
    materialized pair set (shared_jaccard_pairs — Jaccard is a per-pair
    property, so full-corpus pairs filtered to quality survivors equal
    pairs computed on the survivors directly) plus diameter-bounded
    label propagation; the rollup is a partial-aggregable groupBy.
    Nothing collects to the driver.

    ``checkpoint_dir``: fault-tolerance mode for the two materialized
    intermediates (the quality frame and every label-propagation
    round). Default None uses ``localCheckpoint`` — fastest, but
    executor-local, so an executor loss aborts the job on a real
    cluster. Pass a reliable directory (HDFS/S3/DBFS) in production;
    it is threaded through to ``connected_components``, which scopes,
    rotates, and garbage-collects its round checkpoints there. The
    quality frame's own checkpoint is scoped the same way; its path is
    exposed as ``result.curation_checkpoint_path`` — delete it after
    materializing the rollup. The context-global checkpoint dir is
    restored before this function returns."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sampling

    d = load_table(spark, sf_dir, "documents")

    # stage 1 — quality filter
    toks = F.split(dedup.normalize_text(F.col("text")), " ")
    n = F.size(toks)
    shifted = F.slice(toks, 2, F.greatest(n - 1, F.lit(1)))
    zipped = F.zip_with(toks, shifted, lambda a, b: F.concat_ws(" ", a, b))
    grams = F.when(n >= 2, F.slice(zipped, 1, n - 1)).otherwise(
        F.array().cast("array<string>")
    )
    rep = (
        d.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg((F.max("cnt").cast("double") / F.sum("cnt")).alias("rep_ratio"))
    )
    # Materialized once: the quality frame feeds BOTH the pair
    # restriction and the final anti-join/split — without a checkpoint
    # Spark recomputes the explode+double-agg repetition subtree for
    # each consumer. Reliable checkpoint when a directory is given
    # (survives executor loss); executor-local otherwise.
    quality = (
        d.withColumn("n_tok", n)
        .join(rep, "doc_id")
        .where((F.col("n_tok") >= 5) & (F.col("rep_ratio") < 0.6))
        .select("doc_id", "text", "lang", "n_chars")
    )
    quality_dir = None
    if checkpoint_dir is not None:
        # Mirror connected_components' housekeeping: the quality frame's
        # reliable checkpoint lives in its own scoped subdirectory, the
        # context-global checkpoint dir is restored before continuing
        # (connected_components below scopes its own), and the scoped
        # path is exposed on the result as ``curation_checkpoint_path``
        # so the caller can delete it once the rollup is materialized.
        import uuid

        quality_dir = checkpoint_dir.rstrip("/") + f"/cur-{uuid.uuid4().hex}"
        prev = spark.sparkContext._jsc.sc().getCheckpointDir()
        spark.sparkContext.setCheckpointDir(quality_dir)
        try:
            quality = quality.checkpoint(eager=True)
        finally:
            spark.sparkContext.setCheckpointDir(
                prev.get() if prev.isDefined() else None
            )
    else:
        quality = quality.localCheckpoint(eager=True)

    # stage 2 — near-dup cluster dedup (keep cluster minimum; unpaired pass).
    # Pair generation is the shared prefix-filtered trigram join (shuffle
    # key = rare shingle, no corpus broadcast — the 100 TB-safe shape),
    # restricted to quality survivors by two id-keyed joins.
    qa = quality.select(F.col("doc_id").alias("id_a"))
    qb = quality.select(F.col("doc_id").alias("id_b"))
    pairs = shared_jaccard_pairs(spark, sf_dir).join(qa, "id_a").join(qb, "id_b")
    comp = dedup.connected_components(pairs, checkpoint_dir=checkpoint_dir)
    dropped = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    kept = quality.join(dropped, "doc_id", "left_anti")

    # stages 3+4 — deterministic split, rollup
    split = kept.withColumn(
        "split",
        sampling.split_column(
            F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}, salt="cur1"
        ),
    )
    out = (
        split.groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("split", "lang")
    )
    if quality_dir is not None:
        out.curation_checkpoint_path = quality_dir
    return out


_ORACLE_CURATION_PIPELINE = r"""
WITH RECURSIVE t AS (
  SELECT doc_id, text, lang, n_chars,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS gram
  FROM t WHERE len(w) >= 2
), c AS (
  SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram
), rep AS (
  SELECT doc_id, CAST(max(cnt) AS DOUBLE) / sum(cnt) AS rep_ratio
  FROM c GROUP BY doc_id
), quality AS (
  SELECT t.doc_id, t.text, t.lang, t.n_chars
  FROM t JOIN rep ON t.doc_id = rep.doc_id
  WHERE len(t.w) >= 5 AND rep.rep_ratio < 0.6
), base AS (
  SELECT doc_id AS _id,
         CASE WHEN len(w) < 3 THEN [trim(regexp_replace(lower(text), '\s+', ' ', 'g'))]
              ELSE list_distinct(list_transform(range(1, len(w) - 1),
                                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         END AS sh
  FROM (SELECT doc_id, text,
               string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
        FROM quality)
), pairs AS (
  SELECT l._id AS id_a, r._id AS id_b
  FROM base l JOIN base r ON l._id < r._id
  WHERE CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE) /
        CAST(len(list_distinct(list_concat(l.sh, r.sh))) AS DOUBLE) >= 0.5
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
), reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
), labels AS (
  SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a
), kept AS (
  SELECT q.* FROM quality q
  LEFT JOIN labels l ON q.doc_id = l.node AND l.node <> l.component
  WHERE l.node IS NULL
), split AS (
  SELECT lang, n_chars,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':cur1'), 1, 4) < 'cccc'
              THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':cur1'), 1, 4) < 'e666'
              THEN 'val'
              ELSE 'test' END AS split
  FROM kept
)
SELECT split, lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
FROM split
GROUP BY split, lang
ORDER BY split, lang
"""


def q_streaming_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 stream-stream join, ORACLE-CHECKED: signup -> purchase
    conversion pairs per user within one hour, computed by joining two
    watermarked streams of the events table. The time-bound join
    condition lets Spark evict state (each side buffers only
    watermark + bound of history); inner-join semantics guarantee the
    finished stream equals the batch join, which DuckDB replays.

    Scale: join state is bounded by events-per-hour x key cardinality,
    independent of stream length — the property that makes this run
    forever on an unbounded stream."""
    import uuid

    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    path, schema = _events_stream_src(spark, sf_dir)
    signups = W.read_events_stream(spark, path, schema, max_files_per_trigger=8).where(
        F.col("event_type") == "signup"
    )
    purchases = W.read_events_stream(spark, path, schema, max_files_per_trigger=8).where(
        F.col("event_type") == "purchase"
    )
    joined = W.stream_stream_join(
        signups, purchases, key="user_id", within="1 hour", watermark="30 days"
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    out = joined.select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("signup_id"),
        F.col("r.event_id").alias("purchase_id"),
        F.date_format(F.col("l.ts"), fmt).alias("signup_ts"),
        F.date_format(F.col("r.ts"), fmt).alias("purchase_ts"),
    )
    name = f"q_ssj_{uuid.uuid4().hex[:8]}"
    q = W.run_to_memory(out, name, output_mode="append")
    q.stop()
    return spark.table(name).orderBy("user_id", "signup_id", "purchase_id")


_ORACLE_STREAMING_JOIN = """
SELECT s.user_id AS user_id,
       s.event_id AS signup_id,
       p.event_id AS purchase_id,
       strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS signup_ts,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
FROM events s
JOIN events p
  ON s.user_id = p.user_id
 AND p.ts > s.ts
 AND p.ts <= s.ts + INTERVAL 1 HOUR
WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
ORDER BY user_id, signup_id, purchase_id
"""


def q_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: watermarked tumbling-window streaming agg driven to
    completion on a file stream of the events table, ORACLE-CHECKED:
    ``complete`` output mode emits every window (including ones the
    watermark hasn't closed), so the finished stream equals the batch
    GROUP BY — which DuckDB can run. Complete mode holds the whole
    result in state; that's fine for a bounded window-count result even
    at 100 TB of input (state is windows × event_type, not rows), but
    unbounded-key complete sinks would not be — those use append mode
    (streaming_session) or foreachBatch (streaming_upsert)."""
    import uuid

    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    path, schema = _events_stream_src(spark, sf_dir)
    stream = W.read_events_stream(spark, path, schema, max_files_per_trigger=8)
    name = f"q_stream_{uuid.uuid4().hex[:8]}"
    q = W.run_to_memory(
        W.tumbling_counts(stream, window_len="1 hour", watermark="2 hours"),
        name,
        output_mode="complete",
    )
    q.stop()
    fmt = "yyyy-MM-dd HH:mm:ss"
    return spark.table(name).select(
        F.date_format("window_start", fmt).alias("window_start"),
        F.date_format("window_end", fmt).alias("window_end"),
        "event_type",
        "n",
        F.round("total_value", 4).alias("total_value"),
    )


_ORACLE_STREAMING_TUMBLING = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
       event_type,
       count(*) AS n,
       round(sum(value), 4) AS total_value
FROM events
GROUP BY 1, 2, 3
"""


def q_streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: sliding-window streaming agg (1h window, 15min slide) driven
    to completion in complete output mode, ORACLE-CHECKED: each event
    belongs to exactly 4 overlapping windows, which DuckDB reproduces
    by cross-joining the 4 slide offsets. Same bounded-state argument
    as streaming_tumbling (state is windows x event_type)."""
    import uuid

    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    path, schema = _events_stream_src(spark, sf_dir)
    stream = W.read_events_stream(spark, path, schema, max_files_per_trigger=8)
    name = f"q_slide_stream_{uuid.uuid4().hex[:8]}"
    q = W.run_to_memory(
        W.sliding_counts(
            stream, window_len="1 hour", slide="15 minutes", watermark="2 hours"
        ),
        name,
        output_mode="complete",
    )
    q.stop()
    return spark.table(name).select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
    )


_ORACLE_STREAMING_SLIDING = """
SELECT strftime(time_bucket(INTERVAL 15 MINUTE, ts) - o.off * INTERVAL 15 MINUTE,
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n
FROM events
CROSS JOIN (SELECT unnest(range(4)) AS off) o
GROUP BY 1, 2
"""


def q_streaming_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + J1: the reference's staging+MERGE loop (main.py:338-388)
    generalized to a stream, ORACLE-CHECKED. The staging batch is split
    into 4 parquet files fed one-per-micro-batch through foreachBatch;
    each batch MERGEs into the running target (anti-join + union,
    lineage cut with localCheckpoint so the plan doesn't grow per
    batch). Staging is key-unique, so the final table is independent of
    batch order and equals the one-shot batch MERGE — DuckDB runs that.
    At scale the localCheckpoint slot is a Delta/Iceberg MERGE inside
    foreachBatch; checkpointed idempotent-per-key batches give
    effectively-exactly-once, the same argument the reference relied
    on."""
    import tempfile

    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    o = load_table(spark, sf_dir, "orders")
    updates, inserts = _staged_orders(o)
    staging = updates.unionByName(inserts)
    src = _scratch_dir("upsert_stream_src_")
    ckpt = _scratch_dir("upsert_stream_ckpt_")
    staging.repartition(4).write.mode("overwrite").parquet(src)

    state = {"target": o.localCheckpoint()}

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        merged = merge.upsert_anti_union(state["target"], batch_df, "o_orderkey")
        state["target"] = merged.localCheckpoint()

    stream = (
        spark.readStream.schema(staging.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = W.streaming_upsert(stream, apply_batch, ckpt)
    q.processAllAvailable()
    q.stop()
    return state["target"]


def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 streaming form + §2.9, ORACLE-CHECKED: watermarked
    dropDuplicates over a file stream that delivers the whole events
    table TWICE (the same parquet file under two names, one per
    micro-batch). The second delivery is fully suppressed by dedup
    state, so the append-mode output equals SELECT-from-events once —
    exactly the at-least-once -> effectively-exactly-once upgrade the
    reference's keyed MERGE provided (main.py:349-358), here as a
    streaming operator. State is one key per event inside the watermark
    horizon; at 100 TB the horizon bounds it to the late-data window."""
    import glob as globmod
    import shutil
    import tempfile
    import uuid

    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    ev = load_table(spark, sf_dir, "events")
    stage = _scratch_dir("events_dedup_stage_")
    src = _scratch_dir("events_dedup_src_")
    ev.coalesce(1).write.mode("overwrite").parquet(stage)
    part = globmod.glob(f"{stage}/part-*.parquet")[0]
    shutil.copy(part, f"{src}/delivery1.parquet")
    shutil.copy(part, f"{src}/delivery2.parquet")

    stream = W.read_events_stream(spark, src, ev.schema, max_files_per_trigger=1)
    deduped = W.streaming_dedup(
        stream, key_cols=("event_id",), watermark="3650 days"
    )
    name = f"q_dedup_stream_{uuid.uuid4().hex[:8]}"
    q = W.run_to_memory(deduped, name)
    q.stop()
    return spark.table(name).select(
        "event_id",
        "user_id",
        "event_type",
        F.round("value", 4).alias("value"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
    )


_ORACLE_STREAMING_DEDUP = """
SELECT event_id, user_id, event_type, round(value, 4) AS value,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
FROM events
"""


def q_streaming_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10/§2.9 custom stateful operator, ORACLE-CHECKED:
    applyInPandasWithState per-user error-counter (reset on purchase,
    alert at >= 3) driven over FOUR ts-ordered micro-batches (file
    mtimes pin the source order). Update-mode emits one row per key per
    batch; the monotone n_seen version stamp selects the final state,
    which must equal the batch answer DuckDB computes (errors after
    each user's last purchase). State is one 2-long tuple per key —
    bounded by key cardinality, checkpointed by GroupState, so the
    operator survives executor loss at any scale."""
    import glob as globmod
    import os
    import shutil
    import tempfile
    import uuid

    from data_pipeline_bigquery_to_sftp_server_spark.streaming import stateful

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    src = _scratch_dir("events_state_src_")
    wb = Window.orderBy("ts", "event_id")
    parts = ev.withColumn("_b", F.ntile(4).over(wb))
    # ONE pass stages all four batch files (r16 optimization, guide
    # §1.2 "don't compute things you throw away"): the per-tile loop
    # re-evaluated the single-partition ntile window once per file —
    # 4 global sorts of the events table for 4 staged files. A single
    # partitionBy("_b") write from the window's one sorted partition
    # routes rows in order, so each tile file holds exactly the rows,
    # in exactly the order, the filtered per-tile writes produced.
    stage = _scratch_dir("events_state_tiles_")
    parts.coalesce(1).write.mode("overwrite").partitionBy("_b").parquet(stage)
    for i in range(1, 5):
        dst = f"{src}/batch{i}.parquet"
        shutil.copy(globmod.glob(f"{stage}/_b={i}/part-*.parquet")[0], dst)
        os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    name = f"q_state_stream_{uuid.uuid4().hex[:8]}"
    q = (
        stateful.errors_since_purchase(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    updates = spark.table(name)
    wlast = Window.partitionBy("user_id").orderBy(F.desc("n_seen"))
    return (
        updates.withColumn("_rn", F.row_number().over(wlast))
        .where(F.col("_rn") == 1)
        .select("user_id", "n_errors_since_purchase", "alert")
        .orderBy("user_id")
    )


_ORACLE_STREAMING_STATEFUL = """
WITH lp AS (
  SELECT user_id, max(ts) FILTER (WHERE event_type = 'purchase') AS lpts
  FROM events GROUP BY user_id
)
SELECT e.user_id,
       CAST(count(*) FILTER (WHERE e.event_type = 'error'
                             AND (lpts IS NULL OR e.ts > lpts)) AS BIGINT)
         AS n_errors_since_purchase,
       count(*) FILTER (WHERE e.event_type = 'error'
                        AND (lpts IS NULL OR e.ts > lpts)) >= 3
         AS alert
FROM events e JOIN lp ON e.user_id = lp.user_id
GROUP BY e.user_id, lp.lpts
ORDER BY e.user_id
"""


# ---------------------------------------------------------------------------
# TPC-H-shaped relational breadth (Q4/Q7/Q8/Q13/Q15/Q17/Q22 shapes) — widens
# the J*/A*/window coverage of SURVEY §2.3-2.6 with the classic decision-
# support join/agg/subquery patterns the reference delegated to BigQuery.
# ---------------------------------------------------------------------------


def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape (SURVEY §2.3 J3 semi-join + §2.4 A4): orders in a
    quarter having at least one line shipped after the order date,
    counted by priority.

    Scale: the date filter prunes ORDERS before the semi-join, so the
    shuffle on orderkey carries only one quarter of orders; the
    non-equi (shipdate > orderdate) part rides along as a join-side
    predicate instead of a post-join filter."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o_q = o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    late = o_q.join(
        li,
        (o_q.o_orderkey == li.l_orderkey) & (li.l_shipdate > o_q.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_ORACLE_ORDER_PRIORITY_CHECK = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume between two nations by ship
    year — a five-table join where the supplier side and the customer
    side each resolve a nation name.

    Scale: both sides are pre-filtered to the two nations of interest
    BEFORE the lineitem⋈orders shuffle — supplier/nation broadcast
    prunes lineitem, customer/nation broadcast prunes orders — so the
    one big shuffle carries ~2/25 of each fact table; the disjunctive
    pair predicate (which straddles both sides) then runs on the
    already-reduced join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    pair = ("NATION_3", "NATION_8")
    n1 = n.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    supp = (
        s.join(F.broadcast(n1), s.s_nationkey == F.col("s_nkey"))
        .where(F.col("supp_nation").isin(*pair))
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        c.join(F.broadcast(n2), c.c_nationkey == F.col("c_nkey"))
        .where(F.col("cust_nation").isin(*pair))
        .select("c_custkey", "cust_nation")
    )
    o_cn = o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey).select(
        "o_orderkey", "cust_nation"
    )
    joined = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(o_cn, li.l_orderkey == o_cn.o_orderkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_ORACLE_VOLUME_SHIPPING = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
     OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_8's share of supplier revenue among ASIA
    customers per order year — conditional aggregation (share =
    sum(case)/sum) over a snowflake join.

    Scale: region→nation→customer prunes orders via broadcast before
    the fact-fact shuffle (same discipline as star_join); supplier
    nation names ride a 10-row broadcast onto lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    asia_cust = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.where(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    o_asia = (
        o.join(F.broadcast(asia_cust), o.o_custkey == asia_cust.c_custkey)
        .select("o_orderkey", F.year("o_orderdate").cast("long").alias("o_year"))
    )
    supp = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))),
        s.s_nationkey == F.col("s_nkey"),
    ).select("s_suppkey", "supp_nation")
    vol = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(o_asia, li.l_orderkey == o_asia.o_orderkey)
        .select(
            "o_year",
            "supp_nation",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_8", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_ORACLE_MARKET_SHARE = """
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_8' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         n2.n_name AS supp_nation,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
)
GROUP BY o_year
ORDER BY o_year
"""


def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape (§2.3 left-outer family): distribution of order counts
    per customer, including zero-order customers.

    Scale: orders are pre-aggregated to (custkey, count) with map-side
    partial aggregation BEFORE joining customers — the join input
    shrinks from |orders| rows to |customers-with-orders| rows, and the
    left join preserves customers with no orders (count 0). The classic
    formulation (left join then count) shuffles the full fact table."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    ocnt = o.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    per_cust = c.join(ocnt, c.c_custkey == ocnt.o_custkey, "left").select(
        "c_custkey", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("c_count")
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_ORACLE_CUSTOMER_DISTRIBUTION = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) achieving the maximum quarterly revenue —
    aggregate, then keep the rows equal to the global max (scalar-
    subquery-against-own-aggregate pattern).

    Scale: revenue is one row per supplier (tiny after the groupBy), so
    the max side is a single-row broadcast; no second pass over
    lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        s.join(rev, s.s_suppkey == rev.l_suppkey)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_ORACLE_TOP_SUPPLIER = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: average yearly revenue lost if small-quantity orders
    (below half the per-part mean quantity) were not taken, for one
    brand.

    Scale: the correlated per-part average is computed once with a
    map-side-combinable groupBy restricted to the brand's parts
    (broadcast part prune), then broadcast back — two narrow passes
    instead of a correlated-subquery re-scan per row."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    brand_parts = p.where(F.col("p_brand") == "Brand#2").select("p_partkey")
    li_b = li.join(F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = li_b.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li_b.join(F.broadcast(avg_qty), li_b.l_partkey == F.col("a_partkey"))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


_ORACLE_SMALL_QTY_REVENUE = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#2'
  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
"""


def q_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: per-nation count/balance of rich customers
    (above-average positive balance) with no orders since 2000 —
    scalar aggregate subquery + anti-join + grouped agg in one plan.

    Scale: the average is a single-row broadcast; the anti-join
    shuffles customer vs orders pre-filtered by date and projected to
    one column; nation is a 25-row broadcast."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    recent = o.where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    rich = c.join(F.broadcast(avg_bal), c.c_acctbal > F.col("ab")).join(
        recent, c.c_custkey == recent.o_custkey, "left_anti"
    )
    return (
        rich.join(F.broadcast(n), rich.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


_ORACLE_SALES_OPPORTUNITY = """
SELECT n_name, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY n_name
ORDER BY n_name
"""


def q_decimal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DecimalType coverage (§1.2 notes decimal as an engine
    extension): exact money arithmetic — cast to DECIMAL(18,2) before
    summing so the grouped totals are exact, not FP-rounded.

    Scale: decimal sums stay inside Tungsten codegen (no UDF); the
    cast is pushed below the partial aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.sum(price).cast("decimal(18,2)").alias("sum_price"),
            F.min(price).cast("decimal(18,2)").alias("min_price"),
            F.max(price).cast("decimal(18,2)").alias("max_price"),
            F.count("*").alias("n"),
        )
        .orderBy("l_linestatus")
    )


_ORACLE_DECIMAL_AGG = """
SELECT l_linestatus,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price,
       CAST(min(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS min_price,
       CAST(max(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS max_price,
       count(*) AS n
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F18 regex surface beyond regexp_replace: group extraction with
    identical group-index semantics on both engines (first word of the
    part name; numeric brand id re-parsed from 'Brand#N')."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
            F.regexp_extract("p_brand", r"(\d+)", 1).cast("long").alias("brand_num"),
        )
        .groupBy("first_word")
        .agg(
            F.count("*").alias("n"),
            F.max("brand_num").alias("max_brand_num"),
        )
        .orderBy("first_word")
    )


_ORACLE_REGEX_EXTRACT = r"""
SELECT first_word, count(*) AS n, max(brand_num) AS max_brand_num
FROM (
  SELECT regexp_extract(p_name, '^(\w+)', 1) AS first_word,
         CAST(regexp_extract(p_brand, '(\d+)', 1) AS BIGINT) AS brand_num
  FROM part
)
GROUP BY first_word
ORDER BY first_word
"""


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 RANGE frame (value-based, not row-based): per-customer
    trailing-30-day spend at each order. Peers (equal order dates)
    aggregate identically regardless of tie order, which is what makes
    the value hash deterministic.

    Scale: one shuffle on custkey; the frame is evaluated with a
    running multiset inside each partition — no self-join."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_30d"),
    )


_ORACLE_WINDOW_RANGE_FRAME = """
SELECT o_orderkey, o_custkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey
         ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
         RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2) AS trailing_30d
FROM orders
"""


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data splits (X-family): deterministic hash-based
    train/val/test assignment of documents — a pure function of
    doc_id, so the split is reproducible run-to-run, engine-to-engine,
    and stable when files are added or repartitioned (df.sample is
    none of those: its RNG depends on partition position). Oracle
    replays the identical md5-prefix rule in DuckDB and must land
    every row in the same split.

    Scale: assignment is map-side (no shuffle); only the per-split
    per-lang rollup exchanges group rows."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sampling

    d = load_table(spark, sf_dir, "documents")
    split = sampling.hash_split(
        d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="split42"
    )
    return (
        split.groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("split", "lang")
    )


_ORACLE_HASH_SPLIT = """
SELECT split, lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
FROM (
  SELECT lang, n_chars,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split42'), 1, 4) < 'cccc'
              THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split42'), 1, 4) < 'e666'
              THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
GROUP BY split, lang
ORDER BY split, lang
"""


def q_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-family curation: cap every (lang, source) cell at 5 docs,
    chosen by deterministic hash order — quota sampling so no domain
    dominates a corpus. Returns the kept doc ids; the oracle replays
    the identical row_number-over-md5 rule, so both engines must keep
    exactly the same documents."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sampling

    d = load_table(spark, sf_dir, "documents")
    kept = sampling.quota_sample(d, ["lang", "source"], "doc_id", 5, salt="quota1")
    return kept.select("lang", "source", "doc_id").orderBy("lang", "source", "doc_id")


_ORACLE_QUOTA_SAMPLE = """
SELECT lang, source, doc_id
FROM (
  SELECT lang, source, doc_id,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY md5(CAST(doc_id AS VARCHAR) || ':quota1') ASC, doc_id ASC
         ) AS rn
  FROM documents
)
WHERE rn <= 5
ORDER BY lang, source, doc_id
"""


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-family data recipe, ORACLE-CHECKED: source-mixture resampling
    (Pile/DoReMi-style weights) — src0 kept whole, src5 at 50%, src10
    at 25%, src15 at 10%, every other source dropped, each row's fate
    a pure function of md5(doc_id, salt). Map-side filter, no shuffle;
    the oracle replays the identical hash-prefix rule so both engines
    must keep exactly the same documents (operators/sampling.py
    mixture_sample)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sampling

    d = load_table(spark, sf_dir, "documents")
    kept = sampling.mixture_sample(
        d,
        {"src0": 1.0, "src5": 0.5, "src10": 0.25, "src15": 0.1},
        salt="mix1",
    )
    return kept.select("source", "lang", "doc_id").orderBy(
        "source", "lang", "doc_id"
    )


_ORACLE_MIXTURE_SAMPLE = """
SELECT source, lang, doc_id
FROM documents
WHERE (source = 'src0')
   OR (source = 'src5'
       AND substring(md5(CAST(doc_id AS VARCHAR) || ':mix1'), 1, 4) < '8000')
   OR (source = 'src10'
       AND substring(md5(CAST(doc_id AS VARCHAR) || ':mix1'), 1, 4) < '4000')
   OR (source = 'src15'
       AND substring(md5(CAST(doc_id AS VARCHAR) || ':mix1'), 1, 4) < '1999')
ORDER BY source, lang, doc_id
"""


def q_mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X14 upsampling shape, ORACLE-CHECKED: a realistic data recipe
    that UPsamples a high-quality source (src0 x2.5, the Wikipedia-x3
    Pile/LLaMA pattern), keeps src5 whole, thins src10 to 25%, drops
    the rest. Each row of src0 is emitted floor(2.5)=2 times plus one
    extra copy when md5(doc_id, salt) lands under the fractional
    remainder, with a 0-based copy index so replicas stay addressable.
    Map-side posexplode(array_repeat) — no shuffle; the oracle replays
    the identical copy-count rule via range+unnest so both engines
    must emit exactly the same (doc, copy) multiset
    (operators/sampling.py mixture_sample)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sampling

    d = load_table(spark, sf_dir, "documents")
    out = sampling.mixture_sample(
        d,
        {"src0": 2.5, "src5": 1.0, "src10": 0.25},
        salt="mix2",
        copy_col="copy_idx",
    )
    return out.select(
        "source", "doc_id", F.col("copy_idx").cast("long").alias("copy_idx")
    ).orderBy("source", "doc_id", "copy_idx")


_ORACLE_MIXTURE_UPSAMPLE = """
WITH c AS (
  SELECT source, doc_id,
         CASE WHEN source = 'src0'
                THEN 2 + CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':mix2'), 1, 4) < '8000'
                              THEN 1 ELSE 0 END
              WHEN source = 'src5' THEN 1
              WHEN source = 'src10'
                THEN CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':mix2'), 1, 4) < '4000'
                          THEN 1 ELSE 0 END
              ELSE 0 END AS copies
  FROM documents
)
SELECT source, doc_id, CAST(i AS BIGINT) AS copy_idx
FROM c, unnest(range(0, copies)) AS u(i)
ORDER BY source, doc_id, copy_idx
"""


def q_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-family quality gate, ORACLE-CHECKED: CCNet-style perplexity
    signal — per-doc mean negative log2-likelihood under a corpus-
    trained additively-smoothed unigram LM (operators/lm.py). Fully
    relational (one token-keyed agg for the LM, token join, per-doc
    rollup), so DuckDB replays it bit-for-bit on the rounded mean."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import lm

    d = load_table(spark, sf_dir, "documents")
    return lm.unigram_nll_scores(d, "doc_id", "text", smoothing=0.5)


_ORACLE_LM_SCORES = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
  FROM documents
), v AS (
  SELECT t, count(*) AS n FROM toks GROUP BY t
), s AS (
  SELECT sum(n) AS N, count(*) AS V FROM v
)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(-log2((v.n + 0.5) / (s.N + 0.5 * s.V))), 6) AS mean_nll
FROM toks JOIN v USING (t) CROSS JOIN s
GROUP BY doc_id
"""


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X28 CCNet head/middle/tail partition, ORACLE-CHECKED: per-doc
    unigram-LM scores cut into three equal-population buckets PER
    LANGUAGE by deterministic ntile over (mean_nll, doc_id) — the
    published CCNet corpus layout, where consumers choose the
    quality/volume trade-off by bucket instead of a fixed perplexity
    threshold (operators/lm.py perplexity_buckets). DuckDB's ntile has
    identical semantics, so the oracle replays every doc's bucket."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import lm

    d = load_table(spark, sf_dir, "documents")
    return lm.perplexity_buckets(d, "doc_id", "text", "lang", n_buckets=3)


_ORACLE_CCNET_BUCKETS = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
  FROM documents
), v AS (
  SELECT t, count(*) AS n FROM toks GROUP BY t
), s AS (
  SELECT sum(n) AS N, count(*) AS V FROM v
), sc AS (
  SELECT doc_id, count(*) AS n_tokens,
         round(avg(-log2((v.n + 0.5) / (s.N + 0.5 * s.V))), 6) AS mean_nll
  FROM toks JOIN v USING (t) CROSS JOIN s
  GROUP BY doc_id
)
SELECT sc.doc_id, d.lang, sc.n_tokens, sc.mean_nll,
       CAST(ntile(3) OVER (PARTITION BY d.lang
                           ORDER BY sc.mean_nll ASC, sc.doc_id ASC) AS INT) AS bucket
FROM sc JOIN documents d USING (doc_id)
"""


def q_semantic_dedup_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X23+X32 — SemDeDup at its PUBLISHED shape (rows-only: the
    k-means partition isn't SQL-expressible; pair recall vs the global
    exact path is pinned in test_clustering): k-means cluster the
    corpus, search near-dup pairs only WITHIN clusters (per-cluster
    BLAS blocks via applyInPandas — no driver-side matrix, no
    quadratic global term, a jumbo cluster fails loudly via the
    count-first ceiling), then the same connected-components +
    keep-min-id representative plan as the oracle-checked
    q_semantic_dedup. The pair-search stage runs MULTI-PROBE (r8):
    each vector searches its 2 nearest clusters, recovering the
    centroid-boundary pairs single-probe trades away (recall vs the
    global exact path pinned higher in test_clustering); k stays the
    recall/cost dial."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import clustering

    e = load_table(spark, sf_dir, "embeddings")
    _, centers = clustering.kmeans_assign(e, k=8, n_iter=4, seed=42)
    probed = clustering.multi_probe_assign(e, centers, n_probe=2)
    pairs = (
        clustering.within_cluster_pairs(probed, threshold=0.35)
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    clusters = dedup.dedup_clusters(pairs)
    return clusters.select(
        "keep_id",
        "n_members",
        F.concat_ws(",", F.col("members")).alias("members"),
    ).orderBy("keep_id")


def q_cluster_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X32 full-corpus distributed k-means (rows-only: iterative float
    argmin is not SQL-expressible; assignments are pinned against a
    numpy Lloyd reference under identical init in test_clustering).
    Unlike ivf_topk's bounded-sample quantizer this fits on ALL rows —
    per iteration one closure-broadcast Arrow assignment pass (no
    shuffle) + one posexplode aggregation whose exchange carries
    k x dim x n_partitions rows regardless of corpus size
    (operators/clustering.py). Output is the per-cluster corpus-map
    profile."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import clustering

    e = load_table(spark, sf_dir, "embeddings")
    assigned, _ = clustering.kmeans_assign(e, k=8, n_iter=4, seed=42)
    return clustering.cluster_profile(assigned)


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X40 corpus data-card report, ORACLE-CHECKED: the per-source
    observability rollup a curation run publishes (Datasheets/data-card
    practice) — document and token volumes, language diversity,
    exact-duplicate rate (normalized-content multiplicity), and the
    Gopher length-gate pass share, in one pass + one rollup. Every
    number is relational, so the card is auditable cross-engine."""
    from data_pipeline_bigquery_to_sftp_server_spark.functions.text import token_count
    from data_pipeline_bigquery_to_sftp_server_spark.operators.dedup import (
        normalize_text,
    )

    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # content multiplicity keys on the HASH of the normalized text, not
    # the string — the grouping shuffle carries 8 bytes/doc instead of
    # the document body (measured 22 s -> ~8 s at the 100x corpus);
    # hash-for-string equality is the repo's standing dedup contract.
    per_doc = d.select(
        "source",
        "lang",
        token_count(F.col("text")).alias("_toks"),
        F.xxhash64(normalize_text(F.col("text"))).alias("_nm"),
    )
    mult = per_doc.groupBy("_nm").agg(F.count("*").alias("_mult"))
    j = per_doc.join(mult, "_nm")
    return (
        j.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_toks").alias("total_tokens"),
            F.round(F.avg("_toks"), 2).alias("avg_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum((F.col("_mult") > 1).cast("int")).alias("n_dup_docs"),
            F.round(
                F.avg(((F.col("_toks") >= 50) & (F.col("_toks") <= 100000)).cast("int")),
                4,
            ).alias("len_gate_share"),
        )
        .orderBy("source")
    )


_ORACLE_CORPUS_REPORT = r"""
WITH per_doc AS (
  SELECT source, lang,
         len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS toks,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nm
  FROM documents WHERE text IS NOT NULL
), mult AS (
  SELECT nm, count(*) AS m FROM per_doc GROUP BY nm
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS total_tokens,
       round(avg(toks), 2) AS avg_tokens,
       count(DISTINCT lang) AS n_langs,
       CAST(sum(CASE WHEN mult.m > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       round(avg(CASE WHEN toks BETWEEN 50 AND 100000 THEN 1 ELSE 0 END), 4)
         AS len_gate_share
FROM per_doc JOIN mult USING (nm)
GROUP BY source
ORDER BY source
"""


def q_retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X43 embedding-space retrieval eval, ORACLE-CHECKED: for each
    anchor (vec_id % 50 == 0), the rank of its FIRST same-label
    neighbor under exact cosine ordering (self excluded) and the
    reciprocal rank — the kNN/MRR harness that scores an embedding
    space before it is trusted for semantic dedup or ANN retrieval
    (label = relevance). Mean reciprocal rank over anchors is the
    corpus-level metric; per-anchor rows keep the check strong. Same
    broadcast-anchors/one-scan shape as q_hard_negatives."""
    e = load_table(spark, sf_dir, "embeddings")
    anchors = e.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    from pyspark.sql.window import Window

    from data_pipeline_bigquery_to_sftp_server_spark.operators.scale import (
        ensure_parallelism,
    )

    scored = (
        ensure_parallelism(e.select("vec_id", "embedding", "label"))
        .crossJoin(F.broadcast(anchors))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "query_label",
            "vec_id",
            "label",
            # round BEFORE the argmax window (the repo's round-before-
            # rank rule, as in dsir.py's sel_key): a last-ulp Spark/
            # DuckDB float disagreement on near-ties must not flip ranks
            F.round(
                similarity.cosine(
                    F.col("embedding").cast("array<double>"),
                    F.col("query_vec").cast("array<double>"),
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    ranked = scored.withColumn("rnk", F.row_number().over(w))
    first_hit = (
        ranked.where(F.col("label") == F.col("query_label"))
        .groupBy("query_id")
        .agg(F.min("rnk").alias("first_rel_rank"))
    )
    return (
        first_hit.select(
            "query_id",
            "first_rel_rank",
            F.round(F.lit(1.0) / F.col("first_rel_rank"), 6).alias("reciprocal_rank"),
        )
        .orderBy("query_id")
    )


_ORACLE_RETRIEVAL_MRR = r"""
WITH a AS (
  SELECT vec_id AS query_id, embedding AS query_vec, label AS query_label
  FROM embeddings WHERE vec_id % 50 = 0
), ranked AS (
  SELECT a.query_id, a.query_label, e.vec_id, e.label,
         row_number() OVER (
           PARTITION BY a.query_id
           ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                 CAST(a.query_vec AS DOUBLE[])), 6) DESC,
                    e.vec_id ASC) AS rnk
  FROM embeddings e CROSS JOIN a
  WHERE e.vec_id <> a.query_id
)
SELECT query_id,
       CAST(min(rnk) AS INT) AS first_rel_rank,
       round(1.0 / min(rnk), 6) AS reciprocal_rank
FROM ranked
WHERE label = query_label
GROUP BY query_id
ORDER BY query_id
"""


# nDCG discount tables, computed ONCE in driver Python and embedded as
# shortest-round-trip literals in BOTH engines (the Benford/constant
# convention: never call log2 in-engine — libm last-ulp divergence):
# _NDCG_DISC[r] = 1/log2(r+1); _NDCG_IDCG[m] = sum of the first m
# discounts (the ideal DCG when m relevant docs are available).
_NDCG_K = 10
_NDCG_DISC = {r: 1.0 / __import__("math").log2(r + 1) for r in range(1, _NDCG_K + 1)}
_NDCG_IDCG = {0: 0.0}
for _r in range(1, _NDCG_K + 1):
    _NDCG_IDCG[_r] = _NDCG_IDCG[_r - 1] + _NDCG_DISC[_r]


def q_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X91 graded retrieval eval (r11), ORACLE-CHECKED: nDCG@10 per
    anchor over exact cosine ranking with binary same-label relevance —
    the position-sensitive metric next to MRR (which only sees the
    FIRST hit; nDCG scores the whole top-k ordering, the standard
    embedding-benchmark harness). DCG discounts 1/log2(r+1) and the
    ideal-DCG prefix sums are module-level Python literals injected
    into BOTH engines — no in-engine log2, so the only float work is
    a short sum of identical doubles, 6dp-rounded on both sides. The
    ideal normalizer uses min(k, R) with R = the anchor's total
    same-label corpus count (self excluded) — exact, not top-k-local.
    Same broadcast-anchors/one-scan plan as MRR."""
    e = load_table(spark, sf_dir, "embeddings")
    anchors = e.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    from data_pipeline_bigquery_to_sftp_server_spark.operators.scale import (
        ensure_parallelism,
    )

    corpus = ensure_parallelism(e.select("vec_id", "embedding", "label"))
    scored = (
        corpus.crossJoin(F.broadcast(anchors))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "query_label",
            "vec_id",
            "label",
            F.round(
                similarity.cosine(
                    F.col("embedding").cast("array<double>"),
                    F.col("query_vec").cast("array<double>"),
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    top = scored.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= _NDCG_K
    )
    disc = F.lit(0.0)
    for r in range(_NDCG_K, 0, -1):
        disc = F.when(F.col("rnk") == r, F.lit(_NDCG_DISC[r])).otherwise(disc)
    rel = (F.col("label") == F.col("query_label")).cast("int")
    per_anchor = top.groupBy("query_id").agg(
        F.sum(rel).cast("int").alias("n_rel_at_k"),
        F.round(F.sum(rel * disc), 6).alias("dcg"),
    )
    # R = total same-label corpus docs per anchor (self excluded):
    # label counts are a tiny grouped frame, broadcast onto anchors
    label_counts = e.groupBy("label").agg(F.count(F.lit(1)).alias("_lc"))
    rtot = anchors.join(
        F.broadcast(label_counts),
        anchors["query_label"] == label_counts["label"],
    ).select("query_id", (F.col("_lc") - 1).alias("_R"))
    idcg = F.lit(0.0)
    for m in range(_NDCG_K, 0, -1):
        idcg = F.when(
            F.least(F.lit(_NDCG_K), F.col("_R")) == m, F.lit(_NDCG_IDCG[m])
        ).otherwise(idcg)
    return (
        per_anchor.join(rtot, "query_id")
        .select(
            "query_id",
            "n_rel_at_k",
            "dcg",
            F.round(idcg, 6).alias("idcg"),
            F.when(idcg > 0, F.round(F.col("dcg") / idcg, 6))
            .otherwise(F.lit(0.0))
            .alias("ndcg"),
        )
        .orderBy("query_id")
    )


_ORACLE_RETRIEVAL_NDCG = (
    r"""
WITH a AS (
  SELECT vec_id AS query_id, embedding AS query_vec, label AS query_label
  FROM embeddings WHERE vec_id % 50 = 0
), ranked AS (
  SELECT a.query_id, a.query_label, e.label,
         row_number() OVER (
           PARTITION BY a.query_id
           ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                 CAST(a.query_vec AS DOUBLE[])), 6) DESC,
                    e.vec_id ASC) AS rnk
  FROM embeddings e CROSS JOIN a
  WHERE e.vec_id <> a.query_id
), top AS (
  SELECT query_id, query_label, label, rnk,
         CASE rnk """
    + " ".join(
        f"WHEN {r} THEN {_NDCG_DISC[r]!r}" for r in range(1, _NDCG_K + 1)
    )
    + r""" END AS disc
  FROM ranked WHERE rnk <= 10
), per_anchor AS (
  SELECT query_id,
         CAST(sum(CASE WHEN label = query_label THEN 1 ELSE 0 END) AS INT)
           AS n_rel_at_k,
         round(sum(CASE WHEN label = query_label THEN disc ELSE 0.0 END), 6)
           AS dcg
  FROM top GROUP BY query_id
), lc AS (
  SELECT label, count(*) AS n FROM embeddings GROUP BY label
), rtot AS (
  SELECT a.query_id,
         CASE least(10, lc.n - 1) """
    + " ".join(
        f"WHEN {m} THEN {_NDCG_IDCG[m]!r}" for m in range(1, _NDCG_K + 1)
    )
    + r""" ELSE 0.0 END AS idcg_raw
  FROM a JOIN lc ON lc.label = a.query_label
)
SELECT p.query_id, p.n_rel_at_k, p.dcg,
       round(r.idcg_raw, 6) AS idcg,
       CASE WHEN r.idcg_raw > 0 THEN round(p.dcg / r.idcg_raw, 6)
            ELSE 0.0 END AS ndcg
FROM per_anchor p JOIN rtot r USING (query_id)
ORDER BY query_id
"""
)


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X39 hard-negative mining for contrastive training,
    ORACLE-CHECKED: for each anchor (vec_id % 50 == 0), the top-5 most
    cosine-similar corpus vectors with a DIFFERENT label — the
    retrieval step behind training embedding models (high-similarity
    wrong-label examples are the gradient-rich negatives;
    random-negative batches are too easy). Exact scoring here (the
    recall anchor); the corpus-scale path over lsh_topk/ivf_topk
    candidates is operators/retrieval.py hard_negatives_ann — same
    output contract, exercised by q_hard_negatives_ann with a
    self-certifying recall column. Plan: anchors broadcast, corpus
    scanned once, per-anchor top-k window keyed on the anchor id."""
    e = load_table(spark, sf_dir, "embeddings")
    anchors = e.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    from pyspark.sql.window import Window

    from data_pipeline_bigquery_to_sftp_server_spark.operators.scale import (
        ensure_parallelism,
    )

    scored = (
        ensure_parallelism(e.select("vec_id", "embedding", "label"))
        .crossJoin(F.broadcast(anchors))
        .where(F.col("label") != F.col("query_label"))
        .select(
            "query_id",
            "vec_id",
            # round BEFORE the top-k window (round-before-rank rule —
            # see q_retrieval_mrr): near-tie float noise must not flip
            # adjacent ranks between Spark and the oracle
            F.round(
                similarity.cosine(
                    F.col("embedding").cast("array<double>"),
                    F.col("query_vec").cast("array<double>"),
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("query_id", "vec_id", "cos_sim", "rnk")
        .orderBy("query_id", "rnk")
    )


_ORACLE_HARD_NEGATIVES = r"""
WITH a AS (
  SELECT vec_id AS query_id, embedding AS query_vec, label AS query_label
  FROM embeddings WHERE vec_id % 50 = 0
), scored AS (
  SELECT a.query_id, e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      CAST(a.query_vec AS DOUBLE[])), 6) AS cos_sim
  FROM embeddings e CROSS JOIN a
  WHERE e.label <> a.query_label
), ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id ASC) AS rnk
  FROM scored
)
SELECT query_id, vec_id, cos_sim, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 5
ORDER BY query_id, rnk
"""


def q_hard_negatives_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X39b hard-negative mining, ANN tier (rows-only: LSH banding is
    hash-seeded/approximate by construction): the q_hard_negatives
    docstring's corpus-scale path, now real — SRP-LSH candidates
    (k'=40 per anchor) -> label filter -> exact re-rank -> top-5, same
    output contract as the exact twin plus a self-certifying
    ``recall_vs_exact`` column joined from the exact path in the same
    plan (the lsh_topk pattern). Recall floor + full-probe-IVF
    equality pinned in test_retrieval."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import (
        retrieval as R,
    )

    e = load_table(spark, sf_dir, "embeddings")
    anchors = e.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    approx = R.hard_negatives_ann(
        e, anchors, k=5, k_candidates=40, method="lsh",
        dim=64, num_planes=16, bands=8,
    )
    exact = q_hard_negatives(spark, sf_dir).select(
        F.col("query_id").alias("_eq"), F.col("vec_id").alias("_ev")
    )
    hits = approx.alias("a").join(
        exact,
        (F.col("a.query_id") == F.col("_eq")) & (F.col("a.vec_id") == F.col("_ev")),
        "left",
    )
    rec = hits.groupBy(F.col("a.query_id").alias("query_id")).agg(
        F.round(F.count("_ev") / F.lit(5), 4).alias("recall_vs_exact")
    )
    return approx.join(rec, "query_id").orderBy("query_id", "rnk")


def q_retrieval_mrr_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X43b retrieval MRR over ANN candidate lists (rows-only:
    hash-seeded candidates) — operators/retrieval.py retrieval_mrr_ann
    with SRP-LSH candidates, carrying the exact path's
    ``first_rel_rank`` alongside (``exact_first_rel_rank``) so the
    record self-certifies how often the candidate-list rank equals the
    global rank; agreement pinned in test_retrieval."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import (
        retrieval as R,
    )

    e = load_table(spark, sf_dir, "embeddings")
    anchors = e.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    approx = R.retrieval_mrr_ann(
        e, anchors, k_candidates=40, method="lsh",
        dim=64, num_planes=16, bands=8,
    )
    exact = q_retrieval_mrr(spark, sf_dir).select(
        "query_id", F.col("first_rel_rank").alias("exact_first_rel_rank")
    )
    return approx.join(exact, "query_id").orderBy("query_id")


def q_hard_negatives_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X39b at its exactness anchor (r14), ORACLE-CHECKED: the ANN
    hard-negative miner under full-probe IVF with ``k_candidates >=
    |corpus|`` — every inverted list probed and no candidate cut, so
    the candidate set is the whole corpus and the label-filter +
    exact-re-rank + top-5 must equal the exact twin for EVERY anchor
    (not just the fixture the pytest pin runs on). Same
    _ORACLE_HARD_NEGATIVES as the exact path; the production LSH
    configuration stays rows-only with its recall column
    (operators/retrieval.py hard_negatives_ann)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import (
        retrieval as R,
    )

    e = load_table(spark, sf_dir, "embeddings")
    anchors = e.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    out = R.hard_negatives_ann(
        e, anchors, k=5, k_candidates=1 << 30, method="ivf",
        n_centroids=4, n_probe=4,
    )
    return out.select(
        "query_id", "vec_id", "cos_sim", "rnk"
    ).orderBy("query_id", "rnk")


def q_retrieval_mrr_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X43b at its exactness anchor (r14), ORACLE-CHECKED: MRR over
    ANN candidate lists with full-probe IVF and ``k_candidates >=
    |corpus|`` — the candidate list IS the corpus, so within-list
    ranks equal global ranks and the first-relevant rank matches the
    exact path's for every anchor. Shares _ORACLE_RETRIEVAL_MRR; the
    pruned LSH configuration stays rows-only with its agreement
    column (operators/retrieval.py retrieval_mrr_ann)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import (
        retrieval as R,
    )

    e = load_table(spark, sf_dir, "embeddings")
    anchors = e.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    out = R.retrieval_mrr_ann(
        e, anchors, k_candidates=1 << 30, method="ivf",
        n_centroids=4, n_probe=4,
    )
    return out.orderBy("query_id")


def q_bloom_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X38 Bloom-prefiltered exact dedup screen, ORACLE-CHECKED: the
    production two-tier membership pattern — every incoming doc
    (doc_id % 10 == 0) probes a corpus Bloom bitmap MAP-SIDE (no join,
    no shuffle; the bitmap is ~1.2 bytes/doc and rides the task
    closure), and only the maybe-duplicates reach the exact
    fingerprint semi join, shrinking its probe side from |batch| to
    |dups| + FPR·|batch|. Bloom guarantees no false negatives, and the
    exact verify removes false positives, so the final exact_dup
    column is EXACTLY the membership answer — the same oracle as the
    stream-static screen replays it (operators/bloom.py)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import bloom
    from data_pipeline_bigquery_to_sftp_server_spark.operators.dedup import (
        normalize_text,
    )

    # NULL-text filter on both sides, matching the oracle (see
    # q_streaming_incremental_dedup's note).
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    new = d.where(F.col("doc_id") % 10 == 0)
    corpus = d.where(F.col("doc_id") % 10 != 0)
    bm = bloom.build_bloom(corpus, normalize_text(F.col("text")), num_bits=1 << 20)
    maybe = new.withColumn(
        "_maybe", bloom.bloom_flag(normalize_text(F.col("text")), bm)
    )
    corpus_fp = corpus.select(
        F.xxhash64(normalize_text(F.col("text"))).alias("_fp")
    ).dropDuplicates()
    verified = (
        maybe.where(F.col("_maybe"))
        .withColumn("_fp", F.xxhash64(normalize_text(F.col("text"))))
        .join(corpus_fp, "_fp", "left_semi")
        .select(F.col("doc_id").alias("_vid"))
        .withColumn("_e", F.lit(1))
    )
    return (
        new.select("doc_id")
        .join(verified, F.col("doc_id") == F.col("_vid"), "left")
        .select("doc_id", F.col("_e").isNotNull().alias("exact_dup"))
    )


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X37 graph ranking, ORACLE-CHECKED: 3 power iterations of damped
    PageRank with dangling-mass redistribution over a deterministic
    synthetic link graph (each doc links to (7k+1) mod 1009 and
    (13k+3) mod 1009 — the modulus exceeds the id range, so dst-only
    dangling nodes exist and the redistribution term is actually
    exercised). Per-iteration 9dp rounding makes distributed float-sum
    order irrelevant, so the unrolled-CTE oracle replays every rank
    (operators/graph.py pagerank). The crawl-graph importance prior
    corpus curation joins as a quality signal."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import graph

    d = load_table(spark, sf_dir, "documents")
    e = d.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 1) % 1009).alias("dst"),
    ).unionByName(
        d.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 3) % 1009).alias("dst"),
        )
    )
    return graph.pagerank(e, n_iter=3).orderBy("node")


def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2f sorted-neighborhood entity resolution, ORACLE-CHECKED:
    customers sorted by normalized name, candidate pairs within a
    4-position neighborhood, verified by edit distance <= 2 — the
    Hernández/Stolfo blocking that catches near-identical records
    sharing no rare token (the case token/shingle blocking misses).
    Candidate volume is exactly (window-1) x n by construction — the
    skew-free blocking; rank comes from the scalable global-rank plan,
    not a single-partition window; edit distance is the same DP
    levenshtein on both engines (operators/dedup.py
    sorted_neighborhood_pairs)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import dedup as D

    c = load_table(spark, sf_dir, "customer")
    pairs = D.sorted_neighborhood_pairs(
        c, "c_custkey", F.lower(F.col("c_name")), window=4
    )
    return (
        pairs.withColumn(
            "edit_dist", F.levenshtein("key_a", "key_b").cast("int")
        )
        .where(F.col("edit_dist") <= 2)
        .select("id_a", "id_b", "gap", "edit_dist")
        .orderBy("id_a", "id_b")
    )


_ORACLE_SORTED_NEIGHBORHOOD = """
WITH ranked AS (
  SELECT c_custkey AS id, lower(c_name) AS k,
         row_number() OVER (ORDER BY lower(c_name), c_custkey) AS r
  FROM customer
)
SELECT a.id AS id_a, b.id AS id_b, CAST(b.r - a.r AS INT) AS gap,
       CAST(levenshtein(a.k, b.k) AS INT) AS edit_dist
FROM ranked a JOIN ranked b ON b.r - a.r BETWEEN 1 AND 3
WHERE levenshtein(a.k, b.k) <= 2
ORDER BY id_a, id_b
"""


def q_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X37b per-vertex triangle counting, ORACLE-CHECKED: the
    Schank/Wagner degree-orientation algorithm (every triangle has
    exactly one vertex with two out-edges under the acyclic
    (degree, id) orientation, so wedges from common tails + one
    closing-edge semi-join find each triangle once; a hub's edges all
    orient INTO it, so the star-skew wedge explosion is structurally
    impossible — no salting needed). Graph: a deterministic ring chord
    graph over doc_id % 997 (k→k+1, k→k+2, k→7k+1 mod 997) — every
    consecutive triple closes a triangle, the affine chord adds degree
    variety. DuckDB replays orientation, wedges, and closure
    row-for-row (operators/graph.py triangle_counts)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import graph

    d = load_table(spark, sf_dir, "documents")
    n = F.col("doc_id") % 997
    e = (
        d.select(n.alias("src"), ((n + 1) % 997).alias("dst"))
        .unionByName(d.select(n.alias("src"), ((n + 2) % 997).alias("dst")))
        .unionByName(
            d.select(n.alias("src"), ((n * 7 + 1) % 997).alias("dst"))
        )
    )
    return graph.triangle_counts(e).orderBy("node")


_ORACLE_TRIANGLE_COUNTS = """
WITH raw AS (
  SELECT doc_id % 997 AS src, (doc_id % 997 + 1) % 997 AS dst FROM documents
  UNION ALL
  SELECT doc_id % 997, (doc_id % 997 + 2) % 997 FROM documents
  UNION ALL
  SELECT doc_id % 997, ((doc_id % 997) * 7 + 1) % 997 FROM documents
), und AS (
  SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
  FROM raw WHERE src != dst
), deg AS (
  SELECT node, count(*) AS d FROM (
    SELECT lo AS node FROM und UNION ALL SELECT hi AS node FROM und
  ) GROUP BY node
), o AS (
  SELECT CASE WHEN (dl.d, u.lo) < (dh.d, u.hi) THEN u.lo ELSE u.hi END AS t,
         CASE WHEN (dl.d, u.lo) < (dh.d, u.hi) THEN u.hi ELSE u.lo END AS h
  FROM und u JOIN deg dl ON dl.node = u.lo JOIN deg dh ON dh.node = u.hi
), wg AS (
  SELECT x.t AS u, x.h AS v, y.h AS w
  FROM o x JOIN o y ON x.t = y.t
  JOIN deg dv ON dv.node = x.h JOIN deg dw ON dw.node = y.h
  WHERE (dv.d, x.h) < (dw.d, y.h)
), tri AS (
  SELECT u, v, w FROM wg
  WHERE EXISTS (SELECT 1 FROM o WHERE o.t = wg.v AND o.h = wg.w)
), parts AS (
  SELECT unnest([u, v, w]) AS node FROM tri
), pv AS (
  SELECT node, count(*) AS n FROM parts GROUP BY node
)
SELECT d.node, CAST(coalesce(pv.n, 0) AS BIGINT) AS n_triangles
FROM deg d LEFT JOIN pv USING (node)
ORDER BY node
"""


def _pagerank_oracle(n_iter: int = 3) -> str:
    head = r"""
WITH e AS (
  SELECT doc_id AS src, (doc_id * 7 + 1) % 1009 AS dst FROM documents
  UNION ALL
  SELECT doc_id, (doc_id * 13 + 3) % 1009 FROM documents
), verts AS (
  SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
), outdeg AS (
  SELECT src AS node, count(*) AS deg FROM e GROUP BY src
), s AS (
  SELECT count(*) AS n FROM verts
), r0 AS (
  SELECT node, round(1.0 / s.n, 9) AS rank FROM verts CROSS JOIN s
)"""
    step = r""", r{K} AS (
  SELECT v.node,
         round((1 - 0.85) / s.n
               + 0.85 * (coalesce(c.inn, 0) + dm{K}.dm / s.n), 9) AS rank
  FROM verts v
  CROSS JOIN s
  CROSS JOIN (
    SELECT coalesce(sum(rank), 0) AS dm FROM r{P}
    WHERE node NOT IN (SELECT node FROM outdeg)
  ) dm{K}
  LEFT JOIN (
    SELECT e.dst AS node, sum(r.rank / o.deg) AS inn
    FROM e JOIN r{P} r ON r.node = e.src JOIN outdeg o ON o.node = e.src
    GROUP BY e.dst
  ) c ON c.node = v.node
)"""
    body = "".join(step.format(K=k, P=k - 1) for k in range(1, n_iter + 1))
    return (
        head
        + body
        + f"\nSELECT node, round(rank, 6) AS rank FROM r{n_iter} ORDER BY node\n"
    )


_ORACLE_PAGERANK = _pagerank_oracle(3)


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-family extension, ORACLE-CHECKED: change-data-capture between
    two snapshots — one NULL-safe full-outer join classifies every key
    as insert / delete / update / unchanged (operators/merge.py
    snapshot_diff). The value-diff upgrade of the reference's key-only
    sync (main.py decides insert-vs-update by key membership, never
    comparing values). The new snapshot is derived deterministically
    from customer: every 97th key deleted, every 5th balance bumped,
    every 50th key re-inserted under a new id."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import merge

    c = load_table(spark, sf_dir, "customer")
    old = c.select(
        "c_custkey", "c_name", F.round(F.col("c_acctbal").cast("double"), 2).alias("bal")
    )
    base = c.where(F.col("c_custkey") % 97 != 0).select(
        "c_custkey",
        "c_name",
        F.round(
            F.when(
                F.col("c_custkey") % 5 == 0, F.col("c_acctbal").cast("double") + 10
            ).otherwise(F.col("c_acctbal").cast("double")),
            2,
        ).alias("bal"),
    )
    adds = c.where(F.col("c_custkey") % 50 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW "), F.col("c_name")).alias("c_name"),
        F.round(F.col("c_acctbal").cast("double"), 2).alias("bal"),
    )
    new = base.unionByName(adds)
    return merge.snapshot_diff(old, new, "c_custkey").orderBy("c_custkey")


_ORACLE_SNAPSHOT_DIFF = r"""
WITH o AS (
  SELECT c_custkey, c_name, round(CAST(c_acctbal AS DOUBLE), 2) AS bal FROM customer
), n AS (
  SELECT c_custkey, c_name,
         round(CASE WHEN c_custkey % 5 = 0 THEN CAST(c_acctbal AS DOUBLE) + 10
                    ELSE CAST(c_acctbal AS DOUBLE) END, 2) AS bal
  FROM customer WHERE c_custkey % 97 != 0
  UNION ALL
  SELECT c_custkey + 1000000, 'NEW ' || c_name, round(CAST(c_acctbal AS DOUBLE), 2)
  FROM customer WHERE c_custkey % 50 = 0
)
SELECT coalesce(n.c_custkey, o.c_custkey) AS c_custkey,
       CASE WHEN o.c_custkey IS NULL THEN 'insert'
            WHEN n.c_custkey IS NULL THEN 'delete'
            WHEN n.c_name IS DISTINCT FROM o.c_name
              OR n.bal IS DISTINCT FROM o.bal THEN 'update'
            ELSE 'unchanged' END AS op,
       CASE WHEN n.c_custkey IS NULL THEN o.c_name ELSE n.c_name END AS c_name,
       CASE WHEN n.c_custkey IS NULL THEN o.bal ELSE n.bal END AS bal
FROM o FULL OUTER JOIN n ON o.c_custkey = n.c_custkey
ORDER BY c_custkey
"""


def q_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-family extension, ORACLE-CHECKED: slowly-changing-dimension
    type 2 MERGE — changed keys' open rows close at the batch
    timestamp and new versions open, unchanged keys and closed history
    pass through (operators/merge.py scd2_apply). The history-keeping
    upgrade of the reference's in-place MERGE. The oracle is an
    INDEPENDENT re-derivation of the expected interval table (not a
    mirror of the join plan): every 3rd customer changes segment,
    every 100th key arrives new."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import merge

    c = load_table(spark, sf_dir, "customer")
    current = c.select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.lit("2019-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    upd = c.select(
        "c_custkey",
        "c_name",
        F.when(F.col("c_custkey") % 3 == 0, F.lit("MOVED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    ).unionByName(
        c.where(F.col("c_custkey") % 100 == 0).select(
            (F.col("c_custkey") + 1000000).alias("c_custkey"),
            F.concat(F.lit("NEW "), F.col("c_name")).alias("c_name"),
            F.lit("BUILDING").alias("c_mktsegment"),
        )
    )
    out = merge.scd2_apply(current, upd, "c_custkey", batch_ts="2020-06-01")
    return out.orderBy("c_custkey", "valid_from")


_ORACLE_SCD2_APPLY = r"""
SELECT c_custkey, c_name, c_mktsegment, '2019-01-01' AS valid_from,
       CAST(NULL AS VARCHAR) AS valid_to
FROM customer WHERE c_custkey % 3 != 0
UNION ALL
SELECT c_custkey, c_name, c_mktsegment, '2019-01-01', '2020-06-01'
FROM customer WHERE c_custkey % 3 = 0
UNION ALL
SELECT c_custkey, c_name, 'MOVED', '2020-06-01', CAST(NULL AS VARCHAR)
FROM customer WHERE c_custkey % 3 = 0
UNION ALL
SELECT c_custkey + 1000000, 'NEW ' || c_name, 'BUILDING', '2020-06-01',
       CAST(NULL AS VARCHAR)
FROM customer WHERE c_custkey % 100 = 0
ORDER BY c_custkey, valid_from
"""


def q_streaming_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + J10 composition, ORACLE-CHECKED: SCD2 on a stream — the
    screen-on-ingest deployment of the interval MERGE, mirroring how
    dedup (X26) and quality (X42) already ride foreachBatch. The same
    update batch as q_scd2_apply arrives as 4 KEY-PARTITIONED parquet
    files fed one per micro-batch; each batch applies
    merge.scd2_apply against the running dimension (lineage cut per
    batch with localCheckpoint, the streaming_upsert pattern). Because
    the sub-batches partition the update KEYS and share one batch_ts,
    sequential application composes to the one-shot MERGE — keys
    untouched by a sub-batch pass through scd2_apply unchanged — so
    the final dimension is batch-order-independent and the BATCH
    twin's oracle (_ORACLE_SCD2_APPLY) replays it bit-for-bit."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import merge
    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    c = load_table(spark, sf_dir, "customer")
    current = c.select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.lit("2019-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    upd = c.select(
        "c_custkey",
        "c_name",
        F.when(F.col("c_custkey") % 3 == 0, F.lit("MOVED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    ).unionByName(
        c.where(F.col("c_custkey") % 100 == 0).select(
            (F.col("c_custkey") + 1000000).alias("c_custkey"),
            F.concat(F.lit("NEW "), F.col("c_name")).alias("c_name"),
            F.lit("BUILDING").alias("c_mktsegment"),
        )
    )
    src = _scratch_dir("scd2_stream_src_")
    ckpt = _scratch_dir("scd2_stream_ckpt_")
    # key-partitioned split: every key lands in exactly one file, so
    # each micro-batch is key-unique AND key-disjoint from the others —
    # the composition precondition above
    upd.repartition(4, "c_custkey").write.mode("overwrite").parquet(src)

    state = {"dim": current.localCheckpoint()}

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        out = merge.scd2_apply(state["dim"], batch_df, "c_custkey", batch_ts="2020-06-01")
        state["dim"] = out.localCheckpoint()

    stream = (
        spark.readStream.schema(upd.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = W.streaming_upsert(stream, apply_batch, ckpt)
    q.processAllAvailable()
    q.stop()
    return state["dim"].orderBy("c_custkey", "valid_from")


def q_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X36a C4 per-line cleaning, ORACLE-CHECKED: documents (synthesized
    multi-line, the pii_redaction pattern — the documents table is
    single-line word soup, so line structure is built from customer
    fields) keep only lines with >= 5 words AND terminal punctuation;
    emptied documents are discarded. The whole transform is one
    map-side higher-order-function expression — no explode, no shuffle
    (operators/lines.py c4_line_filter)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import lines as L

    c = load_table(spark, sf_dir, "customer")
    txt = F.concat(
        F.col("c_name"), F.lit(" is a "), F.col("c_mktsegment"),
        F.lit(" customer in good standing."), F.lit("\n"),
        F.lit("id "), F.col("c_custkey").cast("string"), F.lit("\n"),
        F.when(
            F.col("c_custkey") % 2 == 0,
            F.lit("Their account balance currently looks healthy."),
        ).otherwise(F.lit("short line")),
    )
    d = c.select(F.col("c_custkey").alias("doc_id"), txt.alias("text"))
    return L.c4_line_filter(d, "doc_id", "text").orderBy("doc_id")


_ORACLE_C4_LINE_FILTER = r"""
WITH d AS (
  SELECT c_custkey AS doc_id,
         c_name || ' is a ' || c_mktsegment || ' customer in good standing.'
         || chr(10) || 'id ' || CAST(c_custkey AS VARCHAR) || chr(10)
         || CASE WHEN c_custkey % 2 = 0
                 THEN 'Their account balance currently looks healthy.'
                 ELSE 'short line' END AS text
  FROM customer
), split AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM d
), kept AS (
  SELECT doc_id, ls,
         list_filter(ls, l ->
           len(string_split(trim(regexp_replace(l, '\s+', ' ', 'g')), ' ')) >= 5
           AND regexp_matches(rtrim(l), '[.!?]["'']?$')) AS ks
  FROM split
)
SELECT doc_id,
       array_to_string(ks, chr(10)) AS text,
       CAST(len(ls) AS INT) AS n_lines,
       CAST(len(ks) AS INT) AS n_kept
FROM kept
WHERE len(ks) > 0
ORDER BY doc_id
"""


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X36b corpus-wide duplicate-line removal, ORACLE-CHECKED: every
    line whose normalized text occurs more than once ACROSS the corpus
    is removed (the C4/Dolma boilerplate rule — nav bars, footers,
    license headers). The synthesized docs carry a global boilerplate
    line (dropped everywhere), a per-segment footer (~n/5 occurrences,
    dropped), and one unique line (kept), so the operator's corpus-
    distributional nature is actually exercised
    (operators/lines.py corpus_line_dedup)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import lines as L

    c = load_table(spark, sf_dir, "customer")
    txt = F.concat(
        F.lit("Subscribe to our newsletter today"), F.lit("\n"),
        F.col("c_name"), F.lit(" wrote unique line number "),
        F.col("c_custkey").cast("string"), F.lit("\n"),
        F.lit("segment "), F.col("c_mktsegment"), F.lit(" homepage footer"),
    )
    d = c.select(F.col("c_custkey").alias("doc_id"), txt.alias("text"))
    return L.corpus_line_dedup(d, "doc_id", "text").orderBy("doc_id")


_ORACLE_LINE_DEDUP = r"""
WITH d AS (
  SELECT c_custkey AS doc_id,
         'Subscribe to our newsletter today' || chr(10)
         || c_name || ' wrote unique line number ' || CAST(c_custkey AS VARCHAR)
         || chr(10) || 'segment ' || c_mktsegment || ' homepage footer' AS text
  FROM customer
), ls AS (
  SELECT doc_id, string_split(text, chr(10)) AS arr FROM d
), lines AS (
  SELECT doc_id, i AS pos, arr[i] AS line,
         trim(regexp_replace(lower(arr[i]), '\s+', ' ', 'g')) AS nm
  FROM ls, unnest(range(1, len(arr) + 1)) AS t(i)
), over_limit AS (
  SELECT nm FROM lines GROUP BY nm HAVING count(*) > 1
), kept AS (
  SELECT doc_id, pos, line FROM lines
  WHERE nm NOT IN (SELECT nm FROM over_limit)
)
SELECT d.doc_id,
       coalesce(k.text, '') AS text,
       CAST(len(string_split(d.text, chr(10))) AS INT) AS n_lines,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
FROM d
LEFT JOIN (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
) k USING (doc_id)
ORDER BY d.doc_id
"""


def q_selection_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X35 END-TO-END SELECTION COMPOSITE, ORACLE-CHECKED through all
    four stages: Gopher length gate (the battery's ok_words rule — the
    one discriminating rule on the synthetic word-soup corpus) →
    DSIR importance resample (k=150 against the src0 target domain) →
    temperature language rebalancing (alpha=0.5, target 100) →
    deterministic shuffle+shard (4 shards). The third composite next
    to curation_pipeline (dedup side) and recipe_pipeline (mixture →
    gate → pack): this one is the SELECTION side — what to keep, in
    what proportions, in what order — and every stage is a
    deterministic pure function of (content, id, salt), so one DuckDB
    query replays the entire chain doc-for-doc, shard position
    included."""
    from data_pipeline_bigquery_to_sftp_server_spark.functions.text import gopher_flags
    from data_pipeline_bigquery_to_sftp_server_spark.operators import dsir, sampling

    from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked

    d = load_table(spark, sf_dir, "documents")
    # the gated pool feeds five consumers (target/raw LM builds, the
    # DSIR score stream, and the two id joins) — persist it once so
    # the gate+tokenize runs one corpus scan, not five
    pool = persist_tracked(
        d.where(F.col("text").isNotNull())
        .withColumn("_g", gopher_flags(F.col("text")))
        .where(F.col("_g.ok_words"))
        .select("doc_id", "lang", "source", "text")
    )
    target = pool.where(F.col("source") == "src0")
    raw = pool.where(F.col("source") != "src0")
    sel = dsir.importance_resample(raw, target, k=150, salt="selpipe")
    # temperature_sample reads its input TWICE (group-count build +
    # probe side) and sel_docs' lineage contains the whole DSIR
    # aggregate — unpersisted, Spark executes DSIR twice in the final
    # plan (no common-subtree dedup). Persisting k<=150 rows costs
    # nothing and halves the chain (r9 profile: 3.1 -> ~2.1 s).
    sel_docs = persist_tracked(pool.join(sel.select("doc_id"), "doc_id"))
    balanced = sampling.temperature_sample(
        sel_docs, "lang", "doc_id", alpha=0.5, target_rows=100, salt="selpipe2"
    )
    kept = pool.join(balanced.select("doc_id"), "doc_id")
    out = sampling.shuffle_shards(kept, "doc_id", n_shards=4, salt="selpipe3")
    return out.select("shard", "pos", "doc_id", "lang").orderBy("shard", "pos")


_ORACLE_SELECTION_PIPELINE = r"""
WITH pool AS (
  SELECT doc_id, lang, source, text
  FROM documents
  WHERE text IS NOT NULL
    AND len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
        BETWEEN 50 AND 100000
), rtoks AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
  FROM pool WHERE source <> 'src0'
), ttoks AS (
  SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
  FROM pool WHERE source = 'src0'
), tv AS (
  SELECT t, count(*) AS tn FROM ttoks GROUP BY t
), rv AS (
  SELECT t, count(*) AS rn FROM rtoks GROUP BY t
), s AS (
  SELECT (SELECT count(*) FROM (SELECT t FROM tv UNION SELECT t FROM rv)) AS vsz,
         (SELECT sum(tn) FROM tv) AS ttot,
         (SELECT sum(rn) FROM rv) AS rtot
), w AS (
  SELECT doc_id,
         round(sum(ln((coalesce(tv.tn, 0) + 0.5) / (s.ttot + 0.5 * s.vsz))
                   - ln((rv.rn + 0.5) / (s.rtot + 0.5 * s.vsz))), 6) AS log_w
  FROM rtoks LEFT JOIN tv USING (t) JOIN rv USING (t) CROSS JOIN s
  GROUP BY doc_id
), sel AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (
             ORDER BY round(log_w + -ln(-ln(
               (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':selpipe'), 1, 12))::BIGINT)::DOUBLE
               / 281474976710656.0)), 6) DESC, doc_id ASC) AS rnk
    FROM w
  ) WHERE rnk <= 150
), seld AS (
  SELECT p.* FROM pool p JOIN sel USING (doc_id)
), g AS (
  SELECT lang, count(*) AS n FROM seld GROUP BY lang
), tot AS (
  SELECT sum(n) AS gn FROM g
), rr AS (
  SELECT lang, n, pow(CAST(n AS DOUBLE) / tot.gn, 0.5) AS wt FROM g CROSS JOIN tot
), z AS (
  SELECT sum(wt) AS sw FROM rr
), pk AS (
  SELECT lang, round(least(1.0, 100.0 * (wt / z.sw) / n), 6) AS p_keep
  FROM rr CROSS JOIN z
), kept AS (
  SELECT d.doc_id, d.lang
  FROM seld d JOIN pk USING (lang)
  WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':selpipe2'), 1, 12))::BIGINT)::DOUBLE
        / 281474976710656.0 < pk.p_keep
), sh AS (
  SELECT doc_id, lang,
         CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':selpipe3:shard'), 1, 12))::BIGINT % 4) AS INT) AS shard,
         md5(CAST(doc_id AS VARCHAR) || ':selpipe3:order') AS oh
  FROM kept
)
SELECT shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY oh ASC, doc_id ASC) AS INT) AS pos,
       doc_id, lang
FROM sh
ORDER BY shard, pos
"""


def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X34 deterministic global shuffle + sharding, ORACLE-CHECKED:
    the curation-to-training materialization step — every doc gets an
    md5-bucket shard and a within-shard rank under an independent
    hash order, yielding a reproducible engine-portable 'globally
    shuffled' training order (everything orderBy(rand()) is not).
    The oracle replays shard AND position for every document
    (operators/sampling.py shuffle_shards)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sampling

    d = load_table(spark, sf_dir, "documents")
    out = sampling.shuffle_shards(d, "doc_id", n_shards=8, salt="shuf1")
    return out.select("shard", "pos", "doc_id").orderBy("shard", "pos")


_ORACLE_SHUFFLE_SHARDS = r"""
WITH s AS (
  SELECT doc_id,
         CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shuf1:shard'), 1, 12))::BIGINT % 8) AS INT) AS shard,
         md5(CAST(doc_id AS VARCHAR) || ':shuf1:order') AS oh
  FROM documents
)
SELECT shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY oh ASC, doc_id ASC) AS INT) AS pos,
       doc_id
FROM s
ORDER BY shard, pos
"""


def q_priority_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X44 cross-source priority dedup, ORACLE-CHECKED: one kept copy
    per exact-content group chosen by (source priority, doc_id) — the
    multi-source curation keep-policy (curated dump beats crawl), vs
    plain dedup's min-id rule. Priority here is the source's numeric
    suffix (src2 beats src7). One 8-byte-hash shuffle; kept rows carry
    the group multiplicity and distinct-source count for the data card
    (operators/dedup.py priority_dedup)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import dedup as D

    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # coalesce the parsed priority: an unparseable source would cast to
    # NULL, and Spark sorts NULLs FIRST asc while DuckDB sorts them
    # LAST — the sentinel removes the latent divergence (all fixture
    # sources parse today; same discipline as the NULL-text screens)
    # no-length-cap substring: the oracle's substr(source, 4) reads to
    # the end of the string, so a >10-char suffix must not truncate on
    # the Spark side only (r8 ADVICE)
    prio = F.coalesce(F.expr("substring(source, 4)").cast("int"), F.lit(999999))
    return D.priority_dedup(d, prio, "doc_id", "text").orderBy("doc_id")


_ORACLE_PRIORITY_DEDUP = r"""
WITH d AS (
  SELECT doc_id, source,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nm,
         coalesce(TRY_CAST(substr(source, 4) AS INT), 999999) AS prio
  FROM documents WHERE text IS NOT NULL
), s AS (
  SELECT nm, count(*) AS n_copies, count(DISTINCT source) AS n_sources
  FROM d GROUP BY nm
), k AS (
  SELECT doc_id, source, nm,
         row_number() OVER (PARTITION BY nm ORDER BY prio ASC, doc_id ASC) AS rn
  FROM d
)
SELECT k.doc_id, k.source, s.n_copies, s.n_sources
FROM k JOIN s USING (nm) WHERE rn = 1
ORDER BY k.doc_id
"""


def q_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X46 contrastive training-pair assembly, ORACLE-CHECKED: per
    anchor (vec_id % 50 == 0) the hardest same-label POSITIVE crossed
    with the 4 hardest different-label NEGATIVES — the
    (anchor, positive, negative_k) rows an InfoNCE batch builder
    consumes, composing the X39 negative miner with hard-positive
    mining in ONE corpus scan (operators/retrieval.py
    contrastive_triplets)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import (
        retrieval as R,
    )

    e = load_table(spark, sf_dir, "embeddings")
    anchors = e.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    return R.contrastive_triplets(e, anchors, n_neg=4).orderBy(
        "query_id", "neg_rank"
    )


_ORACLE_CONTRASTIVE_TRIPLETS = r"""
WITH a AS (
  SELECT vec_id AS query_id, embedding AS query_vec, label AS query_label
  FROM embeddings WHERE vec_id % 50 = 0
), scored AS (
  SELECT a.query_id, a.query_label, e.vec_id, e.label,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      CAST(a.query_vec AS DOUBLE[])), 6) AS cos
  FROM embeddings e CROSS JOIN a
  WHERE e.vec_id <> a.query_id
), pos AS (
  SELECT query_id, vec_id AS pos_id, cos AS pos_cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rn
  FROM scored WHERE label = query_label
), neg AS (
  SELECT query_id, vec_id AS neg_id, cos AS neg_cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS neg_rank
  FROM scored WHERE label <> query_label
)
SELECT p.query_id, p.pos_id, p.pos_cos, n.neg_id, n.neg_cos,
       CAST(n.neg_rank AS INT) AS neg_rank
FROM pos p JOIN neg n USING (query_id)
WHERE p.rn = 1 AND n.neg_rank <= 4
ORDER BY p.query_id, n.neg_rank
"""


def q_curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X45 curriculum-ordered training layout, ORACLE-CHECKED:
    per-doc unigram-LM difficulty (mean NLL — the X15 signal) cut into
    3 equal-population ntile stages, every doc md5-assigned to one of
    8 balanced shards, and positioned so each shard reads easy->hard
    with an independent md5 shuffle WITHIN each stage — the staged
    curriculum-learning materialization (operators/sampling.py
    curriculum_shards). Both engines replay every (shard, pos)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import lm, sampling

    d = load_table(spark, sf_dir, "documents")
    scores = lm.unigram_nll_scores(d, "doc_id", "text", smoothing=0.5).select(
        "doc_id", "mean_nll"
    )
    return sampling.curriculum_shards(
        scores, "mean_nll", "doc_id", n_buckets=3, n_shards=8, salt="cur1"
    ).orderBy("shard", "pos")


_ORACLE_CURRICULUM_SHARDS = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
  FROM documents
), v AS (
  SELECT t, count(*) AS n FROM toks GROUP BY t
), s AS (
  SELECT sum(n) AS N, count(*) AS V FROM v
), sc AS (
  SELECT doc_id,
         round(avg(-log2((v.n + 0.5) / (s.N + 0.5 * s.V))), 6) AS mean_nll
  FROM toks JOIN v USING (t) CROSS JOIN s
  GROUP BY doc_id
), b AS (
  SELECT doc_id, mean_nll,
         CAST(ntile(3) OVER (ORDER BY mean_nll ASC, doc_id ASC) AS INT) AS bucket,
         CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':cur1:cshard'), 1, 12))::BIGINT % 8) AS INT) AS shard,
         md5(CAST(doc_id AS VARCHAR) || ':cur1:corder') AS oh
  FROM sc
)
SELECT shard,
       CAST(row_number() OVER (PARTITION BY shard
                               ORDER BY bucket ASC, oh ASC, doc_id ASC) AS INT) AS pos,
       bucket, doc_id, mean_nll
FROM b
ORDER BY shard, pos
"""


def q_curriculum_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X45+X10 composite, ORACLE-CHECKED end-to-end: curriculum stages
    chained into STAGE-PURE sequence packing — the pipeline junction
    the recipe/selection composites don't cover (a staged training run
    packs each curriculum stage into its own bins so the loader reads
    easy bins before hard ones):

      1. per-doc unigram-LM difficulty (mean NLL, the X15 signal) cut
         into 3 equal-population stages (the X45 machinery — global
         rank + ntile, one shuffle);
      2. whitespace token budgets joined on;
      3. FFD packing into 256-token bins with packing group =
         (stage-1)*8 + md5-shard — bins can NEVER mix stages, and each
         stage still packs across 8 parallel groups (the 100 TB shape:
         group count scales with executors, stage purity is free
         because it rides the group key).

    Output: (stage, bin_id, n_docs, fill, oversize) per bin, stage
    recovered from the bin id's group bits. Every step is
    deterministic and engine-portable, so DuckDB replays the WHOLE
    chain — difficulty CTE, ntile staging, and the recursive-CTE FFD
    state machine (operators/sampling.py, operators/packing.py)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import lm, packing
    from data_pipeline_bigquery_to_sftp_server_spark.operators.relational import (
        ntile_by_rank,
        with_global_rank,
    )

    d = load_table(spark, sf_dir, "documents")
    scores = lm.unigram_nll_scores(d, "doc_id", "text", smoothing=0.5).select(
        "doc_id", "mean_nll"
    )
    ranked, n_rows = with_global_rank(
        scores, ["mean_nll", "doc_id"], rank_col="_grank"
    )
    staged = ranked.withColumn(
        "stage", ntile_by_rank(F.col("_grank"), n_rows, 3)
    ).select("doc_id", "stage")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    toks = d.select(
        "doc_id", F.size(F.split(norm, " ")).cast("long").alias("n_tokens")
    )
    base = staged.join(toks, "doc_id")
    assign = packing.pack_sequences(
        base,
        id_col="doc_id",
        tokens_col="n_tokens",
        budget=256,
        num_groups=24,
        group_expr=(F.col("stage") - 1) * 8 + _portable_pack_group("doc_id", 8),
    )
    return (
        packing.packing_summary(assign)
        .select(
            (F.floor(F.shiftright("bin_id", 32) / 8) + 1)
            .cast("int")
            .alias("stage"),
            "bin_id",
            "n_docs",
            "fill",
            "oversize",
        )
        .orderBy("bin_id")
    )


_ORACLE_CURRICULUM_PACKING = (
    _ffd_oracle_cte(
        r"""
  WITH cptoks AS (
    SELECT doc_id,
           unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
    FROM documents
  ), cpv AS (
    SELECT t, count(*) AS n FROM cptoks GROUP BY t
  ), cps AS (
    SELECT sum(n) AS N, count(*) AS V FROM cpv
  ), cpsc AS (
    SELECT doc_id,
           round(avg(-log2((cpv.n + 0.5) / (cps.N + 0.5 * cps.V))), 6) AS mean_nll
    FROM cptoks JOIN cpv USING (t) CROSS JOIN cps
    GROUP BY doc_id
  ), cpstaged AS (
    SELECT doc_id,
           CAST(ntile(3) OVER (ORDER BY mean_nll ASC, doc_id ASC) AS INT) AS stage
    FROM cpsc
  ), cpcnt AS (
    SELECT doc_id,
           CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
    FROM documents
  )
  SELECT s.doc_id, c.n_tokens,
         (s.stage - 1) * 8 +
         CAST('0x' || substring(md5(CAST(s.doc_id AS VARCHAR)), 1, 4) AS INTEGER) % 8 AS grp
  FROM cpstaged s JOIN cpcnt c USING (doc_id)
""",
        budget=256,
    )
    + """
SELECT CAST((bin_id // 4294967296) // 8 + 1 AS INT) AS stage,
       bin_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS fill,
       max(oversize) AS oversize
FROM assign
GROUP BY bin_id ORDER BY bin_id
"""
)


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X47 winnowing fingerprints, ORACLE-CHECKED row-for-row: the
    MOSS fingerprint-sparsification scheme (Schleimer et al. 2003) —
    per 4-window of 5-gram md5 hashes keep the rightmost minimum, so
    ~2/(w+1) of grams survive while any shared 8-token run still
    collides (operators/dedup.py winnow_fingerprints). md5 keeps the
    selection engine-portable; DuckDB replays every selected
    (doc, pos, fp)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import dedup as D

    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return D.winnow_fingerprints(d, "doc_id", "text", k=5, window=4).orderBy(
        "doc_id", "pos", "fp"
    )


_SQL_WINNOW_BASE = r"""
WITH d AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ls
  FROM documents WHERE text IS NOT NULL
), g AS (
  SELECT doc_id, len(ls) - 4 AS ng, i AS pos,
         substr(md5(array_to_string(ls[i:i+4], ' ')), 1, 16) AS h
  FROM d, unnest(range(1, greatest(len(ls) - 3, 1))) AS t(i)
), keyed AS (
  SELECT doc_id, ng, pos,
         h || lpad(CAST(999999999 - pos AS VARCHAR), 9, '0') AS key
  FROM g
), win AS (
  SELECT doc_id, ng, pos,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wk
  FROM keyed
), sel AS (
  SELECT DISTINCT doc_id,
         CAST(999999999 - CAST(substr(wk, 17, 9) AS INT) AS INT) AS pos,
         substr(wk, 1, 16) AS fp
  FROM win
  WHERE pos <= greatest(ng - 3, 1)
)"""

_ORACLE_WINNOW_FINGERPRINTS = (
    _SQL_WINNOW_BASE + "\nSELECT doc_id, pos, fp FROM sel ORDER BY doc_id, pos, fp\n"
)


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X47b winnowed-fingerprint overlap pairs, ORACLE-CHECKED: the
    MOSS match stage — unordered doc pairs sharing >= 2 distinct
    winnowed fingerprints with the shared count. The candidate join
    runs over the SPARSIFIED set (~2/(w+1) of gram volume), which is
    the scheme's scale advantage over the full positional-gram join
    (operators/dedup.py winnow_overlap_pairs)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import dedup as D

    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    fps = D.winnow_fingerprints(d, "doc_id", "text", k=5, window=4)
    return D.winnow_overlap_pairs(fps, "doc_id", min_shared=2).orderBy(
        "id_a", "id_b"
    )


_ORACLE_WINNOW_PAIRS = (
    _SQL_WINNOW_BASE
    + r"""
, u AS (SELECT DISTINCT doc_id, fp FROM sel)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
FROM u a JOIN u b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= 2
ORDER BY id_a, id_b
"""
)


def q_session_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X50 session-sequence materialization, ORACLE-CHECKED including
    sequence ORDER: the events table as behavioral training data — one
    row per (user, >30-min-gap session) carrying the ordered
    event-type sequence (comma-joined so the hash covers order), the
    analogue of encode_token_ids for the event modality; composes with
    the same packing/curriculum/shard chain downstream
    (operators/sessions.py session_sequences)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sessions

    ev = load_table(spark, sf_dir, "events")
    return sessions.session_sequences(ev).orderBy("user_id", "sess_id")


_ORACLE_SESSION_SEQUENCES = """
WITH g AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, event_id, ts, event_type,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM g
)
SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
       count(*) AS n_events,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
FROM s GROUP BY user_id, sess_id
ORDER BY user_id, sess_id
"""


def q_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X49 QUALITY-SIGNAL ENSEMBLE, ORACLE-CHECKED end-to-end: the
    curation decision real pipelines make — fuse the unigram-LM
    perplexity signal (X15), the Gopher rule battery (X31), and the
    link-graph PageRank prior (X37) into ONE per-doc quality score via
    RANK normalization: each signal's global rank (the r8 scalable
    with_global_rank — no single-partition window, no z-score float
    parity risk: ranks are integers) is averaged and scaled to [0,1].
    Higher = better on every axis (low perplexity, many rules passed,
    high centrality). One DuckDB query replays the whole chain —
    3-iteration PageRank included — making this the fourth
    whole-pipeline certification alongside selection/recipe/curation."""
    from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked
    from data_pipeline_bigquery_to_sftp_server_spark.functions.text import gopher_flags
    from data_pipeline_bigquery_to_sftp_server_spark.operators import graph, lm
    from data_pipeline_bigquery_to_sftp_server_spark.operators.relational import (
        with_global_rank,
    )

    d_all = load_table(spark, sf_dir, "documents")
    d = d_all.where(F.col("text").isNotNull())
    nll = lm.unigram_nll_scores(d, "doc_id", "text", smoothing=0.5).select(
        "doc_id", "mean_nll"
    )
    g = d.select("doc_id", gopher_flags(F.col("text")).alias("_g"))
    npass = g.select(
        "doc_id",
        sum(
            F.col(f"_g.{r}").cast("int")
            for r in [
                "ok_words", "ok_mwl", "ok_sym", "ok_bullet",
                "ok_ellipsis", "ok_alpha", "ok_stop",
            ]
        ).alias("n_passed"),
    )
    # edges come from the UNFILTERED table: the oracle reuses
    # _ORACLE_PAGERANK's edge CTE (FROM documents, no text screen), so
    # the Spark vertex set must match it exactly — a future NULL-text
    # fixture row would otherwise shift rank mass on one side only
    # (r8 ADVICE). The downstream doc_id join re-applies the screen.
    edges = d_all.select(
        F.col("doc_id").alias("src"), ((F.col("doc_id") * 7 + 1) % 1009).alias("dst")
    ).unionByName(
        d_all.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 3) % 1009).alias("dst"),
        )
    )
    pr = graph.pagerank(edges, n_iter=3).select(
        F.col("node").alias("doc_id"), F.col("rank").alias("pr")
    )
    sig = persist_tracked(
        d.select("doc_id").join(nll, "doc_id").join(npass, "doc_id").join(pr, "doc_id")
    )
    # rank-normalize: ascending rank of each GOODNESS direction
    # (neg mean_nll / n_passed / pr all ascending = worst-first).
    # ONE rank pass for all three signals (r9): stack them long-format
    # as (signal, value, doc_id) and take a single global rank ordered
    # by (signal, value, doc_id) — each signal occupies a contiguous
    # block of exactly n ranks, so its per-signal row_number is
    # global_rank - block_offset. One range shuffle + one count job
    # replaces three (the fused plan is also the 100 TB shape: a 3n-row
    # shuffle instead of three n-row shuffles with 3x the fixed
    # sampling/count jobs). Exactness vs the oracle's independent
    # row_numbers holds because blocks are disjoint and each preserves
    # the (value, doc_id) total order.
    stacked = (
        sig.select(
            "doc_id", F.lit("a_lm").alias("_s"),
            (-F.col("mean_nll")).cast("double").alias("_v"),
        )
        .unionByName(
            sig.select(
                "doc_id", F.lit("b_gp").alias("_s"),
                F.col("n_passed").cast("double").alias("_v"),
            )
        )
        .unionByName(
            sig.select(
                "doc_id", F.lit("c_pr").alias("_s"),
                F.col("pr").cast("double").alias("_v"),
            )
        )
    )
    ranked_long, total = with_global_rank(
        stacked, ["_s", "_v", "doc_id"], rank_col="_gr"
    )
    n = total // 3
    offset = (
        F.when(F.col("_s") == "a_lm", F.lit(0))
        .when(F.col("_s") == "b_gp", F.lit(n))
        .otherwise(F.lit(2 * n))
    )
    ranks = (
        ranked_long.withColumn("_r", F.col("_gr") - offset)
        .groupBy("doc_id")
        .agg(F.sum("_r").alias("_rsum"))
    )
    return (
        sig.join(ranks, "doc_id")
        .select(
            "doc_id",
            "mean_nll",
            "n_passed",
            "pr",
            F.round(F.col("_rsum") / F.lit(3.0 * n), 6).alias("quality_score"),
        )
        .orderBy("doc_id")
    )


def _quality_ensemble_oracle() -> str:
    pr_chain = _ORACLE_PAGERANK.rsplit("\nSELECT", 1)[0]
    return (
        pr_chain
        + r"""
, prf AS (
  SELECT node AS doc_id, round(rank, 6) AS pr FROM r3
), toksq AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
  FROM documents WHERE text IS NOT NULL
), vq AS (
  SELECT t, count(*) AS n FROM toksq GROUP BY t
), sq AS (
  SELECT sum(n) AS N, count(*) AS V FROM vq
), nllq AS (
  SELECT doc_id, round(avg(-log2((vq.n + 0.5) / (sq.N + 0.5 * sq.V))), 6) AS mean_nll
  FROM toksq JOIN vq USING (t) CROSS JOIN sq GROUP BY doc_id
), gbase AS (
  SELECT doc_id, text,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks,
         string_split(text, chr(10)) AS lines
  FROM documents WHERE text IS NOT NULL
), gm AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS nw,
         CAST(list_aggregate(list_transform(toks, t -> strlen(t)), 'sum') AS DOUBLE)
           / len(toks) AS mwl,
         (CAST(strlen(text) - strlen(replace(text, '#', '')) AS DOUBLE)
          + CAST(strlen(text) - strlen(replace(text, '...', '')) AS DOUBLE) / 3)
           / len(toks) AS sym_ratio,
         CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) AS DOUBLE)
           / len(lines) AS bullet_frac,
         CAST(len(list_filter(lines, l -> regexp_matches(rtrim(l), '\.\.\.$'))) AS DOUBLE)
           / len(lines) AS ellipsis_frac,
         CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
           / len(toks) AS alpha_frac,
         len(list_filter(['the','be','to','of','and','that','have','with'],
                         st -> list_contains(toks, st))) AS stop_hits
  FROM gbase
), gq AS (
  SELECT doc_id,
         CAST(nw >= 50 AND nw <= 100000 AS INT) + CAST(mwl >= 3 AND mwl <= 10 AS INT)
         + CAST(sym_ratio <= 0.1 AS INT) + CAST(bullet_frac <= 0.9 AS INT)
         + CAST(ellipsis_frac <= 0.3 AS INT) + CAST(alpha_frac >= 0.8 AS INT)
         + CAST(stop_hits >= 2 AS INT) AS n_passed
  FROM gm
), sig AS (
  SELECT d.doc_id, nllq.mean_nll, gq.n_passed, prf.pr
  FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) d
  JOIN nllq USING (doc_id) JOIN gq USING (doc_id) JOIN prf USING (doc_id)
), nq AS (
  SELECT count(*) AS n FROM sig
), ranked AS (
  SELECT doc_id, mean_nll, n_passed, pr,
         row_number() OVER (ORDER BY mean_nll DESC, doc_id ASC) AS r1,
         row_number() OVER (ORDER BY n_passed ASC, doc_id ASC) AS r2,
         row_number() OVER (ORDER BY pr ASC, doc_id ASC) AS r3
  FROM sig
)
SELECT doc_id, mean_nll, n_passed, pr,
       round((r1 + r2 + r3) / (3.0 * nq.n), 6) AS quality_score
FROM ranked CROSS JOIN nq
ORDER BY doc_id
"""
    )


_ORACLE_QUALITY_ENSEMBLE = _quality_ensemble_oracle()


def q_encode_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X48 tokenizer application, ORACLE-CHECKED including sequence
    ORDER: every document as its integer token-id sequence under the
    corpus top-512 word vocabulary (ids in frequency-rank order, OOV
    -> 0) — the materialization step between vocab construction (X29)
    and shard writing; ids ride a comma-joined string so the oracle
    hash covers the exact order (operators/lm.py encode_token_ids)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import lm

    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return lm.encode_token_ids(d, vocab_size=512).orderBy("doc_id")


_ORACLE_ENCODE_TOKEN_IDS = r"""
WITH d AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ls
  FROM documents WHERE text IS NOT NULL
), toks AS (
  SELECT doc_id, i AS pos, ls[i] AS t
  FROM d, unnest(range(1, len(ls) + 1)) AS u(i)
), c AS (
  SELECT t, count(*) AS n FROM toks GROUP BY t
), v AS (
  SELECT t, tok_id FROM (
    SELECT t, row_number() OVER (ORDER BY n DESC, t ASC) AS tok_id FROM c
  ) WHERE tok_id <= 512
), e AS (
  SELECT doc_id, pos, coalesce(v.tok_id, 0) AS id
  FROM toks LEFT JOIN v USING (t)
)
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos) AS ids
FROM e GROUP BY doc_id ORDER BY doc_id
"""


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X31 Gopher quality-rule battery, ORACLE-CHECKED: the published
    Rae et al. 2021 A1.1 filters (word count, mean word length,
    symbol ratio, bullet/ellipsis line fractions, alphabetic-word
    fraction, stop-word presence) as an auditable per-document report
    — every rule's measurement and boolean plus the combined keep
    verdict, so curation can explain drops and tune thresholds.
    Zero-shuffle native expressions; the oracle replays every ratio
    and flag (functions/text.py gopher_flags)."""
    from data_pipeline_bigquery_to_sftp_server_spark.functions.text import gopher_flags

    d = load_table(spark, sf_dir, "documents")
    return (
        d.where(F.col("text").isNotNull())
        .select("doc_id", gopher_flags(F.col("text")).alias("g"))
        .select("doc_id", "g.*")
    )


_ORACLE_GOPHER_RULES = r"""
WITH base AS (
  SELECT doc_id, text,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks,
         string_split(text, chr(10)) AS lines
  FROM documents WHERE text IS NOT NULL
), m AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS nw,
         CAST(list_aggregate(list_transform(toks, t -> strlen(t)), 'sum') AS DOUBLE)
           / len(toks) AS mwl,
         (CAST(strlen(text) - strlen(replace(text, '#', '')) AS DOUBLE)
          + CAST(strlen(text) - strlen(replace(text, '...', '')) AS DOUBLE) / 3)
           / len(toks) AS sym_ratio,
         CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) AS DOUBLE)
           / len(lines) AS bullet_frac,
         CAST(len(list_filter(lines, l -> regexp_matches(rtrim(l), '\.\.\.$'))) AS DOUBLE)
           / len(lines) AS ellipsis_frac,
         CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
           / len(toks) AS alpha_frac,
         len(list_filter(['the','be','to','of','and','that','have','with'],
                         s -> list_contains(toks, s))) AS stop_hits
  FROM base
)
SELECT doc_id,
       CAST(nw AS BIGINT) AS n_words,
       round(mwl, 4) AS mean_word_len,
       round(sym_ratio, 4) AS symbol_ratio,
       round(bullet_frac, 4) AS bullet_frac,
       round(ellipsis_frac, 4) AS ellipsis_frac,
       round(alpha_frac, 4) AS alpha_frac,
       CAST(stop_hits AS INT) AS stop_hits,
       nw >= 50 AND nw <= 100000 AS ok_words,
       mwl >= 3 AND mwl <= 10 AS ok_mwl,
       sym_ratio <= 0.1 AS ok_sym,
       bullet_frac <= 0.9 AS ok_bullet,
       ellipsis_frac <= 0.3 AS ok_ellipsis,
       alpha_frac >= 0.8 AS ok_alpha,
       stop_hits >= 2 AS ok_stop,
       (nw >= 50 AND nw <= 100000) AND (mwl >= 3 AND mwl <= 10)
         AND sym_ratio <= 0.1 AND bullet_frac <= 0.9
         AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
         AND stop_hits >= 2 AS keep
FROM m
"""


_ORACLE_STREAMING_QUALITY_GATE = _ORACLE_GOPHER_RULES.replace(
    "FROM documents WHERE text IS NOT NULL",
    "FROM documents WHERE text IS NOT NULL AND doc_id % 4 = 0",
)




def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X30 multilingual temperature rebalancing, ORACLE-CHECKED: the
    mT5/XLM-R alpha-sampling rule — per-language sampling rates
    ∝ (n_l/N)^0.3 renormalized, rows kept when their engine-portable
    md5 uniform falls under the language's 6dp-rounded keep
    probability, expected total 300 docs with low-resource languages
    upweighted. Deterministic, so the oracle replays the exact kept
    set (operators/sampling.py temperature_sample)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sampling

    d = load_table(spark, sf_dir, "documents")
    out = sampling.temperature_sample(
        d, "lang", "doc_id", alpha=0.3, target_rows=300, salt="temp1"
    )
    return out.orderBy("lang", "doc_id")


_ORACLE_TEMPERATURE_SAMPLE = r"""
WITH g AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY lang
), tot AS (
  SELECT sum(n) AS gn FROM g
), r AS (
  SELECT lang, n, pow(CAST(n AS DOUBLE) / tot.gn, 0.3) AS w FROM g CROSS JOIN tot
), z AS (
  SELECT sum(w) AS sw FROM r
), p AS (
  SELECT lang, round(least(1.0, 300.0 * (w / z.sw) / n), 6) AS p_keep
  FROM r CROSS JOIN z
)
SELECT d.lang, d.doc_id, p.p_keep
FROM documents d JOIN p USING (lang)
WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':temp1'), 1, 12))::BIGINT)::DOUBLE
      / 281474976710656.0 < p.p_keep
ORDER BY d.lang, d.doc_id
"""


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X29 tokenizer-prep vocabulary cut, ORACLE-CHECKED: the smallest
    frequency-ranked token prefix covering 80% of the corpus token
    mass, with rank and cumulative share per kept token — vocabulary
    construction's first step, and the coverage-vs-|V| curve behind
    choosing a tokenizer budget. The cut compares exact integer ratios
    so the boundary cannot drift between engines (operators/lm.py
    vocab_coverage)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import lm

    d = load_table(spark, sf_dir, "documents")
    return lm.vocab_coverage(d, "text", coverage=0.8)


_ORACLE_VOCAB_COVERAGE = r"""
WITH toks AS (
  SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
  FROM documents
), v AS (
  SELECT t, count(*) AS n FROM toks GROUP BY t
), tot AS (
  SELECT sum(n) AS ntot FROM v
), r AS (
  SELECT t, n,
         row_number() OVER (ORDER BY n DESC, t ASC) AS tok_rank,
         sum(n) OVER (ORDER BY n DESC, t ASC ROWS UNBOUNDED PRECEDING) AS cum
  FROM v
)
SELECT t AS token, n, CAST(tok_rank AS INT) AS tok_rank,
       round(CAST(cum AS DOUBLE) / tot.ntot, 6) AS cum_share
FROM r CROSS JOIN tot
WHERE CAST(cum - n AS DOUBLE) / tot.ntot < 0.8
"""


def q_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X27 DSIR-style data selection, ORACLE-CHECKED: every non-src0
    document is scored by the summed per-token ln-likelihood ratio
    between a unigram LM trained on the src0 "target domain" sample
    and one trained on the raw pool itself, then k=100 docs are drawn
    without replacement ∝ their importance weight via the Gumbel
    top-k trick — with the Gumbel noise a pure function of
    (doc_id, salt) through the engine-portable md5 uniform, so DuckDB
    replays the EXACT selection: same weights (6dp), same keys, same
    100 documents, same ranks (operators/dsir.py)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import dsir

    d = load_table(spark, sf_dir, "documents")
    target = d.where(F.col("source") == "src0")
    raw = d.where(F.col("source") != "src0")
    out = dsir.importance_resample(
        raw, target, k=100, id_col="doc_id", text_col="text", salt="dsir1"
    )
    return out.select(
        "doc_id", "n_tokens", "log_w", "sel_key", F.col("rank").alias("sel_rank")
    )


_ORACLE_IMPORTANCE_RESAMPLE = r"""
WITH rtoks AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
  FROM documents WHERE source <> 'src0'
), ttoks AS (
  SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
  FROM documents WHERE source = 'src0'
), tv AS (
  SELECT t, count(*) AS tn FROM ttoks GROUP BY t
), rv AS (
  SELECT t, count(*) AS rn FROM rtoks GROUP BY t
), s AS (
  SELECT (SELECT count(*) FROM (SELECT t FROM tv UNION SELECT t FROM rv)) AS vsz,
         (SELECT sum(tn) FROM tv) AS ttot,
         (SELECT sum(rn) FROM rv) AS rtot
), w AS (
  SELECT doc_id, count(*) AS n_tokens,
         round(sum(ln((coalesce(tv.tn, 0) + 0.5) / (s.ttot + 0.5 * s.vsz))
                   - ln((rv.rn + 0.5) / (s.rtot + 0.5 * s.vsz))), 6) AS log_w
  FROM rtoks LEFT JOIN tv USING (t) JOIN rv USING (t) CROSS JOIN s
  GROUP BY doc_id
), g AS (
  SELECT doc_id, n_tokens, log_w,
         round(log_w + -ln(-ln(
           (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':dsir1'), 1, 12))::BIGINT)::DOUBLE
           / 281474976710656.0)), 6) AS sel_key
  FROM w
)
SELECT doc_id, n_tokens, log_w, sel_key, CAST(sel_rank AS INT) AS sel_rank
FROM (
  SELECT doc_id, n_tokens, log_w, sel_key,
         row_number() OVER (ORDER BY sel_key DESC, doc_id ASC) AS sel_rank
  FROM g
)
WHERE sel_rank <= 100
"""


def q_lm_scores_foreign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X15 production shape, ORACLE-CHECKED: the unigram LM is trained
    on one split (doc_id % 20 != 0) and SCORES the other (doc_id % 20
    == 0) — fresh data against a reference corpus — with unseen tokens
    backing off to the zero-count smoothed probability through the
    left join's NULL count (operators/lm.py)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import lm

    d = load_table(spark, sf_dir, "documents")
    scored = d.where(F.col("doc_id") % 20 == 0)
    train = d.where(F.col("doc_id") % 20 != 0)
    return lm.unigram_nll_scores(scored, "doc_id", "text", 0.5, train=train)


_ORACLE_LM_SCORES_FOREIGN = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
  FROM documents WHERE doc_id % 20 = 0
), ttoks AS (
  SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
  FROM documents WHERE doc_id % 20 != 0
), v AS (
  SELECT t, count(*) AS n FROM ttoks GROUP BY t
), s AS (
  SELECT sum(n) AS N, count(*) AS V FROM v
)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(-log2((coalesce(v.n, 0) + 0.5) / (s.N + 0.5 * s.V))), 6) AS mean_nll
FROM toks LEFT JOIN v USING (t) CROSS JOIN s
GROUP BY doc_id
"""


def q_lm_scores_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X15 bigram LM, ORACLE-CHECKED: per-doc mean NLL over bigram
    transitions with stupid backoff (alpha=0.4), trained on one split
    (doc_id % 20 != 0) and scoring the other — so unseen bigrams
    exercise the backoff branch and unseen tokens the zero-count
    smoothing, both replayed exactly by the oracle. The transition
    model separates shuffled-word text from natural text where the
    unigram model is blind (pinned in test_lm)
    (operators/lm.py bigram_nll_scores)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import lm

    d = load_table(spark, sf_dir, "documents")
    scored = d.where(F.col("doc_id") % 20 == 0)
    train = d.where(F.col("doc_id") % 20 != 0)
    return lm.bigram_nll_scores(scored, "doc_id", "text", 0.5, 0.4, train=train)


_ORACLE_LM_SCORES_BIGRAM = r"""
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(w[2:], (x,i) -> w[i] || ' ' || x)) AS g
  FROM t WHERE doc_id % 20 = 0
), uni AS (
  SELECT tok, count(*) AS n
  FROM (SELECT unnest(w) AS tok FROM t WHERE doc_id % 20 != 0)
  GROUP BY tok
), big AS (
  SELECT g, count(*) AS nb
  FROM (SELECT unnest(list_transform(w[2:], (x,i) -> w[i] || ' ' || x)) AS g
        FROM t WHERE doc_id % 20 != 0)
  GROUP BY g
), s AS (
  SELECT sum(n) AS N, count(*) AS V FROM uni
)
SELECT doc_id, count(*) AS n_bigrams,
       round(avg(CASE WHEN big.nb IS NOT NULL THEN -log2(big.nb / up.n)
                      ELSE -log2(0.4 * ((coalesce(uc.n, 0) + 0.5) / (s.N + 0.5 * s.V)))
                 END), 6) AS mean_nll
FROM bg
LEFT JOIN big USING (g)
LEFT JOIN uni up ON up.tok = split_part(bg.g, ' ', 1)
LEFT JOIN uni uc ON uc.tok = split_part(bg.g, ' ', 2)
CROSS JOIN s
GROUP BY doc_id
"""


def q_nb_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X21 model-based classification, ORACLE-CHECKED: multinomial
    Naive Bayes trained on the labeled split (doc_id % 5 != 0, label =
    lang) and classifying the held-out split — the fastText-style
    learned-classifier stage of LLM pipelines, in the one model family
    whose TRAINING is itself a relational aggregation, so DuckDB
    replays train + inference end-to-end: likelihood table, priors,
    smoothed unseen-token backoff, per-token-normalized posterior, and
    the deterministic argmax (operators/nb.py naive_bayes_scores)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import nb

    d = load_table(spark, sf_dir, "documents")
    scored = d.where(F.col("doc_id") % 5 == 0)
    train = d.where(F.col("doc_id") % 5 != 0)
    return nb.naive_bayes_scores(scored, "doc_id", "text", "lang", 1.0, train=train)


_ORACLE_NB_CLASSIFY = r"""
WITH norm AS (
  SELECT doc_id, lang,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), trt AS (
  SELECT lang AS cls, unnest(w) AS t FROM norm WHERE doc_id % 5 != 0
), sc AS (
  SELECT doc_id, unnest(w) AS t FROM norm WHERE doc_id % 5 = 0
), ct AS (
  SELECT cls, t, count(*) AS n FROM trt GROUP BY cls, t
), tot AS (
  SELECT cls, sum(n) AS tot FROM ct GROUP BY cls
), v AS (
  SELECT count(DISTINCT t) AS vsz FROM trt
), pri AS (
  SELECT lang AS cls,
         CAST(count(*) AS DOUBLE)
           / (SELECT count(*) FROM norm WHERE doc_id % 5 != 0) AS prior
  FROM norm WHERE doc_id % 5 != 0 GROUP BY lang
), pc AS (
  SELECT s.doc_id, p.cls,
         round((log2(p.prior)
                + sum(log2((coalesce(ct.n, 0) + 1.0) / (tot.tot + 1.0 * v.vsz))))
               / count(*), 6) AS score
  FROM sc s
  CROSS JOIN pri p
  LEFT JOIN ct ON ct.cls = p.cls AND ct.t = s.t
  JOIN tot ON tot.cls = p.cls
  CROSS JOIN v
  GROUP BY s.doc_id, p.cls, p.prior
)
SELECT doc_id, cls AS predicted, score AS best_score
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls ASC) AS rn
      FROM pc)
WHERE rn = 1
"""


def q_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 quality signal the Gopher-style filters rely on: bigram
    repetition ratio (count of the most frequent bigram / total
    bigrams). Highly repetitive docs — boilerplate, keyword stuffing,
    degenerate generations — score high and get dropped upstream of
    training.

    Scale: bigrams are built with one zip_with pass over shifted token
    slices (the O(n) construction, see dedup.shingle_hashes), then the
    count is a two-level partial-aggregable groupBy: (doc, gram) then
    (doc). Shuffle carries (doc_id, gram-hash-sized) rows — linear in
    corpus token count, no per-doc UDF."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(dedup.normalize_text(F.col("text")), " ")
    n = F.size(toks)
    shifted = F.slice(toks, 2, F.greatest(n - 1, F.lit(1)))
    zipped = F.zip_with(toks, shifted, lambda a, b: F.concat_ws(" ", a, b))
    grams = F.when(n >= 2, F.slice(zipped, 1, n - 1)).otherwise(
        F.array().cast("array<string>")
    )
    exploded = d.select("doc_id", F.explode(grams).alias("gram"))
    per_gram = exploded.groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.round(F.max("cnt").cast("double") / F.sum("cnt"), 6).alias("rep_ratio"),
            F.sum("cnt").cast("long").alias("n_bigrams"),
        )
        .orderBy("doc_id")
    )


_ORACLE_REPETITION_SCORES = r"""
WITH t AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS gram
  FROM t WHERE len(w) >= 2
), c AS (
  SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram
)
SELECT doc_id,
       round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS rep_ratio,
       CAST(sum(cnt) AS BIGINT) AS n_bigrams
FROM c
GROUP BY doc_id
ORDER BY doc_id
"""


def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 modernized (SURVEY §1.2 'Spark VariantType optional'):
    schema-less semi-structured access — parse events.props into
    VARIANT and extract a typed path, no declared struct schema (the
    from_json route, q_json_extract, needs one). try_parse_json keeps
    the reference's lenient-JSON rule: malformed input -> NULL, not an
    error.

    Scale: VARIANT stores a parsed binary encoding, so repeated path
    extractions don't re-parse the text; extraction is codegen'd
    JVM-side — no UDF, no shuffle beyond the final small agg."""
    e = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.try_parse_json(F.col("props")), "$.k", "bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


_ORACLE_VARIANT_EXTRACT = """
SELECT event_type,
       count(*) AS n_events,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       max(k) AS max_k
FROM (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
ORDER BY event_type
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2d: near-dup pair graph -> connected components -> keep/drop
    rollup (the dedup endgame: pairs alone don't say which docs to
    drop when duplicates chain A~B~C). Spark side is iterative
    min-label propagation with per-round lineage checkpoints; the
    oracle replays it as a recursive-CTE transitive closure.

    Scale: each round shuffles (endpoint, label) pairs — two longs per
    edge — and near-dup clusters are shallow, so rounds ~ diameter ~
    2-4; the pair set itself comes from the bounded-shuffle blocked
    join, never the O(n^2) pair space. Pairs come from the shared
    materialized intermediate (shared_jaccard_pairs)."""
    pairs = shared_jaccard_pairs(spark, sf_dir)
    clusters = dedup.dedup_clusters(pairs)
    return clusters.select(
        "keep_id",
        "n_members",
        F.concat_ws(",", F.col("members")).alias("members"),
    ).orderBy("keep_id")


_ORACLE_DEDUP_CLUSTERS = (
    "WITH RECURSIVE base AS ("
    + _SQL_TRIGRAM_BASE.format(src="documents")
    + r"""), pairs AS (
  SELECT l._id AS id_a, r._id AS id_b
  FROM base l JOIN base r ON l._id < r._id
  WHERE CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE) /
        CAST(len(list_distinct(list_concat(l.sh, r.sh))) AS DOUBLE) >= 0.5
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
), reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
), labels AS (
  SELECT a AS node, least(a, min(b)) AS component
  FROM reach GROUP BY a
)
SELECT component AS keep_id,
       count(*) AS n_members,
       array_to_string(list_sort(list(node)), ',') AS members
FROM labels
GROUP BY component
ORDER BY keep_id
"""
)


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family breadth: ORC sink + source roundtrip, partitioned by
    order status so the read-back filter prunes whole directories
    (same discipline as the hive-partitioned parquet query). Oracle
    aggregates the original parquet — proving the ORC codec preserves
    types and values end-to-end, including timestamps."""
    import tempfile

    from data_pipeline_bigquery_to_sftp_server_spark.sources import files

    o = load_table(spark, sf_dir, "orders")
    out = _scratch_dir("orc_roundtrip_")
    files.write_orc(o, out, partition_by=["o_orderstatus"])
    back = files.read_orc(spark, out)
    return (
        back.where(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("last_order"),
        )
        .orderBy("o_orderpriority")
    )


_ORACLE_ORC_ROUNDTRIP = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price,
       strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_order
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top-20 customers by revenue lost to returned items in
    a quarter — fact⋈fact join followed by grouped agg and a global
    top-k. Deterministic at the limit boundary via a custkey
    tie-break in BOTH engines.

    Scale: orders are date-pruned before the orderkey shuffle and
    lineitem is returnflag-pruned at the scan; the per-customer
    aggregate is tiny, so the final top-k is a TakeOrderedAndProject
    (no full sort). Revenue is summed in DECIMAL so the total is exact
    (a double sum here straddles a half-cent rounding boundary between
    summation orders)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    o_q = o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li_r = li.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    item_rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    rev = (
        li_r.join(o_q, li_r.l_orderkey == o_q.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.round(F.sum(item_rev), 2).cast("double").alias("revenue"))
    )
    return (
        rev.join(c, rev.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_ORACLE_RETURNED_ITEMS = """
SELECT c_custkey, c_name, revenue, c_acctbal, n_name
FROM (
  SELECT c_custkey, c_name, c_acctbal, n_name,
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)
              AS DOUBLE) AS revenue
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    AND l_returnflag = 'R'
  GROUP BY c_custkey, c_name, c_acctbal, n_name
)
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_dup_line_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X51 FineWeb duplicate-line signals, ORACLE-CHECKED: per-document
    fraction of lines (and of characters) whose normalized form occurs
    more than once WITHIN the same document — the highest-impact
    post-dedup quality rules in FineWeb's ablations. Documents are
    synthesized multi-line from customer fields (the c4_line_filter
    pattern — the documents fixture is single-line), with case/space
    variants so the check covers the normalization too. The whole
    computation is one higher-order-function expression per row — zero
    exchanges, embarrassingly parallel (operators/lines.py
    dup_line_signals)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import lines as L

    c = load_table(spark, sf_dir, "customer")
    acct = (F.col("c_custkey") * 7).cast("string")
    txt = F.concat_ws(
        "\n",
        F.concat(F.lit("segment "), F.col("c_mktsegment")),
        F.concat(F.lit("acct "), acct),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(F.lit("Segment   "), F.col("c_mktsegment")),
        ).otherwise(F.concat(F.lit("name "), F.col("c_name"))),
        F.when(
            F.col("c_custkey") % 4 == 0, F.concat(F.lit("ACCT "), acct)
        ).otherwise(
            F.concat(F.lit("nation "), F.col("c_nationkey").cast("string"))
        ),
    )
    d = c.select(F.col("c_custkey").alias("doc_id"), txt.alias("text"))
    return L.dup_line_signals(d, "doc_id", "text").orderBy("doc_id")


_ORACLE_DUP_LINE_SIGNALS = r"""
WITH d AS (
  SELECT c_custkey AS doc_id,
         concat_ws(chr(10),
           'segment ' || c_mktsegment,
           'acct ' || CAST(c_custkey * 7 AS VARCHAR),
           CASE WHEN c_custkey % 3 = 0 THEN 'Segment   ' || c_mktsegment
                ELSE 'name ' || c_name END,
           CASE WHEN c_custkey % 4 = 0 THEN 'ACCT ' || CAST(c_custkey * 7 AS VARCHAR)
                ELSE 'nation ' || CAST(c_nationkey AS VARCHAR) END) AS text
  FROM customer
), t AS (
  SELECT doc_id,
         list_transform(string_split(text, chr(10)),
                        l -> trim(regexp_replace(lower(l), '\s+', ' ', 'g'))) AS lines
  FROM d
), m AS (
  SELECT doc_id, lines,
         list_filter(lines, l -> len(list_filter(lines, x -> x = l)) > 1) AS dups
  FROM t
)
SELECT doc_id,
       len(lines) AS n_lines,
       round(CAST(len(dups) AS DOUBLE) / len(lines), 6) AS dup_line_frac,
       -- length() = CHARACTERS (matches Spark F.length); strlen would
       -- count BYTES and diverge on any non-ASCII line
       round(CASE WHEN coalesce(list_aggregate(list_transform(lines, x -> length(x)), 'sum'), 0) > 0
             THEN CAST(coalesce(list_aggregate(list_transform(dups, x -> length(x)), 'sum'), 0) AS DOUBLE)
                  / list_aggregate(list_transform(lines, x -> length(x)), 'sum')
             ELSE 0.0 END, 6) AS dup_char_frac
FROM m
ORDER BY doc_id
"""


def q_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X52 Tukey-fence length outliers, ORACLE-CHECKED: documents whose
    character count falls outside [q1 - 0.75*iqr, q3 + 0.75*iqr] of
    their SOURCE's exact quartiles — the robust screen for truncated /
    concatenated scrapes run before length-sensitive stages. Exact
    percentile agg per source (bounded group count), fences broadcast
    back, data never shuffles; approx_percentile is the documented
    100 TB swap (operators/sampling.py iqr_outliers)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sampling

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    # k=0.75 (tighter than Tukey's 1.5): the synthetic lengths are
    # near-uniform, so the classic fence flags almost nothing — the
    # tight fence keeps the oracle check over a non-trivial row set
    out = sampling.iqr_outliers(d, "n_chars", "source", k=0.75)
    return (
        out.where(F.col("is_outlier"))
        .select("doc_id", "source", "n_chars", "lo", "hi")
        .orderBy("doc_id")
    )


_ORACLE_IQR_OUTLIERS = """
WITH b AS (
  SELECT source,
         round(quantile_cont(CAST(n_chars AS DOUBLE), 0.25)
               - 0.75 * (quantile_cont(CAST(n_chars AS DOUBLE), 0.75)
                         - quantile_cont(CAST(n_chars AS DOUBLE), 0.25)), 6) AS lo,
         round(quantile_cont(CAST(n_chars AS DOUBLE), 0.75)
               + 0.75 * (quantile_cont(CAST(n_chars AS DOUBLE), 0.75)
                         - quantile_cont(CAST(n_chars AS DOUBLE), 0.25)), 6) AS hi
  FROM documents GROUP BY source
)
SELECT d.doc_id, d.source, d.n_chars, b.lo, b.hi
FROM documents d JOIN b ON d.source IS NOT DISTINCT FROM b.source
WHERE CAST(d.n_chars AS DOUBLE) < b.lo OR CAST(d.n_chars AS DOUBLE) > b.hi
ORDER BY d.doc_id
"""


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X53 ordered funnel analysis, ORACLE-CHECKED: per-user
    view -> click -> purchase progression over the events table, each
    stage's timestamp required to be strictly AFTER the previous
    stage's first occurrence (the product-analytics funnel semantics —
    a purchase before the first view does not count). Output is one
    row per stage with reached-user counts and conversion vs stage 1.

    Plan: three type-filtered user-keyed min-aggregations chained by
    join (each shuffle carries one row per surviving user; partial
    aggs map-side-combine the event stream), then three one-row counts
    — no windows over the raw stream, no driver-side state. At 100 TB
    the stream is scanned once per stage with the event-type filter
    pushed to the scan."""
    from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked

    e = load_table(spark, sf_dir, "events")
    # s1 feeds s2 + its own count + the conversion base, s2 feeds s3 +
    # its count — persist both (one row per surviving user) so the
    # events scan and min-aggs run once per stage, not once per
    # consumer (the bounded-multi-consumer persist rule, r9 review)
    s1 = persist_tracked(
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = persist_tracked(
        e.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c1 = s1.agg(F.count("*").alias("n_users")).withColumn("stage", F.lit(1))
    c2 = s2.agg(F.count("*").alias("n_users")).withColumn("stage", F.lit(2))
    c3 = s3.agg(F.count("*").alias("n_users")).withColumn("stage", F.lit(3))
    base = s1.agg(F.count("*").alias("_n1"))
    return (
        c1.unionByName(c2)
        .unionByName(c3)
        .crossJoin(F.broadcast(base))
        .select(
            "stage",
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase"))[
                F.col("stage") - 1
            ].alias("event_type"),
            "n_users",
            F.round(F.col("n_users").cast("double") / F.col("_n1"), 6).alias(
                "conv_rate"
            ),
        )
        .orderBy("stage")
    )


_ORACLE_FUNNEL_CONVERSION = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
), c AS (
  SELECT 1 AS stage, 'view' AS event_type, (SELECT count(*) FROM s1) AS n_users
  UNION ALL
  SELECT 2, 'click', (SELECT count(*) FROM s2)
  UNION ALL
  SELECT 3, 'purchase', (SELECT count(*) FROM s3)
)
SELECT stage, event_type, n_users,
       round(CAST(n_users AS DOUBLE) / (SELECT count(*) FROM s1), 6) AS conv_rate
FROM c ORDER BY stage
"""


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X54 distributed covariance of the embedding corpus,
    ORACLE-CHECKED cell-for-cell against SQL covar_pop: the d x d
    second-moment matrix computed as one Arrow pass of per-partition
    (n, sum, X^T X) moments + a map-side-combinable sum — corpus
    scanned once, state is d^2 regardless of corpus size (the
    tree-aggregate shape). The PCA family's oracle-checkable face
    (operators/pca.py covariance_matrix)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import pca

    e = load_table(spark, sf_dir, "embeddings")
    return pca.covariance_matrix(e, "embedding").orderBy("i", "j")


_ORACLE_EMBEDDING_COVARIANCE = """
WITH x AS (
  SELECT vec_id, u.s.i AS i, CAST(u.s.v AS DOUBLE) AS v
  FROM embeddings,
       unnest(list_transform(embedding, (v, k) -> struct_pack(i := k, v := v))) u(s)
)
SELECT CAST(a.i - 1 AS INT) AS i, CAST(b.i - 1 AS INT) AS j,
       round(covar_pop(a.v, b.v), 6) + 0.0 AS cov
FROM x a JOIN x b USING (vec_id)
GROUP BY a.i, b.i
ORDER BY i, j
"""


def q_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X55 PCA projection of the embedding corpus onto its top-4
    principal axes (whitened): the standard dimensionality cut before
    clustering / SemDeDup / ANN. Driver state is the d x d covariance
    (asserted <= 256 dims); the projection is a broadcast-closure
    Arrow pass, no shuffle. Rows-only by nature (eigh is not
    SQL-expressible); the moment aggregation underneath is the
    oracle-checked embedding_covariance, and the projection itself is
    numpy-pinned in tests/test_pca.py (operators/pca.py
    pca_project)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import pca

    e = load_table(spark, sf_dir, "embeddings")
    return pca.pca_project(e, "embedding", "vec_id", q=4, whiten=True).orderBy(
        "vec_id"
    )


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X56 BPE tokenizer training, ORACLE-CHECKED through all 6 merge
    rounds: the ordered most-frequent-pair merge list over the
    document corpus (Sennrich 2016). After one corpus tokenization
    pass all state is vocabulary-sized; each round is two windows +
    one pair-count agg + a TakeOrdered argmax broadcast back — no
    driver collect anywhere, the whole train is one lazy plan. The
    DuckDB oracle unrolls the identical six rounds window-for-window
    (operators/bpe.py bpe_train)."""
    merges, _ = shared_bpe_train(spark, sf_dir)
    return merges.orderBy("rank")


def q_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X56b the trained tokenizer's view of its vocabulary: every
    corpus word as its space-joined symbol sequence after the same 6
    merge rounds — certifies the merge APPLICATION (greedy-leftmost
    run-parity rule included) row-for-row, not just the learned pair
    list (operators/bpe.py bpe_train)."""
    _, seg = shared_bpe_train(spark, sf_dir)
    return seg.orderBy("word")


def q_bpe_fast_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X56e vocabulary-scale BPE trainer, ORACLE-CHECKED at the shared
    6-round depth: the driver-side Sennrich merge loop over the
    collected (word, wn) vocabulary table — the production tier
    (HF/SentencePiece shape) whose only corpus-sized step is the one
    word-count aggregation. Replayed against the SAME unrolled 6-round
    DuckDB oracle as the relational trainer, so the window certifies
    the two tiers agree merge-for-merge, pair-count included; the deep
    (512-round) budget the relational shape cannot reach is pinned in
    test_bpe and benched as bpe_fast_deep (operators/bpe.py
    bpe_train_fast)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import bpe

    d = load_table(spark, sf_dir, "documents")
    merges, _ = bpe.bpe_train_fast(d, "text", n_merges=6)
    return merges.orderBy("rank")


def q_bpe_fast_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X56e at a REAL merge budget (1,024 rounds — or vocabulary
    exhaustion, whichever first): the scale case that motivated the
    fast tier, ~2 orders of magnitude past what the per-round
    relational trainer can run (r9 verdict finding #1: two Spark jobs
    per merge ⇒ 32k-merge vocabularies are unreachable). Rows-only BY
    CONSTRUCTION: the DuckDB replay would be a 1,024-round unrolled CTE
    chain; correctness is certified by the oracle-checked 6-round twin
    (q_bpe_fast_merges — identical code path, just the budget) plus the
    row-identity and determinism pins in test_bpe."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import bpe

    d = load_table(spark, sf_dir, "documents")
    merges, _ = bpe.bpe_train_fast(d, "text", n_merges=1024)
    return merges.orderBy("rank")


def _bpe_round_sql(
    k: int, in_tbl: str, out_tbl: str, prefix: str
) -> str:
    """One merge-application round as SQL CTEs (the shared template —
    train and inference rounds must not diverge; r9 review). The pair
    comes from t{k}; LEFT JOIN ON true (not CROSS JOIN) so an empty
    pair frame NULL-extends and the round is a NO-OP, matching the
    Spark side's left-join guard instead of wiping the table."""
    c, g, m, d = (f"{prefix}{x}{k}" for x in ("c", "g", "m", "d"))
    return f""", {c} AS (
  SELECT s.word, s.wn, s.pos, s.sym,
         coalesce(s.sym = t.l AND
                  lead(s.sym) OVER (PARTITION BY s.word ORDER BY s.pos) = t.r,
                  false) AS cand
  FROM {in_tbl} s LEFT JOIN t{k} t ON true
), {g} AS (
  SELECT *, CASE WHEN cand THEN pos - row_number()
                 OVER (PARTITION BY word, cand ORDER BY pos) END AS grp
  FROM {c}
), {m} AS (
  SELECT *, cand AND (row_number() OVER (PARTITION BY word, grp ORDER BY pos) % 2 = 1)
            AS merged
  FROM {g}
), {d} AS (
  SELECT m.*, coalesce(lag(merged) OVER (PARTITION BY word ORDER BY pos), false)
              AS consumed,
         t.l AS tl, t.r AS tr
  FROM {m} m LEFT JOIN t{k} t ON true
), {out_tbl} AS (
  SELECT word, wn, row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
         CASE WHEN merged THEN tl || tr ELSE sym END AS sym
  FROM {d} WHERE NOT consumed
)"""


def _bpe_oracle_chain(n_merges: int) -> str:
    """The shared 6-round unrolled CTE chain (the _ORACLE_PAGERANK
    pattern): s0 is the char-exploded word-count table, s{k} the
    symbol table after merge k, t{k} the pair chosen at round k."""
    parts = [
        r"""
WITH toksb AS (
  SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
  FROM documents WHERE text IS NOT NULL
), wcb AS (
  SELECT word, count(*) AS wn FROM toksb GROUP BY word
), s0 AS (
  SELECT word, wn, u.s.i AS pos, u.s.v AS sym
  FROM wcb,
       unnest(list_transform(string_split(word, ''), (v, k) -> struct_pack(i := k, v := v))) u(s)
)"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(
            f""", p{k} AS (
  SELECT sym AS l, nxt AS r, sum(wn) AS cnt FROM (
    SELECT word, wn, sym, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
    FROM s{k - 1})
  WHERE nxt IS NOT NULL GROUP BY 1, 2
), t{k} AS (
  SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1
)"""
            + _bpe_round_sql(k, f"s{k - 1}", f"s{k}", "")
        )
    return "".join(parts)


_BPE_ROUNDS = 6

_ORACLE_BPE_MERGES = (
    _bpe_oracle_chain(_BPE_ROUNDS)
    + "\n"
    + "\nUNION ALL ".join(
        f'SELECT {k} AS rank, l AS "left", r AS "right", '
        f"CAST(cnt AS BIGINT) AS pair_count FROM t{k}"
        for k in range(1, _BPE_ROUNDS + 1)
    )
    + "\nORDER BY rank"
)

_ORACLE_BPE_SEGMENT = (
    _bpe_oracle_chain(_BPE_ROUNDS)
    + f"""
SELECT word, wn, string_agg(sym, ' ' ORDER BY pos) AS segmentation
FROM s{_BPE_ROUNDS} GROUP BY word, wn ORDER BY word
"""
)


def q_semantic_dedup_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X55+X23 — PCA-accelerated SemDeDup (rows-only: eigh + k-means
    aren't SQL-expressible; pair recall vs the full-dim clustered path
    is pinned in test_pca): candidates are proposed in the UNWHITENED
    top-8 principal subspace of the UNIT-NORMALIZED corpus under a
    Euclidean gate at the exact geometric bound — after
    normalization, cos(a,b) >= t means d_full(a,b) <= sqrt(2-2t);
    centering is a translation (distance-preserving) and the
    projection is orthogonal (contractive), so d_reduced <= d_full
    and the gate d_reduced <= sqrt(2-2t) provably drops NO true pair.
    Every candidate is then re-scored with the EXACT full-dimension
    cosine: the reduced space proposes, the original space disposes —
    precision exact by construction, recall limited only by the
    k-means partition. (A reduced-space COSINE gate is unusable:
    centered-space cosine of true pairs spans [-0.74, 1], measured;
    and whitening would rescale noise directions UP, breaking the
    contraction — hence unwhitened + distance.) Same multi-probe
    k-means + connected-components chain as
    q_semantic_dedup_clustered."""
    from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked
    from data_pipeline_bigquery_to_sftp_server_spark.operators import (
        clustering,
        pca,
    )

    e = load_table(spark, sf_dir, "embeddings")
    # normalize=True: the unit-sphere pre-step happens inside the Arrow
    # passes (one numpy divide) — as a Catalyst HOF it would be an
    # O(d^2)-per-row interpreted expression re-run on every scan
    red = pca.pca_project(
        e, "embedding", "vec_id", q=8, whiten=False, normalize=True
    )
    red_vec = red.select(
        "vec_id", F.array(*[f"pc{i}" for i in range(1, 9)]).alias("embedding")
    )
    red_vec = persist_tracked(red_vec)
    _, centers = clustering.kmeans_assign(red_vec, k=8, n_iter=4, seed=42)
    probed = clustering.multi_probe_assign(red_vec, centers, n_probe=2)
    # the lossless gate: sqrt(2 - 2*0.35) on unit-normalized inputs
    max_d = float((2.0 - 2.0 * 0.35) ** 0.5)
    cand = (
        clustering.within_cluster_pairs(probed, threshold=max_d, metric="dist")
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact full-dim re-score: candidates join their two full vectors,
    # then one Arrow pass computes the batch of cosines (einsum — a
    # Catalyst HOF dot here would be 64 interpreted ops per pair)
    ea = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"))
    eb = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"))
    joined_cand = cand.join(ea, "id_a").join(eb, "id_b")

    def _rescore(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            A = np.stack(pdf["_va"].to_numpy()).astype(np.float64)
            B = np.stack(pdf["_vb"].to_numpy()).astype(np.float64)
            cos = np.einsum("ij,ij->i", A, B) / (
                np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            )
            keep = cos >= 0.35
            yield pd.DataFrame(
                {"id_a": pdf["id_a"][keep], "id_b": pdf["id_b"][keep]}
            )

    id_t = e.schema["vec_id"].dataType.simpleString()
    pairs = joined_cand.mapInPandas(_rescore, f"id_a {id_t}, id_b {id_t}")
    clusters = dedup.dedup_clusters(pairs)
    return clusters.select(
        "keep_id",
        "n_members",
        F.concat_ws(",", F.col("members")).alias("members"),
    ).orderBy("keep_id")


def q_streaming_iqr_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X52+X7 composition, ORACLE-CHECKED: the Tukey length fence as a
    screen-on-ingest streaming stage — per-source fences are
    PRECOMPUTED from the static corpus (the bounded bounds frame), the
    stream probes them via a stream-static broadcast join, and the
    sink holds exactly the batch screen restricted to the streamed
    slice. The deployment topology every static screen in this repo
    follows (dedup X26, quality X42, decontam X17): model built
    offline, applied on arrival."""
    import uuid

    from data_pipeline_bigquery_to_sftp_server_spark.operators import sampling
    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    # the bounds aggregate directly (r9 review: deriving fences from
    # the full corpus-join output paid a corpus-sized join + dedup
    # shuffle to recover a frame that is one row per source)
    fences = sampling.iqr_bounds(d, "n_chars", "source", k=0.75).withColumnRenamed(
        "_g", "source"
    )
    path, schema = _events_stream_src(spark, sf_dir, table="documents")
    stream = W.read_events_stream(spark, path, schema, max_files_per_trigger=4)
    gated = (
        stream.where(F.col("doc_id") % 4 == 0)
        .select("doc_id", "source", "n_chars")
        .join(F.broadcast(fences), "source")
        .withColumn(
            "is_outlier",
            (F.col("n_chars").cast("double") < F.col("lo"))
            | (F.col("n_chars").cast("double") > F.col("hi")),
        )
    )
    name = f"q_iqr_stream_{uuid.uuid4().hex[:8]}"
    q = W.run_to_memory(gated, name, output_mode="append")
    q.stop()
    return spark.table(name).select(
        "doc_id", "source", "n_chars", "lo", "hi", "is_outlier"
    )


_ORACLE_STREAMING_IQR_GATE = """
WITH b AS (
  SELECT source,
         round(quantile_cont(CAST(n_chars AS DOUBLE), 0.25)
               - 0.75 * (quantile_cont(CAST(n_chars AS DOUBLE), 0.75)
                         - quantile_cont(CAST(n_chars AS DOUBLE), 0.25)), 6) AS lo,
         round(quantile_cont(CAST(n_chars AS DOUBLE), 0.75)
               + 0.75 * (quantile_cont(CAST(n_chars AS DOUBLE), 0.75)
                         - quantile_cont(CAST(n_chars AS DOUBLE), 0.25)), 6) AS hi
  FROM documents GROUP BY source
)
SELECT doc_id, source, n_chars, lo, hi,
       (CAST(n_chars AS DOUBLE) < lo OR CAST(n_chars AS DOUBLE) > hi) AS is_outlier
FROM documents JOIN b USING (source)
WHERE doc_id % 4 = 0
"""


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X56c corpus encoding under the trained tokenizer,
    ORACLE-CHECKED including sequence order: every document rendered
    as its BPE symbol sequence — train (X56) -> per-word segmentation
    -> broadcast vocab join against the ordered token stream ->
    order-preserving reassembly. The full tokenizer lifecycle
    (train/segment/encode) is now certified end-to-end; the vocab join
    is broadcast by size (segmentation table = unique words), and
    reassembly is the one doc-keyed shuffle (operators/bpe.py
    bpe_train)."""
    from data_pipeline_bigquery_to_sftp_server_spark.functions.text import tokenize

    d = load_table(spark, sf_dir, "documents")
    _, seg = shared_bpe_train(spark, sf_dir)
    toks = d.where(F.col("text").isNotNull()).select(
        "doc_id", F.posexplode(tokenize(F.col("text"))).alias("pos", "word")
    )
    joined = toks.join(F.broadcast(seg.select("word", "segmentation")), "word")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "segmentation"))),
                    lambda x: x["segmentation"],
                ),
            ).alias("bpe_tokens"),
            F.sum(
                F.size(F.split(F.col("segmentation"), " "))
            ).alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


_ORACLE_BPE_ENCODE = (
    _bpe_oracle_chain(_BPE_ROUNDS)
    + f"""
, segf AS (
  SELECT word, string_agg(sym, ' ' ORDER BY pos) AS segmentation
  FROM s{_BPE_ROUNDS} GROUP BY word
), dtoks AS (
  SELECT doc_id, u.s.i AS pos, u.s.v AS word
  FROM (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
        FROM documents WHERE text IS NOT NULL),
       unnest(list_transform(ws, (v, k) -> struct_pack(i := k, v := v))) u(s)
)
SELECT doc_id,
       string_agg(segmentation, ' ' ORDER BY pos) AS bpe_tokens,
       CAST(sum(len(string_split(segmentation, ' '))) AS BIGINT) AS n_bpe_tokens
FROM dtoks JOIN segf USING (word)
GROUP BY doc_id ORDER BY doc_id
"""
)


def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X59 time-series regularization, ORACLE-CHECKED: each user's
    purchase values resampled onto an hourly grid spanning their own
    observed range, empty hours forward-filled from the last
    observation (pandas resample().ffill() semantics). The raw events
    reduce to grid cells FIRST (one map-side-combinable agg); the
    spine/fill work on the grid, whose size is keys x range/step no
    matter how many events fed it (operators/timeseries.py
    resample_ffill)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import timeseries

    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    return timeseries.resample_ffill(
        e, key="user_id", ts_col="ts", value_col="value"
    ).orderBy("user_id", "cell")


_ORACLE_RESAMPLE_BASE = """
WITH cells AS (
  SELECT user_id, date_trunc('hour', ts) AS cell, round(max(value), 6) AS v
  FROM events
  WHERE event_type = 'purchase' AND ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
), bounds AS (
  SELECT user_id, min(cell) AS lo, max(cell) AS hi FROM cells GROUP BY 1
), spine AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS cell
  FROM bounds
)
"""

_ORACLE_RESAMPLE_FFILL = (
    _ORACLE_RESAMPLE_BASE
    + """
SELECT s.user_id, s.cell,
       last_value(c.v IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.cell
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       c.v IS NOT NULL AS observed
FROM spine s LEFT JOIN cells c USING (user_id, cell)
ORDER BY user_id, cell
"""
)


def q_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X59b linear interpolation on the same grid, ORACLE-CHECKED:
    empty cells take the straight line between the previous and next
    observed cells; trailing cells forward-fill (no next anchor). One
    extra backward window over the GRID — the events are still touched
    once (operators/timeseries.py resample_interpolate)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import timeseries

    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    return timeseries.resample_interpolate(
        e, key="user_id", ts_col="ts", value_col="value"
    ).orderBy("user_id", "cell")


_ORACLE_RESAMPLE_INTERP = (
    _ORACLE_RESAMPLE_BASE
    + """
, g1 AS (
  SELECT s.user_id, s.cell, c.v,
         row_number() OVER (PARTITION BY s.user_id ORDER BY s.cell) AS rn
  FROM spine s LEFT JOIN cells c USING (user_id, cell)
), g2 AS (
  SELECT *,
         last_value(v IGNORE NULLS) OVER wf AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wf AS prn,
         first_value(v IGNORE NULLS) OVER wb AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wb AS nrn
  FROM g1
  WINDOW wf AS (PARTITION BY user_id ORDER BY cell
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wb AS (PARTITION BY user_id ORDER BY cell
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
, g3 AS (
  -- integer micro-unit interpolation with integer round-half-up —
  -- round(double, 6) of the exact decimal halves linear interpolation
  -- constantly produces disagrees between engines (the header rule);
  -- (2*num + den) // (2*den) is bit-identical everywhere
  SELECT *, CAST(round(pv * 1000000) AS BIGINT) AS pv6,
            CAST(round(nv * 1000000) AS BIGINT) AS nv6
  FROM g2
)
SELECT user_id, cell,
       CASE WHEN v IS NOT NULL THEN v
            WHEN nrn IS NULL THEN pv
            ELSE CAST((2 * (pv6 * (nrn - rn) + nv6 * (rn - prn)) + (nrn - prn))
                      // (2 * (nrn - prn)) AS DOUBLE) / 1000000.0
       END AS value,
       v IS NOT NULL AS observed
FROM g3 ORDER BY user_id, cell
"""
)


def q_streaming_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X59c the resample family's foreachBatch deployment,
    ORACLE-CHECKED: held hourly cell state from 90% of the purchase
    stream, the remaining events arrive as 4 micro-batches and each
    batch's cell aggregates fold into the state (max of maxes — exact
    under any arrival order; lineage cut + block release per batch via
    the chain). The regrid of the streamed end-state must equal the
    one-shot batch resample cell-for-cell, so the SAME oracle replays
    it (operators/timeseries.py cell_aggregates / absorb_cells /
    regrid_ffill)."""
    from data_pipeline_bigquery_to_sftp_server_spark.cache import CheckpointChain
    from data_pipeline_bigquery_to_sftp_server_spark.operators import timeseries
    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    held = e.where(F.col("event_id") % 10 != 0)
    arriving = e.where(F.col("event_id") % 10 == 0)
    src = _scratch_dir("resample_stream_src_")
    ckpt = _scratch_dir("resample_stream_ckpt_")
    arriving.repartition(4, "event_id").write.mode("overwrite").parquet(src)

    chain = CheckpointChain()
    state = {
        "cells": chain.step(
            timeseries.cell_aggregates(held, "user_id", "ts", "value")
        )
    }

    def absorb(batch_df: DataFrame, epoch_id: int) -> None:
        b = timeseries.cell_aggregates(batch_df, "user_id", "ts", "value")
        state["cells"] = chain.step(
            timeseries.absorb_cells(state["cells"], b, "user_id")
        )

    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = W.streaming_upsert(stream, absorb, ckpt)
    q.processAllAvailable()
    q.stop()
    return timeseries.regrid_ffill(state["cells"], "user_id").orderBy(
        "user_id", "cell"
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X57 cohort retention over events, ORACLE-CHECKED: users
    cohorted by the Monday-truncated week of their FIRST event; for
    every (cohort week, week offset) the count of cohort users active
    that week and the retention rate vs the cohort size — the standard
    product-analytics triangle, and relationally the canonical
    two-level aggregation: per-user min (one shuffle), distinct
    (user, week) activity (map-side combinable), broadcast cohort
    join, final (cohort, offset) rollup. Every shuffle carries at most
    one row per (user, active week)."""
    e = load_table(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    active = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).dropDuplicates(["user_id", "wk"])
    joined = active.join(first, "user_id").withColumn(
        "week_offset",
        (F.datediff(F.col("wk"), F.col("cw")) / 7).cast("int"),
    )
    from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked

    # per_cell feeds the cohort-size filter AND the output join —
    # persist the bounded (cohort x offset) frame so the events
    # aggregation chain executes once (r9 review)
    per_cell = persist_tracked(
        joined.groupBy("cw", "week_offset").agg(
            F.countDistinct("user_id").alias("n_users")
        )
    )
    size = per_cell.where(F.col("week_offset") == 0).select(
        F.col("cw"), F.col("n_users").alias("_cohort_n")
    )
    return (
        per_cell.join(size, "cw")
        .select(
            F.col("cw").cast("date").alias("cohort_week"),
            "week_offset",
            "n_users",
            F.round(F.col("n_users").cast("double") / F.col("_cohort_n"), 6).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


_ORACLE_COHORT_RETENTION = """
WITH first AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cw FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
), joined AS (
  SELECT a.user_id, f.cw,
         CAST(date_diff('day', f.cw, a.wk) / 7 AS INT) AS week_offset
  FROM active a JOIN first f USING (user_id)
), per_cell AS (
  SELECT cw, week_offset, count(DISTINCT user_id) AS n_users
  FROM joined GROUP BY cw, week_offset
)
SELECT CAST(p.cw AS DATE) AS cohort_week, p.week_offset, p.n_users,
       round(CAST(p.n_users AS DOUBLE) / s.n_users, 6) AS retention
FROM per_cell p JOIN (SELECT cw, n_users FROM per_cell WHERE week_offset = 0) s
  ON p.cw = s.cw
ORDER BY cohort_week, week_offset
"""


def q_incremental_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X54b steady-state moment absorption, ORACLE-CHECKED for
    exactness: covariance derived from HELD moment state (built on 90%
    of the corpus) after absorbing the remaining 10% as an arriving
    batch — moments are additive, so the fold is a union + re-sum of
    two (d^2+d+1)-row frames with NO corpus rescan, and the result
    must equal covar_pop over the full corpus cell-for-cell (the same
    oracle as embedding_covariance). The DedupState ingest pattern
    applied to the statistics family (operators/pca.py moment_state /
    absorb_moments / covariance_from_moments)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import pca

    e = load_table(spark, sf_dir, "embeddings")
    held = pca.moment_state(e.where(F.col("vec_id") % 10 != 0), "embedding")
    folded = pca.absorb_moments(held, e.where(F.col("vec_id") % 10 == 0))
    return pca.covariance_from_moments(folded).orderBy("i", "j")


# The KMV family's sketch params, hoisted so the batch query, the
# streaming absorb's three call sites, and any future consumer CANNOT
# drift apart (r9 advice: states built with different k/salt union into
# nonsense, not an error). The oracle SQL below hardcodes the matching
# ':kmv' salt and 64/63 literals — change these, change those.
_KMV_K = 64
_KMV_SALT = "kmv"


def q_streaming_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X54c the covariance family's foreachBatch deployment,
    ORACLE-CHECKED for exactness: held moment state built from 90% of
    the embedding corpus, the remaining vectors arrive as 4
    micro-batches, and each batch's (n, sum, X^T X) moments are folded
    into the running d²-row state (absorb_moments — moments are
    ADDITIVE, so absorb is a union + re-sum, lineage cut per batch; the
    DedupState/KMV streaming pattern applied to the statistics family).
    The streamed end-state covariance must equal SQL covar_pop over the
    FULL corpus cell-for-cell — the same oracle as the one-shot batch
    query, so arrival order and batching provably don't move a cell
    (operators/pca.py absorb_moments)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import pca
    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    e = load_table(spark, sf_dir, "embeddings")
    held = e.where(F.col("vec_id") % 10 != 0)
    arriving = e.where(F.col("vec_id") % 10 == 0)
    src = _scratch_dir("cov_stream_src_")
    ckpt = _scratch_dir("cov_stream_ckpt_")
    arriving.repartition(4, "vec_id").write.mode("overwrite").parquet(src)

    from data_pipeline_bigquery_to_sftp_server_spark.cache import CheckpointChain

    chain = CheckpointChain()  # lineage cut + previous-batch block release
    state = {
        "m": chain.step(pca.moment_state(held, "embedding")),
        "epochs": set(),
    }

    def absorb(batch_df: DataFrame, epoch_id: int) -> None:
        # moments are ADDITIVE — a replayed micro-batch would
        # double-count; gate on epoch_id (the q_streaming_ivm pattern)
        if epoch_id in state["epochs"]:
            return
        state["epochs"].add(epoch_id)
        state["m"] = chain.step(
            pca.absorb_moments(state["m"], batch_df, "embedding")
        )

    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = W.streaming_upsert(stream, absorb, ckpt)
    q.processAllAvailable()
    q.stop()
    return pca.covariance_from_moments(state["m"]).orderBy("i", "j")


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X58 KMV distinct-count sketch, ORACLE-CHECKED — the rare
    approximate sketch whose whole state is engine-portable: per
    source, the k=64 smallest md5 hashes of the text estimate the
    distinct-document count as (k-1)/u_(k) (exact below k), next to
    the true distinct count and the relative error. Unlike
    HLL/theta (implementation-defined registers), KMV state is a pure
    function of the value set, so DuckDB replays estimate AND error
    cell-for-cell. Mergeable state (kmv_absorb) gives the family the
    DedupState/moment-state ingest shape; pinned in test_sketch
    (operators/sketch.py kmv_state/kmv_estimate)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sketch

    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    st = sketch.kmv_state(d, "text", "source", k=_KMV_K, salt=_KMV_SALT)
    est = sketch.kmv_estimate(st, "source", k=_KMV_K)
    exact = d.groupBy("source").agg(
        F.countDistinct("text").alias("exact_distinct")
    )
    return (
        est.join(exact, "source")
        .select(
            "source",
            "n_sketch",
            "est_distinct",
            "exact_distinct",
            F.round(
                F.abs(F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err"),
        )
        .orderBy("source")
    )


_ORACLE_KMV_DISTINCT = """
WITH dv AS (
  SELECT DISTINCT source,
         (('0x' || substr(md5(text || ':kmv'), 1, 12))::BIGINT)::DOUBLE
           / 281474976710656.0 AS u
  FROM documents WHERE text IS NOT NULL
), ranked AS (
  SELECT source, u, row_number() OVER (PARTITION BY source ORDER BY u ASC) AS pos
  FROM dv
), st AS (
  SELECT source, pos, u FROM ranked WHERE pos <= 64
), agg AS (
  SELECT source, count(*) AS n_sketch, max(u) AS uk FROM st GROUP BY source
), est AS (
  SELECT source, CAST(n_sketch AS BIGINT) AS n_sketch,
         round(CASE WHEN n_sketch < 64 THEN CAST(n_sketch AS DOUBLE)
                    ELSE 63.0 / uk END, 4) AS est_distinct
  FROM agg
), ex AS (
  SELECT source, count(DISTINCT text) AS exact_distinct
  FROM documents WHERE text IS NOT NULL GROUP BY source
)
SELECT source, n_sketch, est_distinct, exact_distinct,
       round(abs(est_distinct - exact_distinct) / exact_distinct, 4) AS rel_err
FROM est JOIN ex USING (source)
ORDER BY source
"""


def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X58d KMV set-operation estimates, ORACLE-CHECKED: for every
    pair of document sources, union / intersection / Jaccard
    cardinality estimates composed purely from the per-source KMV
    sketches (operators/sketch.py kmv_set_estimates — the merged
    sketch of A∪B is the k smallest distinct hashes across both
    states), next to the EXACT union/intersection from a distinct
    text join. This is the corpus-overlap question ("how much does
    source A duplicate source B?") answered from k-row sketch states
    without rescanning either corpus — the sketches compose, so at
    100 TB the G^2/2 pair estimates cost G^2*k rows of arithmetic,
    not a cross-corpus join. Estimates are deterministic doubles
    (md5-derived hashes + exact-int ratios), so DuckDB replays every
    cell; at this fixture scale per-pair unions stay below k=64, so
    the estimates are also provably EXACT (the self-certifying
    err_union/err_inter columns must be zero — asserted in
    test_sketch_kmv)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sketch

    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    st = sketch.kmv_state(d, "text", "source", k=_KMV_K, salt=_KMV_SALT)
    est = sketch.kmv_set_estimates(st, "source", k=_KMV_K)
    dv = d.select("source", "text").distinct()
    sizes = dv.groupBy("source").agg(F.count("*").alias("nd"))
    inter = (
        dv.select(F.col("source").alias("ga"), "text")
        .join(dv.select(F.col("source").alias("gb"), "text"), "text")
        .where(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count("*").alias("exact_inter"))
    )
    out = (
        est.join(inter, ["ga", "gb"], "left")
        .na.fill({"exact_inter": 0})
        .join(
            sizes.select(F.col("source").alias("ga"), F.col("nd").alias("_na")),
            "ga",
        )
        .join(
            sizes.select(F.col("source").alias("gb"), F.col("nd").alias("_nb")),
            "gb",
        )
        .withColumn("exact_union", F.col("_na") + F.col("_nb") - F.col("exact_inter"))
    )
    return out.select(
        "ga",
        "gb",
        "n_merged",
        "n_common",
        "union_est",
        "jaccard_est",
        "inter_est",
        F.col("exact_union").cast("bigint").alias("exact_union"),
        F.col("exact_inter").cast("bigint").alias("exact_inter"),
        (F.col("union_est") - F.col("exact_union")).alias("err_union"),
        (F.col("inter_est") - F.col("exact_inter")).alias("err_inter"),
    ).orderBy("ga", "gb")


_ORACLE_KMV_SET_OPS = """
WITH dv AS (
  SELECT DISTINCT source, text,
         (('0x' || substr(md5(text || ':kmv'), 1, 12))::BIGINT)::DOUBLE
           / 281474976710656.0 AS u
  FROM documents WHERE text IS NOT NULL
), st AS (
  SELECT source, u FROM (
    SELECT source, u,
           row_number() OVER (PARTITION BY source ORDER BY u) AS pos
    FROM (SELECT DISTINCT source, u FROM dv)
  ) WHERE pos <= 64
), pairs AS (
  SELECT a.source AS ga, b.source AS gb
  FROM (SELECT DISTINCT source FROM st) a,
       (SELECT DISTINCT source FROM st) b
  WHERE a.source < b.source
), tagged AS (
  SELECT p.ga, p.gb, s.u,
         max(CASE WHEN s.source = p.ga THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN s.source = p.gb THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN st s ON s.source IN (p.ga, p.gb)
  GROUP BY p.ga, p.gb, s.u
), topk AS (
  SELECT * FROM (
    SELECT ga, gb, u, in_a, in_b,
           row_number() OVER (PARTITION BY ga, gb ORDER BY u) AS pos
    FROM tagged
  ) WHERE pos <= 64
), agg AS (
  SELECT ga, gb, count(*) AS n_m, max(u) AS uk, sum(in_a * in_b) AS n_common
  FROM topk GROUP BY ga, gb
), est AS (
  SELECT ga, gb,
         CAST(n_m AS BIGINT) AS n_merged,
         CAST(n_common AS BIGINT) AS n_common,
         CASE WHEN n_m < 64 OR uk <= 0.0 THEN CAST(n_m AS DOUBLE)
              ELSE 63.0 / uk END AS union_est,
         CAST(n_common AS DOUBLE) / CAST(n_m AS DOUBLE) AS jaccard_est
  FROM agg
), sizes AS (
  SELECT source, count(DISTINCT text) AS nd
  FROM documents WHERE text IS NOT NULL GROUP BY source
), ex AS (
  SELECT a.source AS ga, b.source AS gb, count(*) AS exact_inter
  FROM (SELECT DISTINCT source, text FROM documents WHERE text IS NOT NULL) a
  JOIN (SELECT DISTINCT source, text FROM documents WHERE text IS NOT NULL) b
    ON a.text = b.text AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT e.ga, e.gb, e.n_merged, e.n_common,
       e.union_est, e.jaccard_est,
       e.jaccard_est * e.union_est AS inter_est,
       CAST(sa.nd + sb.nd - coalesce(ex.exact_inter, 0) AS BIGINT)
         AS exact_union,
       CAST(coalesce(ex.exact_inter, 0) AS BIGINT) AS exact_inter,
       e.union_est - (sa.nd + sb.nd - coalesce(ex.exact_inter, 0))
         AS err_union,
       e.jaccard_est * e.union_est - coalesce(ex.exact_inter, 0) AS err_inter
FROM est e
LEFT JOIN ex ON ex.ga = e.ga AND ex.gb = e.gb
JOIN sizes sa ON sa.source = e.ga
JOIN sizes sb ON sb.source = e.gb
ORDER BY e.ga, e.gb
"""


def q_pivot_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 pivot/unpivot round-trip, ORACLE-CHECKED: per-source document
    counts pivoted wide over the (bounded, explicitly listed) language
    set, then melted back to long form with zero-cells dropped — the
    reshaping pair every reporting layer needs. The explicit pivot
    value list matters at scale: without it Spark runs an extra
    distinct-scan job to discover the columns, and an unbounded pivot
    width is a driver OOM (schema is driver state). The unpivot rides
    the SQL stack()/UNPIVOT machinery, not a union of filters."""
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    langs = ["de", "en", "es", "fr", "zh"]
    wide = (
        d.groupBy("source")
        .pivot("lang", langs)
        .agg(F.count(F.lit(1)))
        .na.fill(0, langs)
    )
    long = wide.unpivot("source", langs, "lang", "n_docs")
    return long.where(F.col("n_docs") > 0).orderBy("source", "lang")


_ORACLE_PIVOT_REPORT = """
WITH wide AS (
  SELECT source,
         count(*) FILTER (lang = 'de') AS de,
         count(*) FILTER (lang = 'en') AS en,
         count(*) FILTER (lang = 'es') AS es,
         count(*) FILTER (lang = 'fr') AS fr,
         count(*) FILTER (lang = 'zh') AS zh
  FROM documents WHERE text IS NOT NULL GROUP BY source
)
SELECT source, lang, n_docs FROM wide
UNPIVOT (n_docs FOR lang IN (de, en, es, fr, zh))
WHERE n_docs > 0
ORDER BY source, lang
"""


def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5b forward as-of join with tolerance, ORACLE-CHECKED: each
    click matched to the user's NEXT purchase at-or-after it, but only
    within one hour — time-to-conversion semantics (pandas
    merge_asof(direction='forward', tolerance=...)). Same
    union+window plan as the backward variant mirrored (one shuffle on
    user_id, no pair explosion); the tolerance compares integer
    microseconds on both engines (operators/asof.py
    asof_join_forward)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof.asof_join_forward(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["purchase_value"],
        tolerance_s=3600,
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts_asof").alias("purchase_ts"),
        F.round(F.col("purchase_value_asof"), 6).alias("purchase_value"),
    ).orderBy("event_id")


_ORACLE_ASOF_FORWARD = """
SELECT l.event_id, l.user_id,
       CASE WHEN epoch_us(r.ts) - epoch_us(l.ts) <= 3600000000
            THEN r.ts END AS purchase_ts,
       CASE WHEN epoch_us(r.ts) - epoch_us(l.ts) <= 3600000000
            THEN round(r.value, 6) END AS purchase_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN
     (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts <= r.ts
ORDER BY l.event_id
"""


def q_bpe_encode_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X56d tokenizer INFERENCE on unseen words, ORACLE-CHECKED: the
    corpus-trained merge list applied in rank order to words the
    trainer never saw (customer names) — the encoder half of a real
    BPE tokenizer; the trained segmentation table only covers the
    training vocabulary. Same greedy run-parity application per round,
    each pair broadcast from the stored list instead of an argmax
    (operators/bpe.py apply_merges)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import bpe

    merges, _ = shared_bpe_train(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer")
    names = c.select(F.lower(F.col("c_name")).alias("word")).where(
        F.col("word").isNotNull()
    )
    return bpe.apply_merges(names, merges, n_merges=6).orderBy("word")


def _bpe_apply_oracle_chain(n_merges: int) -> str:
    """Extend the train chain with apply-rounds over the unseen-word
    table: n0 is the char-exploded name set, n{k} the state after the
    rank-k stored pair (the identical window template, pair sourced
    from t{k} instead of an argmax)."""
    parts = [
        _bpe_oracle_chain(n_merges),
        """
, n0 AS (
  SELECT word, 1 AS wn, u.s.i AS pos, u.s.v AS sym
  FROM (SELECT DISTINCT lower(c_name) AS word FROM customer
        WHERE c_name IS NOT NULL),
       unnest(list_transform(string_split(word, ''), (v, k) -> struct_pack(i := k, v := v))) u(s)
)""",
    ]
    for k in range(1, n_merges + 1):
        parts.append(_bpe_round_sql(k, f"n{k - 1}", f"n{k}", "n"))
    return "".join(parts)


_ORACLE_BPE_ENCODE_NEW = (
    _bpe_apply_oracle_chain(_BPE_ROUNDS)
    + f"""
SELECT word, string_agg(sym, ' ' ORDER BY pos) AS segmentation
FROM n{_BPE_ROUNDS} GROUP BY word ORDER BY word
"""
)


def q_bpe_encode_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X56f vocabulary-scale tokenizer inference, ORACLE-CHECKED: the
    fast encoder (lowest-rank-present loop, rank table in the closure,
    one Arrow pass — no per-round Spark jobs) segmenting the unseen
    customer names under the corpus-trained 6-round merge list. SAME
    oracle as the relational apply_merges query (q_bpe_encode_new), so
    the window certifies encoder-tier agreement the way
    bpe_fast_merges certifies the trainers; deep-budget encode==train
    consistency is pinned in test_bpe at 512 merges (operators/bpe.py
    encode_words_fast)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import bpe

    merges, _ = shared_bpe_train(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer")
    names = c.select(F.lower(F.col("c_name")).alias("word")).where(
        F.col("word").isNotNull()
    )
    return bpe.encode_words_fast(names, merges, n_merges=6).orderBy("word")


def q_streaming_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X58+§2.9 composition, ORACLE-CHECKED: the KMV distinct sketch
    maintained ON INGEST — held state built from 90% of the corpus,
    the remaining docs arrive as 4 micro-batches and each batch's
    sketch is absorbed into the running state via foreachBatch (the
    DedupState/SCD2 streaming pattern, lineage cut per batch). Because
    kmv_absorb is exactly mergeable (merge == whole, pinned in
    test_sketch_kmv), the streamed end-state estimate equals the
    one-shot batch sketch — so the BATCH twin's oracle
    (_ORACLE_KMV_DISTINCT) replays the streamed result cell-for-cell,
    arrival order and batching notwithstanding."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sketch
    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    held = d.where(F.col("doc_id") % 10 != 0)
    arriving = d.where(F.col("doc_id") % 10 == 0)
    src = _scratch_dir("kmv_stream_src_")
    ckpt = _scratch_dir("kmv_stream_ckpt_")
    arriving.repartition(4, "doc_id").write.mode("overwrite").parquet(src)

    from data_pipeline_bigquery_to_sftp_server_spark.cache import CheckpointChain

    # chain, not bare localCheckpoint: each absorb's lineage cut also
    # RELEASES the previous batch's checkpoint blocks, so an unbounded
    # stream holds at most two generations of k-row-per-group state
    chain = CheckpointChain()
    state = {
        "kmv": chain.step(
            sketch.kmv_state(held, "text", "source", k=_KMV_K, salt=_KMV_SALT)
        )
    }

    def absorb_batch(batch_df: DataFrame, epoch_id: int) -> None:
        b = sketch.kmv_state(batch_df, "text", "source", k=_KMV_K, salt=_KMV_SALT)
        state["kmv"] = chain.step(
            sketch.kmv_absorb(state["kmv"], b, "source", k=_KMV_K)
        )

    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = W.streaming_upsert(stream, absorb_batch, ckpt)
    q.processAllAvailable()
    q.stop()
    est = sketch.kmv_estimate(state["kmv"], "source", k=_KMV_K)
    exact = d.groupBy("source").agg(
        F.countDistinct("text").alias("exact_distinct")
    )
    return (
        est.join(exact, "source")
        .select(
            "source",
            "n_sketch",
            "est_distinct",
            "exact_distinct",
            F.round(
                F.abs(F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err"),
        )
        .orderBy("source")
    )


def q_window_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 distribution-window coverage, ORACLE-CHECKED: percent_rank,
    cume_dist, and ntile(4) of document length within each source —
    the three ranking windows the suite's rank/lag/frame queries
    didn't yet exercise. Total order inside the window (n_chars,
    doc_id) so ranks are partition-stable; one shuffle on source."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return (
        d.select(
            "doc_id",
            "source",
            "n_chars",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("doc_id")
    )


_ORACLE_WINDOW_DIST = """
SELECT doc_id, source, n_chars,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       CAST(ntile(4) OVER w AS INT) AS quartile
FROM documents
WINDOW w AS (PARTITION BY source ORDER BY n_chars, doc_id)
ORDER BY doc_id
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X60 weighted sampling without replacement, ORACLE-CHECKED: the
    top-10 documents per source under an Efraimidis-Spirakis
    exponential race keyed by document length (operators/sampling.py
    weighted_sample_wor) — the quality-weighted corpus downsampler a
    training-data pipeline runs when it wants long documents
    overrepresented WITHOUT replacement and WITHOUT an RNG (the race
    key is a pure function of doc_id+salt, so the sample is
    reproducible across runs, partitionings, and engines — DuckDB
    replays the identical md5 + ln race). One window rank per source;
    the shuffle carries (id, weight) only."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sampling

    d = load_table(spark, sf_dir, "documents")
    return sampling.weighted_sample_wor(
        d, "doc_id", "n_chars", n=10, group_col="source", salt="wsw"
    ).orderBy("source", "sample_rank")


_ORACLE_WEIGHTED_SAMPLE = """
WITH u AS (
  SELECT source, doc_id, n_chars,
         ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':wsw'), 1, 12))::BIGINT)::DOUBLE
            / 281474976710656.0) / CAST(n_chars AS DOUBLE) AS race_key
  FROM documents WHERE n_chars > 0
), r AS (
  SELECT source, doc_id, n_chars,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY race_key DESC, doc_id) AS INT)
           AS sample_rank
  FROM u
)
SELECT source, doc_id, n_chars, sample_rank
FROM r WHERE sample_rank <= 10
ORDER BY source, sample_rank
"""


def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X64 mergeable histogram quantiles, ORACLE-CHECKED cell-for-cell:
    per-event-type p25/p50/p75/p95 estimated from the integer-bucket
    histogram state (operators/hist.py — the quantile member of the
    held-state family), published NEXT TO the exact type-1 order
    statistic and the realized error. The sketch path touches the
    corpus once (one count agg) and then does arithmetic on
    (groups x buckets) rows; the exact twin's per-group sort is the
    toy-scale anchor that certifies the estimate, not the scale path.
    Every emitted double is exact-int arithmetic plus two mirrored
    IEEE divisions, so DuckDB replays est AND err bit-for-bit —
    the oracle-checkability t-digest/KLL state can never offer."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import hist

    ev = load_table(spark, sf_dir, "events")
    st = hist.hist_state(ev, "value", "event_type")
    est = hist.hist_quantiles(st, "event_type", ps=[25, 50, 75, 95]).withColumn(
        "t", F.expr("(p * n_total + 99) div 100")
    )
    wn = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = (
        ev.where(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("_et"),
            F.col("value").alias("exact_q"),
            F.row_number().over(wn).alias("rn"),
        )
    )
    joined = est.join(
        ranked,
        (est["event_type"] == ranked["_et"]) & (est["t"] == ranked["rn"]),
    )
    return joined.select(
        "event_type",
        "p",
        "est",
        "exact_q",
        (F.col("est") - F.col("exact_q")).alias("err"),
        "n_total",
    ).orderBy("event_type", "p")


_ORACLE_HIST_QUANTILES = """
WITH m AS (
  SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS mm
  FROM events WHERE value IS NOT NULL
), st AS (
  SELECT event_type, mm // 5000000 AS bucket, count(*) AS n
  FROM m GROUP BY 1, 2
), cum AS (
  SELECT event_type, bucket, n,
         sum(n) OVER (PARTITION BY event_type ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM st
), tot AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS n_total FROM st GROUP BY 1
), tgt AS (
  SELECT event_type, n_total, p, (p * n_total + 99) // 100 AS t
  FROM tot, (SELECT unnest([25, 50, 75, 95]) AS p)
), hit AS (
  SELECT g.event_type, g.p, g.n_total, g.t, c.bucket, c.n,
         c.cum - c.n AS cum_before
  FROM tgt g JOIN cum c ON c.event_type = g.event_type
  WHERE c.cum - c.n < g.t AND g.t <= c.cum
), ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn
  FROM events WHERE value IS NOT NULL
)
SELECT h.event_type, CAST(h.p AS INT) AS p,
       (CAST(h.bucket AS DOUBLE) * 5000000.0
        + 5000000.0 * CAST(h.t - h.cum_before AS DOUBLE)
          / CAST(h.n AS DOUBLE)) / 1000000.0 AS est,
       r.value AS exact_q,
       (CAST(h.bucket AS DOUBLE) * 5000000.0
        + 5000000.0 * CAST(h.t - h.cum_before AS DOUBLE)
          / CAST(h.n AS DOUBLE)) / 1000000.0 - r.value AS err,
       h.n_total
FROM hit h JOIN ranked r ON r.event_type = h.event_type AND r.rn = h.t
ORDER BY h.event_type, h.p
"""


def q_streaming_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X64b the histogram family's foreachBatch deployment, ORACLE-
    CHECKED: held state built from 90% of events, the rest arrives as
    4 micro-batches, each absorbed into the running (group, bucket, n)
    state (hist_absorb — counts are exact longs, so absorb is a union
    + re-sum; lineage cut per batch via CheckpointChain). The streamed
    end-state quantiles must equal the one-shot batch build over the
    FULL corpus cell-for-cell — the same mergeability argument as the
    KMV/moment streaming rows, now for the quantile state."""
    from data_pipeline_bigquery_to_sftp_server_spark.cache import CheckpointChain
    from data_pipeline_bigquery_to_sftp_server_spark.operators import hist
    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    ev = load_table(spark, sf_dir, "events")
    held = ev.where(F.col("event_id") % 10 != 0)
    arriving = ev.where(F.col("event_id") % 10 == 0).select(
        "event_id", "event_type", "value"
    )
    src = _scratch_dir("hist_stream_src_")
    ckpt = _scratch_dir("hist_stream_ckpt_")
    arriving.repartition(4, "event_id").write.mode("overwrite").parquet(src)

    chain = CheckpointChain()
    state = {
        "h": chain.step(hist.hist_state(held, "value", "event_type")),
        "epochs": set(),
    }

    def absorb(batch_df: DataFrame, epoch_id: int) -> None:
        # bucket counts are ADDITIVE — a replayed micro-batch would
        # double-count; gate on epoch_id (the q_streaming_ivm pattern)
        if epoch_id in state["epochs"]:
            return
        state["epochs"].add(epoch_id)
        state["h"] = chain.step(
            hist.hist_absorb(
                state["h"], hist.hist_state(batch_df, "value", "event_type"),
                "event_type",
            )
        )

    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = W.streaming_upsert(stream, absorb, ckpt)
    q.processAllAvailable()
    q.stop()
    return hist.hist_quantiles(state["h"], "event_type").orderBy(
        "event_type", "p"
    )


_ORACLE_STREAMING_HIST = """
WITH m AS (
  SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS mm
  FROM events WHERE value IS NOT NULL
), st AS (
  SELECT event_type, mm // 5000000 AS bucket, count(*) AS n
  FROM m GROUP BY 1, 2
), cum AS (
  SELECT event_type, bucket, n,
         sum(n) OVER (PARTITION BY event_type ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM st
), tot AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS n_total FROM st GROUP BY 1
), tgt AS (
  SELECT event_type, n_total, p, (p * n_total + 99) // 100 AS t
  FROM tot, (SELECT unnest([25, 50, 75, 95]) AS p)
)
SELECT g.event_type, CAST(g.p AS INT) AS p,
       (CAST(c.bucket AS DOUBLE) * 5000000.0
        + 5000000.0 * CAST(g.t - (c.cum - c.n) AS DOUBLE)
          / CAST(c.n AS DOUBLE)) / 1000000.0 AS est,
       g.n_total
FROM tgt g JOIN cum c ON c.event_type = g.event_type
WHERE c.cum - c.n < g.t AND g.t <= c.cum
ORDER BY g.event_type, g.p
"""


def q_hist_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X64c distribution-drift monitoring from histogram states,
    ORACLE-CHECKED: per-event-type total variation distance between
    the value distribution of the first half of the month and the
    second (operators/hist.py hist_drift) — the snapshot-to-snapshot
    "did this metric move?" gate, answered from two (groups x buckets)
    states WITHOUT rescanning either snapshot. TVD's numerator is an
    exact integer sum of cross-multiplied counts (unlike PSI/KL, whose
    ln() terms are libm-divergent and float-sum order-dependent), so
    one final division makes every cell engine-identical."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import hist

    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    early = hist.hist_state(ev.where(F.col("ts") < cut), "value", "event_type")
    late = hist.hist_state(ev.where(F.col("ts") >= cut), "value", "event_type")
    return hist.hist_drift(early, late, "event_type").orderBy("event_type")


_ORACLE_HIST_DRIFT = """
WITH m AS (
  SELECT event_type, ts,
         CAST(round(value * 1000000) AS BIGINT) // 5000000 AS bucket
  FROM events WHERE value IS NOT NULL
), a AS (
  SELECT event_type, bucket, count(*) AS na FROM m
  WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1, 2
), b AS (
  SELECT event_type, bucket, count(*) AS nb FROM m
  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1, 2
), cells AS (
  SELECT coalesce(a.event_type, b.event_type) AS event_type,
         coalesce(a.bucket, b.bucket) AS bucket,
         coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
  FROM a FULL OUTER JOIN b
    ON a.event_type = b.event_type AND a.bucket = b.bucket
), tot AS (
  SELECT event_type, sum(na) AS n_a, sum(nb) AS n_b
  FROM cells GROUP BY 1
), dev AS (
  SELECT c.event_type,
         abs(c.na * t.n_b - c.nb * t.n_a) AS d,
         t.n_a, t.n_b
  FROM cells c JOIN tot t ON t.event_type = c.event_type
)
SELECT event_type,
       CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST(sum(d) AS DOUBLE) / CAST(2 * n_a * n_b AS DOUBLE) AS tvd,
       CAST(max(d) AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS max_bucket_dev
FROM dev GROUP BY event_type, n_a, n_b
ORDER BY event_type
"""


def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 schema-evolution read, ORACLE-CHECKED: an ingest directory
    whose later batches ADDED a column (batch 1 writes documents
    without ``lang``; batch 2 includes it) is read back as ONE frame
    via parquet mergeSchema — early-batch rows surface NULL for the
    late column, no rewrite of old files, which is how a 100 TB
    append-only lake evolves (schema-on-read; the alternative —
    rewriting history — is a full-corpus pass). The per-source report
    then counts rows, lang coverage, and distinct langs over the
    merged frame; the oracle replays the batch split arithmetically
    from the original table. Footprint-stable: mergeSchema unions
    FOOTERS (per-file metadata), not data."""
    d = load_table(spark, sf_dir, "documents")
    root = _scratch_dir("schema_evo_")
    d.where(F.col("doc_id") % 2 == 0).select(
        "doc_id", "text", "source"
    ).write.mode("overwrite").parquet(f"{root}/batch=1")
    d.where(F.col("doc_id") % 2 == 1).select(
        "doc_id", "text", "source", "lang"
    ).write.mode("overwrite").parquet(f"{root}/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{root}/batch=1", f"{root}/batch=2"
    )
    assert "lang" in merged.columns, "mergeSchema must surface the late column"
    return (
        merged.groupBy("source")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("lang").alias("n_with_lang"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("source")
    )


_ORACLE_SCHEMA_EVOLUTION = """
SELECT source,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN doc_id % 2 = 1 AND lang IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_with_lang,
       count(DISTINCT CASE WHEN doc_id % 2 = 1 THEN lang END) AS n_langs
FROM documents
GROUP BY source
ORDER BY source
"""


def q_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X61 rolling z-score anomaly detection, ORACLE-CHECKED for
    bit-exactness: daily revenue scored against the trailing-7-day
    mean/std, flagging |z| > 2 — the monitoring query every ingest
    pipeline runs over its own throughput. The variance is computed
    from EXACT integer window sums (cents, cents^2 in decimal(38) —
    DuckDB's window sums promote to HUGEINT, so both engines hold the
    identical integers), then ONE division and ONE sqrt produce std:
    every emitted double is the same IEEE value in any engine, so
    nothing needs rounding — which is the only fully-safe parity
    (memory: round(double, N) flips at half boundaries).

    Scale: the corpus-sized work is the partial+final day aggregation;
    the windowed frame is calendar-bounded (365 rows/year NO MATTER
    the corpus size), so the single ordered window partition is a
    few-KB sort, not a data-sized one. The square is taken in
    decimal(19)·decimal(19) -> decimal(38) (never in long — daily
    cents pass 2e9 already at sf0.1, where a long square would
    overflow; DuckDB mirrors with a HUGEINT square), so the only
    remaining ceiling is the LONG daily-sum path itself, asserted at
    1e15 cents/day ($10T/day — beyond any revenue stream)."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    daily = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(cents).alias("_c"))
    ceiling_ok = F.col("_c") <= F.lit(1_000_000_000_000_000)
    daily = daily.where(
        F.assert_true(
            ceiling_ok,
            F.lit(
                "rolling_anomaly: daily cents beyond the long-sum "
                "ceiling — pre-scale to whole dollars at this corpus size"
            ),
        ).isNull()
    )
    w = Window.orderBy("day").rowsBetween(-7, -1)
    c_dec = F.col("_c").cast("decimal(19,0)")
    s1 = F.sum("_c").over(w).cast("decimal(38,0)")
    s2 = F.sum(c_dec * c_dec).over(w)
    cnt = F.count("_c").over(w)
    scored = daily.select(
        "day",
        "_c",
        s1.alias("_s1"),
        s2.alias("_s2"),
        cnt.alias("_n"),
    ).where(F.col("_n") == 7)
    varnum = (F.lit(7).cast("decimal(38,0)") * F.col("_s2")
              - F.col("_s1") * F.col("_s1"))
    mean = F.col("_s1").cast("double") / 7.0
    std = F.sqrt(varnum.cast("double") / 42.0)
    z = F.when(
        varnum > 0, (F.col("_c").cast("double") - mean) / std
    ).otherwise(F.lit(None).cast("double"))
    return (
        scored.withColumn("z", z)
        .select(
            "day",
            (F.col("_c") / 100.0).alias("revenue"),
            (F.col("_s1").cast("double") / 700.0).alias("mean_7d"),
            "z",
            (F.abs(F.col("z")) > 2.0).alias("is_anomaly"),
        )
        .orderBy("day")
    )


_ORACLE_ROLLING_ANOMALY = """
WITH daily AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
  FROM orders GROUP BY 1
), win AS (
  SELECT day, c,
         sum(c) OVER w AS s1,
         sum(CAST(c AS HUGEINT) * c) OVER w AS s2,
         count(c) OVER w AS n
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
), full7 AS (
  SELECT day, c, s1, s2, 7 * s2 - s1 * s1 AS varnum
  FROM win WHERE n = 7
), scored AS (
  SELECT day, c, s1,
         CASE WHEN varnum > 0
              THEN (CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / 7.0)
                   / sqrt(CAST(varnum AS DOUBLE) / 42.0)
              ELSE NULL END AS z
  FROM full7
)
SELECT day,
       c / 100.0 AS revenue,
       CAST(s1 AS DOUBLE) / 700.0 AS mean_7d,
       z,
       abs(z) > 2.0 AS is_anomaly
FROM scored ORDER BY day
"""


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4c co-located bucketed join, ORACLE-CHECKED and PLAN-ASSERTED:
    orders and lineitem written as managed tables bucketed 8 ways on
    the order key (sources/files.py write_bucketed), then joined and
    per-order aggregated with ZERO Exchange in the physical plan — the
    100 TB answer to a fact-fact join repeated every run (pay the
    bucketed write once, join shuffle-free forever; SURVEY §4). The
    broadcast threshold is disabled for the probe so the assert pins
    the sort-merge path (at real scale neither side broadcasts); the
    grouping keys include the bucket key, so the aggregate also rides
    the bucket clustering (partial+final fold with no exchange). The
    no-shuffle property is asserted IN-PLAN here, not only in
    tests/test_asof_skew.py — a regression fails the query itself."""
    import uuid

    from data_pipeline_bigquery_to_sftp_server_spark.plans import explain as _explain
    from data_pipeline_bigquery_to_sftp_server_spark.sources import files

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    ta = f"bj_orders_{uuid.uuid4().hex[:8]}"
    tb = f"bj_lineitem_{uuid.uuid4().hex[:8]}"
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    out_dir = _scratch_dir("bucketed_join_")
    try:
        files.write_bucketed(
            o.select("o_orderkey", "o_orderpriority"), ta, "o_orderkey", buckets=8
        )
        files.write_bucketed(
            li.select("o_orderkey", "l_quantity", "l_extendedprice", "l_discount"),
            tb,
            "o_orderkey",
            buckets=8,
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # Integer micro-unit revenue (price cents x discount hundredths
        # = exact 1e-4-dollar units): a double sum of price*(1-disc)
        # lands on exact half-cents, where parallel summation order
        # flips round(x, 2) between engines. Sums of exact longs can't.
        cents = F.round(F.col("l_extendedprice") * 100).cast("long")
        disc_h = F.round(F.col("l_discount") * 100).cast("long")
        joined = (
            spark.table(ta)
            .join(spark.table(tb), "o_orderkey")
            .groupBy("o_orderkey", "o_orderpriority")
            .agg(
                F.count("*").alias("n_items"),
                F.sum(cents * (100 - disc_h)).alias("_rev_u"),
                F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            )
            .where(F.col("n_items") >= 6)
            # integer round-half-up 1e-4-units -> cents, then one exact
            # long/double division: identical on every engine
            .withColumn("revenue", F.expr("(_rev_u * 2 + 100) div 200") / 100.0)
            .drop("_rev_u")
        )
        plan = _explain.formatted_plan(joined)
        assert "Exchange" not in plan, "bucketed join/agg must run shuffle-free"
        # Materialize through the shuffle-free plan, then drop the
        # tables: the returned frame must not depend on catalog state.
        joined.write.mode("overwrite").parquet(out_dir)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")
    return spark.read.parquet(out_dir).orderBy("o_orderkey")


_ORACLE_BUCKETED_JOIN = """
WITH g AS (
  SELECT o_orderkey, o_orderpriority,
         count(*) AS n_items,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_u,
         round(sum(l_quantity), 2) AS total_qty
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY o_orderkey, o_orderpriority
  HAVING count(*) >= 6
)
SELECT o_orderkey, o_orderpriority, n_items, total_qty,
       CAST((rev_u * 2 + 100) // 200 AS DOUBLE) / 100.0 AS revenue
FROM g ORDER BY o_orderkey
"""


def q_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint audit (the Deequ pattern), ORACLE-
    CHECKED: five pipeline-gate constraints over orders — primary-key
    uniqueness, key completeness, positive amounts, status domain
    membership, and orphaned foreign keys against customer — reported
    as one row per constraint with violations/checked/pass_rate. The
    four scan-bound checks fold into ONE aggregate over a single pass
    of the fact table (count / countDistinct / conditional sums — no
    per-constraint rescan, which is what makes a 50-constraint audit
    affordable at 100 TB); the referential check is a broadcast anti-
    join count (dimension side small by definition). The 1x1 crossJoin
    stitching the two one-row frames is a bounded contract. All
    violation counts are exact integers; pass_rate is one exact-int
    division, identical across engines."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    agg = o.agg(
        F.count("*").alias("n"),
        F.countDistinct("o_orderkey").alias("n_key"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("null_key"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("bad_price"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F"), 1).otherwise(0)
        ).alias("bad_status"),
    )
    orphans = o.join(
        c, o["o_custkey"] == c["c_custkey"], "left_anti"
    ).agg(F.count("*").alias("orphans"))
    both = agg.crossJoin(orphans)
    long = both.select(
        F.expr(
            "stack(5, "
            "'orderkey_unique', n - n_key, "
            "'orderkey_not_null', null_key, "
            "'totalprice_positive', bad_price, "
            "'status_in_domain', bad_status, "
            "'custkey_references_customer', orphans) "
            "AS (constraint_name, violations)"
        ),
        F.col("n").alias("checked"),
    )
    return long.select(
        "constraint_name",
        F.col("violations").cast("bigint").alias("violations"),
        F.col("checked").cast("bigint").alias("checked"),
        F.round(
            1.0 - F.col("violations") / F.col("checked").cast("double"), 6
        ).alias("pass_rate"),
    ).orderBy("constraint_name")


_ORACLE_CONSTRAINT_AUDIT = """
WITH a AS (
  SELECT count(*) AS n,
         count(DISTINCT o_orderkey) AS n_key,
         sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS null_key,
         sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS bad_price,
         sum(CASE WHEN o_orderstatus NOT IN ('O', 'F') THEN 1 ELSE 0 END)
           AS bad_status
  FROM orders
), r AS (
  SELECT count(*) AS orphans FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
), u AS (
  SELECT 'orderkey_unique' AS constraint_name, n - n_key AS violations,
         n AS checked FROM a
  UNION ALL SELECT 'orderkey_not_null', null_key, n FROM a
  UNION ALL SELECT 'totalprice_positive', bad_price, n FROM a
  UNION ALL SELECT 'status_in_domain', bad_status, n FROM a
  UNION ALL SELECT 'custkey_references_customer', orphans, n FROM a, r
)
SELECT constraint_name,
       CAST(violations AS BIGINT) AS violations,
       CAST(checked AS BIGINT) AS checked,
       round(1.0 - violations / CAST(checked AS DOUBLE), 6) AS pass_rate
FROM u ORDER BY constraint_name
"""


def q_data_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X89 data-health monitoring composite (r10 verdict #8), ORACLE-
    CHECKED end-to-end: the observability analogue of the curation/
    selection/recipe composites — one unified report chaining the three
    monitoring families a production pipeline runs every cycle:

    - **drift** (X64c): per-event-type TVD between the month's two
      halves from histogram states (did the value distribution move?);
    - **anomaly** (X61): trailing-7-day z-score over daily revenue
      (did throughput spike/collapse?), exact-integer window variance;
    - **constraint** (X62): the five-constraint Deequ-style audit
      (is the data itself broken?), one scan + one broadcast anti-join.

    Output is one long frame ``(check_type, subject, value, flag)`` —
    the shape a paging rule consumes. Each family keeps its own exact
    arithmetic (TVD integer cross-products, decimal window sums,
    integer violation counts), so the composite's oracle is the three
    component oracles reshaped and UNION ALLed — every cell stays
    engine-identical. Scale: the three sections scan orders twice and
    events once, all partial+final aggregates; section outputs are
    groups/days/constraints-sized."""
    drift = q_hist_drift(spark, sf_dir).select(
        F.lit("drift").alias("check_type"),
        F.col("event_type").alias("subject"),
        F.col("tvd").alias("value"),
        (F.col("tvd") > 0.10).alias("flag"),
    )
    anom = q_rolling_anomaly(spark, sf_dir).select(
        F.lit("anomaly").alias("check_type"),
        F.col("day").alias("subject"),
        F.col("z").alias("value"),
        F.col("is_anomaly").alias("flag"),
    )
    cons = q_constraint_audit(spark, sf_dir).select(
        F.lit("constraint").alias("check_type"),
        F.col("constraint_name").alias("subject"),
        F.col("pass_rate").alias("value"),
        (F.col("violations") > 0).alias("flag"),
    )
    return (
        drift.unionByName(anom)
        .unionByName(cons)
        .orderBy("check_type", "subject")
    )


_ORACLE_DATA_HEALTH = f"""
WITH drift_r AS ({_ORACLE_HIST_DRIFT}),
anom_r AS ({_ORACLE_ROLLING_ANOMALY}),
cons_r AS ({_ORACLE_CONSTRAINT_AUDIT})
SELECT * FROM (
  SELECT 'drift' AS check_type, event_type AS subject, tvd AS value,
         tvd > 0.10 AS flag
  FROM drift_r
  UNION ALL
  SELECT 'anomaly', day, z, is_anomaly FROM anom_r
  UNION ALL
  SELECT 'constraint', constraint_name, pass_rate, violations > 0
  FROM cons_r
) ORDER BY check_type, subject
"""


def q_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X66 sliding-window distinct counts (DAU/WAU), ORACLE-CHECKED:
    per day of the observed range, the distinct users active that day
    and within the trailing 7 days — the activity dashboard every
    event pipeline ships.  The quadratic forms (per-day self-join, or
    a range-frame collect_set window) are replaced by the linear
    covered-day expansion: distinct (user, day) marks -> each mark
    explodes to the <=7 report days it covers -> dedup + count
    (operators/timeseries.py rolling_active).  Zero-activity days
    surface as 0 via the day spine; all-integer output, so DuckDB
    replays cell-for-cell via generate_series."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import timeseries

    ev = load_table(spark, sf_dir, "events")
    dau = timeseries.rolling_active(ev, "ts", "user_id", window_days=1)
    wau = timeseries.rolling_active(ev, "ts", "user_id", window_days=7)
    return (
        dau.withColumnRenamed("active", "dau")
        .join(wau.withColumnRenamed("active", "wau"), "day")
        .orderBy("day")
    )


_ORACLE_ROLLING_ACTIVE = """
WITH marks AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), b AS (
  SELECT min(day) AS d0, max(day) AS d1 FROM marks
), spine AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM b
), cov AS (
  SELECT DISTINCT m.day + CAST(t.i AS INTEGER) AS day, m.user_id
  FROM marks m, generate_series(0, 6) t(i)
), wau AS (
  SELECT day, count(*) AS wau FROM cov GROUP BY day
), dau AS (
  SELECT day, count(*) AS dau FROM marks GROUP BY day
)
SELECT s.day,
       CAST(coalesce(d.dau, 0) AS BIGINT) AS dau,
       CAST(coalesce(w.wau, 0) AS BIGINT) AS wau
FROM spine s
LEFT JOIN dau d ON d.day = s.day
LEFT JOIN wau w ON w.day = s.day
ORDER BY s.day
"""


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X58c HyperLogLog distinct-count sketch, ORACLE-CHECKED — the
    KMV pair's register-based sibling (operators/sketch.py hll_state /
    hll_estimate): per source, 64 registers estimate the distinct
    document count, next to the true count and relative error. HLL
    estimates are normally NOT oracle-checkable (implementation-defined
    hash/register packing + libm ln in the low-range branch); this one
    is, via (a) integer-exact register ranks from md5-prefix bit
    strings, (b) the harmonic sum kept integer until one final
    division, (c) the linear-counting correction embedded as the SAME
    precomputed literal table in both engines. State is mergeable
    (hll_absorb, pinned in test_sketch_hll) and needs no distinct
    before aggregating — the cheapest sketch build shape."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sketch

    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # two cardinality regimes so BOTH estimator arms are oracle-checked:
    # distinct texts per source is 25 at every SF (linear-counting arm);
    # distinct doc_ids per lang grows with SF (raw harmonic arm)
    both = _hll_two_regime(d)
    st = sketch.hll_state(both, "_v", "grp", p=6, salt="hll")
    est = sketch.hll_estimate(st, "grp", p=6)
    exact = both.groupBy("grp").agg(
        F.countDistinct("_v").alias("exact_distinct")
    )
    return (
        est.join(exact, "grp")
        .select(
            "grp",
            "n_buckets",
            "zeros",
            "est_distinct",
            "exact_distinct",
            F.round(
                F.abs(F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err"),
        )
        .orderBy("grp")
    )


def _build_hll_oracle() -> str:
    """The DuckDB replay of q_hll_distinct, assembled from the SAME
    constants the Spark plan embeds (hll_linear_count_table + the
    alpha*m^2*2^maxr literal) so the two engines cannot drift."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sketch

    m, p = 64, 6
    maxr = 48 - p + 1
    c = repr(0.709 * float(m) * float(m) * float(1 << maxr))
    lc = sketch.hll_linear_count_table(m)
    case = "CASE zeros " + " ".join(
        f"WHEN {z} THEN {v!r}" for z, v in sorted(lc.items())
    ) + " END"
    return f"""
WITH vals AS (
  SELECT 'source:' || source AS grp, text AS v
  FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT 'lang:' || lang AS grp, CAST(doc_id AS VARCHAR) AS v
  FROM documents WHERE text IS NOT NULL
), h AS (
  SELECT grp,
         ('0x' || substr(md5(v || ':hll'), 1, 12))::BIGINT AS hv
  FROM vals
), br AS (
  SELECT grp, hv & {m - 1} AS bucket,
         CASE WHEN strpos(lpad(bin(hv >> {p}), {maxr - 1}, '0'), '1') = 0
              THEN {maxr}
              ELSE strpos(lpad(bin(hv >> {p}), {maxr - 1}, '0'), '1')
         END AS rho
  FROM h
), reg AS (
  SELECT grp, bucket, max(rho) AS r FROM br GROUP BY 1, 2
), agg AS (
  SELECT grp, count(*) AS nb,
         sum(1::BIGINT << ({maxr} - r)) AS sp
  FROM reg GROUP BY 1
), est0 AS (
  SELECT grp, CAST(nb AS BIGINT) AS n_buckets,
         CAST({m} - nb AS BIGINT) AS zeros,
         {c} / CAST(sp + ({m} - nb) * (1::BIGINT << {maxr}) AS DOUBLE) AS raw
  FROM agg
), est AS (
  SELECT grp, n_buckets, zeros,
         CASE WHEN raw <= {2.5 * m!r} AND zeros > 0
              THEN {case}
              ELSE round(raw, 4) END AS est_distinct
  FROM est0
), ex AS (
  SELECT grp, count(DISTINCT v) AS exact_distinct
  FROM vals GROUP BY grp
)
SELECT grp, n_buckets, zeros, est_distinct, exact_distinct,
       round(abs(est_distinct - exact_distinct) / exact_distinct, 4) AS rel_err
FROM est JOIN ex USING (grp)
ORDER BY grp
"""


_ORACLE_HLL_DISTINCT = _build_hll_oracle()


def q_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11b count-min sketch point frequencies, ORACLE-CHECKED
    INCLUDING its overestimates (operators/sketch.py cms_state /
    cms_lookup): token occurrence counts from a depth=3 x width=16
    counter matrix — deliberately undersized against the ~31-token
    vocabulary so hash collisions happen and the one-sided error is
    VISIBLE — next to exact counts and the (always >= 0) overestimate.
    All-integer state and estimates, so DuckDB replays every counter
    and every collision cell-for-cell. Complements heavy_hitters
    (exact "which values are frequent" under a capacity assert) with
    "how often does THIS value occur" from bounded held state; counters
    are additive, so the state is mergeable (cms_absorb, pinned in
    test_sketch_cms)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sketch

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(text.tokenize(F.col("text"))).alias("token"))
    st = sketch.cms_state(toks, "token", depth=3, width=16, salt="cms")
    probes = toks.dropDuplicates(["token"])
    est = sketch.cms_lookup(st, probes, "token", depth=3, width=16, salt="cms")
    exact = toks.groupBy("token").agg(F.count("*").alias("exact_count"))
    return (
        est.join(exact, "token")
        .select(
            "token",
            F.col("est_count").cast("long").alias("est_count"),
            F.col("exact_count").cast("long").alias("exact_count"),
            (F.col("est_count") - F.col("exact_count"))
            .cast("long")
            .alias("overestimate"),
        )
        .orderBy("token")
    )


_ORACLE_CMS_COUNTS = r"""
WITH toks AS (
  SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
  FROM documents
), ds AS (
  SELECT unnest([0, 1, 2]) AS d
), cells AS (
  SELECT ds.d,
         ('0x' || substr(md5(token || ':cms:' || CAST(ds.d AS VARCHAR)), 1, 12))::BIGINT % 16 AS w,
         count(*) AS cnt
  FROM toks, ds GROUP BY 1, 2
), probes AS (
  SELECT DISTINCT token FROM toks
), pc AS (
  SELECT token, ds.d,
         ('0x' || substr(md5(token || ':cms:' || CAST(ds.d AS VARCHAR)), 1, 12))::BIGINT % 16 AS w
  FROM probes, ds
), est AS (
  SELECT token, min(coalesce(cnt, 0)) AS est_count
  FROM pc LEFT JOIN cells USING (d, w) GROUP BY token
), ex AS (
  SELECT token, count(*) AS exact_count FROM toks GROUP BY token
)
SELECT token,
       CAST(est_count AS BIGINT) AS est_count,
       CAST(exact_count AS BIGINT) AS exact_count,
       CAST(est_count - exact_count AS BIGINT) AS overestimate
FROM est JOIN ex USING (token)
ORDER BY token
"""


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X67 z-order (Morton) layout quality, ORACLE-CHECKED
    (operators/layout.py): events are laid into 32 equal buckets two
    ways — z-ordered on (day-of-month, user-bucket) vs linearly sorted
    on user-bucket alone — and each layout reports, from per-bucket
    min/max statistics ONLY (exactly what parquet footers give a
    scan planner), how many buckets and rows a day-range predicate and
    a user-range predicate would each have to read. The z-order rows
    show both predicates pruning; the linear layout prunes only its
    own sort key and reads every bucket for the day predicate — the
    data-skipping argument for multi-dimension clustering, stated as
    integers an oracle replays exactly. Bucket assignment is the
    deterministic global-rank twin of the production
    repartitionByRange write path (zorder_write, pinned in
    test_layout)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import layout
    from data_pipeline_bigquery_to_sftp_server_spark.operators.relational import (
        with_global_rank,
    )

    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    maxu = ev.agg(F.max("user_id").alias("_mu"))
    d = ev.crossJoin(F.broadcast(maxu)).select(
        "event_id",
        (F.dayofmonth("ts") - 1).cast("long").alias("day0"),
        F.expr("user_id * 32 div (_mu + 1)").cast("long").alias("ub"),
    )
    zb = layout.zorder_buckets(
        d, ["day0", "ub"], "event_id", bits=5, n_buckets=32
    ).select(F.lit("zorder").alias("layout"), "bucket", "day0", "ub")
    ranked, n_total = with_global_rank(d, ["ub", "event_id"])
    lb = ranked.select(
        F.lit("linear_user").alias("layout"),
        F.expr(f"(grank - 1) * 32 div {n_total}").cast("long").alias("bucket"),
        "day0",
        "ub",
    )
    st = (
        zb.unionByName(lb)
        .groupBy("layout", "bucket")
        .agg(
            F.count("*").alias("_n"),
            F.min("day0").alias("_d0"),
            F.max("day0").alias("_d1"),
            F.min("ub").alias("_u0"),
            F.max("ub").alias("_u1"),
        )
    )
    day_hit = (F.col("_d1") >= 10) & (F.col("_d0") <= 16)
    user_hit = (F.col("_u1") >= 8) & (F.col("_u0") <= 23)
    return (
        st.groupBy("layout")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum(F.when(day_hit, 1).otherwise(0)).alias("day_pred_buckets"),
            F.sum(F.when(day_hit, F.col("_n")).otherwise(0)).alias(
                "day_pred_rows"
            ),
            F.sum(F.when(user_hit, 1).otherwise(0)).alias(
                "user_pred_buckets"
            ),
            F.sum(F.when(user_hit, F.col("_n")).otherwise(0)).alias(
                "user_pred_rows"
            ),
        )
        .orderBy("layout")
    )


_ORACLE_ZORDER_LAYOUT = """
WITH base AS (
  SELECT event_id,
         CAST(date_part('day', ts) - 1 AS BIGINT) AS day0,
         CAST(user_id * 32 // ((SELECT max(user_id) FROM events
                                WHERE ts IS NOT NULL AND user_id IS NOT NULL) + 1)
              AS BIGINT) AS ub
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), z AS (
  SELECT event_id, day0, ub,
         (((day0 >> 0) & 1) << 0) + (((ub >> 0) & 1) << 1) +
         (((day0 >> 1) & 1) << 2) + (((ub >> 1) & 1) << 3) +
         (((day0 >> 2) & 1) << 4) + (((ub >> 2) & 1) << 5) +
         (((day0 >> 3) & 1) << 6) + (((ub >> 3) & 1) << 7) +
         (((day0 >> 4) & 1) << 8) + (((ub >> 4) & 1) << 9) AS zkey
  FROM base
), n AS (
  SELECT count(*) AS n FROM base
), lay AS (
  SELECT 'zorder' AS layout,
         (row_number() OVER (ORDER BY zkey, event_id) - 1) * 32 // n.n AS bucket,
         day0, ub
  FROM z, n
  UNION ALL
  SELECT 'linear_user' AS layout,
         (row_number() OVER (ORDER BY ub, event_id) - 1) * 32 // n.n AS bucket,
         day0, ub
  FROM base, n
), st AS (
  SELECT layout, bucket, count(*) AS n_rows,
         min(day0) AS d0, max(day0) AS d1,
         min(ub) AS u0, max(ub) AS u1
  FROM lay GROUP BY 1, 2
)
SELECT layout,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(CASE WHEN d1 >= 10 AND d0 <= 16 THEN 1 ELSE 0 END) AS BIGINT)
         AS day_pred_buckets,
       CAST(sum(CASE WHEN d1 >= 10 AND d0 <= 16 THEN n_rows ELSE 0 END) AS BIGINT)
         AS day_pred_rows,
       CAST(sum(CASE WHEN u1 >= 8 AND u0 <= 23 THEN 1 ELSE 0 END) AS BIGINT)
         AS user_pred_buckets,
       CAST(sum(CASE WHEN u1 >= 8 AND u0 <= 23 THEN n_rows ELSE 0 END) AS BIGINT)
         AS user_pred_rows
FROM st GROUP BY layout ORDER BY layout
"""


def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X68 one-pass table profiler, ORACLE-CHECKED
    (operators/profile.py): per column of ``orders`` — n_rows, null
    count, exact distinct count, and type-appropriate min/max (doubles
    for numerics, epoch micros for timestamps, binary-collation
    strings) — from ONE dynamically-built aggregate over one scan (the
    F16 plan-from-schema discipline). The exact distinct counts ride
    one EXPAND shuffle; profile_table(exact=False) is the in-code
    100 TB swap to approx_count_distinct (pinned within rsd in
    test_profile)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import profile

    o = load_table(spark, sf_dir, "orders")
    return profile.profile_table(o).orderBy("col_name")


_ORACLE_PROFILE_TABLE = """
WITH a AS (SELECT count(*) AS n_rows FROM orders)
SELECT 'o_custkey' AS col_name, 'bigint' AS dtype, a.n_rows,
       (SELECT CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders) AS n_nulls,
       (SELECT count(DISTINCT o_custkey) FROM orders) AS n_distinct,
       (SELECT round(CAST(min(o_custkey) AS DOUBLE), 6) FROM orders) AS min_num,
       (SELECT round(CAST(max(o_custkey) AS DOUBLE), 6) FROM orders) AS max_num,
       NULL AS min_str, NULL AS max_str
FROM a
UNION ALL
SELECT 'o_orderdate', 'timestamp_ntz', a.n_rows,
       (SELECT CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders),
       (SELECT count(DISTINCT o_orderdate) FROM orders),
       (SELECT CAST(epoch_us(min(o_orderdate)) AS DOUBLE) FROM orders),
       (SELECT CAST(epoch_us(max(o_orderdate)) AS DOUBLE) FROM orders),
       NULL, NULL
FROM a
UNION ALL
SELECT 'o_orderkey', 'bigint', a.n_rows,
       (SELECT CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders),
       (SELECT count(DISTINCT o_orderkey) FROM orders),
       (SELECT round(CAST(min(o_orderkey) AS DOUBLE), 6) FROM orders),
       (SELECT round(CAST(max(o_orderkey) AS DOUBLE), 6) FROM orders),
       NULL, NULL
FROM a
UNION ALL
SELECT 'o_orderpriority', 'string', a.n_rows,
       (SELECT CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders),
       (SELECT count(DISTINCT o_orderpriority) FROM orders),
       NULL, NULL,
       (SELECT min(o_orderpriority) FROM orders),
       (SELECT max(o_orderpriority) FROM orders)
FROM a
UNION ALL
SELECT 'o_orderstatus', 'string', a.n_rows,
       (SELECT CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders),
       (SELECT count(DISTINCT o_orderstatus) FROM orders),
       NULL, NULL,
       (SELECT min(o_orderstatus) FROM orders),
       (SELECT max(o_orderstatus) FROM orders)
FROM a
UNION ALL
SELECT 'o_totalprice', 'double', a.n_rows,
       (SELECT CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders),
       (SELECT count(DISTINCT o_totalprice) FROM orders),
       (SELECT round(min(o_totalprice), 6) FROM orders),
       (SELECT round(max(o_totalprice), 6) FROM orders),
       NULL, NULL
FROM a
ORDER BY col_name
"""


def q_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X69 MATCH_RECOGNIZE-lite event-pattern matching, ORACLE-CHECKED
    (operators/sessions.py sequence_pattern): per user, how many times
    the browse-to-buy pattern view(view|click)*purchase occurs in
    their ordered event stream, whether they ever converted, and the
    first matched path. The sequence compresses to one char per event
    and the pattern runs once per user — Spark's missing
    MATCH_RECOGNIZE reduced to a per-key scalar regex; DuckDB replays
    via string_agg(ORDER BY) + regexp_extract_all."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sessions

    ev = load_table(spark, sf_dir, "events")
    return sessions.sequence_pattern(ev, "v[vc]*p").orderBy("user_id")


_ORACLE_SEQUENCE_PATTERN = """
WITH e AS (
  SELECT user_id, ts, event_id, substr(event_type, 1, 1) AS ch
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL
), s AS (
  SELECT user_id, count(*) AS n_events,
         string_agg(ch, '' ORDER BY ts, event_id) AS seq
  FROM e GROUP BY user_id
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(len(regexp_extract_all(seq, 'v[vc]*p')) AS BIGINT) AS n_matches,
       CAST(CASE WHEN len(regexp_extract_all(seq, 'v[vc]*p')) > 0
                 THEN 1 ELSE 0 END AS BIGINT) AS converted,
       coalesce(regexp_extract(seq, 'v[vc]*p'), '') AS first_path,
       CAST(length(coalesce(regexp_extract(seq, 'v[vc]*p'), '')) AS BIGINT)
         AS path_len
FROM s ORDER BY user_id
"""


def _hll_two_regime(d: DataFrame) -> DataFrame:
    """The (grp, _v) projection shared by the batch and streaming HLL
    queries: low-cardinality texts per source + high-cardinality
    doc_ids per lang, so both estimator arms stay exercised."""
    lo = d.select(
        F.concat(F.lit("source:"), F.col("source")).alias("grp"),
        F.col("text").alias("_v"),
    )
    hi = d.select(
        F.concat(F.lit("lang:"), F.col("lang")).alias("grp"),
        F.col("doc_id").cast("string").alias("_v"),
    )
    return lo.unionByName(hi)


def q_streaming_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X58e+§2.9 composition, ORACLE-CHECKED: the HyperLogLog sketch
    maintained ON INGEST — held registers built from 90% of the
    corpus, the remaining docs arrive as 4 micro-batches, each batch's
    registers folded in via foreachBatch (per-bucket max; lineage cut
    + previous-generation release through CheckpointChain). Register
    max is exactly mergeable (merge == whole, pinned in
    test_sketch_hll), so the streamed end-state equals the one-shot
    batch sketch and the BATCH twin's oracle (_ORACLE_HLL_DISTINCT)
    replays the streamed result cell-for-cell regardless of arrival
    order or batching."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sketch
    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    held = d.where(F.col("doc_id") % 10 != 0)
    arriving = d.where(F.col("doc_id") % 10 == 0)
    src = _scratch_dir("hll_stream_src_")
    ckpt = _scratch_dir("hll_stream_ckpt_")
    arriving.repartition(4, "doc_id").write.mode("overwrite").parquet(src)

    from data_pipeline_bigquery_to_sftp_server_spark.cache import CheckpointChain

    chain = CheckpointChain()
    state = {
        "hll": chain.step(
            sketch.hll_state(_hll_two_regime(held), "_v", "grp", p=6, salt="hll")
        )
    }

    def absorb_batch(batch_df: DataFrame, epoch_id: int) -> None:
        b = sketch.hll_state(
            _hll_two_regime(batch_df), "_v", "grp", p=6, salt="hll"
        )
        state["hll"] = chain.step(sketch.hll_absorb(state["hll"], b, "grp"))

    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = W.streaming_upsert(stream, absorb_batch, ckpt)
    q.processAllAvailable()
    q.stop()
    est = sketch.hll_estimate(state["hll"], "grp", p=6)
    exact = _hll_two_regime(d).groupBy("grp").agg(
        F.countDistinct("_v").alias("exact_distinct")
    )
    return (
        est.join(exact, "grp")
        .select(
            "grp",
            "n_buckets",
            "zeros",
            "est_distinct",
            "exact_distinct",
            F.round(
                F.abs(F.col("est_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err"),
        )
        .orderBy("grp")
    )


def q_skyline_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X70 2-D Pareto frontier (skyline), ORACLE-CHECKED
    (operators/frontier.py): customers not dominated on
    (order count, lifetime spend) — the "best tradeoff" report a naive
    engine writes as a correlated NOT EXISTS all-pairs scan (the
    DuckDB oracle does exactly that); here it is the sort-scan
    reduction: collapse to one max-spend row per distinct order count,
    one window pass over that COLLAPSED frame, broadcast the surviving
    keys back. Spend is exact integer cents so dominance is
    engine-portable."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import frontier

    o = load_table(spark, sf_dir, "orders")
    per = (
        o.where(F.col("o_custkey").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "spend_cents"
            ),
        )
    )
    return frontier.skyline_2d(per, "n_orders", "spend_cents").orderBy(
        F.col("n_orders").desc(), "o_custkey"
    )


_ORACLE_SKYLINE_CUSTOMERS = """
WITH s AS (
  SELECT o_custkey, count(*) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS spend_cents
  FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey
)
SELECT a.o_custkey, CAST(a.n_orders AS BIGINT) AS n_orders, a.spend_cents
FROM s a
WHERE NOT EXISTS (
  SELECT 1 FROM s b
  WHERE b.n_orders >= a.n_orders AND b.spend_cents >= a.spend_cents
    AND (b.n_orders > a.n_orders OR b.spend_cents > a.spend_cents))
ORDER BY n_orders DESC, o_custkey
"""


def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X71 smoothed target encoding, ORACLE-CHECKED
    (operators/features.py): per-supplier smoothed return rate
    te = (pos + m*prior)/(n + m) — the category-feature transform a
    training pipeline runs before model fitting. One grouped count agg
    + a one-row broadcast prior; the float expression tree is written
    identically in both engines over exact integer counts, so the
    unrounded doubles hash-match bit-for-bit."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import features

    li = load_table(spark, sf_dir, "lineitem")
    target = (F.col("l_returnflag") == "R").cast("long")
    return features.target_encode(li, "l_suppkey", target, m=25.0).orderBy(
        "l_suppkey"
    )


_ORACLE_TARGET_ENCODE = """
WITH g AS (
  SELECT CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS gpos,
         count(*) AS gn
  FROM lineitem
), s AS (
  SELECT l_suppkey, count(*) AS n_rows,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pos
  FROM lineitem GROUP BY l_suppkey
)
SELECT l_suppkey, CAST(n_rows AS BIGINT) AS n_rows, n_pos,
       (gpos / gn) AS prior,
       (n_pos + 25.0 * (gpos / gn)) / (n_rows + 25.0) AS te
FROM s CROSS JOIN g
ORDER BY l_suppkey
"""


def q_impute_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X71b group-mean NULL imputation, ORACLE-CHECKED
    (operators/features.py impute_group_mean): every 13th event's value
    is knocked out deterministically, then refilled with its event
    type's mean over exact integer cents — ONE division of two exact
    integers per group, broadcast back. The standard feature-cleaning
    step before training; non-NULL rows pass through bit-identical."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import features

    ev = load_table(spark, sf_dir, "events")
    holey = ev.withColumn(
        "value",
        F.when(F.col("event_id") % 13 == 0, F.lit(None).cast("double")).otherwise(
            F.col("value")
        ),
    )
    out = features.impute_group_mean(holey, "event_type", "value")
    return out.select(
        "event_id", "event_type", "value", "value_filled"
    ).orderBy("event_id")


_ORACLE_IMPUTE_MISSING = """
WITH h AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS value
  FROM events
), m AS (
  SELECT event_type,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
         count(value) AS n_v
  FROM h GROUP BY event_type
)
SELECT h.event_id, h.event_type, h.value,
       CASE WHEN h.value IS NOT NULL THEN h.value
            WHEN m.n_v > 0 THEN (m.sum_c / m.n_v) / 100.0
            ELSE NULL END AS value_filled
FROM h JOIN m USING (event_type)
ORDER BY event_id
"""


def q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12 point-in-time join, ORACLE-CHECKED (operators/merge.py
    pit_join): facts pick the dimension VERSION valid at the fact's
    own timestamp — the read side of the SCD2 interval table
    (q_scd2_apply writes it; this reads it). Customers' segment
    changes on 1998-01-01 (every 3rd moves), and each order's revenue
    is attributed to the segment the customer was in ON THE ORDER
    DATE. One key equi-join with the interval predicate as an
    in-stage filter — never a range join."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    v1 = c.select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("1995-01-01").alias("valid_from"),
        F.lit("1998-01-01").alias("valid_to"),
    )
    v2 = c.select(
        F.col("c_custkey").alias("o_custkey"),
        F.when(F.col("c_custkey") % 3 == 0, F.lit("MOVED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
        F.lit("1998-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    facts = o.withColumn(
        "order_day", F.date_format("o_orderdate", "yyyy-MM-dd")
    )
    j = merge.pit_join(facts, dim, "o_custkey", "order_day")
    return (
        j.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "spend_cents"
            ),
        )
        .orderBy("segment")
    )


_ORACLE_PIT_JOIN = """
WITH dim AS (
  SELECT c_custkey, c_mktsegment AS segment,
         '1995-01-01' AS valid_from, '1998-01-01' AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey,
         CASE WHEN c_custkey % 3 = 0 THEN 'MOVED' ELSE c_mktsegment END,
         '1998-01-01', NULL
  FROM customer
)
SELECT d.segment, count(*) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS spend_cents
FROM orders o JOIN dim d
  ON o.o_custkey = d.c_custkey
 AND strftime(o.o_orderdate, '%Y-%m-%d') >= d.valid_from
 AND (d.valid_to IS NULL OR strftime(o.o_orderdate, '%Y-%m-%d') < d.valid_to)
GROUP BY d.segment
ORDER BY d.segment
"""


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X72 multi-touch attribution, ORACLE-CHECKED
    (operators/sessions.py attribution): every purchase linked to the
    view/click touches since the user's previous purchase, with
    first/last-touch flags and the linear weight as the exact integer
    rational (1, n_touches) — integers, never a float share, so
    downstream rollups stay order-independent. One user-keyed window
    pass + one (user, group) equi-join."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sessions

    ev = load_table(spark, sf_dir, "events")
    return sessions.attribution(ev).orderBy(
        "user", "conv_event_id", "touch_rank"
    )


_ORACLE_ATTRIBUTION = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type, value
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IN ('purchase', 'view', 'click')
), g AS (
  SELECT *,
         coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS grp
  FROM e
), t AS (
  SELECT user_id, grp, event_id, event_type,
         row_number() OVER (PARTITION BY user_id, grp
                            ORDER BY ts, event_id) AS touch_rank,
         count(*) OVER (PARTITION BY user_id, grp) AS n_touches
  FROM g WHERE event_type != 'purchase'
), c AS (
  SELECT user_id, grp, event_id AS conv_event_id, value AS conv_value
  FROM g WHERE event_type = 'purchase'
)
SELECT c.user_id AS user, c.conv_event_id, c.conv_value,
       t.event_id AS touch_event_id, t.event_type AS touch_type,
       CAST(t.touch_rank AS INT) AS touch_rank,
       CAST(t.n_touches AS BIGINT) AS n_touches,
       CAST(CASE WHEN t.touch_rank = 1 THEN 1 ELSE 0 END AS BIGINT)
         AS is_first,
       CAST(CASE WHEN t.touch_rank = t.n_touches THEN 1 ELSE 0 END AS BIGINT)
         AS is_last,
       CAST(1 AS INT) AS weight_num,
       CAST(t.n_touches AS BIGINT) AS weight_den
FROM c JOIN t ON c.user_id = t.user_id AND c.grp = t.grp
ORDER BY "user", conv_event_id, touch_rank
"""


def q_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X73 k-hop BFS reachability, ORACLE-CHECKED (operators/graph.py
    bfs_reachability): the recursive-query class — every node of the
    bipartite part<->supplier graph (edges = distinct lineitem pairs,
    both directions) reachable within 3 hops of the seed parts
    (partkey % 200 == 0), with its exact BFS distance. Spark has no
    WITH RECURSIVE; the frontier loop (layer-joins + anti-join against
    visited, per-round lineage truncation) IS the engine's recursive
    CTE, and the DuckDB oracle replays it with a real one."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import graph

    li = load_table(spark, sf_dir, "lineitem")
    pe = li.select(
        F.concat(F.lit("p:"), F.col("l_partkey")).alias("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey")).alias("dst"),
    ).distinct()
    edges = pe.unionByName(
        pe.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = (
        li.where(F.col("l_partkey") % 200 == 0)
        .select(F.concat(F.lit("p:"), F.col("l_partkey")).alias("node"))
        .distinct()
    )
    out = graph.bfs_reachability(edges, seeds, max_hops=3)
    return out.select(
        "node", F.col("min_hops").cast("long").alias("min_hops")
    ).orderBy("min_hops", "node")


_ORACLE_BFS_REACHABILITY = """
WITH RECURSIVE e AS (
  SELECT DISTINCT 'p:' || l_partkey AS src, 's:' || l_suppkey AS dst
  FROM lineitem
  UNION
  SELECT DISTINCT 's:' || l_suppkey, 'p:' || l_partkey FROM lineitem
), walk(node, hop) AS (
  SELECT DISTINCT 'p:' || l_partkey, 0 FROM lineitem WHERE l_partkey % 200 = 0
  UNION
  SELECT e.dst, w.hop + 1
  FROM walk w JOIN e ON e.src = w.node
  WHERE w.hop < 3
)
SELECT node, CAST(min(hop) AS BIGINT) AS min_hops
FROM walk GROUP BY node
ORDER BY min_hops, node
"""


def _ivm_delta(o: DataFrame) -> DataFrame:
    """The deterministic CDC batch shared by the batch and streaming
    IVM queries (and re-derived independently by their oracle): every
    11th order deleted, every 7th (surviving) repriced +100 (modeled
    as D(old)+I(new)), every 13th cloned as a brand-new '0-NEW' order."""
    dels = o.where(F.col("o_orderkey") % 11 == 0).select(
        "o_orderkey",
        F.lit("D").alias("op"),
        "o_orderpriority",
        F.col("o_totalprice").alias("amount"),
    )
    upd = o.where(
        (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 11 != 0)
    )
    upd_old = upd.select(
        "o_orderkey",
        F.lit("D").alias("op"),
        "o_orderpriority",
        F.col("o_totalprice").alias("amount"),
    )
    upd_new = upd.select(
        "o_orderkey",
        F.lit("I").alias("op"),
        "o_orderpriority",
        (F.col("o_totalprice") + 100).alias("amount"),
    )
    ins = o.where(F.col("o_orderkey") % 13 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        F.lit("I").alias("op"),
        F.lit("0-NEW").alias("o_orderpriority"),
        F.col("o_totalprice").alias("amount"),
    )
    return (
        dels.unionByName(upd_old).unionByName(upd_new).unionByName(ins)
    )


def q_ivm_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X74 incremental view maintenance, ORACLE-CHECKED
    (operators/ivm.py): a per-priority (count, exact-cents-sum) view
    maintained by folding a CDC delta (deletes + repricing updates +
    inserts) into the held state — state-sized work, never a base
    recompute. Absorption is pure integer arithmetic, so the oracle is
    the FULL RECOMPUTE over the independently-constructed post-delta
    table: incremental == recompute, exactly."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import ivm

    o = load_table(spark, sf_dir, "orders")
    state = ivm.agg_state(o, ["o_orderpriority"], "o_totalprice")
    d = ivm.delta_group(_ivm_delta(o), ["o_orderpriority"], "amount")
    return ivm.absorb_delta(state, d, ["o_orderpriority"]).orderBy(
        "o_orderpriority"
    )


_ORACLE_IVM_AGGREGATE = """
WITH post AS (
  SELECT o_orderpriority AS prio,
         CAST(round(CASE WHEN o_orderkey % 7 = 0
                         THEN (o_totalprice + 100) * 100
                         ELSE o_totalprice * 100 END) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 11 != 0
  UNION ALL
  SELECT '0-NEW', CAST(round(o_totalprice * 100) AS BIGINT)
  FROM orders WHERE o_orderkey % 13 = 0
)
SELECT prio AS o_orderpriority, count(*) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM post GROUP BY prio
ORDER BY prio
"""


def q_streaming_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + X74 composition, ORACLE-CHECKED: the maintained view ON
    INGEST — the same CDC delta arrives as 4 key-partitioned parquet
    files fed one per micro-batch; each batch's net effect folds into
    the held state via foreachBatch (lineage cut + block release per
    batch through CheckpointChain). Integer absorption is exactly
    mergeable in any batching, so the streamed end-state replays the
    batch twin's full-recompute oracle cell-for-cell."""
    from data_pipeline_bigquery_to_sftp_server_spark.cache import CheckpointChain
    from data_pipeline_bigquery_to_sftp_server_spark.operators import ivm
    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    o = load_table(spark, sf_dir, "orders")
    delta = _ivm_delta(o)
    src = _scratch_dir("ivm_stream_src_")
    ckpt = _scratch_dir("ivm_stream_ckpt_")
    delta.repartition(4, "o_orderkey").write.mode("overwrite").parquet(src)

    chain = CheckpointChain()
    state = {
        "view": chain.step(
            ivm.agg_state(o, ["o_orderpriority"], "o_totalprice")
        ),
        "epochs": set(),
    }

    def absorb_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # foreachBatch is at-least-once: an ADDITIVE absorb replayed
        # after a restart would double-count (unlike the register-max
        # HLL absorb, which is replay-idempotent) — gate on epoch_id
        if epoch_id in state["epochs"]:
            return
        state["epochs"].add(epoch_id)
        d = ivm.delta_group(batch_df, ["o_orderpriority"], "amount")
        state["view"] = chain.step(
            ivm.absorb_delta(state["view"], d, ["o_orderpriority"])
        )

    stream = (
        spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = W.streaming_upsert(stream, absorb_batch, ckpt)
    q.processAllAvailable()
    q.stop()
    return state["view"].orderBy("o_orderpriority")


def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X75 entity-resolution composite, ORACLE-CHECKED: the full
    record-linkage pipeline — sorted-neighborhood blocking (X2f) ->
    edit-distance match verify -> connected-component entity
    clustering (X2d machinery) -> every record assigned an entity id
    (min member id), unmatched records their own singleton entity.
    Records are the part-name VOCABULARY (the fuzzy_name_pairs
    collapse-then-compare discipline: the name vocabulary stays
    bounded when the table is huge) plus two deterministic typo
    variants per name (last char dropped; 'x' appended on even ids) —
    injected known-duplicates the pipeline must re-unify, the standard
    ER evaluation setup. Typo clusters have diameter <= 2, so the
    min-label CC rounds are constant at ANY scale (the customer-name
    digit-chain pathology — consecutive ids at edit distance 1
    chaining into one diameter-n component — is exactly what the
    vocabulary collapse avoids). Oracle composes the same two proven
    idioms: neighborhood CTE + recursive transitive closure."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import dedup as D

    p = load_table(spark, sf_dir, "part")
    base = (
        p.groupBy(F.lower(F.col("p_name")).alias("name"))
        .agg(F.min("p_partkey").alias("rec_id"))
        .select("rec_id", "name")
    )
    records = base.unionByName(
        base.select(
            (F.col("rec_id") + 1000000).alias("rec_id"),
            F.expr("substring(name, 1, length(name) - 1)").alias("name"),
        )
    ).unionByName(
        base.where(F.col("rec_id") % 2 == 0).select(
            (F.col("rec_id") + 2000000).alias("rec_id"),
            F.concat(F.col("name"), F.lit("x")).alias("name"),
        )
    )
    pairs = D.sorted_neighborhood_pairs(
        records, "rec_id", F.col("name"), window=4
    )
    matched = (
        pairs.withColumn("edit_dist", F.levenshtein("key_a", "key_b"))
        .where(F.col("edit_dist") <= 2)
        .select("id_a", "id_b")
    )
    clusters = D.dedup_clusters(matched)
    cluster_rows = clusters.select(
        F.col("keep_id").alias("entity_id"),
        F.col("n_members").alias("n_records"),
        F.concat_ws(",", F.col("members")).alias("members"),
    )
    matched_nodes = (
        matched.select(F.col("id_a").alias("node"))
        .unionByName(matched.select(F.col("id_b").alias("node")))
        .distinct()
    )
    singles = records.join(
        matched_nodes, records["rec_id"] == matched_nodes["node"], "left_anti"
    ).select(
        F.col("rec_id").alias("entity_id"),
        F.lit(1).cast("long").alias("n_records"),
        F.col("rec_id").cast("string").alias("members"),
    )
    return cluster_rows.unionByName(singles).orderBy("entity_id")


_ORACLE_ENTITY_RESOLUTION = """
WITH RECURSIVE recs AS (
  SELECT min(p_partkey) AS rec_id, lower(p_name) AS name
  FROM part GROUP BY lower(p_name)
), records AS (
  SELECT rec_id, name FROM recs
  UNION ALL
  SELECT rec_id + 1000000, substr(name, 1, length(name) - 1) FROM recs
  UNION ALL
  SELECT rec_id + 2000000, name || 'x' FROM recs WHERE rec_id % 2 = 0
), ranked AS (
  SELECT rec_id AS id, name AS k,
         row_number() OVER (ORDER BY name, rec_id) AS r
  FROM records
), pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM ranked a JOIN ranked b ON b.r - a.r BETWEEN 1 AND 3
  WHERE levenshtein(a.k, b.k) <= 2
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
), reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
), labels AS (
  SELECT a AS node, least(a, min(b)) AS component
  FROM reach GROUP BY a
), clusters AS (
  SELECT component AS entity_id, count(*) AS n_records,
         array_to_string(list_sort(list(node)), ',') AS members
  FROM labels GROUP BY component
)
SELECT entity_id, CAST(n_records AS BIGINT) AS n_records, members
FROM clusters
UNION ALL
SELECT c.rec_id, 1, CAST(c.rec_id AS VARCHAR)
FROM records c
WHERE NOT EXISTS (SELECT 1 FROM labels l WHERE l.node = c.rec_id)
ORDER BY entity_id
"""


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X76 k-anonymity audit + one-step generalization,
    ORACLE-CHECKED: the privacy gate a training-data pipeline runs
    beside PII redaction (X9) — quasi-identifier groups
    (nation, segment) are counted; groups meeting k=8 publish at
    nation level, violating groups generalize nation -> region
    (the standard generalization-hierarchy step) and are recounted.
    Two grouped counts plus broadcast dimension joins — no row-level
    shuffle beyond the aggregates."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    k = 8
    cn = c.join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
    ).join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    g1 = cn.groupBy("n_name", "r_name", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_records")
    )
    ok = g1.where(F.col("n_records") >= k).select(
        F.lit("nation").alias("level"),
        F.col("n_name").alias("qi_key"),
        "c_mktsegment",
        "n_records",
        F.lit(1).cast("long").alias("meets_k"),
    )
    regen = (
        g1.where(F.col("n_records") < k)
        .groupBy("r_name", "c_mktsegment")
        .agg(F.sum("n_records").alias("n_records"))
        .select(
            F.lit("region").alias("level"),
            F.col("r_name").alias("qi_key"),
            "c_mktsegment",
            "n_records",
            (F.col("n_records") >= k).cast("long").alias("meets_k"),
        )
    )
    return ok.unionByName(regen).orderBy("level", "qi_key", "c_mktsegment")


_ORACLE_K_ANONYMITY = """
WITH g1 AS (
  SELECT n.n_name, r.r_name, c.c_mktsegment, count(*) AS n_records
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name, r.r_name, c.c_mktsegment
)
SELECT 'nation' AS level, n_name AS qi_key, c_mktsegment,
       CAST(n_records AS BIGINT) AS n_records, CAST(1 AS BIGINT) AS meets_k
FROM g1 WHERE n_records >= 8
UNION ALL
SELECT 'region', r_name, c_mktsegment,
       CAST(sum(n_records) AS BIGINT),
       CAST(CASE WHEN sum(n_records) >= 8 THEN 1 ELSE 0 END AS BIGINT)
FROM g1 WHERE n_records < 8
GROUP BY r_name, c_mktsegment
ORDER BY level, qi_key, c_mktsegment
"""


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X76b l-diversity + disclosure-risk audit (r11), ORACLE-CHECKED:
    k-anonymity's necessary-but-insufficient gap — a QI group can meet
    k while every member shares the SAME sensitive value, disclosing
    it to anyone who can place a person in the group. Per
    (nation, segment) QI group over a banded sensitive attribute
    (account-balance band = cents div 200000 — integer division, the
    hist.py bucketing discipline): the distinct-sensitive-value count
    (distinct l-diversity, meets l=3), and the max single-value share
    (the re-identification adversary's best guess probability — the
    t-closeness-lite disclosure number). Two grouped counts + one
    division of exact longs; group space is |nations|x|segments|."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    ldiv = 3
    cn = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    # shift: acctbal can be negative and div truncates toward zero in
    # Spark but floors in SQL — shift into the positive domain first
    # (the hist_state signed-domain rule)
    band = F.expr("(cents + 200000000) div 200000")
    per_sens = (
        cn.select("n_name", "c_mktsegment", cents.alias("cents"))
        .withColumn("band", band)
        .groupBy("n_name", "c_mktsegment", "band")
        .agg(F.count(F.lit(1)).alias("_nb"))
    )
    return (
        per_sens.groupBy("n_name", "c_mktsegment")
        .agg(
            F.sum("_nb").cast("bigint").alias("n_records"),
            F.count(F.lit(1)).cast("bigint").alias("n_sensitive"),
            F.max("_nb").cast("bigint").alias("_mx"),
        )
        .select(
            "n_name",
            "c_mktsegment",
            "n_records",
            "n_sensitive",
            (F.col("_mx") / F.col("n_records")).alias("max_share"),
            (F.col("n_sensitive") >= ldiv).alias("meets_l"),
        )
        .orderBy("n_name", "c_mktsegment")
    )


_ORACLE_L_DIVERSITY = """
WITH b AS (
  SELECT n.n_name, c.c_mktsegment,
         (CAST(round(c.c_acctbal * 100) AS BIGINT) + 200000000) // 200000
           AS band
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
), per_sens AS (
  SELECT n_name, c_mktsegment, band, count(*) AS nb
  FROM b GROUP BY n_name, c_mktsegment, band
)
SELECT n_name, c_mktsegment,
       CAST(sum(nb) AS BIGINT) AS n_records,
       CAST(count(*) AS BIGINT) AS n_sensitive,
       CAST(max(nb) AS BIGINT) / CAST(sum(nb) AS BIGINT) AS max_share,
       count(*) >= 3 AS meets_l
FROM per_sens GROUP BY n_name, c_mktsegment
ORDER BY n_name, c_mktsegment
"""


def q_quantile_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X77 cross-source score calibration, ORACLE-CHECKED: quality
    scores from different sources aren't comparable on raw value (one
    crawl's length distribution differs from another's); rank-based
    quantile normalization maps each doc to its within-source
    percentile, bucketed to deciles — the mixing prerequisite before
    a corpus-wide quality cut. percent_rank is tie-stable (equal
    scores share a rank), so the decile assignment is engine-portable;
    one window shuffle per source partition."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars")
    pr = F.percent_rank().over(w)
    dec = F.least(F.floor(pr * 10), F.lit(9)).cast("long")
    return (
        d.where(F.col("n_chars").isNotNull())
        .select("source", dec.alias("decile"), "n_chars")
        .groupBy("source", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("source", "decile")
    )


_ORACLE_QUANTILE_CALIBRATION = """
WITH p AS (
  SELECT source, n_chars,
         percent_rank() OVER (PARTITION BY source ORDER BY n_chars) AS pr
  FROM documents WHERE n_chars IS NOT NULL
)
SELECT source, CAST(least(floor(pr * 10), 9) AS BIGINT) AS decile,
       count(*) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM p GROUP BY source, decile
ORDER BY source, decile
"""


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X92 grouped winsorization (r11), ORACLE-CHECKED: per-source
    clipping of n_chars at the exact [p5, p95] type-1 quantiles — the
    outlier-robust feature-prep step next to the IQR fence (X52 drops
    outliers; winsorization KEEPS the row at the boundary value, the
    right call when sample size matters). Quantiles are positional:
    rank values under the (value, doc_id) total order, pick the value
    at rank ceil(p*n/100) with pure integer math ((p*n + 99) div 100)
    — the tie-stable engine-portable selection (never quantile_cont,
    whose interpolation differs at half boundaries). Report per
    source: bounds, clip counts, and exact-integer means before/after
    (one double division each). One partitioned window + two grouped
    aggregates."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("n_chars").isNotNull()
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = d.select(
        "source",
        F.col("n_chars").cast("long").alias("v"),
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )
    t05 = F.expr("(5 * n + 99) div 100")
    t95 = F.expr("(95 * n + 99) div 100")
    bounds = ranked.groupBy("source").agg(
        F.min(F.when(F.col("rnk") == t05, F.col("v"))).alias("lo"),
        F.min(F.when(F.col("rnk") == t95, F.col("v"))).alias("hi"),
    )
    clipped = ranked.join(F.broadcast(bounds), "source").select(
        "source",
        "v",
        F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("v"))).alias("_w"),
        (F.col("v") < F.col("lo")).cast("int").alias("_cl"),
        (F.col("v") > F.col("hi")).cast("int").alias("_ch"),
        "lo",
        "hi",
    )
    return (
        clipped.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.first("lo").alias("lo"),
            F.first("hi").alias("hi"),
            F.sum("_cl").cast("bigint").alias("n_clipped_low"),
            F.sum("_ch").cast("bigint").alias("n_clipped_high"),
            (F.sum("v") / F.count(F.lit(1))).alias("mean_before"),
            (F.sum("_w") / F.count(F.lit(1))).alias("mean_after"),
        )
        .orderBy("source")
    )


_ORACLE_WINSORIZE = """
WITH ranked AS (
  SELECT source, CAST(n_chars AS BIGINT) AS v,
         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
           AS rnk,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents WHERE n_chars IS NOT NULL
), bounds AS (
  SELECT source,
         min(CASE WHEN rnk = (5 * n + 99) // 100 THEN v END) AS lo,
         min(CASE WHEN rnk = (95 * n + 99) // 100 THEN v END) AS hi
  FROM ranked GROUP BY source
), c AS (
  SELECT r.source, r.v,
         greatest(b.lo, least(b.hi, r.v)) AS w,
         CASE WHEN r.v < b.lo THEN 1 ELSE 0 END AS cl,
         CASE WHEN r.v > b.hi THEN 1 ELSE 0 END AS ch,
         b.lo, b.hi
  FROM ranked r JOIN bounds b USING (source)
)
SELECT source, count(*) AS n_docs,
       CAST(min(lo) AS BIGINT) AS lo, CAST(min(hi) AS BIGINT) AS hi,
       CAST(sum(cl) AS BIGINT) AS n_clipped_low,
       CAST(sum(ch) AS BIGINT) AS n_clipped_high,
       CAST(sum(v) AS BIGINT) / count(*) AS mean_before,
       CAST(sum(w) AS BIGINT) / count(*) AS mean_after
FROM c GROUP BY source ORDER BY source
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X94 stratified sampling with exact proportional allocation
    (r11), ORACLE-CHECKED: a 200-doc eval budget split across source
    strata by largest-remainder (Hamilton) apportionment — base_h =
    (budget*N_h) div N, the leftover seats to the largest integer
    remainders budget*N_h - base_h*N (ties by source name) — ALL
    integer arithmetic, so the allocation is engine-exact where
    floor-of-float shares would wobble at seat boundaries. The draw
    inside each stratum takes the allocation's smallest md5(doc_id)
    hashes (the weighted_sample reproducible-race discipline), so both
    engines select the identical documents. Output: one row per
    stratum (population, exact allocation, drawn count, min drawn id)
    — the eval-set constructor for proportional corpus audits. Scale:
    one grouped count, seat math on the |strata|-row frame, one
    partitioned top-k window for the draw."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    budget = 200
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_pop"))
    totals = counts.agg(F.sum("n_pop").alias("n_total"))
    seats = counts.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_pop",
        F.expr(f"({budget} * n_pop) div n_total").alias("_base"),
        (F.lit(budget) * F.col("n_pop")
         - F.expr(f"({budget} * n_pop) div n_total") * F.col("n_total")
         ).alias("_rem"),
        "n_total",
    )
    leftover = F.lit(budget) - F.sum("_base").over(
        Window.partitionBy(F.lit(1))
    )
    wr = Window.partitionBy(F.lit(1)).orderBy(F.desc("_rem"), F.asc("source"))
    alloc = seats.select(
        "source",
        "n_pop",
        (
            F.col("_base")
            + (F.row_number().over(wr) <= leftover).cast("long")
        ).alias("alloc"),
    )
    wd = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    drawn = (
        d.select("source", "doc_id")
        .withColumn("_r", F.row_number().over(wd))
        .join(F.broadcast(alloc), "source")
        .where(F.col("_r") <= F.col("alloc"))
    )
    return (
        drawn.groupBy("source")
        .agg(
            F.first("n_pop").alias("n_pop"),
            F.first("alloc").cast("bigint").alias("alloc"),
            F.count(F.lit(1)).alias("n_drawn"),
            F.min("doc_id").alias("min_drawn_id"),
        )
        .orderBy("source")
    )


_ORACLE_STRATIFIED_SAMPLE = """
WITH counts AS (
  SELECT source, count(*) AS n_pop FROM documents
  WHERE doc_id IS NOT NULL GROUP BY source
), tot AS (
  SELECT CAST(sum(n_pop) AS BIGINT) AS n_total FROM counts
), seats AS (
  SELECT source, n_pop,
         (200 * n_pop) // n_total AS base,
         200 * n_pop - ((200 * n_pop) // n_total) * n_total AS rem
  FROM counts CROSS JOIN tot
), alloc AS (
  SELECT source, n_pop,
         base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                          <= 200 - (SELECT sum(base) FROM seats)
                     THEN 1 ELSE 0 END AS alloc
  FROM seats
), ranked AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS r
  FROM documents WHERE doc_id IS NOT NULL
), drawn AS (
  SELECT r.source, r.doc_id, a.n_pop, a.alloc
  FROM ranked r JOIN alloc a USING (source)
  WHERE r.r <= a.alloc
)
SELECT source, CAST(min(n_pop) AS BIGINT) AS n_pop,
       CAST(min(alloc) AS BIGINT) AS alloc,
       count(*) AS n_drawn,
       CAST(min(doc_id) AS BIGINT) AS min_drawn_id
FROM drawn GROUP BY source ORDER BY source
"""


def q_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X93 median/MAD outlier scoring (r11), ORACLE-CHECKED: the
    Iglewicz-Hoberg modified z-score 0.6745*(v - median)/MAD per
    document, flagged at |z| > 3.5 — the robust sibling of the IQR
    fence (X52) and the rolling mean/std z (X61): median and MAD are
    50%-breakdown estimators, so a heavy tail cannot drag its own
    fence the way it drags a mean/std. Both statistics are EXACT
    positional quantiles (rank ceil(n/2) under a total order — the
    winsorize discipline; MAD ranks the integer |v - med| deviations
    in a second pass), the 0.6745 consistency constant is a literal in
    both engines, and each z is one fixed float tree over exact longs.
    Output: per-source summary (median, MAD, outlier count) — two
    partitioned window passes + grouped aggregates, no UDF."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("n_chars").isNotNull()
    )
    w1 = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = d.select(
        "source",
        "doc_id",
        F.col("n_chars").cast("long").alias("v"),
        F.row_number().over(w1).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )
    tmed = F.expr("(50 * n + 99) div 100")
    med = ranked.groupBy("source").agg(
        F.min(F.when(F.col("rnk") == tmed, F.col("v"))).alias("med")
    )
    dev = ranked.join(F.broadcast(med), "source").select(
        "source",
        "doc_id",
        "v",
        "med",
        F.abs(F.col("v") - F.col("med")).alias("_ad"),
    )
    w2 = Window.partitionBy("source").orderBy("_ad", "doc_id")
    dev_ranked = dev.select(
        "*",
        F.row_number().over(w2).alias("rnk2"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )
    mad = dev_ranked.groupBy("source").agg(
        F.min(
            F.when(F.col("rnk2") == F.expr("(50 * n + 99) div 100"), F.col("_ad"))
        ).alias("mad")
    )
    z = F.lit(0.6745) * (F.col("v") - F.col("med")).cast("double") / F.col(
        "mad"
    ).cast("double")
    scored = dev.join(F.broadcast(mad), "source").select(
        "source",
        "med",
        "mad",
        F.when(F.col("mad") > 0, F.abs(z) > 3.5)
        .otherwise(F.lit(False))
        .alias("_is_out"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.first("med").alias("median"),
            F.first("mad").alias("mad"),
            F.sum(F.col("_is_out").cast("int")).cast("bigint").alias(
                "n_outliers"
            ),
        )
        .orderBy("source")
    )


_ORACLE_ROBUST_ZSCORE = """
WITH ranked AS (
  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS v,
         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
           AS rnk,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents WHERE n_chars IS NOT NULL
), med AS (
  SELECT source, min(CASE WHEN rnk = (50 * n + 99) // 100 THEN v END) AS med
  FROM ranked GROUP BY source
), dev AS (
  SELECT r.source, r.doc_id, r.v, m.med, abs(r.v - m.med) AS ad
  FROM ranked r JOIN med m USING (source)
), dev_ranked AS (
  SELECT source, doc_id, v, med, ad,
         row_number() OVER (PARTITION BY source ORDER BY ad, doc_id) AS rnk2,
         count(*) OVER (PARTITION BY source) AS n
  FROM dev
), mad AS (
  SELECT source,
         min(CASE WHEN rnk2 = (50 * n + 99) // 100 THEN ad END) AS mad
  FROM dev_ranked GROUP BY source
), scored AS (
  SELECT d.source, d.med, m.mad,
         CASE WHEN m.mad > 0
              THEN abs(0.6745 * CAST(d.v - d.med AS DOUBLE)
                       / CAST(m.mad AS DOUBLE)) > 3.5
              ELSE FALSE END AS is_out
  FROM dev d JOIN mad m USING (source)
)
SELECT source, count(*) AS n_docs,
       CAST(min(med) AS BIGINT) AS median,
       CAST(min(mad) AS BIGINT) AS mad,
       CAST(sum(CASE WHEN is_out THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM scored GROUP BY source ORDER BY source
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X78 Markov transition estimation, ORACLE-CHECKED: the
    first-order event-type transition matrix over per-user ordered
    streams — counts of consecutive (from, to) pairs and the estimated
    transition probability count/row-total (ONE division of two exact
    longs, engine-portable). The behavioral-sequence statistic next to
    X69's pattern matching; one user-keyed window pass + one grouped
    count, with the row totals as a partition window over the tiny
    (|types|²) count frame."""
    ev = load_table(spark, sf_dir, "events")
    counts = _transition_counts(ev)
    return _transition_report(counts)


def _transition_counts(ev: DataFrame) -> DataFrame:
    """(from_type, to_type, n) consecutive-pair counts per user order —
    the mergeable state the batch report and the streaming absorb
    share (counts over disjoint user sets add exactly)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
    )
    return pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )


def _transition_report(counts: DataFrame) -> DataFrame:
    total = F.sum("n").over(Window.partitionBy("from_type"))
    return counts.select(
        "from_type",
        "to_type",
        "n",
        total.alias("from_total"),
        (F.col("n") / total).alias("p"),
    ).orderBy("from_type", "to_type")


_ORACLE_EVENT_TRANSITIONS = """
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), counts AS (
  SELECT from_type, to_type, count(*) AS n
  FROM pairs WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS from_total,
       n / sum(n) OVER (PARTITION BY from_type) AS p
FROM counts ORDER BY from_type, to_type
"""


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X79 RFM segmentation, ORACLE-CHECKED: customers scored 1-5 on
    Recency (latest order date), Frequency (order count), Monetary
    (exact cents spend) via tie-stable quantile scores (percent_rank
    semantics — never ntile, whose tie assignment is
    row-order-dependent across engines), rolled up to one row per
    (r, f, m) cell with customer count and total spend. The global
    ranks come from the range-repartitioned with_global_rank plan
    (features.py rank_quantile_score), NOT a single-partition
    Window.orderBy — three bounded-shuffle scoring passes over the
    per-customer aggregate frame, then a grouped count."""
    from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked
    from data_pipeline_bigquery_to_sftp_server_spark.operators import features

    o = load_table(spark, sf_dir, "orders")
    # persisted once: all three scoring passes (two plan branches each)
    # read this per-customer aggregate instead of re-scanning orders
    per = persist_tracked(
        o.where(F.col("o_custkey").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).alias("_freq"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "_cents"
            ),
        )
    )

    scored = features.rank_quantile_score(per, "_last", "o_custkey", 5, "r_score")
    scored = features.rank_quantile_score(scored, "_freq", "o_custkey", 5, "f_score")
    scored = features.rank_quantile_score(scored, "_cents", "o_custkey", 5, "m_score")
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("_cents").alias("spend_cents"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


_ORACLE_RFM_SEGMENTS = """
WITH per AS (
  SELECT o_custkey, max(o_orderdate) AS last_o, count(*) AS freq,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey
), scored AS (
  SELECT cents,
         CAST(least(floor(percent_rank() OVER (ORDER BY last_o) * 5), 4)
              + 1 AS BIGINT) AS r_score,
         CAST(least(floor(percent_rank() OVER (ORDER BY freq) * 5), 4)
              + 1 AS BIGINT) AS f_score,
         CAST(least(floor(percent_rank() OVER (ORDER BY cents) * 5), 4)
              + 1 AS BIGINT) AS m_score
  FROM per
)
SELECT r_score, f_score, m_score, count(*) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS spend_cents
FROM scored GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
"""


def q_scd3_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13 SCD type 3 MERGE, ORACLE-CHECKED (operators/merge.py
    scd3_apply): one level of in-place history — changed keys' old
    segment moves to prev_segment, new value takes its place;
    unchanged keys pass through; new keys arrive with NULL previous.
    Same deterministic update batch as the SCD2 query (every 3rd
    customer moves, every 100th key is new), oracle independently
    re-derived branch by branch. One full-outer key join — the
    upsert_full_outer shuffle shape, no intervals."""
    c = load_table(spark, sf_dir, "customer")
    current = c.select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.lit(None).cast("string").alias("prev_mktsegment"),
    )
    upd = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 3 == 0, F.lit("MOVED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    ).unionByName(
        c.where(F.col("c_custkey") % 100 == 0).select(
            (F.col("c_custkey") + 1000000).alias("c_custkey"),
            F.lit("BUILDING").alias("c_mktsegment"),
        )
    )
    out = merge.scd3_apply(
        current, upd, "c_custkey", "c_mktsegment", prev_col="prev_mktsegment"
    )
    return out.orderBy("c_custkey")


_ORACLE_SCD3_APPLY = """
SELECT c_custkey, c_name,
       CASE WHEN c_custkey % 3 = 0 THEN 'MOVED'
            ELSE c_mktsegment END AS c_mktsegment,
       CASE WHEN c_custkey % 3 = 0 AND c_mktsegment != 'MOVED'
            THEN c_mktsegment ELSE NULL END AS prev_mktsegment
FROM customer
UNION ALL
SELECT c_custkey + 1000000, NULL, 'BUILDING', NULL
FROM customer WHERE c_custkey % 100 = 0
ORDER BY c_custkey
"""


def q_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X80 data-vault hash keys + change detection, ORACLE-CHECKED:
    hub keys as md5 of the business key and satellite HASHDIFFs as md5
    over the pipe-joined tracked attributes — the warehouse-modeling
    idiom that turns "did anything change?" into one string equality
    instead of N column compares (and makes keys join-portable across
    systems without sequence coordination). The query hashes the
    current snapshot and the deterministically perturbed one (every
    3rd segment moves) and emits the keys whose hashdiff changed —
    pure map-side hashing + one key equi-join."""
    c = load_table(spark, sf_dir, "customer")

    def hashed(df):
        return df.select(
            "c_custkey",
            F.md5(F.col("c_custkey").cast("string")).alias("hub_hash"),
            F.md5(
                F.concat_ws("|", F.col("c_name"), F.col("c_mktsegment"))
            ).alias("hashdiff"),
        )

    cur = hashed(c)
    new = hashed(
        c.withColumn(
            "c_mktsegment",
            F.when(F.col("c_custkey") % 3 == 0, F.lit("MOVED")).otherwise(
                F.col("c_mktsegment")
            ),
        )
    ).select(
        "c_custkey",
        F.col("hashdiff").alias("new_hashdiff"),
    )
    return (
        cur.join(new, "c_custkey")
        .where(F.col("hashdiff") != F.col("new_hashdiff"))
        .select("c_custkey", "hub_hash", "hashdiff", "new_hashdiff")
        .orderBy("c_custkey")
    )


_ORACLE_SURROGATE_KEYS = """
WITH cur AS (
  SELECT c_custkey,
         md5(CAST(c_custkey AS VARCHAR)) AS hub_hash,
         md5(c_name || '|' || c_mktsegment) AS hashdiff,
         md5(c_name || '|' ||
             CASE WHEN c_custkey % 3 = 0 THEN 'MOVED'
                  ELSE c_mktsegment END) AS new_hashdiff
  FROM customer
)
SELECT c_custkey, hub_hash, hashdiff, new_hashdiff
FROM cur WHERE hashdiff != new_hashdiff
ORDER BY c_custkey
"""


def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X81 referential-integrity audit, ORACLE-CHECKED: orphan
    foreign-key scan across the star schema — for each declared
    relationship, total child rows, rows whose FK has no parent, and
    distinct orphan keys (lineitem->orders is seeded with orphans by
    construction at every SF: the fixture's orderkeys are sparse). The
    cross-table completion of the single-table constraint audit
    (q_constraint_audit); each relationship is ONE child scan — a
    left join against the distinct-parent-key marker frame feeds a
    single conditional aggregation producing total, orphan, and
    distinct-orphan counts together (the merge_counts one-scan
    discipline; the previous anti-join + separate total-count form
    scanned every child twice)."""
    rels = [
        ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("customer.c_nationkey->nation.n_nationkey", "customer",
         "c_nationkey", "nation", "n_nationkey"),
    ]
    out = None
    for rel, child_t, fk, parent_t, pk in rels:
        child = load_table(spark, sf_dir, child_t)
        parent_keys = (
            load_table(spark, sf_dir, parent_t)
            .select(F.col(pk).alias("_pk"))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        j = child.join(parent_keys, child[fk] == parent_keys["_pk"], "left")
        is_orphan = F.col("_hit").isNull()
        row = j.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(is_orphan.cast("long")).alias("n_orphans"),
            F.countDistinct(F.when(is_orphan, F.col(fk))).alias(
                "n_orphan_keys"
            ),
        ).select(
            F.lit(rel).alias("relationship"),
            "n_rows",
            "n_orphans",
            "n_orphan_keys",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("relationship")


_ORACLE_FK_INTEGRITY = """
SELECT 'customer.c_nationkey->nation.n_nationkey' AS relationship,
       (SELECT count(*) FROM customer) AS n_rows,
       (SELECT count(*) FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM nation n
                           WHERE n.n_nationkey = c.c_nationkey)) AS n_orphans,
       (SELECT count(DISTINCT c_nationkey) FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM nation n
                           WHERE n.n_nationkey = c.c_nationkey))
         AS n_orphan_keys
UNION ALL
SELECT 'lineitem.l_orderkey->orders.o_orderkey',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_orderkey = l.l_orderkey)),
       (SELECT count(DISTINCT l_orderkey) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'lineitem.l_partkey->part.p_partkey',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM part p
                           WHERE p.p_partkey = l.l_partkey)),
       (SELECT count(DISTINCT l_partkey) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM part p
                           WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'orders.o_custkey->customer.c_custkey',
       (SELECT count(*) FROM orders),
       (SELECT count(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c
                           WHERE c.c_custkey = o.o_custkey)),
       (SELECT count(DISTINCT o_custkey) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c
                           WHERE c.c_custkey = o.o_custkey))
ORDER BY relationship
"""


def q_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X82 weighted shortest paths, ORACLE-CHECKED (operators/graph.py
    shortest_paths): hop-bounded Bellman-Ford over the deterministic
    ring-chord graph (the triangle-count graph with integer weights
    derived from the endpoints) from four spread seed nodes — the
    weighted member of the recursive-query class next to X73's BFS.
    After k rounds min_dist is EXACTLY the cheapest <=k-edge path
    (the Bellman-Ford invariant), which is what the DuckDB recursive
    CTE enumerates; integer weights keep every distance an exact
    long."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import graph

    d = load_table(spark, sf_dir, "documents")
    n = F.col("doc_id") % 997
    e = (
        d.select(
            n.alias("src"),
            ((n + 1) % 997).alias("dst"),
            (n % 5 + 1).alias("w"),
        )
        .unionByName(
            d.select(
                n.alias("src"),
                ((n + 2) % 997).alias("dst"),
                (n % 7 + 2).alias("w"),
            )
        )
        .unionByName(
            d.select(
                n.alias("src"),
                ((n * 7 + 1) % 997).alias("dst"),
                (n % 9 + 3).alias("w"),
            )
        )
        .distinct()
    )
    seeds = d.select(n.alias("node")).where(n % 331 == 0).distinct()
    out = graph.shortest_paths(e, seeds, max_hops=6)
    return out.orderBy("node")


_ORACLE_SHORTEST_PATHS = """
WITH RECURSIVE nodes AS (
  SELECT DISTINCT doc_id % 997 AS n FROM documents
), e AS (
  SELECT n AS src, (n + 1) % 997 AS dst, n % 5 + 1 AS w FROM nodes
  UNION
  SELECT n, (n + 2) % 997, n % 7 + 2 FROM nodes
  UNION
  SELECT n, (n * 7 + 1) % 997, n % 9 + 3 FROM nodes
), walk(node, dist, hop) AS (
  SELECT n, CAST(0 AS BIGINT), 0 FROM nodes WHERE n % 331 = 0
  UNION
  SELECT e.dst, w.dist + e.w, w.hop + 1
  FROM walk w JOIN e ON e.src = w.node
  WHERE w.hop < 6
)
SELECT node, CAST(min(dist) AS BIGINT) AS min_dist
FROM walk GROUP BY node
ORDER BY node
"""


def q_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X83 grouped OLS trend fit, ORACLE-CHECKED
    (operators/features.py grouped_ols): per-priority least-squares
    line of monthly revenue (exact cents) on month index — slope,
    intercept and r² from ONE grouped aggregation of exact
    decimal-sum statistics (closed form, never an iterative solver;
    the rolling_anomaly no-long-squares discipline). Every emitted
    float is a fixed IEEE tree over exact integers, replayed by the
    DuckDB HUGEINT mirror bit-for-bit."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import features

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    monthly = o.groupBy(
        "o_orderpriority",
        (
            (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
        ).alias("x"),
    ).agg(F.sum(cents).alias("y"))
    return features.grouped_ols(
        monthly, ["o_orderpriority"], "x", "y"
    ).orderBy("o_orderpriority")


_ORACLE_REVENUE_TREND = """
WITH m AS (
  SELECT o_orderpriority,
         (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS x,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1, 2
), g AS (
  SELECT o_orderpriority, count(*) AS n,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM m GROUP BY o_orderpriority
)
SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
       CAST(sx AS BIGINT) AS sum_x, CAST(sy AS BIGINT) AS sum_y,
       CASE WHEN n * sxx - sx * sx > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope,
       CASE WHEN n * sxx - sx * sx > 0
            THEN (CAST(sy AS DOUBLE)
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE))
                    * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) END AS intercept,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN (CAST(n * sxy - sx * sy AS DOUBLE)
                  * CAST(n * sxy - sx * sy AS DOUBLE))
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) END AS r2
FROM g ORDER BY o_orderpriority
"""


def q_streaming_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + X78 composition, ORACLE-CHECKED: the Markov transition
    state maintained ON INGEST — held pair counts built from 90% of
    users, the rest arriving as 4 USER-PARTITIONED parquet files fed
    one per micro-batch (hash-partitioning by user keeps every user's
    whole ordered stream inside one batch, so the per-batch lead()
    window sees complete sequences and no cross-batch pair is ever
    lost). Pair counts over disjoint user sets add exactly, so the
    streamed end-state replays the BATCH twin's oracle
    (_ORACLE_EVENT_TRANSITIONS) cell-for-cell in any arrival order."""
    from data_pipeline_bigquery_to_sftp_server_spark.cache import CheckpointChain
    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    ev = load_table(spark, sf_dir, "events")
    held = ev.where(F.col("user_id") % 10 != 0)
    arriving = ev.where(F.col("user_id") % 10 == 0)
    src = _scratch_dir("transitions_stream_src_")
    ckpt = _scratch_dir("transitions_stream_ckpt_")
    arriving.repartition(4, "user_id").write.mode("overwrite").parquet(src)

    chain = CheckpointChain()
    state = {"counts": chain.step(_transition_counts(held)), "epochs": set()}

    def absorb_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # additive counts: at-least-once re-delivery must not replay
        # (see q_streaming_ivm) — gate on epoch_id
        if epoch_id in state["epochs"]:
            return
        state["epochs"].add(epoch_id)
        b = _transition_counts(batch_df)
        state["counts"] = chain.step(
            state["counts"]
            .unionByName(b)
            .groupBy("from_type", "to_type")
            .agg(F.sum("n").alias("n"))
        )

    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = W.streaming_upsert(stream, absorb_batch, ckpt)
    q.processAllAvailable()
    q.stop()
    return _transition_report(state["counts"])


def q_streaming_transitions_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + X78 general tier (r10 verdict #4), ORACLE-CHECKED: Markov
    transitions over a stream whose producer CANNOT control file
    layout — the time-rolled log. The arriving files are contiguous
    (ts, event_id) ranges (ntile over the global event order — what a
    log roller produces), so every user's sequence is split ACROSS
    micro-batches; the per-batch window of q_streaming_transitions
    would drop every cross-batch pair here. Instead, an
    applyInPandasWithState operator carries last-event-type per user in
    GroupState (streaming/stateful.py transitions_stateful) and emits
    the boundary-spanning pair when its second half arrives. The
    streamed pair multiset must equal the batch lead() twin — the SAME
    oracle as q_event_transitions, now with zero layout preconditions.

    Scale: state is one short string per user (checkpointed by the
    GroupState store, restart-safe via Spark's commit log — no epoch
    gate needed); each micro-batch shuffles once on user_id; the
    emitted rows are pair-sized. Delivery order is pinned by explicit
    mtimes on the staged files (FileStreamSource delivers oldest
    first) — in production the log roller's naming/rotation gives the
    same guarantee."""
    import os as _os

    from data_pipeline_bigquery_to_sftp_server_spark.streaming import stateful as ST
    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_micros(F.col("ts")).alias("ts_us"),
        )
    )
    # stage 4 time-contiguous files — the log-roller fixture. The
    # single-partition ntile window is STAGING-ONLY (builds the test
    # stream; production files arrive already rolled) and bounded here.
    tiled = ev.withColumn(
        "_tile", F.ntile(4).over(Window.orderBy("ts_us", "event_id"))
    )
    src = _scratch_dir("transitions_state_src_")
    ckpt = _scratch_dir("transitions_state_ckpt_")
    tmp = _scratch_dir("transitions_state_tmp_")
    # ONE pass stages all four roll files (r16 optimization): the
    # per-tile loop re-ran the single-partition ntile window per file
    # — 4 global sorts for 4 staged files. The partitionBy("_tile")
    # write from the window's one sorted partition routes rows in
    # order, so each roll file holds the same rows in the same order.
    tiled.coalesce(1).write.mode("overwrite").partitionBy(
        "_tile"
    ).parquet(tmp)
    for k in range(1, 5):
        part_dir = f"{tmp}/_tile={k}"
        (part_file,) = [
            f for f in _os.listdir(part_dir) if f.endswith(".parquet")
        ]
        dst = f"{src}/{k:02d}.parquet"
        _os.rename(f"{part_dir}/{part_file}", dst)
        # distinct ascending mtimes pin FileStreamSource delivery order
        _os.utime(dst, (1_700_000_000 + 60 * k, 1_700_000_000 + 60 * k))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    import uuid as _uuid

    name = f"q_transitions_state_{_uuid.uuid4().hex[:8]}"
    q = (
        ST.transitions_stateful(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    counts = (
        spark.table(name)
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return _transition_report(counts)


def q_merge_fileskip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 file-skipping tier (r10 verdict #6), ORACLE-CHECKED: MERGE
    against a key-range-laid-out parquet table (operators/merge.py
    range_layout_write + upsert_fileskip) where a contiguous CDC batch
    (a 500-key rank slice + 5 new high keys) touches only the 2-3 of 16
    range buckets its keys intersect — the parquet answer to "Delta at
    100 TB" from the SURVEY risk register: min/max manifest statistics
    prune the rewrite exactly as a lakehouse MERGE's file-statistics
    log would. The output reports every bucket of the FINAL table
    (row count, cents sum, key range, touched flag); the oracle replays
    the deterministic rank-math cutpoints, the clamp-rule bucket
    assignment, the anti+union MERGE, and the touched set — so the
    skip evidence itself is oracle-checked, not just the merged values.
    Untouched-file byte-identity + idempotent re-apply are pinned in
    test_merge."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("fileskip_target_")
    merge.range_layout_write(o, "o_orderkey", path, n_buckets=16)
    ranked, _n = relational.with_global_rank(o, ["o_orderkey"])
    upd = ranked.where(
        (F.col("grank") >= 2001) & (F.col("grank") <= 2500)
    ).select("o_orderkey", (F.col("cents") + 10_000).alias("cents"))
    ins = spark.range(5).select(
        (F.col("id") + 30_000_000).alias("o_orderkey"),
        (F.col("id") * 1000 + 99).alias("cents"),
    )
    staging = upd.unionByName(ins)
    merged_view = merge.upsert_fileskip(spark, path, staging, "o_orderkey")
    touched = [int(b) for b in merged_view.touched_buckets]
    final = spark.read.parquet(path)
    return (
        final.groupBy(F.col("_kr").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("sum_cents"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .withColumn("touched", F.col("bucket").isin(touched))
        .orderBy("bucket")
    )


_ORACLE_MERGE_FILESKIP = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
), base AS (
  SELECT k, cents, (rn - 1) * 16 // n AS b FROM o
), cut AS (
  SELECT b, min(k) AS min_k FROM base GROUP BY b
), upd AS (
  SELECT k, cents + 10000 AS cents FROM o WHERE rn BETWEEN 2001 AND 2500
), ins AS (
  SELECT 30000000 + i AS k, i * 1000 + 99 AS cents
  FROM generate_series(0, 4) t(i)
), staging AS (
  SELECT k, cents FROM upd UNION ALL SELECT k, cents FROM ins
), merged AS (
  SELECT k, cents FROM base WHERE k NOT IN (SELECT k FROM staging)
  UNION ALL SELECT k, cents FROM staging
), assigned AS (
  SELECT m.k, m.cents,
         coalesce((SELECT max(c.b) FROM cut c WHERE c.min_k <= m.k), 0) AS b
  FROM merged m
), touched AS (
  SELECT DISTINCT
         coalesce((SELECT max(c.b) FROM cut c WHERE c.min_k <= s.k), 0) AS b
  FROM staging s
)
SELECT b AS bucket, count(*) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(min(k) AS BIGINT) AS min_key,
       CAST(max(k) AS BIGINT) AS max_key,
       b IN (SELECT b FROM touched) AS touched
FROM assigned GROUP BY b ORDER BY b
"""


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J14 interval-overlap join (r11), ORACLE-CHECKED: every
    (shipment window, order week) pair that overlaps — lineitem's
    ship→receipt interval against a 7-day order exposure window
    (the schedule-conflict / exposure join class; operators/asof.py
    interval_overlap_join). Both interval sets explode into weekly
    grid cells and candidates co-locate under ONE cell-keyed
    equi-join; the first-shared-cell rule emits each qualifying pair
    exactly once with no distinct pass, and the exact date predicate
    runs in-stage — never the BroadcastNestedLoop a bare
    inequality-pair plans as (the oracle runs exactly that quadratic
    form). overlap_days is inclusive integer date arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    # the fixture carries no receipt date — synthesize a deterministic
    # transit time (1..20 days by line number), mirrored in the oracle
    a = li.where(F.col("l_orderkey") % 199 == 0).select(
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.date_add(
            F.col("l_shipdate"), (F.lit(1) + F.col("l_linenumber") % 20).cast("int")
        ).alias("l_receiptdate"),
    )
    b = o.where(F.col("o_orderkey") % 211 == 0).select(
        "o_orderkey",
        F.col("o_orderdate").alias("o_start"),
        F.date_add(F.col("o_orderdate"), 7).alias("o_end"),
    )
    joined = asof.interval_overlap_join(
        a, b, "l_shipdate", "l_receiptdate", "o_start", "o_end", cell_days=7
    )
    overlap_days = (
        F.datediff(
            F.least(F.col("l_receiptdate"), F.col("o_end")),
            F.greatest(F.col("l_shipdate"), F.col("o_start")),
        )
        + 1
    )
    return joined.select(
        "l_orderkey",
        "l_linenumber",
        "o_orderkey",
        overlap_days.cast("int").alias("overlap_days"),
    ).orderBy("l_orderkey", "l_linenumber", "o_orderkey")


_ORACLE_INTERVAL_JOIN = """
WITH l AS (
  SELECT l_orderkey, l_linenumber, l_shipdate,
         l_shipdate + to_days(CAST(1 + l_linenumber % 20 AS INTEGER))
           AS l_receiptdate
  FROM lineitem WHERE l_orderkey % 199 = 0
)
SELECT l.l_orderkey, l.l_linenumber, o.o_orderkey,
       CAST(date_diff('day',
                      greatest(l.l_shipdate, o.o_orderdate),
                      least(l.l_receiptdate, o.o_orderdate + INTERVAL 7 DAY))
            + 1 AS INTEGER) AS overlap_days
FROM l
JOIN (SELECT * FROM orders WHERE o_orderkey % 211 = 0) o
  ON l.l_shipdate <= o.o_orderdate + INTERVAL 7 DAY
 AND o.o_orderdate <= l.l_receiptdate
ORDER BY l_orderkey, l_linenumber, o_orderkey
"""


def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1e snapshot isolation + time travel on plain parquet (r11),
    ORACLE-CHECKED: the versioned key-range layout (operators/merge.py
    versioned_layout_write / upsert_versioned / read_version) applies
    the same CDC batch as q_merge_fileskip, but by writing the touched
    buckets as NEW generation directories and committing manifest v1 —
    v0 stays byte-untouched and readable forever (the Iceberg/Delta
    snapshot mechanism in miniature; vacuum_versions is the reclaim
    half, pinned in test_merge). The report reads BOTH versions through
    their manifests and aggregates each: the oracle replays v0 as the
    raw table and v1 as the anti+union MERGE, so time travel itself is
    what's being value-checked. Reading v0 after the merge costs the
    same as before it — dead generations are never opened."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("timetravel_")
    merge.versioned_layout_write(o, "o_orderkey", path, n_buckets=16)
    ranked, _n = relational.with_global_rank(o, ["o_orderkey"])
    upd = ranked.where(
        (F.col("grank") >= 2001) & (F.col("grank") <= 2500)
    ).select("o_orderkey", (F.col("cents") + 10_000).alias("cents"))
    ins = spark.range(5).select(
        (F.col("id") + 30_000_000).alias("o_orderkey"),
        (F.col("id") * 1000 + 99).alias("cents"),
    )
    merge.upsert_versioned(spark, path, upd.unionByName(ins), "o_orderkey")

    def report(v: int) -> DataFrame:
        t = merge.read_version(spark, path, v)
        return t.agg(
            F.lit(v).alias("version"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("sum_cents"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )

    return report(0).unionByName(report(1)).orderBy("version")


_ORACLE_TIME_TRAVEL = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn
  FROM orders
), staging AS (
  SELECT k, cents + 10000 AS cents FROM o WHERE rn BETWEEN 2001 AND 2500
  UNION ALL
  SELECT 30000000 + i, i * 1000 + 99 FROM generate_series(0, 4) t(i)
), merged AS (
  SELECT k, cents FROM o WHERE k NOT IN (SELECT k FROM staging)
  UNION ALL SELECT k, cents FROM staging
)
SELECT 0 AS version, count(*) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(min(k) AS BIGINT) AS min_key, CAST(max(k) AS BIGINT) AS max_key
FROM o
UNION ALL
SELECT 1, count(*), CAST(sum(cents) AS BIGINT),
       CAST(min(k) AS BIGINT), CAST(max(k) AS BIGINT)
FROM merged
ORDER BY version
"""


def q_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1e+J9 composition (r11), ORACLE-CHECKED: the change data feed
    between two committed table versions — Delta's CDF on plain
    parquet. Two time-travel reads through their manifests (only live
    generation directories open) feed snapshot_diff's one full-outer
    key join; the emitted (key, op, values) rows are exactly the CDC
    log a downstream consumer replays. The oracle reconstructs the
    staging batch relationally, so every update/insert row is
    value-checked. Unchanged rows are filtered ENGINE-SIDE (the CDF
    contract: emit changes, not the table)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("versiondiff_")
    merge.versioned_layout_write(o, "o_orderkey", path, n_buckets=16)
    ranked, _n = relational.with_global_rank(o, ["o_orderkey"])
    upd = ranked.where(
        (F.col("grank") >= 2001) & (F.col("grank") <= 2500)
    ).select("o_orderkey", (F.col("cents") + 10_000).alias("cents"))
    ins = spark.range(5).select(
        (F.col("id") + 30_000_000).alias("o_orderkey"),
        (F.col("id") * 1000 + 99).alias("cents"),
    )
    merge.upsert_versioned(spark, path, upd.unionByName(ins), "o_orderkey")
    v0 = merge.read_version(spark, path, 0).select("o_orderkey", "cents")
    v1 = merge.read_version(spark, path, 1).select("o_orderkey", "cents")
    cdf = merge.snapshot_diff(v0, v1, "o_orderkey", compare_cols=["cents"])
    return cdf.where(F.col("op") != "unchanged").orderBy("o_orderkey")


_ORACLE_VERSION_DIFF = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn
  FROM orders
)
SELECT k AS o_orderkey, 'update' AS op, cents + 10000 AS cents
FROM o WHERE rn BETWEEN 2001 AND 2500
UNION ALL
SELECT 30000000 + i, 'insert', i * 1000 + 99
FROM generate_series(0, 4) t(i)
ORDER BY o_orderkey
"""


def q_merge_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1f merge-on-READ deletion vectors (r11 verdict #3),
    ORACLE-CHECKED: the same versioned table as q_time_travel takes a
    pure DELETE (a 50-key rank slice) that commits ZERO data files —
    only a deletion-vector file and a carried-forward manifest — then
    a MOR upsert (100 repriced keys + 5 inserts) that writes ONLY the
    staging rows as the new generation, never opening the existing
    bucket directories copy-on-write would rewrite
    (operators/merge.py upsert_versioned_dv / delete_versioned). The
    report aggregates the LIVE view per bucket next to the PHYSICAL
    row count (base + staged copies — the stale copies the DV
    suppresses) and the DV entry count, all three replayed
    relationally by the oracle — so the zero-rewrite evidence is
    itself value-checked. Byte-identity of pre-existing files and
    COW-equivalence are pinned in test_merge; compact_table folds the
    DV back to zero debt. At 100 TB this is the difference between a
    few-hundred-row CDC commit costing O(|batch|) and costing
    O(|touched buckets|) — the reference's own MERGE cadence
    (main.py:349-358)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("mergedv_")
    merge.versioned_layout_write(o, "o_orderkey", path, n_buckets=16)
    ranked, _n = relational.with_global_rank(o, ["o_orderkey"])
    dels = ranked.where(
        (F.col("grank") >= 1001) & (F.col("grank") <= 1050)
    ).select("o_orderkey")
    merge.delete_versioned(spark, path, dels, "o_orderkey")  # v1: DV only
    upd = ranked.where(
        (F.col("grank") >= 2001) & (F.col("grank") <= 2100)
    ).select("o_orderkey", (F.col("cents") + 10_000).alias("cents"))
    ins = spark.range(5).select(
        (F.col("id") + 30_000_000).alias("o_orderkey"),
        (F.col("id") * 1000 + 99).alias("cents"),
    )
    merge.upsert_versioned_dv(
        spark, path, upd.unionByName(ins), "o_orderkey"
    )  # v2: staging rows + DV, no bucket rewrite
    live = merge.read_version(spark, path)
    physical = spark.read.option("basePath", f"{path}/data").parquet(
        f"{path}/data"
    )
    dv = spark.read.parquet(f"{path}/_dv/v=2")
    live_b = live.groupBy(F.col("_kr").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_live"),
        F.sum("cents").alias("sum_cents"),
    )
    phys_b = physical.groupBy(F.col("_kr").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_physical")
    )
    dv_b = dv.groupBy(F.col("_kr").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_dv")
    )
    return (
        live_b.join(phys_b, "bucket", "full_outer")
        .join(dv_b, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_live", F.lit(0)).alias("n_live"),
            F.coalesce("sum_cents", F.lit(0)).alias("sum_cents"),
            F.coalesce("n_physical", F.lit(0)).alias("n_physical"),
            F.coalesce("n_dv", F.lit(0)).alias("n_dv"),
        )
        .orderBy("bucket")
    )


_ORACLE_MERGE_DV = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
), base AS (
  SELECT k, cents, (rn - 1) * 16 // n AS b FROM o
), cut AS (
  SELECT b, min(k) AS min_k FROM base GROUP BY b
), dels AS (
  SELECT k FROM o WHERE rn BETWEEN 1001 AND 1050
), staging AS (
  SELECT k, cents + 10000 AS cents FROM o WHERE rn BETWEEN 2001 AND 2100
  UNION ALL
  SELECT 30000000 + i, i * 1000 + 99 FROM generate_series(0, 4) t(i)
), assigned AS (
  SELECT s.k, s.cents,
         coalesce((SELECT max(c.b) FROM cut c WHERE c.min_k <= s.k), 0) AS b
  FROM staging s
), live AS (
  SELECT k, cents, b FROM base
  WHERE k NOT IN (SELECT k FROM dels) AND k NOT IN (SELECT k FROM staging)
  UNION ALL SELECT k, cents, b FROM assigned
), phys AS (
  SELECT b FROM base UNION ALL SELECT b FROM assigned
), dvk AS (
  SELECT d.k,
         coalesce((SELECT max(c.b) FROM cut c WHERE c.min_k <= d.k), 0) AS b
  FROM dels d
  UNION ALL SELECT k, b FROM assigned
), buckets AS (
  SELECT DISTINCT b FROM phys
)
SELECT bk.b AS bucket,
       coalesce(lv.n_live, 0) AS n_live,
       coalesce(lv.sum_cents, 0) AS sum_cents,
       coalesce(ph.n_physical, 0) AS n_physical,
       coalesce(dv.n_dv, 0) AS n_dv
FROM buckets bk
LEFT JOIN (
  SELECT b, count(*) AS n_live, CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM live GROUP BY b
) lv ON lv.b = bk.b
LEFT JOIN (
  SELECT b, count(*) AS n_physical FROM phys GROUP BY b
) ph ON ph.b = bk.b
LEFT JOIN (
  SELECT b, count(*) AS n_dv FROM dvk GROUP BY b
) dv ON dv.b = bk.b
ORDER BY bucket
"""


def q_column_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1g per-column manifest statistics (r11 verdict #5),
    ORACLE-CHECKED: the versioned layout bootstraps with
    ``stats_cols`` so the commit log carries min/max of a NON-key
    column per (bucket, generation) directory, and
    read_version_pruned skips every directory whose stats exclude the
    predicate range — file skipping for predicates the layout key
    can't serve (operators/merge.py _manifest_agg /
    read_version_pruned). The demo column is deliberately
    ANTI-monotone in the key (``30000000 - o_orderkey``): key-range
    pruning is useless for it in principle, yet its per-directory
    stats still prune because contiguous key buckets induce contiguous
    ranges of any derived attribute — the same argument a lakehouse
    z-order makes (the multi-dim case is the zorder_layout row). The
    report carries ``dirs_read``/``dirs_total`` as columns; the oracle
    replays them as the count of buckets containing a qualifying row
    (exact for a monotone attribute), so the pruning evidence is
    value-checked, not asserted. The band is rank-derived (top eighth
    of the key space), scale-independent."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.lit(30_000_000) - F.col("o_orderkey")).alias("keyinv"),
    )
    path = _scratch_dir("colprune_")
    merge.versioned_layout_write(
        o, "o_orderkey", path, n_buckets=16, stats_cols=["keyinv"]
    )
    ranked, n_total = relational.with_global_rank(o, ["o_orderkey"])
    cut_rank = n_total - n_total // 8 + 1
    k_cut = ranked.where(F.col("grank") == cut_rank).collect()[0].o_orderkey
    # qualifying rows: o_orderkey >= k_cut, expressed on the DERIVED
    # column only: keyinv <= 30000000 - k_cut (lo bound spans the rest)
    pruned = merge.read_version_pruned(
        spark, path, "keyinv", 0, 30_000_000 - int(k_cut)
    )
    return (
        pruned.groupBy(F.col("_kr").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("sum_cents"),
            F.min("keyinv").alias("min_keyinv"),
            F.max("keyinv").alias("max_keyinv"),
        )
        .withColumn("dirs_read", F.lit(int(pruned.dirs_read)))
        .withColumn("dirs_total", F.lit(int(pruned.dirs_total)))
        .orderBy("bucket")
    )


_ORACLE_COLUMN_PRUNE = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         30000000 - o_orderkey AS keyinv,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
), base AS (
  SELECT k, cents, keyinv, (rn - 1) * 16 // n AS b,
         rn >= n - n // 8 + 1 AS qual
  FROM o
), ev AS (
  SELECT count(DISTINCT b) AS dirs_read FROM base WHERE qual
)
SELECT b AS bucket, count(*) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(min(keyinv) AS BIGINT) AS min_keyinv,
       CAST(max(keyinv) AS BIGINT) AS max_keyinv,
       CAST(ev.dirs_read AS INTEGER) AS dirs_read,
       16 AS dirs_total
FROM base, ev
WHERE qual
GROUP BY b, ev.dirs_read
ORDER BY bucket
"""


def q_streaming_versioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + J1e/J1f composition (r11 verdict #7), ORACLE-CHECKED:
    the reference's staging+MERGE sync loop (main.py:391-471) given
    exactly-once TABLE semantics — a foreachBatch stream of 4
    micro-batches commits each epoch into the VERSIONED layout through
    merge-on-read upserts, with the manifest as the commit log: every
    epoch's commit carries ``commit_meta='epoch:<id>'`` and the absorb
    consults committed_metas first, so a redelivered epoch (restart
    replay) finds itself already committed and skips — no duplicate
    version, no double-applied batch (operators/merge.py
    versioned_absorb; forced-redelivery pinned in test_merge). Staging
    is key-unique, so the final live view equals the one-shot batch
    MERGE, which DuckDB replays. Unlike q_streaming_upsert's
    driver-held localCheckpoint target, the state here is the durable
    on-disk table — executor loss, restart, and replay all land on the
    manifest ledger, which is the property the reference's
    thread-looped MERGE never had."""
    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    o = load_table(spark, sf_dir, "orders")
    updates, inserts = _staged_orders(o)
    staging = updates.unionByName(inserts)
    path = _scratch_dir("streamver_")
    src = _scratch_dir("streamver_src_")
    ckpt = _scratch_dir("streamver_ckpt_")
    merge.versioned_layout_write(o, "o_orderkey", path, n_buckets=16)
    staging.repartition(4).write.mode("overwrite").parquet(src)

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        merge.versioned_absorb(
            spark, path, batch_df, "o_orderkey", epoch_id, mor=True
        )

    stream = (
        spark.readStream.schema(staging.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = W.streaming_upsert(stream, apply_batch, ckpt)
    q.processAllAvailable()
    q.stop()
    return merge.read_version(spark, path).select(*o.columns)


def q_versioned_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1g x X67 composition (r12), ORACLE-CHECKED: Delta's
    ``OPTIMIZE ZORDER BY`` + statistics skipping rebuilt on the
    versioned layout — events are laid out on a Morton key over
    (day-of-month, user-bucket) as the table's UNIQUE layout key
    (z-major: ``z * 2^44 + event_id``), with BOTH dimensions declared
    as manifest stats columns. Because each key-range bucket then
    holds a small hyper-rectangle of the dim space,
    read_version_pruned skips directories for range predicates on
    EITHER dimension — the multi-dim generalization the r11 verdict
    asked per-column stats for. The report runs both predicates
    through actual pruned reads and carries dirs_read/dirs_total; the
    oracle replays the bit interleave, the rank-math buckets, the
    per-bucket min/max, and the hit counts, so the pruning evidence is
    value-checked end-to-end (operators/layout.py zorder_key +
    operators/merge.py versioned_layout_write/read_version_pruned).
    The single-dim layout's failure on the other dimension is the
    in-registry q_zorder_layout row."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import layout

    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    maxu = ev.agg(F.max("user_id").alias("_mu"))
    d = ev.crossJoin(F.broadcast(maxu)).select(
        "event_id",
        (F.dayofmonth("ts") - 1).cast("long").alias("day0"),
        F.expr("user_id * 32 div (_mu + 1)").cast("long").alias("ub"),
    )
    z = layout.zorder_key([F.col("day0"), F.col("ub")], bits=5)
    t = d.withColumn(
        "zk", (z * F.lit(2**44) + F.col("event_id")).cast("long")
    )
    path = _scratch_dir("verzorder_")
    merge.versioned_layout_write(
        t, "zk", path, n_buckets=32, stats_cols=["day0", "ub"]
    )

    def report(tag: str, col: str, lo: int, hi: int) -> DataFrame:
        pruned = merge.read_version_pruned(spark, path, col, lo, hi)
        return pruned.agg(
            F.lit(tag).alias("predicate"),
            F.lit(int(pruned.dirs_read)).cast("int").alias("dirs_read"),
            F.lit(int(pruned.dirs_total)).cast("int").alias("dirs_total"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("event_id").alias("sum_ids"),
        )

    return (
        report("day0_10_16", "day0", 10, 16)
        .unionByName(report("ub_8_23", "ub", 8, 23))
        .orderBy("predicate")
    )


_ORACLE_VERSIONED_ZORDER = """
WITH base AS (
  SELECT event_id,
         CAST(date_part('day', ts) - 1 AS BIGINT) AS day0,
         CAST(user_id * 32 // ((SELECT max(user_id) FROM events
                                WHERE ts IS NOT NULL AND user_id IS NOT NULL) + 1)
              AS BIGINT) AS ub
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), z AS (
  SELECT event_id, day0, ub,
         (((day0 >> 0) & 1) << 0) + (((ub >> 0) & 1) << 1) +
         (((day0 >> 1) & 1) << 2) + (((ub >> 1) & 1) << 3) +
         (((day0 >> 2) & 1) << 4) + (((ub >> 2) & 1) << 5) +
         (((day0 >> 3) & 1) << 6) + (((ub >> 3) & 1) << 7) +
         (((day0 >> 4) & 1) << 8) + (((ub >> 4) & 1) << 9) AS zkey
  FROM base
), n AS (
  SELECT count(*) AS n FROM base
), b AS (
  SELECT event_id, day0, ub,
         (row_number() OVER (ORDER BY zkey, event_id) - 1) * 32 // n.n
           AS bucket
  FROM z, n
), st AS (
  SELECT bucket, min(day0) AS d0, max(day0) AS d1,
         min(ub) AS u0, max(ub) AS u1
  FROM b GROUP BY bucket
)
SELECT 'day0_10_16' AS predicate,
       CAST((SELECT count(*) FROM st WHERE d1 >= 10 AND d0 <= 16)
            AS INTEGER) AS dirs_read,
       32 AS dirs_total,
       count(*) AS n_rows,
       CAST(sum(event_id) AS BIGINT) AS sum_ids
FROM b WHERE day0 BETWEEN 10 AND 16
UNION ALL
SELECT 'ub_8_23',
       CAST((SELECT count(*) FROM st WHERE u1 >= 8 AND u0 <= 23)
            AS INTEGER),
       32, count(*), CAST(sum(event_id) AS BIGINT)
FROM b WHERE ub BETWEEN 8 AND 23
ORDER BY predicate
"""


def q_merge_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1i scoped snapshot-sync MERGE (r12), ORACLE-CHECKED: the third
    MERGE arm — ``WHEN NOT MATCHED BY SOURCE THEN DELETE`` under a
    scope predicate (operators/merge.py merge_scoped_sync). The
    producer hands a complete snapshot of 1995-Q1 orders (every 5th
    key gone, every 3rd repriced +50.00 exact, every 97th cloned to a
    new +200M key); the table converges to that snapshot INSIDE the
    scope and passes through untouched outside it. No join at all:
    scoped sync needs no key membership — one scope filter over the
    target (a partition predicate at scale, so the pass-through side
    is partition-pruned) plus the staging union. The oracle replays
    the slice replacement relationally."""
    o = load_table(spark, sf_dir, "orders")
    scope = (F.col("o_orderdate") >= F.lit("1995-01-01")) & (
        F.col("o_orderdate") < F.lit("1995-04-01")
    )
    inscope = o.where(scope)
    survivors = inscope.where(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + F.lit(50.0)
        ).otherwise(F.col("o_totalprice")),
    )
    clones = inscope.where(F.col("o_orderkey") % 97 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(200_000_000)
    )
    staging = survivors.unionByName(clones)
    return merge.merge_scoped_sync(o, staging, "o_orderkey", scope)


_ORACLE_MERGE_SYNC = """
WITH inscope AS (
  SELECT * FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1995-04-01'
)
SELECT * FROM orders
WHERE NOT (o_orderdate >= TIMESTAMP '1995-01-01'
           AND o_orderdate < TIMESTAMP '1995-04-01')
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus,
       CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 50.0
            ELSE o_totalprice END AS o_totalprice,
       o_orderdate, o_orderpriority
FROM inscope WHERE o_orderkey % 5 != 0
UNION ALL
SELECT o_orderkey + 200000000, o_custkey, o_orderstatus, o_totalprice,
       o_orderdate, o_orderpriority
FROM inscope WHERE o_orderkey % 97 = 0
"""


def q_versioned_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1h schema evolution on the versioned layout (r12),
    ORACLE-CHECKED: a merge-on-read batch CARRYING A NEW COLUMN
    evolves the table the way a lakehouse ADD COLUMN does — new
    generation files hold the column, read_version merges schemas so
    pre-evolution rows read NULL, and time travel returns each
    version's OWN schema (v0's manifest lists only pre-evolution
    directories, so the column simply isn't there). The report
    aggregates both versions including the column's presence,
    non-NULL count, and sum — the oracle replays the evolved MERGE
    with NULL for untouched rows, so evolution semantics are
    value-checked. The omit-direction (a later batch missing an
    evolved column writes NULL fresh copies, MERGE's
    update-all-columns arm) is pinned in test_merge
    (operators/merge.py: mergeSchema reads + allowMissingColumns
    union)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("evolve_")
    merge.versioned_layout_write(o, "o_orderkey", path, n_buckets=16)
    ranked, _n = relational.with_global_rank(o, ["o_orderkey"])
    staged = ranked.where(
        (F.col("grank") >= 2001) & (F.col("grank") <= 2100)
    ).select(
        "o_orderkey",
        (F.col("cents") + 10_000).alias("cents"),
        (F.col("o_orderkey") % 7).alias("flag"),
    )
    merge.upsert_versioned_dv(spark, path, staged, "o_orderkey")

    def report(v: int) -> DataFrame:
        t = merge.read_version(spark, path, v)
        if "flag" in t.columns:
            return t.agg(
                F.lit(v).alias("version"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("cents").alias("sum_cents"),
                F.lit(True).alias("has_flag"),
                F.count("flag").alias("n_flag"),
                F.coalesce(F.sum("flag"), F.lit(0)).alias("sum_flag"),
            )
        return t.agg(
            F.lit(v).alias("version"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("sum_cents"),
            F.lit(False).alias("has_flag"),
            F.lit(0).cast("long").alias("n_flag"),
            F.lit(0).cast("long").alias("sum_flag"),
        )

    return report(0).unionByName(report(1)).orderBy("version")


_ORACLE_VERSIONED_EVOLVE = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn
  FROM orders
), staged AS (
  SELECT k, cents + 10000 AS cents, k % 7 AS flag
  FROM o WHERE rn BETWEEN 2001 AND 2100
), merged AS (
  SELECT k, cents, NULL AS flag FROM o
  WHERE k NOT IN (SELECT k FROM staged)
  UNION ALL SELECT k, cents, flag FROM staged
)
SELECT 0 AS version, count(*) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       false AS has_flag, CAST(0 AS BIGINT) AS n_flag,
       CAST(0 AS BIGINT) AS sum_flag
FROM o
UNION ALL
SELECT 1, count(*), CAST(sum(cents) AS BIGINT),
       true, count(flag), CAST(coalesce(sum(flag), 0) AS BIGINT)
FROM merged
ORDER BY version
"""


def q_restore_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1j RESTORE — rollback-as-commit (r12 verdict #3),
    ORACLE-CHECKED: a good merge-on-read MERGE (v1, which also leaves
    a deletion vector so the restore must carry DV state), then a bad
    copy-on-write MERGE that poisons 100 rows (v2), then
    ``restore_version(path, 1)`` re-commits v1's manifest+DV as v3 in
    O(manifest) — no data is copied; the latest read and the v1 read
    reference the same immutable generation directories
    (operators/merge.py restore_version). The report aggregates the
    LATEST table per bucket next to the still-time-travelable bad
    version's sums, plus the version count — so the oracle
    value-checks all three restore properties at once: latest == v1,
    the bad version remains readable, and the restore is a real
    ledgered commit (n_versions = 4, not a manifest overwrite). The
    reference's recovery story is re-running the whole sync
    (main.py:366-384); here undo is O(manifest) at any table size.
    Idempotent re-restore and vacuum-after-restore are pinned in
    test_merge."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("restore_")
    merge.versioned_layout_write(o, "o_orderkey", path, n_buckets=16)
    ranked, _n = relational.with_global_rank(o, ["o_orderkey"])
    good = (
        ranked.where((F.col("grank") >= 101) & (F.col("grank") <= 200))
        .select("o_orderkey", (F.col("cents") + 5000).alias("cents"))
        .unionByName(
            spark.range(5).select(
                (F.col("id") + 40_000_000).alias("o_orderkey"),
                (F.col("id") * 77).alias("cents"),
            )
        )
    )
    merge.upsert_versioned_dv(spark, path, good, "o_orderkey")  # v1: good
    bad = ranked.where(
        (F.col("grank") >= 301) & (F.col("grank") <= 400)
    ).select("o_orderkey", F.lit(-1).cast("long").alias("cents"))
    merge.upsert_versioned(spark, path, bad, "o_orderkey")  # v2: bad
    merge.restore_version(spark, path, 1)  # v3: undo in O(manifest)
    n_versions = len(merge._list_versions(spark, f"{path}/_manifest"))
    latest = merge.read_version(spark, path)
    bad_view = merge.read_version(spark, path, 2)
    lat_b = latest.groupBy(F.col("_kr").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_live"),
        F.sum("cents").alias("sum_cents"),
    )
    bad_b = bad_view.groupBy(F.col("_kr").alias("bucket")).agg(
        F.sum("cents").alias("sum_cents_bad")
    )
    return (
        lat_b.join(bad_b, "bucket")
        .withColumn("n_versions", F.lit(int(n_versions)))
        .orderBy("bucket")
    )


_ORACLE_RESTORE_TABLE = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
), base AS (
  SELECT k, cents, (rn - 1) * 16 // n AS b FROM o
), cut AS (
  SELECT b, min(k) AS min_k FROM base GROUP BY b
), good AS (
  SELECT k, cents + 5000 AS cents FROM o WHERE rn BETWEEN 101 AND 200
  UNION ALL
  SELECT 40000000 + i, i * 77 FROM generate_series(0, 4) t(i)
), gask AS (
  SELECT g.k, g.cents,
         coalesce((SELECT max(c.b) FROM cut c WHERE c.min_k <= g.k), 0) AS b
  FROM good g
), v1 AS (
  SELECT k, cents, b FROM base WHERE k NOT IN (SELECT k FROM good)
  UNION ALL SELECT k, cents, b FROM gask
), bad AS (
  SELECT k FROM o WHERE rn BETWEEN 301 AND 400
), v2 AS (
  SELECT k,
         CASE WHEN k IN (SELECT k FROM bad) THEN -1 ELSE cents END AS cents,
         b
  FROM v1
)
SELECT l.b AS bucket, l.n_live, l.sum_cents, w.sum_cents_bad,
       4 AS n_versions
FROM (
  SELECT b, count(*) AS n_live, CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM v1 GROUP BY b
) l
JOIN (
  SELECT b, CAST(sum(cents) AS BIGINT) AS sum_cents_bad FROM v2 GROUP BY b
) w ON w.b = l.b
ORDER BY bucket
"""


def q_constraint_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1p write-time CHECK constraints + quarantine (r13; Delta ADD
    CONSTRAINT / DLT expectations), ORACLE-CHECKED: the table declares
    ``cents_pos`` (cents >= 0) and ``key_cap`` (key < 50M); a staging
    batch carries both kinds of violation (a rank band updated to
    negative cents, plus out-of-range inserted keys); committed through
    quarantine mode, the violators land in the per-version quarantine
    ledger with their violation name and ONLY the clean remainder
    merges (operators/constraints.py). The gate the reference never
    had: its MERGE absorbs any malformed row (main.py:349-358). The
    report is the per-bucket LIVE table next to the quarantine census
    and the version count, so the oracle value-checks the whole
    contract: clean rows in, bad rows out, per-constraint counts
    exact, and the quarantined commit is one real ledgered version.
    Error mode (commit refused before any write, all committers) is
    pinned in test_constraints. Scale: the gate is one map-side filter
    over the BATCH only — zero shuffle, nothing table-sized."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("congate_")
    merge.versioned_layout_write(o, "k", path, n_buckets=16)
    constraints.set_constraints(
        spark, path, {"cents_pos": "cents >= 0", "key_cap": "k < 50000000"}
    )
    ranked, _n = relational.with_global_rank(o, ["k"])
    staging = (
        ranked.where((F.col("grank") >= 101) & (F.col("grank") <= 400))
        .select("k", (F.col("cents") - F.lit(10_000_000)).alias("cents"))
        .unionByName(
            spark.range(3).select(
                (F.col("id") + 90_000_000).alias("k"),
                (F.col("id") + 100).alias("cents"),
            )
        )
    )
    out = constraints.upsert_versioned_checked(
        spark, path, staging, "k", mode="quarantine"
    )
    q = constraints.read_quarantine(spark, path, out.version)
    census = {
        r._violation: r.n
        for r in q.groupBy("_violation").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_versions = len(merge._list_versions(spark, f"{path}/_manifest"))
    return (
        merge.read_version(spark, path)
        .groupBy(F.col("_kr").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_live"), F.sum("cents").alias("sum_cents"))
        .withColumn(
            "n_quarantined", F.lit(int(out.n_quarantined)).cast("long")
        )
        .withColumn(
            "n_q_cents", F.lit(int(census.get("cents_pos", 0))).cast("long")
        )
        .withColumn(
            "n_q_keycap", F.lit(int(census.get("key_cap", 0))).cast("long")
        )
        .withColumn("n_versions", F.lit(int(n_versions)))
        .orderBy("bucket")
    )


_ORACLE_CONSTRAINT_GATE = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
), base AS (
  SELECT k, cents, (rn - 1) * 16 // n AS b FROM o
), staging AS (
  SELECT k, cents - 10000000 AS cents FROM o WHERE rn BETWEEN 101 AND 400
  UNION ALL
  SELECT 90000000 + i, 100 + i FROM generate_series(0, 2) t(i)
), q AS (
  SELECT k, cents,
         CASE WHEN NOT (cents >= 0) THEN 'cents_pos'
              WHEN NOT (k < 50000000) THEN 'key_cap' END AS viol
  FROM staging
), clean AS (
  SELECT k, cents FROM q WHERE viol IS NULL
), merged AS (
  -- every clean row is an UPDATE of an existing key (the only inserts
  -- in the batch violate key_cap), so the merge is a keyed CASE
  SELECT b.k,
         CASE WHEN c.k IS NOT NULL THEN c.cents ELSE b.cents END AS cents,
         b.b
  FROM base b LEFT JOIN clean c ON c.k = b.k
)
SELECT b AS bucket, count(*) AS n_live, CAST(sum(cents) AS BIGINT) AS sum_cents,
       (SELECT count(*) FROM q WHERE viol IS NOT NULL) AS n_quarantined,
       (SELECT count(*) FROM q WHERE viol = 'cents_pos') AS n_q_cents,
       (SELECT count(*) FROM q WHERE viol = 'key_cap') AS n_q_keycap,
       2 AS n_versions
FROM merged GROUP BY b ORDER BY bucket
"""


def q_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1q SHALLOW CLONE — zero-copy table fork (r13; Delta CLONE),
    ORACLE-CHECKED: clone_table commits a new table whose first
    manifest REFERENCES the source's generation directories (no data
    file copied — asserted in-plan from the filesystem: the clone's
    data dir does not exist at clone time), then a copy-on-write MERGE
    diverges the clone while the source stays byte-identical
    (operators/merge.py clone_table, _read_gen_dirs). The report joins
    the CLONE's per-bucket live aggregate against the SOURCE's, with
    the shared-directory census (untouched buckets keep resolving to
    source files — exactly 16 minus the touched buckets) and the
    zero-copy evidence as value-checked columns. Dev/test forks of a
    100 TB table cost one manifest write; storage is shared until
    divergence, as in Delta. Vacuum/compaction/clone-of-clone safety
    pinned in test_merge."""
    import os

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    src = _scratch_dir("clonesrc_")
    dst = _scratch_dir("clonedst_")
    os.rmdir(dst)  # clone_table requires a fresh destination
    merge.versioned_layout_write(o, "k", src, n_buckets=16)
    merge.clone_table(spark, src, dst)
    files_copied = (
        sum(len(fs) for _, _, fs in os.walk(f"{dst}/data"))
        if os.path.exists(f"{dst}/data")
        else 0
    )
    ranked, _n = relational.with_global_rank(o, ["k"])
    staging = (
        ranked.where((F.col("grank") >= 51) & (F.col("grank") <= 150))
        .select("k", (F.col("cents") + 777).alias("cents"))
        .unionByName(
            spark.range(5).select(
                (F.col("id") + 70_000_000).alias("k"),
                (F.col("id") + 55).alias("cents"),
            )
        )
    )
    merge.upsert_versioned(spark, dst, staging, "k")
    vlast = merge._list_versions(spark, f"{dst}/_manifest")[-1]
    man = merge._read_manifest(spark, dst, vlast)
    n_shared = (
        man.where(F.col("ext").isNotNull()).count()
        if "ext" in man.columns
        else 0
    )
    clone_agg = (
        merge.read_version(spark, dst)
        .groupBy(F.col("_kr").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_live_clone"),
            F.sum("cents").alias("sum_cents_clone"),
        )
    )
    src_agg = (
        merge.read_version(spark, src)
        .groupBy(F.col("_kr").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_live_src"),
            F.sum("cents").alias("sum_cents_src"),
        )
    )
    return (
        clone_agg.join(src_agg, "bucket")
        .withColumn("files_copied", F.lit(int(files_copied)).cast("long"))
        .withColumn("n_shared_dirs", F.lit(int(n_shared)).cast("long"))
        .orderBy("bucket")
    )


_ORACLE_SHALLOW_CLONE = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
), base AS (
  SELECT k, cents, (rn - 1) * 16 // n AS b FROM o
), cut AS (
  SELECT b, min(k) AS min_k FROM base GROUP BY b
), staging AS (
  SELECT k, cents + 777 AS cents FROM o WHERE rn BETWEEN 51 AND 150
  UNION ALL
  SELECT 70000000 + i, 55 + i FROM generate_series(0, 4) t(i)
), gask AS (
  SELECT s.k, s.cents,
         coalesce((SELECT max(c.b) FROM cut c WHERE c.min_k <= s.k), 0) AS b
  FROM staging s
), clone AS (
  SELECT k, cents, b FROM base WHERE k NOT IN (SELECT k FROM staging)
  UNION ALL SELECT k, cents, b FROM gask
)
SELECT c.bucket, c.n_live_clone, c.sum_cents_clone,
       s.n_live_src, s.sum_cents_src,
       0 AS files_copied,
       16 - (SELECT count(DISTINCT b) FROM gask) AS n_shared_dirs
FROM (
  SELECT b AS bucket, count(*) AS n_live_clone,
         CAST(sum(cents) AS BIGINT) AS sum_cents_clone
  FROM clone GROUP BY b
) c
JOIN (
  SELECT b AS bucket, count(*) AS n_live_src,
         CAST(sum(cents) AS BIGINT) AS sum_cents_src
  FROM base GROUP BY b
) s ON s.bucket = c.bucket
ORDER BY c.bucket
"""


def q_as_of_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1r TIMESTAMP AS OF time travel (r13; Delta's timestamp travel),
    ORACLE-CHECKED: three commits, then a read at the MIDDLE commit's
    timestamp resolves to that version — commit_timestamps derives the
    clock from each committed manifest's ``_SUCCESS`` modification time
    (the same source Delta uses) made strictly monotonic, so "latest
    version at time T" is well-defined even for same-tick commits
    (operators/merge.py commit_timestamps, version_as_of,
    read_version_as_of). Wall-clock values are nondeterministic; the
    CONTENT the probe resolves to is not — the oracle replays the
    middle version's exact table, and the resolved version number rides
    as a value-checked column, so a resolution off by one flips the
    hash. Boundary/error semantics pinned in test_merge. Scale: the
    resolution is O(versions) driver FS stats; the read is
    read_version's one-manifest plan."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("asof_")
    merge.versioned_layout_write(o, "k", path, n_buckets=16)
    ranked, _n = relational.with_global_rank(o, ["k"])
    v1_batch = (
        ranked.where((F.col("grank") >= 201) & (F.col("grank") <= 320))
        .select("k", (F.col("cents") + 1111).alias("cents"))
        .unionByName(
            spark.range(4).select(
                (F.col("id") + 80_000_000).alias("k"),
                (F.col("id") + 9).alias("cents"),
            )
        )
    )
    merge.upsert_versioned(spark, path, v1_batch, "k")  # v1: the probe target
    v2_batch = ranked.where(
        (F.col("grank") >= 401) & (F.col("grank") <= 460)
    ).select("k", (F.col("cents") - 3333).alias("cents"))
    merge.upsert_versioned(spark, path, v2_batch, "k")  # v2: must NOT show
    ts = merge.commit_timestamps(spark, path)
    resolved = merge.version_as_of(spark, path, ts[1])
    return (
        merge.read_version_as_of(spark, path, ts[1])
        .groupBy(F.col("_kr").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_live"), F.sum("cents").alias("sum_cents"))
        .withColumn("version_resolved", F.lit(int(resolved)))
        .orderBy("bucket")
    )


_ORACLE_AS_OF_TIMESTAMP = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
), base AS (
  SELECT k, cents, (rn - 1) * 16 // n AS b FROM o
), cut AS (
  SELECT b, min(k) AS min_k FROM base GROUP BY b
), v1b AS (
  SELECT k, cents + 1111 AS cents FROM o WHERE rn BETWEEN 201 AND 320
  UNION ALL
  SELECT 80000000 + i, 9 + i FROM generate_series(0, 3) t(i)
), gask AS (
  SELECT s.k, s.cents,
         coalesce((SELECT max(c.b) FROM cut c WHERE c.min_k <= s.k), 0) AS b
  FROM v1b s
), v1 AS (
  SELECT k, cents, b FROM base WHERE k NOT IN (SELECT k FROM v1b)
  UNION ALL SELECT k, cents, b FROM gask
)
SELECT b AS bucket, count(*) AS n_live,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       1 AS version_resolved
FROM v1 GROUP BY b ORDER BY bucket
"""


def q_tagged_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1s TAGS — named snapshot pointers that pin retention (r13;
    Iceberg tags), ORACLE-CHECKED: a release tag is set on the middle
    commit, a later merge supersedes it, and VACUUM with keep_last=1
    runs — which would expire everything but the latest; the tag PINS
    its snapshot (and the generations it references), so
    read_tag("release") still serves the exact tagged contents while
    the untagged bootstrap expires (operators/merge.py tag_version/
    read_tag/list_tags + the vacuum retention rule). The report is the
    tagged read's per-bucket aggregate with the pinned version and the
    post-vacuum retained-version count as value-checked columns — so
    the oracle checks the pointer, the pin, AND the reclaim in one
    result. Re-tag/delete-tag/release semantics pinned in test_merge.
    Scale: a tag is one small JSON write; the pin costs vacuum one
    set-union over version numbers."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("tagged_")
    merge.versioned_layout_write(o, "k", path, n_buckets=16)
    ranked, _n = relational.with_global_rank(o, ["k"])
    v1_batch = ranked.where(
        (F.col("grank") >= 151) & (F.col("grank") <= 250)
    ).select("k", (F.col("cents") + 4444).alias("cents"))
    merge.upsert_versioned(spark, path, v1_batch, "k")  # v1: the release
    tagged_v = merge.tag_version(spark, path, "release")  # pins v1
    v2_batch = ranked.where(
        (F.col("grank") >= 351) & (F.col("grank") <= 420)
    ).select("k", (F.col("cents") - 7777).alias("cents"))
    merge.upsert_versioned(spark, path, v2_batch, "k")  # v2 supersedes
    merge.vacuum_versions(spark, path, keep_last=1)  # v0 expires, v1 pinned
    retained = merge._list_versions(spark, f"{path}/_manifest")
    return (
        merge.read_tag(spark, path, "release")
        .groupBy(F.col("_kr").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_live"), F.sum("cents").alias("sum_cents"))
        .withColumn("tagged_version", F.lit(int(tagged_v)))
        .withColumn("n_retained", F.lit(len(retained)))
        .orderBy("bucket")
    )


_ORACLE_TAGGED_READ = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
), base AS (
  SELECT k, cents, (rn - 1) * 16 // n AS b FROM o
), v1b AS (
  SELECT k, cents + 4444 AS cents FROM o WHERE rn BETWEEN 151 AND 250
), v1 AS (
  -- band updates of existing keys only: merge is a keyed CASE
  SELECT b.k,
         CASE WHEN u.k IS NOT NULL THEN u.cents ELSE b.cents END AS cents,
         b.b
  FROM base b LEFT JOIN v1b u ON u.k = b.k
)
SELECT b AS bucket, count(*) AS n_live,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       1 AS tagged_version,
       2 AS n_retained
FROM v1 GROUP BY b ORDER BY bucket
"""


def q_compact_binpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1m file-size-aware OPTIMIZE (r12 verdict #7), ORACLE-CHECKED:
    three tiny merge-on-read commits plus a pure-DV delete leave one
    bucket holding a stack of small generation directories;
    compact_small_generations bin-packs every bucket's sub-threshold
    generations into one fresh generation and commits — generations at
    or above the target are never rewritten (operators/merge.py
    compact_small_generations). The report is the per-bucket LIVE
    table after packing next to the carried-forward deletion-vector
    census and the version count, so the oracle value-checks the three
    claims that matter: contents identical (packing is pure layout),
    the DV carries verbatim (dead keys stay dead without their copies
    being rewritten), and the pack is a real ledgered commit
    (n_versions = 6). The >= 3-directory reduction is asserted
    in-plan (byte sizes aren't relational facts, so the threshold
    split rides an engine assert; the CONTENT is what the oracle
    replays). Vacuum-reclaim of packed inputs is pinned in
    test_merge."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("binpack_")
    merge.versioned_layout_write(o, "o_orderkey", path, n_buckets=16)
    ranked, n_total = relational.with_global_rank(o, ["o_orderkey"])
    # rank-derived, scale-independent bands: three 40-row DV batches
    # past the midpoint, a 20-row delete band past the quarter point
    mid, quarter = n_total // 2, n_total // 4
    for i, lo in enumerate((mid + 1, mid + 41, mid + 81)):
        upd = ranked.where(
            (F.col("grank") >= lo) & (F.col("grank") <= lo + 39)
        ).select(
            "o_orderkey",
            (F.col("cents") + 1000 * (i + 1)).alias("cents"),
        )
        merge.upsert_versioned_dv(spark, path, upd, "o_orderkey")
    dels = ranked.where(
        (F.col("grank") >= quarter + 1) & (F.col("grank") <= quarter + 20)
    ).select("o_orderkey")
    merge.delete_versioned(spark, path, dels, "o_orderkey")  # v4
    out = merge.compact_small_generations(
        spark, path, "o_orderkey", min_file_bytes=16 << 10
    )
    # the three tiny generations always sit under 16 KiB together in
    # one bucket: packing MUST have coalesced them
    assert out.version == 5 and out.n_packed_dirs >= 3, (
        out.version,
        out.n_packed_dirs,
    )
    live = merge.read_version(spark, path)
    dv = spark.read.parquet(f"{path}/_dv/v=5")
    live_b = live.groupBy(F.col("_kr").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_live"),
        F.sum("cents").alias("sum_cents"),
    )
    dv_b = dv.groupBy(F.col("_kr").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_dv")
    )
    return (
        live_b.join(dv_b, "bucket", "left")
        .select(
            "bucket",
            "n_live",
            "sum_cents",
            F.coalesce("n_dv", F.lit(0)).alias("n_dv"),
            F.lit(6).alias("n_versions"),
        )
        .orderBy("bucket")
    )


_ORACLE_COMPACT_BINPACK = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
), base AS (
  SELECT k, cents, (rn - 1) * 16 // n AS b FROM o
), cut AS (
  SELECT b, min(k) AS min_k FROM base GROUP BY b
), upd AS (
  SELECT k, cents + 1000 AS cents FROM o
  WHERE rn > n // 2 AND rn <= n // 2 + 40
  UNION ALL
  SELECT k, cents + 2000 FROM o
  WHERE rn > n // 2 + 40 AND rn <= n // 2 + 80
  UNION ALL
  SELECT k, cents + 3000 FROM o
  WHERE rn > n // 2 + 80 AND rn <= n // 2 + 120
), dels AS (
  SELECT k FROM o WHERE rn > n // 4 AND rn <= n // 4 + 20
), uassigned AS (
  SELECT u.k, u.cents,
         coalesce((SELECT max(c.b) FROM cut c WHERE c.min_k <= u.k), 0) AS b
  FROM upd u
), live AS (
  SELECT k, cents, b FROM base
  WHERE k NOT IN (SELECT k FROM dels) AND k NOT IN (SELECT k FROM upd)
  UNION ALL SELECT k, cents, b FROM uassigned
), dvk AS (
  SELECT d.k,
         coalesce((SELECT max(c.b) FROM cut c WHERE c.min_k <= d.k), 0) AS b
  FROM dels d
  UNION ALL SELECT k, b FROM uassigned
)
SELECT lv.b AS bucket, lv.n_live, lv.sum_cents,
       coalesce(dv.n_dv, 0) AS n_dv, 6 AS n_versions
FROM (
  SELECT b, count(*) AS n_live, CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM live GROUP BY b
) lv
LEFT JOIN (
  SELECT b, count(*) AS n_dv FROM dvk GROUP BY b
) dv ON dv.b = lv.b
ORDER BY bucket
"""


def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1k manifest-Bloom point-predicate skipping (r12 verdict #4),
    ORACLE-CHECKED: equality probes on a high-cardinality NON-layout
    column — the reference's own ``_id`` lookup shape
    (main.py:179-194) — served by per-(bucket, generation) Bloom
    bitmaps riding the commit log (operators/merge.py _bloom_rows /
    read_version_point). Range stats are useless here BY CONSTRUCTION:
    ``uid = (k * 2654435761) % 100000007`` (Knuth multiplicative)
    spreads every bucket's uids across the whole domain, so every
    directory's [min, max] straddles every probe; the bitmaps still
    prune to the directories truly holding the value. Four probes
    cover the matrix — a base-table hit, a hit in a DV-committed fresh
    generation, a SUPERSEDED uid (bitmaps honestly report its old
    directory, the deletion vector then yields zero rows — physical
    presence vs liveness made visible), and an absent value (prunes
    everything). dirs_read/dirs_total ride as evidence columns the
    oracle replays as exact containing-directory counts: Bloom's
    one-sided error means dirs_read = truth + FPR-noise, and at the
    committed width (2^21 bits vs ~10^3-10^4 rows/directory, k=6) the
    noise term is < 1e-9 per probe — at larger fills size
    ``bloom_bits`` at ~10 bits/key, the standard 1% curve. The exact
    in-stage equality filter makes the ROWS exact at any FPR."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        ((F.col("o_orderkey") * F.lit(2654435761)) % F.lit(100000007)).alias(
            "uid"
        ),
    )
    path = _scratch_dir("pointlk_")
    merge.versioned_layout_write(
        o, "o_orderkey", path, n_buckets=16, point_cols=["uid"]
    )
    ranked, n_total = relational.with_global_rank(o, ["o_orderkey"])
    # rank-derived, scale-independent bands (the column_prune rule):
    # the DV batch is the 40 ranks past the midpoint, the anchors sit
    # at n/10 (untouched base key) and midpoint+10 (updated key)
    lo = n_total // 2
    upd = ranked.where(
        (F.col("grank") >= lo + 1) & (F.col("grank") <= lo + 40)
    ).select(
        "o_orderkey",
        (F.col("cents") + 999).alias("cents"),
        (F.col("uid") + 200_000_000).alias("uid"),
    )
    merge.upsert_versioned_dv(spark, path, upd, "o_orderkey")
    a_base, a_fresh = n_total // 10, lo + 10
    anchors = {
        r.grank: int(r.uid)
        for r in ranked.where(F.col("grank").isin(a_base, a_fresh))
        .select("grank", "uid")
        .collect()
    }
    probes = [
        ("absent", 999_999_999_999),
        ("base_hit", anchors[a_base]),
        ("fresh_hit", anchors[a_fresh] + 200_000_000),
        ("superseded", anchors[a_fresh]),
    ]
    parts = []
    for name, u in probes:
        d = merge.read_version_point(spark, path, "uid", u)
        parts.append(
            d.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(F.sum("cents"), F.lit(0))
                .cast("bigint")
                .alias("sum_cents"),
            )
            .withColumn("probe", F.lit(name))
            .withColumn("dirs_read", F.lit(int(d.dirs_read)))
            .withColumn("dirs_total", F.lit(int(d.dirs_total)))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "probe", "n_rows", "sum_cents", "dirs_read", "dirs_total"
    ).orderBy("probe")


_ORACLE_POINT_LOOKUP = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         (o_orderkey * 2654435761) % 100000007 AS uid,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
), base AS (
  SELECT k, cents, uid, (rn - 1) * 16 // n AS b FROM o
), cut AS (
  SELECT b, min(k) AS min_k FROM base GROUP BY b
), upd AS (
  SELECT k, cents + 999 AS cents, uid + 200000000 AS uid
  FROM o WHERE rn > n // 2 AND rn <= n // 2 + 40
), uassigned AS (
  SELECT u.k, u.cents, u.uid,
         coalesce((SELECT max(c.b) FROM cut c WHERE c.min_k <= u.k), 0) AS b
  FROM upd u
), live AS (
  SELECT k, cents, uid FROM base WHERE k NOT IN (SELECT k FROM upd)
  UNION ALL SELECT k, cents, uid FROM uassigned
), nfresh AS (
  SELECT count(DISTINCT b) AS nb FROM uassigned
), probes AS (
  SELECT 'absent' AS probe, CAST(999999999999 AS BIGINT) AS u
  UNION ALL
  SELECT 'base_hit', (SELECT uid FROM o WHERE rn = n // 10)
  UNION ALL
  SELECT 'fresh_hit', (SELECT uid + 200000000 FROM o WHERE rn = n // 2 + 10)
  UNION ALL
  SELECT 'superseded', (SELECT uid FROM o WHERE rn = n // 2 + 10)
)
SELECT p.probe,
       (SELECT count(*) FROM live l WHERE l.uid = p.u) AS n_rows,
       (SELECT CAST(coalesce(sum(cents), 0) AS BIGINT)
        FROM live l WHERE l.uid = p.u) AS sum_cents,
       CAST((SELECT count(DISTINCT b) FROM base WHERE uid = p.u)
            + (SELECT count(DISTINCT b) FROM uassigned WHERE uid = p.u)
            AS INTEGER) AS dirs_read,
       CAST(16 + nf.nb AS INTEGER) AS dirs_total
FROM probes p, nfresh nf
ORDER BY probe
"""


def q_merge_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1l conditional multi-arm MERGE (r12 verdict #5),
    ORACLE-CHECKED: the general Delta/ANSI MERGE surface —
    ``WHEN MATCHED AND <cond> THEN DELETE / UPDATE SET <subset> /
    UPDATE SET * , WHEN NOT MATCHED AND <cond> THEN INSERT`` — of
    which the reference's update-all upsert (main.py:349-358) is the
    no-condition special case (operators/merge.py merge_arms). A CDC
    batch carries an op column: 'D' rows delete, 'U' rows update —
    but open orders (t.ostatus = 'O') take ONLY the repriced cents
    (SET-subset, their status untouched) while the second U-arm
    rewrites closed orders entirely; 'I' rows insert only when
    priced >= 0 (the negative ones drop). First-match-wins precedence
    across four arms, one full-outer join however many arms — DuckDB
    replays it as a CASE-classified full outer, cell for cell."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderstatus").alias("ostatus"),
    )
    ranked, _n = relational.with_global_rank(o, ["o_orderkey"])
    dels = ranked.where(
        (F.col("grank") >= 1001) & (F.col("grank") <= 1100)
    ).select("o_orderkey", "cents", "ostatus", F.lit("D").alias("op"))
    upds = ranked.where(
        (F.col("grank") >= 2001) & (F.col("grank") <= 2200)
    ).select(
        "o_orderkey",
        (F.col("cents") + 7777).alias("cents"),
        F.lit("X").alias("ostatus"),
        F.lit("U").alias("op"),
    )
    ins = spark.range(10).select(
        (F.col("id") + 50_000_000).alias("o_orderkey"),
        (F.col("id") * 11 - 22).alias("cents"),
        F.lit("X").alias("ostatus"),
        F.lit("I").alias("op"),
    )
    staging = dels.unionByName(upds).unionByName(ins)
    return merge.merge_arms(
        o,
        staging,
        "o_orderkey",
        matched=[
            ("s.op = 'D'", "delete"),
            ("s.op = 'U' AND t.ostatus = 'O'", "update", ["cents"]),
            ("s.op = 'U'", "update", None),
        ],
        not_matched=[("s.op = 'I' AND s.cents >= 0", "insert")],
    )


_ORACLE_MERGE_ARMS = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderstatus AS ostatus,
         row_number() OVER (ORDER BY o_orderkey) AS rn
  FROM orders
), s AS (
  SELECT k, cents, ostatus, 'D' AS op FROM o WHERE rn BETWEEN 1001 AND 1100
  UNION ALL
  SELECT k, cents + 7777, 'X', 'U' FROM o WHERE rn BETWEEN 2001 AND 2200
  UNION ALL
  SELECT 50000000 + i, i * 11 - 22, 'X', 'I' FROM generate_series(0, 9) t(i)
), j AS (
  SELECT t.k AS tk, t.cents AS tc, t.ostatus AS ts,
         s.k AS sk, s.cents AS sc, s.ostatus AS ss, s.op
  FROM o t FULL OUTER JOIN s ON t.k = s.k
), cls AS (
  SELECT *,
         CASE
           WHEN tk IS NOT NULL AND sk IS NOT NULL AND op = 'D' THEN 'm0'
           WHEN tk IS NOT NULL AND sk IS NOT NULL AND op = 'U'
                AND ts = 'O' THEN 'm1'
           WHEN tk IS NOT NULL AND sk IS NOT NULL AND op = 'U' THEN 'm2'
           WHEN tk IS NOT NULL THEN 'noop'
           WHEN op = 'I' AND sc >= 0 THEN 'i0'
           ELSE 'skip'
         END AS arm
  FROM j
)
SELECT coalesce(tk, sk) AS o_orderkey,
       CASE WHEN arm IN ('m1', 'm2', 'i0') THEN sc ELSE tc END AS cents,
       CASE WHEN arm IN ('m2', 'i0') THEN ss ELSE ts END AS ostatus
FROM cls
WHERE arm NOT IN ('m0', 'skip')
"""


def q_merge_arms_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1l on the versioned table, merge-on-read pricing
    (r12 verdict #5 "DV-tier twin"), ORACLE-CHECKED: the same arm
    surface committed through merge_arms_versioned_dv — the delete
    arm's keys become pure deletion-vector entries (zero data files),
    update/insert arms write ONLY their fresh copies as the new
    generation, matched-but-unclaimed 'N' rows and cond-failing
    inserts touch nothing at all. The report is the q_merge_dv
    evidence shape: per bucket, the LIVE table (n_live, sum_cents)
    against the PHYSICAL file population (n_physical) and the DV
    entry count (n_dv) — so the oracle value-checks both the merge
    semantics and the merge-on-read pricing claim (physical = base +
    updates + inserts only; DV = claimed keys only)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("armsdv_")
    merge.versioned_layout_write(o, "o_orderkey", path, n_buckets=16)
    ranked, _n = relational.with_global_rank(o, ["o_orderkey"])
    dels = ranked.where(
        (F.col("grank") >= 1001) & (F.col("grank") <= 1050)
    ).select("o_orderkey", "cents", F.lit("D").alias("op"))
    upds = ranked.where(
        (F.col("grank") >= 2001) & (F.col("grank") <= 2100)
    ).select(
        "o_orderkey", (F.col("cents") + 10_000).alias("cents"),
        F.lit("U").alias("op"),
    )
    noops = ranked.where(
        (F.col("grank") >= 3001) & (F.col("grank") <= 3050)
    ).select("o_orderkey", "cents", F.lit("N").alias("op"))
    ins = spark.range(8).select(
        (F.col("id") + 30_000_000).alias("o_orderkey"),
        (F.col("id") * 1000 - 2000).alias("cents"),  # 2 negative: skip
        F.lit("I").alias("op"),
    )
    staging = dels.unionByName(upds).unionByName(noops).unionByName(ins)
    merge.merge_arms_versioned_dv(
        spark, path, staging, "o_orderkey",
        matched=[("s.op = 'D'", "delete"), ("s.op = 'U'", "update", None)],
        not_matched=[("s.op = 'I' AND s.cents >= 0", "insert")],
    )
    live = merge.read_version(spark, path)
    physical = spark.read.option("basePath", f"{path}/data").parquet(
        f"{path}/data"
    )
    dv = spark.read.parquet(f"{path}/_dv/v=1")
    live_b = live.groupBy(F.col("_kr").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_live"),
        F.sum("cents").alias("sum_cents"),
    )
    phys_b = physical.groupBy(F.col("_kr").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_physical")
    )
    dv_b = dv.groupBy(F.col("_kr").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_dv")
    )
    return (
        live_b.join(phys_b, "bucket", "full_outer")
        .join(dv_b, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_live", F.lit(0)).alias("n_live"),
            F.coalesce("sum_cents", F.lit(0)).alias("sum_cents"),
            F.coalesce("n_physical", F.lit(0)).alias("n_physical"),
            F.coalesce("n_dv", F.lit(0)).alias("n_dv"),
        )
        .orderBy("bucket")
    )


_ORACLE_MERGE_ARMS_DV = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
), base AS (
  SELECT k, cents, (rn - 1) * 16 // n AS b FROM o
), cut AS (
  SELECT b, min(k) AS min_k FROM base GROUP BY b
), dels AS (
  SELECT k FROM o WHERE rn BETWEEN 1001 AND 1050
), upds AS (
  SELECT k, cents + 10000 AS cents FROM o WHERE rn BETWEEN 2001 AND 2100
), ins AS (
  SELECT 30000000 + i AS k, i * 1000 - 2000 AS cents
  FROM generate_series(0, 7) t(i)
  WHERE i * 1000 - 2000 >= 0
), fresh AS (
  SELECT k, cents FROM upds UNION ALL SELECT k, cents FROM ins
), fassigned AS (
  SELECT f.k, f.cents,
         coalesce((SELECT max(c.b) FROM cut c WHERE c.min_k <= f.k), 0) AS b
  FROM fresh f
), live AS (
  SELECT k, cents, b FROM base
  WHERE k NOT IN (SELECT k FROM dels) AND k NOT IN (SELECT k FROM fresh)
  UNION ALL SELECT k, cents, b FROM fassigned
), phys AS (
  SELECT b FROM base UNION ALL SELECT b FROM fassigned
), dvk AS (
  SELECT d.k,
         coalesce((SELECT max(c.b) FROM cut c WHERE c.min_k <= d.k), 0) AS b
  FROM dels d
  UNION ALL SELECT k, b FROM fassigned
), buckets AS (
  SELECT DISTINCT b FROM phys
)
SELECT bk.b AS bucket,
       coalesce(lv.n_live, 0) AS n_live,
       coalesce(lv.sum_cents, 0) AS sum_cents,
       coalesce(ph.n_physical, 0) AS n_physical,
       coalesce(dv.n_dv, 0) AS n_dv
FROM buckets bk
LEFT JOIN (
  SELECT b, count(*) AS n_live, CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM live GROUP BY b
) lv ON lv.b = bk.b
LEFT JOIN (
  SELECT b, count(*) AS n_physical FROM phys GROUP BY b
) ph ON ph.b = bk.b
LEFT JOIN (
  SELECT b, count(*) AS n_dv FROM dvk GROUP BY b
) dv ON dv.b = bk.b
ORDER BY bucket
"""


def q_merge_arms_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1l WHEN NOT MATCHED BY SOURCE arms (r13), ORACLE-CHECKED: the
    last Delta MERGE arm family — conditional actions on TARGET rows
    absent from staging. A producer hands the current snapshot of one
    rank slice (every 7th key gone, every 3rd repriced); the MERGE
    updates matched rows from the snapshot, then, within the slice,
    retires vanished OPEN orders (conditional DELETE) and archives the
    other vanished rows (expression UPDATE SET ostatus='Z' — the
    staging side is all-NULL for these rows, so SETs are expressions
    over t), while everything outside the slice passes through
    untouched because no arm's slice predicate claims it. Still ONE
    full-outer join + CASE — the unconditional no-join special case is
    merge_scoped_sync (q_merge_sync); DuckDB replays the classified
    full outer cell for cell (operators/merge.py merge_arms,
    not_matched_by_source)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderstatus").alias("ostatus"),
    )
    ranked, n_total = relational.with_global_rank(o, ["o_orderkey"])
    lo_r, hi_r = n_total // 3 + 1, n_total // 3 + 200
    slice_df = ranked.where(
        (F.col("grank") >= lo_r) & (F.col("grank") <= hi_r)
    )
    b = slice_df.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).first()
    lo_k, hi_k = int(b.lo), int(b.hi)
    staging = slice_df.where(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("cents") + 333
        ).otherwise(F.col("cents")).alias("cents"),
        "ostatus",
    )
    in_slice = f"t.o_orderkey >= {lo_k} AND t.o_orderkey <= {hi_k}"
    return merge.merge_arms(
        o,
        staging,
        "o_orderkey",
        matched=[(None, "update", None)],
        not_matched_by_source=[
            (f"{in_slice} AND t.ostatus = 'O'", "delete"),
            (in_slice, "update", {"ostatus": "'Z'"}),
        ],
    )


_ORACLE_MERGE_ARMS_SYNC = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderstatus AS ostatus,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
), sl AS (
  SELECT * FROM o WHERE rn > n // 3 AND rn <= n // 3 + 200
), staging AS (
  SELECT k,
         CASE WHEN k % 3 = 0 THEN cents + 333 ELSE cents END AS cents,
         ostatus
  FROM sl WHERE k % 7 != 0
), bounds AS (
  SELECT min(k) AS lo, max(k) AS hi FROM sl
)
SELECT t.k AS o_orderkey,
       coalesce(s.cents, t.cents) AS cents,
       CASE WHEN s.k IS NOT NULL THEN s.ostatus
            WHEN t.k >= b.lo AND t.k <= b.hi THEN 'Z'
            ELSE t.ostatus END AS ostatus
FROM o t
LEFT JOIN staging s ON s.k = t.k
CROSS JOIN bounds b
WHERE NOT (s.k IS NULL AND t.k >= b.lo AND t.k <= b.hi
           AND t.ostatus = 'O')
"""


def q_table_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1e x audit surface (r13), ORACLE-CHECKED: DESCRIBE HISTORY —
    the commit ledger as a queryable frame. A known five-commit
    sequence (bootstrap, merge-on-read upsert, pure-DV delete,
    copy-on-write update in a DISJOINT bucket region, RESTORE of v1)
    is read back ENTIRELY from the commit log: per version, the
    operation tag (WRITE/MERGE/DELETE/RESTORE — Delta's provenance
    column, deterministic per committer), the live directory count,
    the physical file population, DV presence, and
    the commit-meta string; no data file is opened
    (operators/merge.py table_history — one scan over all manifests
    via the version partition column). Every cell is replayable from
    the commit sequence arithmetic: the DV upsert adds its staged rows
    and fresh-bucket directories; the delete and the disjoint-region
    COW rewrite change NEITHER count (DV writes no files; a rewrite of
    untouched-by-DV buckets preserves its rows 1:1 and swaps one
    generation directory per bucket); the restore returns to v1's
    exact pointer set — which is the claim RESTORE makes, here
    value-checked through the ledger."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("history_")
    merge.versioned_layout_write(o, "o_orderkey", path, n_buckets=16)
    ranked, n_total = relational.with_global_rank(o, ["o_orderkey"])
    mid, quarter, threeq = n_total // 2, n_total // 4, 3 * n_total // 4
    upd = ranked.where(
        (F.col("grank") >= mid + 1) & (F.col("grank") <= mid + 40)
    ).select("o_orderkey", (F.col("cents") + 10).alias("cents"))
    merge.upsert_versioned_dv(
        spark, path, upd, "o_orderkey", commit_meta="dv-upsert"
    )  # v1
    dels = ranked.where(
        (F.col("grank") >= quarter + 1) & (F.col("grank") <= quarter + 20)
    ).select("o_orderkey")
    merge.delete_versioned(
        spark, path, dels, "o_orderkey", commit_meta="delete"
    )  # v2
    cow = ranked.where(
        (F.col("grank") >= threeq + 1) & (F.col("grank") <= threeq + 40)
    ).select("o_orderkey", (F.col("cents") + 5).alias("cents"))
    merge.upsert_versioned(
        spark, path, cow, "o_orderkey", commit_meta="cow-update"
    )  # v3
    merge.restore_version(spark, path, 1, commit_meta="restore")  # v4
    return merge.table_history(spark, path)


_ORACLE_TABLE_HISTORY = """
WITH o AS (
  SELECT o_orderkey AS k,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
), base AS (
  SELECT k, (rn - 1) * 16 // n AS b FROM o
), cut AS (
  SELECT b, min(k) AS min_k FROM base GROUP BY b
), s1 AS (
  SELECT k FROM o WHERE rn > n // 2 AND rn <= n // 2 + 40
), nf1 AS (
  SELECT count(DISTINCT coalesce(
           (SELECT max(c.b) FROM cut c WHERE c.min_k <= s.k), 0)) AS nb
  FROM s1 s
), tot AS (
  SELECT count(*) AS n FROM o
)
SELECT CAST(v.version AS INTEGER) AS version,
       CASE v.version WHEN 0 THEN 'WRITE' WHEN 1 THEN 'MERGE'
                      WHEN 2 THEN 'DELETE' WHEN 3 THEN 'MERGE'
                      WHEN 4 THEN 'RESTORE'
       END AS operation,
       CAST(CASE WHEN v.version = 0 THEN 16 ELSE 16 + nf1.nb END
            AS BIGINT) AS n_dirs,
       CAST(CASE WHEN v.version = 0 THEN tot.n ELSE tot.n + 40 END
            AS BIGINT) AS physical_rows,
       v.version > 0 AS has_dv,
       CASE v.version WHEN 1 THEN 'dv-upsert' WHEN 2 THEN 'delete'
                      WHEN 3 THEN 'cow-update' WHEN 4 THEN 'restore'
       END AS meta
FROM (SELECT unnest(ARRAY[0, 1, 2, 3, 4]) AS version) v
CROSS JOIN nf1 CROSS JOIN tot
ORDER BY version
"""


def q_streaming_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X95b streaming CDF SOURCE over the versioned table (r13),
    ORACLE-CHECKED: ``spark.readStream.format("versioned_cdf")`` —
    the read half of the lakehouse streaming story whose write half is
    q_streaming_versioned's epoch-ledgered sink. The commit log IS the
    change log: changed keys at version v are the DV entries with
    ``live_gen == v`` (fresh copy present -> upsert row, absent ->
    delete row), so merge-on-read commits stream out exactly their
    logical changes while structural commits are silent by
    construction — the final compact_table here emits NOTHING even
    though it rewrites every bucket, which is the property that makes
    the feed consumable (a downstream replica applying it converges to
    read_version without ever seeing layout churn). Offsets are
    manifest versions; replay reads immutable history
    (sources/pysource.py VersionedCdfDataSource; checkpoint-restart
    dedup pinned in test_merge). The oracle replays the upsert and
    delete batches with their version tags."""
    from data_pipeline_bigquery_to_sftp_server_spark.sources.pysource import (
        register_versioned_cdf,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("cdfsrc_")
    out = _scratch_dir("cdfsrc_out_")
    ckpt = _scratch_dir("cdfsrc_ckpt_")
    merge.versioned_layout_write(o, "o_orderkey", path, n_buckets=16)
    ranked, n_total = relational.with_global_rank(o, ["o_orderkey"])
    mid, quarter = n_total // 2, n_total // 4
    upd = (
        ranked.where((F.col("grank") >= mid + 1) & (F.col("grank") <= mid + 40))
        .select("o_orderkey", (F.col("cents") + 999).alias("cents"))
        .unionByName(
            spark.range(5).select(
                (F.col("id") + 60_000_000).alias("o_orderkey"),
                (F.col("id") * 13).alias("cents"),
            )
        )
    )
    merge.upsert_versioned_dv(spark, path, upd, "o_orderkey")  # v1
    dels = ranked.where(
        (F.col("grank") >= quarter + 1) & (F.col("grank") <= quarter + 20)
    ).select("o_orderkey")
    merge.delete_versioned(spark, path, dels, "o_orderkey")  # v2
    merge.compact_table(spark, path, "o_orderkey")  # v3: silent
    register_versioned_cdf(spark)
    q = (
        spark.readStream.format("versioned_cdf")
        .option("path", path)
        .option("key", "o_orderkey")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.read.parquet(out).orderBy("_version", "o_orderkey")


_ORACLE_STREAMING_CDF = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
)
SELECT k AS o_orderkey, cents + 999 AS cents,
       'upsert' AS _op, CAST(1 AS BIGINT) AS _version
FROM o WHERE rn > n // 2 AND rn <= n // 2 + 40
UNION ALL
SELECT 60000000 + i, i * 13, 'upsert', 1 FROM generate_series(0, 4) t(i)
UNION ALL
SELECT k, NULL, 'delete', 2
FROM o WHERE rn > n // 4 AND rn <= n // 4 + 20
ORDER BY _version, o_orderkey
"""


def q_table_changes_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X95f BATCH change-data-feed read (r15 — Delta's
    ``table_changes()`` TVF, the batch twin of X95b's streaming
    source), ORACLE-CHECKED through the SQL spelling ``SELECT * FROM
    TABLE_CHANGES(t, 0)``: the same change rule as the stream (DV
    entries with live_gen == v; fresh copy -> upsert, absent ->
    delete), derived DataFrame-natively per version — one
    column-pruned DV read, a scan of only that version's _gen
    directories, a semi/anti join pair — so the batch feed costs
    O(changes in range), never O(table). The scene commits an upsert
    batch (updates + inserts), a pure delete, and a full compaction
    whose rewrite of every bucket must emit NOTHING (structural
    commits are silent). Byte-equality with the streamed feed, range
    endpoints (consumed-through offsets), and empty-range schema are
    pinned in test_merge (operators/merge.py table_changes;
    operators/sqlfront.py)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators.sqlfront import (
        lakehouse_sql,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("tcb_")
    merge.versioned_layout_write(o, "o_orderkey", path, n_buckets=16)
    ranked, n_total = relational.with_global_rank(o, ["o_orderkey"])
    mid, quarter = n_total // 2, n_total // 4
    upd = (
        ranked.where((F.col("grank") >= mid + 1) & (F.col("grank") <= mid + 40))
        .select("o_orderkey", (F.col("cents") + 999).alias("cents"))
        .unionByName(
            spark.range(5).select(
                (F.col("id") + 60_000_000).alias("o_orderkey"),
                (F.col("id") * 13).alias("cents"),
            )
        )
    )
    merge.upsert_versioned_dv(spark, path, upd, "o_orderkey")  # v1
    dels = ranked.where(
        (F.col("grank") >= quarter + 1) & (F.col("grank") <= quarter + 20)
    ).select("o_orderkey")
    merge.delete_versioned(spark, path, dels, "o_orderkey")  # v2
    merge.compact_table(spark, path, "o_orderkey")  # v3: silent
    return lakehouse_sql(
        spark, "SELECT * FROM TABLE_CHANGES(t, 0)", tables={"t": path}
    ).orderBy("_version", "o_orderkey")


_ORACLE_TABLE_CHANGES_BATCH = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
)
SELECT k AS o_orderkey, cents + 999 AS cents,
       'upsert' AS _op, CAST(1 AS BIGINT) AS _version
FROM o WHERE rn > n // 2 AND rn <= n // 2 + 40
UNION ALL
SELECT 60000000 + i, i * 13, 'upsert', 1 FROM generate_series(0, 4) t(i)
UNION ALL
SELECT k, NULL, 'delete', 2
FROM o WHERE rn > n // 4 AND rn <= n // 4 + 20
ORDER BY _version, o_orderkey
"""


def q_table_replication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X95c end-to-end table replication (r13), ORACLE-CHECKED: the
    composite the CDF source exists for — a REPLICA versioned table
    follows the source through the streamed change feed alone.
    Bootstrap = time-travel read of source v0; then
    ``readStream.format("versioned_cdf")`` -> foreachBatch applies
    each source version's changes IN VERSION ORDER through the same
    MOR committers the source used, with ``commit_meta='cdf:<src
    version>'`` making redelivery idempotent (the replica's manifest
    is its own ledger — the X95 sink discipline pointed at a
    replicated feed). Source-side churn includes upserts, inserts, a
    pure delete, a conditional-arm commit, AND a full compaction that
    must replicate as NOTHING (structural commits are silent in the
    feed — the replica never sees layout churn). The report compares
    source and replica live tables per bucket (full-outer on bucket,
    both sides' counts and sums) so the oracle value-checks
    CONVERGENCE, not just the feed: any divergent row breaks a bucket
    sum. At scale this is cross-region lakehouse replication priced at
    O(logical changes), the thing the reference's re-run-the-sync
    architecture (main.py:391-471) fundamentally cannot do."""
    from data_pipeline_bigquery_to_sftp_server_spark.sources.pysource import (
        register_versioned_cdf,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    src = _scratch_dir("repl_src_")
    dst = _scratch_dir("repl_dst_")
    ckpt = _scratch_dir("repl_ckpt_")
    merge.versioned_layout_write(o, "o_orderkey", src, n_buckets=8)
    ranked, n_total = relational.with_global_rank(o, ["o_orderkey"])
    mid, quarter = n_total // 2, n_total // 4
    upd = (
        ranked.where((F.col("grank") >= mid + 1) & (F.col("grank") <= mid + 40))
        .select("o_orderkey", (F.col("cents") + 999).alias("cents"))
        .unionByName(
            spark.range(5).select(
                (F.col("id") + 70_000_000).alias("o_orderkey"),
                (F.col("id") * 17).alias("cents"),
            )
        )
    )
    merge.upsert_versioned_dv(spark, src, upd, "o_orderkey")  # v1
    dels = ranked.where(
        (F.col("grank") >= quarter + 1) & (F.col("grank") <= quarter + 20)
    ).select("o_orderkey")
    merge.delete_versioned(spark, src, dels, "o_orderkey")  # v2
    arms_staging = ranked.where(
        (F.col("grank") >= mid + 41) & (F.col("grank") <= mid + 80)
    ).select("o_orderkey", "cents")
    merge.merge_arms_versioned_dv(
        spark, src, arms_staging, "o_orderkey",
        matched=[
            ("t.cents % 2 = 0", "delete"),
            (None, "update", None),
        ],
    )  # v3: even-cents rows in the band die, odd ones re-commit
    merge.compact_table(spark, src, "o_orderkey")  # v4: silent in feed
    # replica bootstrap from the source's INITIAL snapshot only
    merge.versioned_layout_write(
        merge.read_version(spark, src, 0).select("o_orderkey", "cents"),
        "o_orderkey", dst, n_buckets=8,
    )
    register_versioned_cdf(spark)

    def apply_changes(batch: DataFrame, epoch_id: int) -> None:
        # DataFrame-NATIVE apply (r14 — the r13 verdict's second
        # driver-bound path): the change rows never land on the
        # driver. Pin the micro-batch once (several actions below read
        # it), collect ONLY the distinct version/op pairs — bounded by
        # the number of commits in the batch, never by row count — and
        # hand per-version DataFrame slices straight to the same MOR
        # committers the source used.
        pinned = batch.localCheckpoint(eager=True)
        vops = {
            (r._version, r._op)
            for r in pinned.select("_version", "_op").distinct().collect()
        }
        # one ledger read per delivered batch: replay protection is
        # against REDELIVERY (restart), not between a batch's versions
        meta_done = merge.committed_metas(spark, dst)
        for v in sorted({v for v, _ in vops}):
            if (v, "upsert") in vops and f"cdf-u:{v}" not in meta_done:
                merge.upsert_versioned_dv(
                    spark, dst,
                    pinned.where(
                        (F.col("_version") == v) & (F.col("_op") == "upsert")
                    ).select("o_orderkey", "cents"),
                    "o_orderkey", commit_meta=f"cdf-u:{v}",
                )
            if (v, "delete") in vops and f"cdf-d:{v}" not in meta_done:
                merge.delete_versioned(
                    spark, dst,
                    pinned.where(
                        (F.col("_version") == v) & (F.col("_op") == "delete")
                    ).select("o_orderkey"),
                    "o_orderkey", commit_meta=f"cdf-d:{v}",
                )
        pinned.unpersist()

    q = (
        spark.readStream.format("versioned_cdf")
        .option("path", src)
        .option("key", "o_orderkey")
        .load()
        .writeStream.foreachBatch(apply_changes)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    s_live = merge.read_version(spark, src).groupBy(
        F.col("_kr").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_src"),
        F.sum("cents").alias("sum_src"),
    )
    d_live = merge.read_version(spark, dst).groupBy(
        F.col("_kr").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_replica"),
        F.sum("cents").alias("sum_replica"),
    )
    return (
        s_live.join(d_live, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("n_src", F.lit(0)).alias("n_src"),
            F.coalesce("sum_src", F.lit(0)).alias("sum_src"),
            F.coalesce("n_replica", F.lit(0)).alias("n_replica"),
            F.coalesce("sum_replica", F.lit(0)).alias("sum_replica"),
        )
        .orderBy("bucket")
    )


_ORACLE_TABLE_REPLICATION = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
), base AS (
  SELECT k, cents, (rn - 1) * 8 // n AS b FROM o
), cut AS (
  SELECT b, min(k) AS min_k FROM base GROUP BY b
), upd AS (
  SELECT k, cents + 999 AS cents FROM o
  WHERE rn > n // 2 AND rn <= n // 2 + 40
  UNION ALL
  SELECT 70000000 + i, i * 17 FROM generate_series(0, 4) t(i)
), dels AS (
  SELECT k FROM o WHERE rn > n // 4 AND rn <= n // 4 + 20
), v2 AS (
  SELECT k, cents FROM base
  WHERE k NOT IN (SELECT k FROM upd) AND k NOT IN (SELECT k FROM dels)
  UNION ALL SELECT k, cents FROM upd
), band AS (
  SELECT k FROM o WHERE rn > n // 2 + 40 AND rn <= n // 2 + 80
), live AS (
  SELECT k, cents FROM v2
  WHERE k NOT IN (SELECT k FROM band WHERE EXISTS (
          SELECT 1 FROM v2 i WHERE i.k = band.k AND i.cents % 2 = 0))
), final AS (
  SELECT l.k, l.cents,
         coalesce((SELECT max(c.b) FROM cut c WHERE c.min_k <= l.k), 0) AS b
  FROM live l
)
SELECT b AS bucket,
       count(*) AS n_src,
       CAST(sum(cents) AS BIGINT) AS sum_src,
       count(*) AS n_replica,
       CAST(sum(cents) AS BIGINT) AS sum_replica
FROM final
GROUP BY b
ORDER BY bucket
"""


def q_rebucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1o partition evolution (r13), ORACLE-CHECKED: the table
    bootstraps at 4 key-range buckets, takes a merge-on-read upsert
    (with inserts) and a pure-DV delete, then rebucket_table
    re-commits the LIVE table under 16 buckets as version 3 — the
    Iceberg partition-evolution move, priced as one global re-sort and
    folding DV debt to zero on the way (operators/merge.py
    rebucket_table). Old versions keep reading under their own layout
    (bucket assignment derives per-version from that version's
    manifest — nothing about addressing is table-global), pinned in
    test_merge along with post-evolution merges landing under the new
    cutpoints. The report is the per-NEW-bucket live census plus the
    version count; the oracle replays the new layout from first
    principles — rank the live rows, assign (rank-1)*16//n — so the
    evolution's content-preservation AND its new bucket geometry are
    both value-checked."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("rebucket_")
    merge.versioned_layout_write(o, "o_orderkey", path, n_buckets=4)
    ranked, n_total = relational.with_global_rank(o, ["o_orderkey"])
    mid, quarter = n_total // 2, n_total // 4
    upd = (
        ranked.where((F.col("grank") >= mid + 1) & (F.col("grank") <= mid + 40))
        .select("o_orderkey", (F.col("cents") + 999).alias("cents"))
        .unionByName(
            spark.range(5).select(
                (F.col("id") + 80_000_000).alias("o_orderkey"),
                (F.col("id") * 19).alias("cents"),
            )
        )
    )
    merge.upsert_versioned_dv(spark, path, upd, "o_orderkey")  # v1
    dels = ranked.where(
        (F.col("grank") >= quarter + 1) & (F.col("grank") <= quarter + 20)
    ).select("o_orderkey")
    merge.delete_versioned(spark, path, dels, "o_orderkey")  # v2
    merge.rebucket_table(spark, path, "o_orderkey", n_buckets=16)  # v3
    n_versions = len(merge._list_versions(spark, f"{path}/_manifest"))
    return (
        merge.read_version(spark, path)
        .groupBy(F.col("_kr").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_live"),
            F.sum("cents").alias("sum_cents"),
        )
        .withColumn("n_versions", F.lit(int(n_versions)))
        .orderBy("bucket")
    )


_ORACLE_REBUCKET = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
), upd AS (
  SELECT k, cents + 999 AS cents FROM o
  WHERE rn > n // 2 AND rn <= n // 2 + 40
  UNION ALL
  SELECT 80000000 + i, i * 19 FROM generate_series(0, 4) t(i)
), dels AS (
  SELECT k FROM o WHERE rn > n // 4 AND rn <= n // 4 + 20
), live AS (
  SELECT k, cents FROM o
  WHERE k NOT IN (SELECT k FROM upd) AND k NOT IN (SELECT k FROM dels)
  UNION ALL SELECT k, cents FROM upd
), relaid AS (
  SELECT k, cents,
         (row_number() OVER (ORDER BY k) - 1) * 16
           // (count(*) OVER ()) AS b
  FROM live
)
SELECT b AS bucket, count(*) AS n_live,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       4 AS n_versions
FROM relaid
GROUP BY b
ORDER BY bucket
"""


def q_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2g general-tier connected components (r10 verdict #5),
    ORACLE-CHECKED: star contraction (Kiveris large-star/small-star,
    operators/dedup.py connected_components_star) over a graph built to
    exhibit BOTH pathologies at once — a 400-node chain (diameter 400:
    min-label propagation raises at any sane budget; this is the
    serially-correlated-key shape the ER docstring names) unioned with
    ~100 shallow star clusters (custkey -> synthetic hub). The general
    tier converges in O(log n) rounds regardless (~12 here), and the
    DuckDB recursive-CTE transitive closure replays the component
    rollup exactly (the chain is fixture-bounded at 400 so the oracle's
    quadratic closure stays 80k rows — the Spark side needs no such
    bound).

    Scale: each contraction round is two node-keyed min-aggregates +
    equi-joins over the edge multiset — no step depends on diameter,
    the structural property that makes CC safe on arbitrary graphs at
    100 TB."""
    o = load_table(spark, sf_dir, "orders")
    # chain staging: the 400 smallest orderkeys linked in rank order —
    # the single-partition lead() window is FIXTURE STAGING over 400
    # rows, bounded by construction
    keys = o.select("o_orderkey").orderBy("o_orderkey").limit(400)
    w = Window.orderBy("o_orderkey")
    # offset into an id space disjoint from custkeys/hubs so the chain
    # stays its own (diameter-400) component instead of bridging stars
    chain_edges = (
        keys.select(
            (F.col("o_orderkey") + 10_000_000).alias("id_a"),
            (F.lead("o_orderkey").over(w) + 10_000_000).alias("id_b"),
        )
        .where(F.col("id_b").isNotNull())
    )
    c = load_table(spark, sf_dir, "customer")
    star_edges = c.select(
        F.col("c_custkey").alias("id_a"),
        (F.lit(2_000_000) + F.col("c_custkey") % 97).alias("id_b"),
    )
    edges = chain_edges.unionByName(star_edges)
    labels = dedup.connected_components(edges, general=True)
    return (
        labels.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.max("node").alias("max_node"),
        )
        .orderBy("component")
    )


_ORACLE_CC_STAR = """
WITH RECURSIVE ch AS (
  SELECT k, row_number() OVER (ORDER BY k) AS rn
  FROM (SELECT o_orderkey AS k FROM orders ORDER BY o_orderkey LIMIT 400)
), chain AS (
  SELECT a.k + 10000000 AS id_a, b.k + 10000000 AS id_b
  FROM ch a JOIN ch b ON b.rn = a.rn + 1
), stars AS (
  SELECT c_custkey AS id_a, 2000000 + c_custkey % 97 AS id_b FROM customer
), e0 AS (
  SELECT id_a, id_b FROM chain UNION SELECT id_a, id_b FROM stars
), edges AS (
  SELECT id_a AS a, id_b AS b FROM e0 UNION SELECT id_b, id_a FROM e0
), reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
), labels AS (
  SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a
)
SELECT component, count(*) AS n_nodes, CAST(max(node) AS BIGINT) AS max_node
FROM labels GROUP BY component ORDER BY component
"""


def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 Python Data Source plugin, ORACLE-CHECKED
    (sources/pysource.py): the reference's paginated API scan as a
    REGISTERED Spark source — ``spark.read.format("rest_pages")`` with
    one input partition per page, so page fetches parallelize across
    executors and the planner sees a real scan node (the Spark 4
    ``pyspark.sql.datasource`` API; the idiomatic endpoint of the
    S2/S3 rest.py evolution). The hermetic record generator is a pure
    function of (row id, salt), so the DuckDB oracle regenerates the
    pages with generate_series."""
    from data_pipeline_bigquery_to_sftp_server_spark.sources.pysource import (
        RestPagesDataSource,
    )

    spark.dataSource.register(RestPagesDataSource)
    df = (
        spark.read.format("rest_pages")
        .option("n_rows", 5000)
        .option("page_size", 250)
        .option("seed_salt", 3)
        .load()
    )
    return (
        df.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("priority").alias("sum_priority"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
        .orderBy("status")
    )


_ORACLE_PYTHON_DATASOURCE = """
WITH r AS (
  SELECT i AS id,
         CASE (i + 3) % 3 WHEN 0 THEN 'open' WHEN 1 THEN 'pending'
              ELSE 'closed' END AS status,
         (i * 7 + 3) % 5 + 1 AS priority
  FROM generate_series(0, 4999) t(i)
)
SELECT status, count(*) AS n,
       CAST(sum(priority) AS BIGINT) AS sum_priority,
       CAST(min(id) AS BIGINT) AS min_id,
       CAST(max(id) AS BIGINT) AS max_id
FROM r GROUP BY status ORDER BY status
"""


def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6+X1 composition, ORACLE-CHECKED: exact multimodal dedup —
    identical binary payloads (re-crawled images, re-encoded copies)
    found by grouping on the payload digest computed INSIDE the
    Arrow-batched decode stage, keeping the minimum media id per
    group. The dedup family applied through the binary-column path:
    one mapInPandas pass + one digest-keyed count — the digest (32
    bytes) shuffles, the payload never does. The fixture's texts are
    all unique, so every 5th payload is re-ingested under a new id
    (the re-crawl simulation, same injected-duplicate discipline as
    the ER query) — the dedup must find exactly those."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import multimodal

    d = load_table(spark, sf_dir, "documents")

    def mediaify(df, id_offset):
        return df.select(
            (F.col("doc_id") + id_offset).alias("media_id"),
            F.lit("doc").alias("kind"),
            F.encode(F.col("text"), "UTF-8").alias("payload"),
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        )

    media = mediaify(d, 0).unionByName(
        mediaify(d.where(F.col("doc_id") % 5 == 0), 1_000_000)
    )
    feats = multimodal.extract_features(media, dim=8, algo="sha256")
    return (
        feats.groupBy("digest")
        .agg(
            F.min("media_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .where(F.col("n_copies") > 1)
        .orderBy("keep_id")
    )


_ORACLE_MEDIA_DEDUP = """
WITH f AS (
  SELECT doc_id AS media_id, sha256(text) AS digest FROM documents
  UNION ALL
  SELECT doc_id + 1000000, sha256(text) FROM documents WHERE doc_id % 5 = 0
)
SELECT digest, CAST(min(media_id) AS BIGINT) AS keep_id,
       count(*) AS n_copies
FROM f GROUP BY digest HAVING count(*) > 1
ORDER BY keep_id
"""


def q_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X85 spatial distance join, ORACLE-CHECKED
    (operators/spatial.py): all point pairs within Euclidean distance
    50 over a deterministic planar scatter of the documents (modular
    affine coordinates) — the fixed-radius near-neighbor join, grid-
    bucketed so candidates co-locate by cell instead of the O(n²)
    cross join the DuckDB oracle runs. Exact integer squared-distance
    predicate: no sqrt, no libm, every pair and distance replayed
    bit-for-bit."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import spatial

    d = load_table(spark, sf_dir, "documents")

    def coord(salt):
        # the sketch family's engine-portable uniform: md5-prefix int
        # (an affine lattice has NO close pairs — a scatter needs a hash)
        h = F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(salt))), 1, 8
        )
        return F.conv(h, 16, 10).cast("long") % 10000

    pts = d.select(
        F.col("doc_id").alias("id"),
        coord(":px").alias("x"),
        coord(":py").alias("y"),
    )
    return spatial.grid_distance_join(pts, max_dist=50).orderBy(
        "id_a", "id_b"
    )


_ORACLE_SPATIAL_JOIN = """
WITH p AS (
  SELECT doc_id AS id,
         ('0x' || substr(md5(doc_id || ':px'), 1, 8))::BIGINT % 10000 AS x,
         ('0x' || substr(md5(doc_id || ':py'), 1, 8))::BIGINT % 10000 AS y
  FROM documents
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST((a.x - b.x) * (a.x - b.x)
            + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist2
FROM p a JOIN p b ON a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 2500
ORDER BY id_a, id_b
"""


def q_table_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X86 checksum table reconciliation, ORACLE-CHECKED
    (operators/reconcile.py): replica B of the orders table drifted —
    every 101st order repriced, every 103rd lost, every 107th key
    present only in B — and the reconciler finds exactly those rows by
    exchanging 64 bucket checksums then drilling ONLY the differing
    buckets (the Merkle anti-entropy pattern; near-identical 100 TB
    replicas reconcile by touching almost nothing twice). Money rides
    integer cents inside the row hash; the oracle replays the same
    summary-then-drill plan, so both engines agree by construction."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import reconcile

    a, b = _reconcile_replicas(spark, sf_dir)
    out = reconcile.reconcile_tables(
        a, b, "o_orderkey", ["o_orderpriority", "cents"], n_buckets=64
    )
    return out.orderBy("o_orderkey")


def _reconcile_replicas(spark: SparkSession, sf_dir: str):
    """Replica A (orders as key/priority/cents) and the
    deterministically drifted replica B shared by the batch and
    streaming reconciliation queries (and re-derived by their
    oracle)."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    a = o.select("o_orderkey", "o_orderpriority", cents.alias("cents"))
    b = (
        a.where(F.col("o_orderkey") % 103 != 0)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.when(
                F.col("o_orderkey") % 101 == 0, F.col("cents") + 10000
            )
            .otherwise(F.col("cents"))
            .alias("cents"),
        )
        .unionByName(
            a.where(F.col("o_orderkey") % 107 == 0).select(
                (F.col("o_orderkey") + 20_000_000).alias("o_orderkey"),
                "o_orderpriority",
                "cents",
            )
        )
    )
    return a, b


def q_streaming_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 + X86 composition, ORACLE-CHECKED: replica A's
    reconciliation summary maintained ON INGEST — the held 64-row
    bucket state is built from 90% of A, the rest arrives as 4 parquet
    files absorbed per micro-batch (epoch-gated: the summary is
    ADDITIVE, so an at-least-once re-delivery must not replay), and
    reconciling against drifted replica B then starts from the HELD
    state: suspects come from the streamed summary, the drill scans
    only those buckets. Additivity over disjoint rows makes the
    streamed summary equal the one-shot scan, so the batch twin's
    oracle replays the row-level diff cell-for-cell."""
    from data_pipeline_bigquery_to_sftp_server_spark.cache import CheckpointChain
    from data_pipeline_bigquery_to_sftp_server_spark.operators import reconcile as R
    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    a, b = _reconcile_replicas(spark, sf_dir)
    key, cols = "o_orderkey", ["o_orderpriority", "cents"]
    held = a.where(F.col(key) % 10 != 0)
    arriving = a.where(F.col(key) % 10 == 0)
    src = _scratch_dir("reconcile_stream_src_")
    ckpt = _scratch_dir("reconcile_stream_ckpt_")
    arriving.repartition(4, key).write.mode("overwrite").parquet(src)

    chain = CheckpointChain()
    state = {
        "sum": chain.step(
            R.bucket_summary(R.row_signature(held, key, cols, 64))
        ),
        "epochs": set(),
    }

    def absorb_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id in state["epochs"]:
            return
        state["epochs"].add(epoch_id)
        d = R.bucket_summary(R.row_signature(batch_df, key, cols, 64))
        state["sum"] = chain.step(R.absorb_summary(state["sum"], d))

    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = W.streaming_upsert(stream, absorb_batch, ckpt)
    q.processAllAvailable()
    q.stop()

    sa = R.row_signature(a, key, cols, 64)
    sb = R.row_signature(b, key, cols, 64)
    suspects = R.summary_diff(state["sum"], R.bucket_summary(sb))
    return R.drill(sa, sb, suspects, key).orderBy(key)


_ORACLE_TABLE_RECONCILE = """
WITH a AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), b AS (
  SELECT o_orderkey, o_orderpriority,
         CASE WHEN o_orderkey % 101 = 0 THEN cents + 10000
              ELSE cents END AS cents
  FROM a WHERE o_orderkey % 103 != 0
  UNION ALL
  SELECT o_orderkey + 20000000, o_orderpriority, cents
  FROM a WHERE o_orderkey % 107 = 0
), sa AS (
  -- mirror row_signature's injective NULL-safe field encoding:
  -- '#'||len||':'||value per field (NULL would encode as '#N')
  SELECT o_orderkey AS rk,
         ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT
           % 64 AS bucket,
         ('0x' || substr(md5(
            '#' || length(CAST(o_orderkey AS VARCHAR)) || ':' || o_orderkey
            || '#' || length(o_orderpriority) || ':' || o_orderpriority
            || '#' || length(CAST(cents AS VARCHAR)) || ':' || cents
         ), 1, 12))::BIGINT AS rhash
  FROM a
), sb AS (
  SELECT o_orderkey AS rk,
         ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT
           % 64 AS bucket,
         ('0x' || substr(md5(
            '#' || length(CAST(o_orderkey AS VARCHAR)) || ':' || o_orderkey
            || '#' || length(o_orderpriority) || ':' || o_orderpriority
            || '#' || length(CAST(cents AS VARCHAR)) || ':' || cents
         ), 1, 12))::BIGINT AS rhash
  FROM b
), ga AS (
  SELECT bucket, CAST(sum(rhash) AS BIGINT) AS ha, count(*) AS na
  FROM sa GROUP BY bucket
), gb AS (
  SELECT bucket, CAST(sum(rhash) AS BIGINT) AS hb, count(*) AS nb
  FROM sb GROUP BY bucket
), suspects AS (
  SELECT coalesce(ga.bucket, gb.bucket) AS bucket
  FROM ga FULL OUTER JOIN gb ON ga.bucket = gb.bucket
  WHERE NOT (ha IS NOT DISTINCT FROM hb AND na IS NOT DISTINCT FROM nb)
), da AS (
  SELECT sa.* FROM sa JOIN suspects USING (bucket)
), db AS (
  SELECT sb.* FROM sb JOIN suspects USING (bucket)
)
SELECT coalesce(da.bucket, db.bucket) AS bucket,
       coalesce(da.rk, db.rk) AS o_orderkey,
       CASE WHEN db.rk IS NULL THEN 'missing_b'
            WHEN da.rk IS NULL THEN 'missing_a'
            WHEN da.rhash != db.rhash THEN 'changed' END AS status
FROM da FULL OUTER JOIN db ON da.rk = db.rk
WHERE (CASE WHEN db.rk IS NULL THEN 'missing_b'
            WHEN da.rk IS NULL THEN 'missing_a'
            WHEN da.rhash != db.rhash THEN 'changed' END) IS NOT NULL
ORDER BY o_orderkey
"""


_BENFORD = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X87 Benford first-digit audit, ORACLE-CHECKED: the fraud/
    fabrication screen auditors run over money columns — observed
    first-digit shares of the order amounts against Benford's
    log10(1+1/d) expectation. The first digit comes from the CENTS
    STRING (never log10 of a double — libm diverges across engines);
    shares are one division of exact longs; the expected values are
    shortest-round-trip double literals embedded identically in both
    engines, so observed, expected, and deviation all hash-match.
    One grouped count over a scan; the share window runs on the
    9-row digit frame."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    digits = (
        o.where(F.col("o_totalprice") > 0)
        .select(
            F.substring(cents.cast("string"), 1, 1).cast("long").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy())
    expected = F.lit(None).cast("double")
    for dig, exp_p in _BENFORD.items():
        expected = F.when(F.col("digit") == dig, F.lit(exp_p)).otherwise(
            expected
        )
    return (
        digits.select(
            "digit",
            "n",
            (F.col("n") / total).alias("observed"),
            expected.alias("expected"),
            ((F.col("n") / total) - expected).alias("deviation"),
        )
        .orderBy("digit")
    )


_ORACLE_BENFORD_AUDIT = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         count(*) AS n
  FROM orders WHERE o_totalprice > 0 GROUP BY 1
), e(digit, expected) AS (
  VALUES (1, 0.3010299956639812), (2, 0.17609125905568124),
         (3, 0.12493873660829992), (4, 0.09691001300805642),
         (5, 0.07918124604762482), (6, 0.06694678963061322),
         (7, 0.05799194697768673), (8, 0.05115252244738129),
         (9, 0.04575749056067514)
)
SELECT d.digit, CAST(d.n AS BIGINT) AS n,
       d.n / sum(d.n) OVER () AS observed,
       e.expected,
       (d.n / sum(d.n) OVER ()) - e.expected AS deviation
FROM d JOIN e ON d.digit = e.digit
ORDER BY d.digit
"""


def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X88 association-rule mining (support/confidence/lift),
    ORACLE-CHECKED: which event types co-occur within a user's
    history — the market-basket statistic over (user, type) presence
    sets. One distinct-pair self-join keyed on the user (baskets are
    type-set sized, never event-count sized), counts broadcast back;
    support/confidence/lift are single fixed IEEE expressions over
    exact longs, hash-matched unrounded. Both rule directions are
    emitted (confidence is asymmetric)."""
    ev = load_table(spark, sf_dir, "events")
    present = (
        ev.where(F.col("user_id").isNotNull())
        .select("user_id", "event_type")
        .distinct()
    )
    totals = present.agg(
        F.countDistinct("user_id").alias("_n_users")
    )
    per_type = present.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_t")
    )
    a = present.select(
        F.col("user_id").alias("u"), F.col("event_type").alias("ante")
    )
    b = present.select(
        F.col("user_id").alias("u"), F.col("event_type").alias("cons")
    )
    pair_counts = (
        a.join(b, "u")
        .where(F.col("ante") != F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    na = per_type.select(
        F.col("event_type").alias("ante"), F.col("n_t").alias("n_a")
    )
    nb = per_type.select(
        F.col("event_type").alias("cons"), F.col("n_t").alias("n_b")
    )
    return (
        pair_counts.join(F.broadcast(na), "ante")
        .join(F.broadcast(nb), "cons")
        .crossJoin(F.broadcast(totals))
        .select(
            "ante",
            "cons",
            "n_ab",
            "n_a",
            "n_b",
            (F.col("n_ab") / F.col("_n_users")).alias("support"),
            (F.col("n_ab") / F.col("n_a")).alias("confidence"),
            (
                (F.col("n_ab") * F.col("_n_users"))
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
        .orderBy("ante", "cons")
    )


_ORACLE_BASKET_RULES = """
WITH present AS (
  SELECT DISTINCT user_id, event_type
  FROM events WHERE user_id IS NOT NULL
), totals AS (
  SELECT count(DISTINCT user_id) AS n_users FROM present
), per_type AS (
  SELECT event_type, count(*) AS n_t FROM present GROUP BY event_type
), pairs AS (
  SELECT a.event_type AS ante, b.event_type AS cons, count(*) AS n_ab
  FROM present a JOIN present b
    ON a.user_id = b.user_id AND a.event_type != b.event_type
  GROUP BY 1, 2
)
SELECT p.ante, p.cons, CAST(p.n_ab AS BIGINT) AS n_ab,
       CAST(na.n_t AS BIGINT) AS n_a, CAST(nb.n_t AS BIGINT) AS n_b,
       p.n_ab / t.n_users AS support,
       p.n_ab / na.n_t AS confidence,
       (p.n_ab * t.n_users) / (na.n_t * nb.n_t) AS lift
FROM pairs p
JOIN per_type na ON na.event_type = p.ante
JOIN per_type nb ON nb.event_type = p.cons
CROSS JOIN totals t
ORDER BY p.ante, p.cons
"""


def q_lakehouse_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1t SQL front door for the lakehouse tier (r14, the r13 verdict
    gap #5), ORACLE-CHECKED: one scene routing the three Delta-style
    statements through operators/sqlfront.py onto the EXISTING
    committers — ``MERGE INTO`` (conditional delete + update + insert
    arms -> merge_arms_versioned_dv), ``RESTORE TABLE ... TO VERSION
    AS OF`` (-> restore_version, rollback-as-commit), and ``DESCRIBE
    HISTORY`` (-> table_history). The report reads each history row's
    version BACK through time travel and aggregates it, so the oracle
    value-checks all three statements' semantics at once: the MERGE's
    arm classification (v1), the restore's content equality with v0
    (v2), and the history ledger's version/operation rows."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators.sqlfront import (
        lakehouse_sql,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("lhsql_")
    merge.versioned_layout_write(o, "o_orderkey", path, n_buckets=8)
    ranked, n_total = relational.with_global_rank(o, ["o_orderkey"])
    mid = n_total // 2
    staging = (
        ranked.where((F.col("grank") >= mid + 1) & (F.col("grank") <= mid + 40))
        .select("o_orderkey", (F.col("cents") + 999).alias("cents"))
        .unionByName(
            spark.range(5).select(
                (F.col("id") + 80_000_000).alias("o_orderkey"),
                (F.col("id") * 21).alias("cents"),
            )
        )
    )
    staging.createOrReplaceTempView("_lhsql_cdc")
    tables = {"t": path}
    lakehouse_sql(
        spark,
        """
        MERGE INTO t USING _lhsql_cdc AS s ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND t.cents % 2 = 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """,
        tables=tables,
    )  # v1
    lakehouse_sql(
        spark, "RESTORE TABLE t TO VERSION AS OF 0", tables=tables
    )  # v2
    hist = lakehouse_sql(spark, "DESCRIBE HISTORY t", tables=tables)
    parts = []
    for r in hist.select("version", "operation").collect():  # 3 rows
        parts.append(
            merge.read_version(spark, path, int(r.version))
            .agg(
                F.count(F.lit(1)).alias("n_live"),
                F.sum("cents").alias("sum_cents"),
            )
            .select(
                F.lit(int(r.version)).cast("long").alias("version"),
                F.lit(r.operation).alias("operation"),
                "n_live",
                "sum_cents",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("version")


_ORACLE_LAKEHOUSE_SQL = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
), band AS (
  SELECT k, cents FROM o WHERE rn > n // 2 AND rn <= n // 2 + 40
), ins AS (
  SELECT 80000000 + i AS k, i * 21 AS cents FROM generate_series(0, 4) t(i)
), v1 AS (
  SELECT k, cents FROM o WHERE k NOT IN (SELECT k FROM band)
  UNION ALL
  SELECT k, cents + 999 FROM band WHERE cents % 2 != 0
  UNION ALL
  SELECT k, cents FROM ins
)
SELECT CAST(0 AS BIGINT) AS version, 'WRITE' AS operation,
       count(*) AS n_live, CAST(sum(cents) AS BIGINT) AS sum_cents FROM o
UNION ALL
SELECT 1, 'MERGE', count(*), CAST(sum(cents) AS BIGINT) FROM v1
UNION ALL
SELECT 2, 'RESTORE', count(*), CAST(sum(cents) AS BIGINT) FROM o
ORDER BY version
"""


def q_sql_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1u SQL time-travel reads (r15 — the r14 verdict's gap #3),
    ORACLE-CHECKED: Delta's ``SELECT * FROM t VERSION AS OF n`` /
    ``TIMESTAMP AS OF ts`` routed through the SQL front door
    (operators/sqlfront.py) onto read_version / read_version_as_of —
    the first read a SQL-native user tries after MERGE INTO works.
    Scene: bootstrap + two COW commits (the q_as_of_timestamp shape);
    the SAME middle version is then read THREE ways — VERSION AS OF 1,
    TIMESTAMP AS OF <epoch-millis literal>, and TIMESTAMP AS OF
    '<quoted ISO-8601>' — and each read aggregates per bucket under a
    ``form`` tag. All three forms must replay v1's exact content
    (the later v2 commit must NOT leak into any of them), so a
    resolution or parse defect in any spelling flips the hash.
    Wall-clock values are nondeterministic; the content they resolve
    to is not. Grammar/boundary errors pinned in test_sqlfront.
    Scale: each read is read_version's one-manifest plan; timestamp
    resolution is O(versions) sidecar reads."""
    from datetime import datetime, timezone

    from data_pipeline_bigquery_to_sftp_server_spark.operators.sqlfront import (
        lakehouse_sql,
    )

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("sqltt_")
    merge.versioned_layout_write(o, "k", path, n_buckets=16)
    ranked, _n = relational.with_global_rank(o, ["k"])
    v1_batch = (
        ranked.where((F.col("grank") >= 201) & (F.col("grank") <= 320))
        .select("k", (F.col("cents") + 1111).alias("cents"))
        .unionByName(
            spark.range(4).select(
                (F.col("id") + 80_000_000).alias("k"),
                (F.col("id") + 9).alias("cents"),
            )
        )
    )
    merge.upsert_versioned(spark, path, v1_batch, "k")  # v1: probe target
    v2_batch = ranked.where(
        (F.col("grank") >= 401) & (F.col("grank") <= 460)
    ).select("k", (F.col("cents") - 3333).alias("cents"))
    merge.upsert_versioned(spark, path, v2_batch, "k")  # v2: must NOT show
    ts1 = merge.commit_timestamps(spark, path)[1]
    iso1 = datetime.fromtimestamp(ts1 / 1000, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S.%f"
    )
    tables = {"t": path}
    stmts = {
        "version": "SELECT * FROM t VERSION AS OF 1",
        "ts_int": f"SELECT * FROM t TIMESTAMP AS OF {ts1}",
        "ts_iso": f"SELECT * FROM t TIMESTAMP AS OF '{iso1}'",
    }
    out = None
    for form, stmt in stmts.items():
        part = (
            lakehouse_sql(spark, stmt, tables=tables)
            .groupBy(F.col("_kr").alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_live"),
                F.sum("cents").alias("sum_cents"),
            )
            .select(F.lit(form).alias("form"), "bucket", "n_live", "sum_cents")
        )
        out = part if out is None else out.unionByName(part)
    return out.orderBy("form", "bucket")


_ORACLE_SQL_TIME_TRAVEL = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
), base AS (
  SELECT k, cents, (rn - 1) * 16 // n AS b FROM o
), cut AS (
  SELECT b, min(k) AS min_k FROM base GROUP BY b
), v1b AS (
  SELECT k, cents + 1111 AS cents FROM o WHERE rn BETWEEN 201 AND 320
  UNION ALL
  SELECT 80000000 + i, 9 + i FROM generate_series(0, 3) t(i)
), gask AS (
  SELECT s.k, s.cents,
         coalesce((SELECT max(c.b) FROM cut c WHERE c.min_k <= s.k), 0) AS b
  FROM v1b s
), v1 AS (
  SELECT k, cents, b FROM base WHERE k NOT IN (SELECT k FROM v1b)
  UNION ALL SELECT k, cents, b FROM gask
), agg AS (
  SELECT b AS bucket, count(*) AS n_live,
         CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM v1 GROUP BY b
)
SELECT f.form, a.bucket, a.n_live, a.sum_cents
FROM (VALUES ('version'), ('ts_int'), ('ts_iso')) f(form)
CROSS JOIN agg a
ORDER BY f.form, a.bucket
"""


def q_sql_update_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1w SQL DELETE FROM / UPDATE statements (r15 — Delta's
    statement pair), ORACLE-CHECKED: both route through the front door
    onto the MERGE-ON-READ committers — UPDATE evaluates its SET
    expressions over the matched rows' OLD values and commits the
    rewritten rows via upsert_versioned_dv (O(matching rows), no
    bucket rewrite); DELETE resolves the matching keys through the
    live read and commits a zero-data-file delete_versioned version.
    The DELETE's predicate reads the UPDATE's committed state (cents
    AFTER the +777), so the oracle value-checks the statement
    ordering, the arithmetic, the key resolution, and the final live
    table per bucket in one result. Grammar/guard rails pinned in
    test_sqlfront. Scale: both commits are O(matched), the read side
    is the touched buckets' live rows."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators.sqlfront import (
        lakehouse_sql,
    )

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("sqlud_")
    merge.versioned_layout_write(o, "k", path, n_buckets=8)
    tables = {"t": path}
    lakehouse_sql(
        spark, "UPDATE t SET cents = cents + 777 WHERE k % 3 = 0",
        tables=tables, key="k",
    )  # v1
    lakehouse_sql(
        spark, "DELETE FROM t WHERE cents % 5 = 0", tables=tables, key="k"
    )  # v2: sees v1's cents
    return (
        merge.read_version(spark, path)
        .groupBy(F.col("_kr").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_live"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("bucket")
    )


_ORACLE_SQL_UPDATE_DELETE = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
), upd AS (
  SELECT k,
         CASE WHEN k % 3 = 0 THEN cents + 777 ELSE cents END AS cents,
         (rn - 1) * 8 // n AS b
  FROM o
), live AS (
  SELECT * FROM upd WHERE cents % 5 != 0
)
SELECT b AS bucket, count(*) AS n_live,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM live GROUP BY b ORDER BY bucket
"""


def q_incremental_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1v incremental re-clustering OPTIMIZE (r15 — the r14 verdict's
    stretch item; Delta liquid clustering's OPTIMIZE behavior),
    ORACLE-CHECKED: a Morton-keyed versioned table (the
    q_versioned_zorder layout: z(day0, ub) as the table key, both dims
    as manifest stats columns) takes three CDC update commits against
    one day-band, leaving every touched bucket with three extra small
    generations — the layout debt liquid clustering exists to pay
    down. ``OPTIMIZE`` (through the SQL front door, jumbo threshold so
    generation COUNT, not byte size, drives packing) then rewrites
    ONLY the buckets that accumulated new generations — cold buckets'
    bootstrap directories are untouched (``gen0_dirs`` drops by
    exactly |touched|) — and re-sorts the packed files by the Morton
    key (compact_small_generations). The report runs the same pruned
    range read before and after: ``dirs_total`` falls from
    8 + 3·|touched| back to 8, ``dirs_read`` sheds the CDC
    directories, and the content columns (count + updated payload sum
    over the predicate) are IDENTICAL across the two phases — a
    compaction that changed any row flips the hash. The oracle replays
    the bit interleave, rank-math buckets, per-directory min/max
    rectangles, both phases' pruning arithmetic, and the band's final
    payload. Scale: OPTIMIZE cost is O(touched buckets' bytes), never
    O(table) — the incremental property under test."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators import layout
    from data_pipeline_bigquery_to_sftp_server_spark.operators.sqlfront import (
        lakehouse_sql,
    )

    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    maxu = ev.agg(F.max("user_id").alias("_mu"))
    d = ev.crossJoin(F.broadcast(maxu)).select(
        "event_id",
        (F.dayofmonth("ts") - 1).cast("long").alias("day0"),
        F.expr("user_id * 32 div (_mu + 1)").cast("long").alias("ub"),
        (F.col("event_id") % 1000).cast("long").alias("w"),
    )
    z = layout.zorder_key([F.col("day0"), F.col("ub")], bits=5)
    t = d.withColumn(
        "zk", (z * F.lit(2**44) + F.col("event_id")).cast("long")
    )
    path = _scratch_dir("liquid_")
    merge.versioned_layout_write(
        t, "zk", path, n_buckets=8, stats_cols=["day0", "ub"]
    )
    band = t.where((F.col("day0") >= 3) & (F.col("day0") <= 5))
    for c in (1, 2, 3):  # v1..v3: same band, payload bumped each time
        merge.upsert_versioned_dv(
            spark, path,
            band.withColumn("w", F.col("w") + F.lit(1000 * c)), "zk",
        )

    def report(phase: str) -> DataFrame:
        pruned = merge.read_version_pruned(spark, path, "day0", 2, 4)
        latest = merge._list_versions(spark, f"{path}/_manifest")[-1]
        gen0 = (
            merge._read_manifest(spark, path, latest)
            .where(F.col("gen") == 0)
            .count()
        )
        return pruned.agg(
            F.lit(phase).alias("phase"),
            F.lit(int(pruned.dirs_read)).cast("int").alias("dirs_read"),
            F.lit(int(pruned.dirs_total)).cast("int").alias("dirs_total"),
            F.lit(int(gen0)).cast("int").alias("gen0_dirs"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("w").alias("sum_w"),
        )

    before = report("1_before")
    lakehouse_sql(
        spark, "OPTIMIZE t", tables={"t": path}, key="zk",
        min_file_bytes=1 << 30,
    )
    after = report("2_after")
    return before.unionByName(after).orderBy("phase")


_ORACLE_INCREMENTAL_OPTIMIZE = """
WITH base AS (
  SELECT event_id,
         CAST(date_part('day', ts) - 1 AS BIGINT) AS day0,
         CAST(user_id * 32 // ((SELECT max(user_id) FROM events
                                WHERE ts IS NOT NULL AND user_id IS NOT NULL) + 1)
              AS BIGINT) AS ub,
         event_id % 1000 AS w
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), z AS (
  SELECT event_id, day0, ub, w,
         (((day0 >> 0) & 1) << 0) + (((ub >> 0) & 1) << 1) +
         (((day0 >> 1) & 1) << 2) + (((ub >> 1) & 1) << 3) +
         (((day0 >> 2) & 1) << 4) + (((ub >> 2) & 1) << 5) +
         (((day0 >> 3) & 1) << 6) + (((ub >> 3) & 1) << 7) +
         (((day0 >> 4) & 1) << 8) + (((ub >> 4) & 1) << 9) AS zkey
  FROM base
), n AS (
  SELECT count(*) AS n FROM base
), b AS (
  SELECT event_id, day0, ub, w,
         (row_number() OVER (ORDER BY zkey, event_id) - 1) * 8 // n.n
           AS bucket
  FROM z, n
), band AS (
  SELECT * FROM b WHERE day0 BETWEEN 3 AND 5
), t AS (
  SELECT count(DISTINCT bucket) AS nt FROM band
), g0 AS (
  SELECT bucket, min(day0) AS d0, max(day0) AS d1 FROM b GROUP BY bucket
), cdc AS (
  SELECT bucket, min(day0) AS d0, max(day0) AS d1 FROM band GROUP BY bucket
), hits AS (
  SELECT (SELECT count(*) FROM g0 WHERE d1 >= 2 AND d0 <= 4) AS g0_hit,
         (SELECT count(*) FROM cdc WHERE d1 >= 2 AND d0 <= 4) AS cdc_hit
), content AS (
  SELECT count(*) AS n_rows,
         CAST(sum(CASE WHEN day0 BETWEEN 3 AND 5 THEN w + 3000 ELSE w END)
              AS BIGINT) AS sum_w
  FROM b WHERE day0 BETWEEN 2 AND 4
)
SELECT '1_before' AS phase,
       CAST(h.g0_hit + 3 * h.cdc_hit AS INTEGER) AS dirs_read,
       CAST(8 + 3 * t.nt AS INTEGER) AS dirs_total,
       8 AS gen0_dirs, c.n_rows, c.sum_w
FROM hits h, t, content c
UNION ALL
SELECT '2_after',
       CAST(h.g0_hit AS INTEGER), 8,
       CAST(8 - t.nt AS INTEGER), c.n_rows, c.sum_w
FROM hits h, t, content c
ORDER BY phase
"""


def q_sql_table_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1x metadata-resolved SQL DML (r16 — the r15 verdict's top
    item), ORACLE-CHECKED: the bootstrap persists the table's merge
    key (and layout facts) in ``_manifest/_table.json`` exactly where
    Delta's metaData action keeps it, so ``UPDATE`` / ``DELETE FROM``
    / ``OPTIMIZE`` run with NO ``key=`` parameter — the first
    statement a SQL-native user types now works. The scene drives the
    whole lifecycle key-free: UPDATE (old-values semantics), DELETE
    reading the UPDATE's committed state, OPTIMIZE FULL (content
    must be invariant), then SHALLOW CLONE — the metadata travels
    with the fork — and a key-free DELETE on the clone. The oracle
    replays both tables' final per-bucket live state, so key
    resolution, statement ordering, arithmetic, and clone inheritance
    are all value-checked in one result
    (operators/merge.py table_meta; operators/sqlfront.py _key_for).
    Scale: metadata is one tiny JSON read per statement."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators.sqlfront import (
        lakehouse_sql,
    )

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("tmeta_src_")
    clone = _scratch_dir("tmeta_clone_")
    merge.versioned_layout_write(o, "k", path, n_buckets=8)
    tables = {"t": path}
    # every statement below resolves the key from _table.json
    lakehouse_sql(
        spark, "UPDATE t SET cents = cents + 777 WHERE k % 3 = 0",
        tables=tables,
    )  # v1
    lakehouse_sql(
        spark, "DELETE FROM t WHERE cents % 5 = 0", tables=tables
    )  # v2: sees v1's cents
    lakehouse_sql(spark, "OPTIMIZE t FULL", tables=tables)  # v3: invariant
    lakehouse_sql(
        spark, f"CREATE TABLE '{clone}' SHALLOW CLONE t", tables=tables
    )
    lakehouse_sql(spark, f"DELETE FROM '{clone}' WHERE k % 7 = 0")

    def agg(tag: str, p: str) -> DataFrame:
        return (
            merge.read_version(spark, p)
            .groupBy(F.col("_kr").alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_live"),
                F.sum("cents").alias("sum_cents"),
            )
            .select(
                F.lit(tag).alias("tbl"), "bucket", "n_live", "sum_cents"
            )
        )

    return (
        agg("1_src", path)
        .unionByName(agg("2_clone", clone))
        .orderBy("tbl", "bucket")
    )


_ORACLE_SQL_TABLE_META = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
), upd AS (
  SELECT k,
         CASE WHEN k % 3 = 0 THEN cents + 777 ELSE cents END AS cents,
         (rn - 1) * 8 // n AS b
  FROM o
), live_src AS (
  SELECT * FROM upd WHERE cents % 5 != 0
), live_clone AS (
  SELECT * FROM live_src WHERE k % 7 != 0
)
SELECT '1_src' AS tbl, b AS bucket, count(*) AS n_live,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM live_src GROUP BY b
UNION ALL
SELECT '2_clone', b, count(*), CAST(sum(cents) AS BIGINT)
FROM live_clone GROUP BY b
ORDER BY tbl, bucket
"""


def q_optimize_zorder_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1y ``OPTIMIZE ... ZORDER BY`` through the SQL front door (r16
    — Delta's spelling on the Morton machinery), ORACLE-CHECKED: a
    day-major events table bootstrapped with NO declared stats
    columns takes ``OPTIMIZE t ZORDER BY (day0, ub)``: compact_table
    rewrites every bucket sorted on the Morton interleave of the two
    dimensions AND PROMOTES them to maintained manifest statistics.
    The report runs the same pruned range read before and after — the
    before phase has no stats for day0, so pruning degrades to
    read-everything (dirs_read == dirs_total == 8); the after phase
    prunes on the freshly promoted statistics (only the buckets whose
    day range intersects), with the content columns identical across
    phases (a rewrite that changed any row flips the hash). The
    oracle replays the rank-math bucket layout, each bucket's day
    min/max rectangle, both phases' pruning arithmetic, and the
    band's payload (operators/merge.py compact_table zorder_by;
    operators/sqlfront.py). Scale: the rewrite is one bounded
    bucket-exchange + in-task sort, never a global sort."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators.sqlfront import (
        lakehouse_sql,
    )

    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    maxu = ev.agg(F.max("user_id").alias("_mu"))
    d = ev.crossJoin(F.broadcast(maxu)).select(
        "event_id",
        (F.dayofmonth("ts") - 1).cast("long").alias("day0"),
        F.expr("user_id * 32 div (_mu + 1)").cast("long").alias("ub"),
        (F.col("event_id") % 1000).cast("long").alias("w"),
    )
    # day-major key: buckets become day ranges, so the PROMOTED day0
    # statistics have pruning power the moment they exist
    t = d.withColumn(
        "dk", (F.col("day0") * F.lit(2**44) + F.col("event_id")).cast("long")
    )
    path = _scratch_dir("zsql_")
    merge.versioned_layout_write(t, "dk", path, n_buckets=8)  # NO stats

    def report(phase: str) -> DataFrame:
        pruned = merge.read_version_pruned(spark, path, "day0", 10, 16)
        return pruned.agg(
            F.lit(phase).alias("phase"),
            F.lit(int(pruned.dirs_read)).cast("int").alias("dirs_read"),
            F.lit(int(pruned.dirs_total)).cast("int").alias("dirs_total"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("w").alias("sum_w"),
        )

    before = report("1_before")
    lakehouse_sql(
        spark, "OPTIMIZE t ZORDER BY (day0, ub) BITS 5", tables={"t": path}
    )  # key-free: resolved from _table.json
    after = report("2_after")
    return before.unionByName(after).orderBy("phase")


_ORACLE_OPTIMIZE_ZORDER_SQL = """
WITH base AS (
  SELECT event_id,
         CAST(date_part('day', ts) - 1 AS BIGINT) AS day0,
         CAST(user_id * 32 // ((SELECT max(user_id) FROM events
                                WHERE ts IS NOT NULL AND user_id IS NOT NULL) + 1)
              AS BIGINT) AS ub,
         event_id % 1000 AS w
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), n AS (
  SELECT count(*) AS n FROM base
), b AS (
  SELECT day0, w,
         (row_number() OVER (ORDER BY day0 * 17592186044416 + event_id) - 1)
           * 8 // n.n AS bucket
  FROM base, n
), rect AS (
  SELECT bucket, min(day0) AS d0, max(day0) AS d1 FROM b GROUP BY bucket
), hits AS (
  SELECT count(*) AS hit FROM rect WHERE d1 >= 10 AND d0 <= 16
), content AS (
  SELECT count(*) AS n_rows, CAST(sum(w) AS BIGINT) AS sum_w
  FROM b WHERE day0 BETWEEN 10 AND 16
)
SELECT '1_before' AS phase, 8 AS dirs_read, 8 AS dirs_total,
       c.n_rows, c.sum_w
FROM content c
UNION ALL
SELECT '2_after', CAST(h.hit AS INTEGER), 8, c.n_rows, c.sum_w
FROM hits h, content c
ORDER BY phase
"""


def q_table_changes_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X95g timestamp-endpoint batch CDF (r16 — Delta's
    starting/endingTimestamp on table_changes), ORACLE-CHECKED: the
    batch feed's endpoints resolve through the STAMPED commit clock
    (the same vacuum-immune in-commit timestamps the stream and
    TIMESTAMP AS OF use). Three MOR commits land; the report reads
    the feed twice — from v2's stamp onward (versions 2 and 3) and
    bounded to exactly v2's stamp on both ends — and aggregates each
    slice per (version, op), so the clock resolution, the
    consumed-through conversion, and both change sets are
    value-checked. The oracle replays the deterministic change sets
    (operators/merge.py table_changes starting_timestamp /
    ending_timestamp + commit_timestamps). Scale: endpoint resolution
    is O(versions) sidecar reads; the feed stays O(changes in
    range)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("tcts_")
    merge.versioned_layout_write(o, "k", path, n_buckets=8)
    merge.upsert_versioned_dv(
        spark, path,
        o.where(F.col("k") % 97 == 0).select("k", (F.col("cents") + 1).alias("cents")),
        "k",
    )  # v1
    merge.delete_versioned(
        spark, path, o.where(F.col("k") % 101 == 0).select("k"), "k"
    )  # v2
    merge.upsert_versioned_dv(
        spark, path,
        o.where(F.col("k") % 103 == 0).select("k", (F.col("cents") + 2).alias("cents")),
        "k",
    )  # v3
    ts = merge.commit_timestamps(spark, path)

    def agg(tag: str, df: DataFrame) -> DataFrame:
        return (
            df.groupBy(
                F.col("_version").alias("ver"), F.col("_op").alias("op")
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("k").alias("sum_k"),
            )
            .select(F.lit(tag).alias("scope"), "ver", "op", "n", "sum_k")
        )

    from_v2 = agg(
        "1_from_v2_ts",
        merge.table_changes(spark, path, starting_timestamp=ts[2]),
    )
    only_v2 = agg(
        "2_only_v2",
        merge.table_changes(
            spark, path, starting_timestamp=ts[2], ending_timestamp=ts[2]
        ),
    )
    return from_v2.unionByName(only_v2).orderBy("scope", "ver", "op")


_ORACLE_TABLE_CHANGES_TS = """
WITH o AS (SELECT o_orderkey AS k FROM orders),
v2 AS (
  SELECT CAST(2 AS BIGINT) AS ver, 'delete' AS op, count(*) AS n,
         CAST(sum(k) AS BIGINT) AS sum_k
  FROM o WHERE k % 101 = 0
), v3 AS (
  SELECT CAST(3 AS BIGINT), 'upsert', count(*),
         CAST(sum(k) AS BIGINT)
  FROM o WHERE k % 103 = 0
)
SELECT '1_from_v2_ts' AS scope, * FROM v2
UNION ALL
SELECT '1_from_v2_ts', * FROM v3
UNION ALL
SELECT '2_only_v2', * FROM v2
ORDER BY scope, ver, op
"""


def q_concurrent_commits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1z disjoint-bucket concurrent-commit admission (r16 — Delta's
    conflict resolution for non-conflicting transactions),
    ORACLE-CHECKED under a REAL race: writer A claims version 1's
    commit intent and stalls; writer B (a second thread) stages a
    bucket-disjoint MOR batch, loses the create-exclusive race, waits
    for A's commit, proves disjointness from A's stamped
    changed_buckets, and commits at version 2 with its
    ALREADY-STAGED batch — no rebase, no staging recompute
    (admitted_over == [1] is asserted in-query; a rebase would record
    nothing). The result is the merged table's per-bucket live state
    plus each commit's stamped change-set buckets, so the oracle
    value-checks that two genuinely concurrent writers produced
    exactly the sequential application
    (operators/merge.py upsert_versioned_dv admit_disjoint /
    _wait_for_commit). Scale: admission costs one sidecar read and
    one manifest re-read per admitted winner — the staged batch
    (the expensive part at 100 TB) is written once."""
    import threading

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("ccadmit_")
    merge.versioned_layout_write(o, "k", path, n_buckets=8)
    ranked, n_total = relational.with_global_rank(o, ["k"])
    low5 = ranked.where(F.col("grank") <= 5).select(
        "k", F.lit(111).cast("long").alias("cents")
    )
    high5 = ranked.where(F.col("grank") > n_total - 5).select(
        "k", F.lit(222).cast("long").alias("cents")
    )
    # writer A claims v1 and stalls mid-commit
    merge._begin_commit(spark, path, 1, "writer-A")
    res: dict = {}

    def racer():
        try:
            res["out"] = merge.upsert_versioned_dv(
                spark, path, high5, "k",
                writer="writer-B", admit_disjoint=True,
            )
        except Exception as e:  # surfaced after join
            res["err"] = e

    t = threading.Thread(target=racer)
    t.start()
    import time

    time.sleep(1.0)  # B has staged, lost the race, and is waiting
    merge.upsert_versioned_dv(
        spark, path, low5, "k", writer="writer-A"
    )  # A completes v1 (same-writer idempotent re-entry)
    t.join(120)
    if "err" in res:
        raise res["err"]
    if res["out"].admitted_over != [1]:
        raise AssertionError(
            f"admission did not happen: {res['out'].admitted_over}"
        )
    stamps = spark.createDataFrame(
        [
            (int(v), ",".join(map(str, merge._commit_changed_buckets(spark, path, v))))
            for v in (1, 2)
        ],
        "ver int, changed_buckets string",
    ).select(
        F.lit("2_ledger").alias("section"),
        F.col("ver").cast("long").alias("bucket"),
        F.col("changed_buckets").alias("detail"),
        F.lit(None).cast("long").alias("n_live"),
        F.lit(None).cast("long").alias("sum_cents"),
    )
    live = (
        merge.read_version(spark, path)
        .groupBy(F.col("_kr").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_live"),
            F.sum("cents").alias("sum_cents"),
        )
        .select(
            F.lit("1_live").alias("section"),
            "bucket",
            F.lit(None).cast("string").alias("detail"),
            "n_live",
            "sum_cents",
        )
    )
    return live.unionByName(stamps).orderBy("section", "bucket")


_ORACLE_CONCURRENT_COMMITS = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
), seq AS (  -- sequential application of A (5 lowest) then B (5 highest)
  SELECT k,
         CASE WHEN rn <= 5 THEN 111
              WHEN rn > n - 5 THEN 222
              ELSE cents END AS cents,
         (rn - 1) * 8 // n AS b
  FROM o
)
SELECT '1_live' AS section, b AS bucket, CAST(NULL AS VARCHAR) AS detail,
       count(*) AS n_live, CAST(sum(cents) AS BIGINT) AS sum_cents
FROM seq GROUP BY b
UNION ALL
SELECT '2_ledger', 1, '0', NULL, NULL
UNION ALL
SELECT '2_ledger', 2, '7', NULL, NULL
ORDER BY section, bucket
"""


def q_sql_ctas_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2a lakehouse CTAS + INSERT INTO (r16 — the last SQL lifecycle
    gap: bootstrap previously required Python), ORACLE-CHECKED:
    ``CREATE TABLE ... KEY k BUCKETS 8 AS SELECT`` bootstraps a
    versioned table from a SQL view (the KEY clause persists into
    ``_table.json``, this engine's metaData slot, so every later
    statement is key-free), then three key-free INSERTs exercise both
    sources and both semantics — VALUES with new keys (appends,
    integer literals cast to the table's BIGINT columns), SELECT with
    new keys (appends into the extended last bucket), and SELECT over
    EXISTING keys (keyed replace: last-writer-wins per key, the
    documented divergence from Delta's duplicate-appending INSERT).
    The oracle replays the bootstrap bucket layout, the replaces, and
    both appends per bucket (operators/sqlfront.py CTAS/INSERT
    dispatch; guard rails pinned in test_sqlfront). Scale: each
    INSERT is an O(|staging|) MOR commit."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators.sqlfront import (
        lakehouse_sql,
    )

    load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).createOrReplaceTempView("_q_ctas_orders")
    path = _scratch_dir("ctasins_")
    lakehouse_sql(
        spark,
        f"CREATE TABLE '{path}' KEY k BUCKETS 8 AS "
        "SELECT k, cents FROM _q_ctas_orders WHERE k % 2 = 0",
    )
    tables = {"t": path}
    lakehouse_sql(
        spark,
        "INSERT INTO t VALUES (200000001, 11), (200000002, 22)",
        tables=tables,
    )  # v1: appends past the key range
    lakehouse_sql(
        spark,
        "INSERT INTO t SELECT k + 100000000, cents "
        "FROM _q_ctas_orders WHERE k % 10 = 4",
        tables=tables,
    )  # v2: SELECT-sourced appends
    lakehouse_sql(
        spark,
        "INSERT INTO t SELECT k, cents + 7 "
        "FROM _q_ctas_orders WHERE k % 50 = 0",
        tables=tables,
    )  # v3: existing keys -> keyed replace
    return (
        merge.read_version(spark, path)
        .groupBy(F.col("_kr").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_live"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("bucket")
    )


_ORACLE_SQL_CTAS_INSERT = """
WITH e AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders WHERE o_orderkey % 2 = 0
), base AS (  -- bootstrap layout + the v3 keyed replaces
  SELECT CASE WHEN k % 50 = 0 THEN cents + 7 ELSE cents END AS cents,
         (rn - 1) * 8 // n AS b
  FROM e
), ins AS (   -- v1 VALUES + v2 SELECT appends: beyond max key -> last bucket
  SELECT cents, 7 AS b FROM e WHERE k % 10 = 4
  UNION ALL
  SELECT 11, 7
  UNION ALL
  SELECT 22, 7
), allrows AS (
  SELECT * FROM base UNION ALL SELECT * FROM ins
)
SELECT b AS bucket, count(*) AS n_live,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM allrows GROUP BY b ORDER BY bucket
"""


def q_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2b column mapping lifecycle (r16), ORACLE-CHECKED: Delta's
    name-mode column mapping rebuilt on the plain-parquet layout —
    RENAME / ADD / DROP COLUMN as metadata-only structural commits
    (merge.rename_column/add_column/drop_column + the ALTER TABLE SQL
    spellings), files keeping their frozen physical names, every read
    projecting the LOGICAL schema as of its version. The lifecycle
    mixes Python-API and SQL DDL, writes through the MOR committer
    under three different schemas (original, renamed, renamed+added),
    and reports BOTH the tip state (renamed twice + added column) and
    a time-travel read at v1 under v1's OWN original names — all
    values replayed by the oracle (operators/merge.py column-mapping
    layer; row-level pins in test_merge/test_sqlfront). Scale: every
    DDL commit is O(manifest) — no data file is opened, let alone
    rewritten, exactly Delta's price."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators.sqlfront import (
        lakehouse_sql,
    )

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("colmap_")
    merge.versioned_layout_write(o, "k", path, n_buckets=8)  # v0
    merge.upsert_versioned_dv(  # v1 — under the ORIGINAL name
        spark, path,
        o.where(F.col("k") % 10 == 0).select(
            "k", (F.col("cents") + 5).alias("cents")
        ),
        "k",
    )
    merge.rename_column(spark, path, "cents", "amount")  # v2
    merge.upsert_versioned_dv(  # v3 — under the RENAMED name
        spark, path,
        o.where(F.col("k") % 15 == 0).select(
            "k", F.lit(77).cast("long").alias("amount")
        ),
        "k",
    )
    merge.add_column(spark, path, "flag", "long")  # v4
    upd = (  # v5 — rows keep their current amount, gain flag=1
        merge.read_version(spark, path)
        .where(F.col("k") % 20 == 0)
        .select("k", "amount", F.lit(1).cast("long").alias("flag"))
    )
    merge.upsert_versioned_dv(spark, path, upd, "k")
    tables = {"t": path}
    lakehouse_sql(  # v6+v7 — ADD then DROP leaves no trace at the tip
        spark, "ALTER TABLE t ADD COLUMN tmp long", tables=tables
    )
    lakehouse_sql(spark, "ALTER TABLE t DROP COLUMN tmp", tables=tables)
    lakehouse_sql(  # v8 — second rename, through SQL
        spark, "ALTER TABLE t RENAME COLUMN amount TO amt", tables=tables
    )
    tip = (
        merge.read_version(spark, path)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("amt").alias("sum_val"),
            F.sum("flag").alias("sum_flag"),
        )
        .select(F.lit("tip").alias("scene"), "n", "sum_val", "sum_flag")
    )
    v1 = (
        merge.read_version(spark, path, 1)  # v1's OWN names: cents
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("sum_val"))
        .select(
            F.lit("v1").alias("scene"),
            "n",
            "sum_val",
            F.lit(None).cast("long").alias("sum_flag"),
        )
    )
    return tip.unionByName(v1).orderBy("scene")


_ORACLE_COLUMN_MAPPING = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), fin AS (
  SELECT k,
         CASE WHEN k % 15 = 0 THEN 77
              WHEN k % 10 = 0 THEN cents + 5
              ELSE cents END AS amt,
         CASE WHEN k % 20 = 0 THEN 1 ELSE NULL END AS flag
  FROM o
)
SELECT 'tip' AS scene, count(*) AS n,
       CAST(sum(amt) AS BIGINT) AS sum_val,
       CAST(sum(flag) AS BIGINT) AS sum_flag
FROM fin
UNION ALL
SELECT 'v1', count(*),
       CAST(sum(CASE WHEN k % 10 = 0 THEN cents + 5 ELSE cents END)
            AS BIGINT),
       NULL
FROM o
ORDER BY scene
"""


def q_scoped_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2g scoped OPTIMIZE ... WHERE (r16), ORACLE-CHECKED: compact
    ONLY the buckets whose key range intersects the predicate. Churn
    lands both inside and outside a key window; the scoped compaction
    rewrites exactly the in-window churned buckets (count replayed via
    the bootstrap bucket-assignment arithmetic — in-window buckets
    with one generation and no DV are SKIPPED, so the count is the
    churned-bucket count, not the window's bucket count), folds their
    DV entries while the out-of-window churn's entries carry forward
    (replayed), and leaves the live content value-identical
    (operators/merge.py compact_key_range; mtime/CDF-silence pins in
    test_merge). Scale: O(window churn), never O(table)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("scopedopt_")
    merge.versioned_layout_write(o, "k", path, n_buckets=8)
    stats = o.agg(F.max("k").alias("mx")).collect()[0]
    lo, hi = 1, int(stats.mx) // 3  # the first third of the key space
    churn = o.where(F.col("k") % 7 == 0).select(
        "k", (F.col("cents") + 1).alias("cents")
    )
    merge.upsert_versioned_dv(spark, path, churn, "k")  # in+out of window
    man = merge.compact_key_range(spark, path, "k", lo, hi)
    dv_after = merge._read_dv(spark, path, man.version)
    live = merge.read_version(spark, path).agg(
        F.count(F.lit(1)).alias("a"), F.sum("cents").alias("b")
    )
    facts = spark.createDataFrame(
        [
            (
                "opt",
                int(man.n_compacted_buckets),
                0 if dv_after is None else dv_after.count(),
            )
        ],
        "scene string, a long, b long",
    )
    return (
        live.select(F.lit("live").alias("scene"), "a", "b")
        .unionByName(facts)
        .orderBy("scene")
    )


_ORACLE_SCOPED_OPTIMIZE = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         (row_number() OVER (ORDER BY o_orderkey) - 1) * 8
             // count(*) OVER () AS bucket
  FROM orders
), win AS (
  SELECT CAST(max(k) AS BIGINT) // 3 AS hi FROM o
), churned AS (
  SELECT k, bucket FROM o WHERE k % 7 = 0
)
SELECT 'live' AS scene, count(*) AS a,
       CAST(sum(CASE WHEN k % 7 = 0 THEN cents + 1 ELSE cents END)
            AS BIGINT) AS b
FROM o
UNION ALL
SELECT 'opt',
       -- hit buckets: every bucket is churned (k%7 spans the key
       -- space), so the hit set is exactly the buckets whose
       -- bootstrap range intersects [1, hi] = buckets holding any
       -- key <= hi
       (SELECT count(DISTINCT bucket) FROM o, win WHERE k <= hi),
       -- carried DV entries: churn in the NON-hit buckets
       (SELECT count(*) FROM churned WHERE bucket NOT IN (
          SELECT bucket FROM o, win WHERE k <= hi))
ORDER BY scene
"""


def q_schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2d/J2e composite (r16), ORACLE-CHECKED: MERGE WITH SCHEMA
    EVOLUTION + GENERATED ALWAYS AS working together under a declared
    mapping. The lifecycle: bootstrap -> rename (mapping in force) ->
    add a GENERATED cents-bucket column -> a MERGE WITH SCHEMA
    EVOLUTION whose staging carries a brand-new ``src`` column (auto
    ADD COLUMN) while the generated column recomputes over the
    POST-arm rows — update arms refresh it, inserts compute it, and
    rows untouched by the merge keep NULL (added columns are not
    backfilled, the documented divergence). Every value is replayed by
    the oracle (operators/merge.py _auto_evolve_schema /
    _apply_generated; row-level pins in test_merge)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators.sqlfront import (
        lakehouse_sql,
    )

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("schevo_")
    merge.versioned_layout_write(o, "k", path, n_buckets=8)
    merge.rename_column(spark, path, "cents", "amount")
    lakehouse_sql(
        spark,
        "ALTER TABLE t ADD COLUMN band bigint "
        "GENERATED ALWAYS AS (amount % 97)",
        tables={"t": path},
    )
    staged = (
        o.where(F.col("k") % 40 == 0)
        .select(
            "k",
            (F.col("cents") + 11).alias("amount"),
            F.lit("upd").alias("src"),
        )
        .unionByName(
            o.where(F.col("k") % 90 == 0).select(
                (F.col("k") + 80_000_000).alias("k"),
                F.lit(500).cast("long").alias("amount"),
                F.lit("new").alias("src"),
            )
        )
    )
    lakehouse_sql(
        spark,
        "MERGE WITH SCHEMA EVOLUTION INTO t USING src ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        tables={"t": path},
        staging=staged,
    )
    return (
        merge.read_version(spark, path)
        .groupBy(F.coalesce(F.col("src"), F.lit("base")).alias("src"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("amount").alias("sum_amount"),
            F.sum("band").alias("sum_band"),
        )
        .orderBy("src")
    )


_ORACLE_SCHEMA_EVOLUTION_MERGE = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), upd AS (SELECT k, cents + 11 AS amount FROM o WHERE k % 40 = 0),
ins AS (SELECT k + 80000000 AS k, CAST(500 AS BIGINT) AS amount
        FROM o WHERE k % 90 = 0),
base AS (SELECT k, cents AS amount FROM o WHERE k % 40 != 0)
SELECT 'base' AS src, count(*) AS n,
       CAST(sum(amount) AS BIGINT) AS sum_amount,
       CAST(NULL AS BIGINT) AS sum_band
FROM base
UNION ALL
SELECT 'new', count(*), CAST(sum(amount) AS BIGINT),
       CAST(sum(amount % 97) AS BIGINT)
FROM ins
UNION ALL
SELECT 'upd', count(*), CAST(sum(amount) AS BIGINT),
       CAST(sum(amount % 97) AS BIGINT)
FROM upd
ORDER BY src
"""


def q_reorg_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2c REORG TABLE ... APPLY (PURGE) (r16), ORACLE-CHECKED:
    Delta's deletion-vector purge — rewrite ONLY the buckets carrying
    DV debt, folding merge-on-read debt to zero at O(debt buckets)
    instead of compact_table's O(table). The scene: a MOR upsert and a
    MOR delete concentrate debt in the touched keys' buckets; the
    purge rewrites exactly those buckets (count oracle-replayed via
    the bootstrap bucket-assignment arithmetic), the folded DV entry
    count matches the distinct-touched-keys replay, the post-purge DV
    is literally absent, and the live content is value-identical to
    the oracle's state replay (operators/merge.py
    purge_deletion_vectors; mtime/CDF-silence pins in test_merge).
    Scale: clean buckets' directories are never opened — the rewrite
    is O(churned key range), the exact price Delta's REORG pays."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("purge_")
    merge.versioned_layout_write(o, "k", path, n_buckets=8)
    merge.upsert_versioned_dv(
        spark, path,
        o.where(F.col("k") % 50 == 0).select(
            "k", (F.col("cents") + 3).alias("cents")
        ),
        "k",
    )
    merge.delete_versioned(
        spark, path,
        o.where(F.col("k") % 70 == 0).select("k"),
        "k",
    )
    man = merge.purge_deletion_vectors(spark, path, "k")
    dv_after = merge._read_dv(spark, path, man.version)
    live = merge.read_version(spark, path).agg(
        F.count(F.lit(1)).alias("a"), F.sum("cents").alias("b")
    )
    facts = spark.createDataFrame(
        [
            ("purge", int(man.n_purged_buckets), int(man.n_dv_entries)),
            ("dv_after", 0 if dv_after is None else dv_after.count(), None),
        ],
        "scene string, a long, b long",
    )
    return (
        live.select(F.lit("live").alias("scene"), "a", "b")
        .unionByName(facts)
        .orderBy("scene")
    )


_ORACLE_REORG_PURGE = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         (row_number() OVER (ORDER BY o_orderkey) - 1) * 8
             // count(*) OVER () AS bucket
  FROM orders
), touched AS (
  SELECT k, bucket FROM o WHERE k % 50 = 0 OR k % 70 = 0
), live AS (
  SELECT CASE WHEN k % 50 = 0 THEN cents + 3 ELSE cents END AS amt
  FROM o WHERE k % 70 != 0
)
SELECT 'dv_after' AS scene, CAST(0 AS BIGINT) AS a, CAST(NULL AS BIGINT) AS b
UNION ALL
SELECT 'live', count(*), CAST(sum(amt) AS BIGINT) FROM live
UNION ALL
SELECT 'purge', count(DISTINCT bucket), count(*) FROM touched
ORDER BY scene
"""


def q_table_changes_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X95i Delta-vocabulary batch CDF (r16), ORACLE-CHECKED:
    ``table_changes(change_format='delta')`` emits Delta CDF's full
    ``_change_type`` set — insert / update_preimage /
    update_postimage / delete-carrying-old-values — derived by ONE
    pruned read of the changed buckets' live state at v-1 (untouched
    buckets never opened). A single MERGE mixing all three arm
    classes lands; the report aggregates the feed per change type
    over keys AND payloads, so both images' values (old cents on the
    preimage and the delete, new cents on the postimage) are
    value-checked against the oracle's replay
    (operators/merge.py table_changes change_format; row-level image
    pins in test_merge). Scale: O(changed buckets) extra read per
    version — Delta's own preimage price."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = _scratch_dir("tcdelta_")
    merge.versioned_layout_write(o, "k", path, n_buckets=8)
    staged = (
        o.where(F.col("k") % 30 == 0)
        .select("k", (F.col("cents") + 9).alias("cents"))
        .unionByName(
            o.where((F.col("k") % 40 == 0) & (F.col("k") % 30 != 0)).select(
                "k", F.lit(-1).cast("long").alias("cents")
            )
        )
        .unionByName(
            o.where(F.col("k") % 100 == 0).select(
                (F.col("k") + 70_000_000).alias("k"),
                F.lit(55).cast("long").alias("cents"),
            )
        )
    )
    merge.merge_arms_versioned_dv(
        spark, path, staged, "k",
        matched=[("s.cents = -1", "delete"), (None, "update", None)],
        not_matched=[(None, "insert")],
    )
    return (
        merge.table_changes(spark, path, 0, change_format="delta")
        .groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("change_type")
    )


_ORACLE_TABLE_CHANGES_DELTA = """
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), upd AS (SELECT k, cents FROM o WHERE k % 30 = 0),
dels AS (SELECT k, cents FROM o WHERE k % 40 = 0 AND k % 30 != 0),
ins AS (SELECT k + 70000000 AS k, CAST(55 AS BIGINT) AS cents
        FROM o WHERE k % 100 = 0)
SELECT 'delete' AS change_type, count(*) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM dels
UNION ALL
SELECT 'insert', count(*), CAST(sum(k) AS BIGINT),
       CAST(sum(cents) AS BIGINT)
FROM ins
UNION ALL
SELECT 'update_preimage', count(*), CAST(sum(k) AS BIGINT),
       CAST(sum(cents) AS BIGINT)
FROM upd
UNION ALL
SELECT 'update_postimage', count(*), CAST(sum(k) AS BIGINT),
       CAST(sum(cents) + 9 * count(*) AS BIGINT)
FROM upd
ORDER BY change_type
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

# Ordering contract: the driver's correctness harness records the FIRST
# 50 entries of this dict (dict order is insertion order).  The first 50
# below are therefore a curated window that spans every SURVEY.md §2
# family — flagship composite, reference sync flow, the whole dedup /
# similarity / text-analysis X family, sources, one representative per
# relational & scalar-function family, windows, UDF/UDTF, two TPC-H-style
# reports, and all seven streaming queries.  Redundant variants of
# already-windowed operators (e.g. cosine_topk vs cosine_topk_np,
# rollup/cube vs grouping_sets_sql, merge_upsert_outer vs merge_upsert)
# sit past slot 50; they remain fully oracle-checked by
# tools/verify_local.py and tests/.
QUERIES: dict[str, QueryFn] = {
    # -- slots 1-50: driver correctness window ------------------------
    # r16 rotation (r15 verdict next-round #3): the five new r16
    # queries (metadata-resolved SQL DML incl. clone inheritance;
    # OPTIMIZE ZORDER BY with stats promotion; timestamp-endpoint
    # batch CDF; disjoint-bucket concurrent-commit admission under a
    # real race), then the ten r10-attested rows that headed the
    # rotation pool (asof_forward, the BPE trio, kmv_set_ops,
    # streaming_kmv, sync_pipeline, udaf_geomean, weighted_sample,
    # window_dist), then 35 of the r11 cohort in its correctness
    # order. The remaining 15 r11 rows sit just past the slot line
    # (all verify_local-green) and head the r17 pool with the r12
    # cohort.
    "sql_table_meta": q_sql_table_meta,
    "optimize_zorder_sql": q_optimize_zorder_sql,
    "table_changes_ts": q_table_changes_ts,
    "concurrent_commits": q_concurrent_commits,
    "sql_ctas_insert": q_sql_ctas_insert,
    "table_changes_delta": q_table_changes_delta,
    "column_mapping": q_column_mapping,
    "reorg_purge": q_reorg_purge,
    "schema_evolution_merge": q_schema_evolution_merge,
    "scoped_optimize": q_scoped_optimize,
    # latest attestation r10:
    "asof_forward": q_asof_forward,
    "bpe_encode_fast": q_bpe_encode_fast,
    "bpe_fast_merges": q_bpe_fast_merges,
    "bpe_merges": q_bpe_merges,
    "kmv_set_ops": q_kmv_set_ops,
    "streaming_kmv": q_streaming_kmv,
    "sync_pipeline": q_sync_pipeline,
    "udaf_geomean": q_udaf_geomean,
    "weighted_sample": q_weighted_sample,
    "window_dist": q_window_dist,
    # latest attestation r11 (cohort order):
    "skyline_customers": q_skyline_customers,
    "target_encode": q_target_encode,
    "impute_missing": q_impute_missing,
    "pit_join": q_pit_join,
    "attribution": q_attribution,
    "bfs_reachability": q_bfs_reachability,
    "ivm_aggregate": q_ivm_aggregate,
    "streaming_ivm": q_streaming_ivm,
    "entity_resolution": q_entity_resolution,
    "k_anonymity": q_k_anonymity,
    "quantile_calibration": q_quantile_calibration,
    "event_transitions": q_event_transitions,
    "rfm_segments": q_rfm_segments,
    "scd3_apply": q_scd3_apply,
    "surrogate_keys": q_surrogate_keys,
    "fk_integrity": q_fk_integrity,
    "shortest_paths": q_shortest_paths,
    "revenue_trend": q_revenue_trend,
    "streaming_transitions": q_streaming_transitions,
    "python_datasource": q_python_datasource,
    "media_dedup": q_media_dedup,
    "spatial_join": q_spatial_join,
    "table_reconcile": q_table_reconcile,
    "benford_audit": q_benford_audit,
    "streaming_reconcile": q_streaming_reconcile,
    "basket_rules": q_basket_rules,
    "hist_drift": q_hist_drift,
    "rolling_active": q_rolling_active,
    "hll_distinct": q_hll_distinct,
    "cms_counts": q_cms_counts,
    "zorder_layout": q_zorder_layout,
    "profile_table": q_profile_table,
    "sequence_pattern": q_sequence_pattern,
    "streaming_hll": q_streaming_hll,
    "semantic_decontam": q_semantic_decontam,
    # -- slots 51+: verified via verify_local -------------------------
    "resample_ffill": q_resample_ffill,
    # The displaced r15 window (all 50 driver-green in CORRECTNESS_r15),
    # the remaining 14 r11-cohort rows, and the rest of the registry
    # in prior order.
    "sql_time_travel": q_sql_time_travel,
    "incremental_optimize": q_incremental_optimize,
    "sql_update_delete": q_sql_update_delete,
    "table_changes_batch": q_table_changes_batch,
    "bloom_screen": q_bloom_screen,
    "importance_resample": q_importance_resample,
    "ivf_full_probe": q_ivf_full_probe,
    "pagerank": q_pagerank,
    "streaming_dedup": q_streaming_dedup,
    "streaming_session": q_streaming_session,
    "asof_join": q_asof_join,
    "bm25_topk": q_bm25_topk,
    "bpe_encode": q_bpe_encode,
    "bpe_segment": q_bpe_segment,
    "bucketed_join": q_bucketed_join,
    "cohort_retention": q_cohort_retention,
    "constraint_audit": q_constraint_audit,
    "curation_pipeline": q_curation_pipeline,
    "dup_line_signals": q_dup_line_signals,
    "embedding_covariance": q_embedding_covariance,
    "funnel_conversion": q_funnel_conversion,
    "hist_quantiles": q_hist_quantiles,
    "incremental_covariance": q_incremental_covariance,
    "incremental_embedding_dups": q_incremental_embedding_dups,
    "ingest_pipeline": q_ingest_pipeline,
    "iqr_outliers": q_iqr_outliers,
    "kmv_distinct": q_kmv_distinct,
    "lm_scores_bigram": q_lm_scores_bigram,
    "media_features": q_media_features,
    "nb_classify": q_nb_classify,
    "pack_sequences": q_pack_sequences,
    "pivot_report": q_pivot_report,
    "quality_ensemble": q_quality_ensemble,
    "rolling_anomaly": q_rolling_anomaly,
    "scd2_apply": q_scd2_apply,
    "schema_evolution": q_schema_evolution,
    "selection_pipeline": q_selection_pipeline,
    "semantic_dedup": q_semantic_dedup,
    "session_sequences": q_session_sequences,
    "sql_cte": q_sql_cte,
    "stateful_dedup": q_stateful_dedup,
    "streaming_ann_absorb": q_streaming_ann_absorb,
    "streaming_covariance": q_streaming_covariance,
    "streaming_hist": q_streaming_hist,
    "streaming_incremental_dedup": q_streaming_incremental_dedup,
    "streaming_iqr_gate": q_streaming_iqr_gate,
    "streaming_join": q_streaming_join,
    "streaming_stateful": q_streaming_stateful,
    "streaming_tumbling": q_streaming_tumbling,
    "streaming_upsert": q_streaming_upsert,
    "ivf_prebuilt_full_probe": q_ivf_prebuilt_full_probe,
    "pq_full_rerank": q_pq_full_rerank,
    "ivfpq_full_probe": q_ivfpq_full_probe,
    "lakehouse_sql": q_lakehouse_sql,
    "hard_negatives_full_probe": q_hard_negatives_full_probe,
    "retrieval_mrr_full_probe": q_retrieval_mrr_full_probe,
    "regex_extract": q_regex_extract,
    "udtf_sentences": q_udtf_sentences,
    "anti_join": q_anti_join,
    "count_distinct": q_count_distinct,
    "distinct_keys": q_distinct_keys,
    "grouping_sets_sql": q_grouping_sets_sql,
    "hash_split": q_hash_split,
    "lm_scores_foreign": q_lm_scores_foreign,
    "merge_upsert": q_merge_upsert,
    "mixture_sample": q_mixture_sample,
    "paginate": q_paginate,
    "range_join": q_range_join,
    "repetition_scores": q_repetition_scores,
    "semi_join": q_semi_join,
    "set_ops": q_set_ops,
    "top_customers": q_top_customers,
    "cosine_topk_np": q_cosine_topk_np,
    "dup_ngram_spans": q_dup_ngram_spans,
    "incremental_dedup": q_incremental_dedup,
    "streaming_sliding": q_streaming_sliding,
    "text_stats": q_text_stats,
    "embedding_dups_exact": q_embedding_dups_exact,
    "pmi_collocations": q_pmi_collocations,
    "tfidf_pairs": q_tfidf_pairs,
    "token_topk": q_token_topk,
    "assemble_bins": q_assemble_bins,
    "chunk_documents": q_chunk_documents,
    "corpus_report": q_corpus_report,
    "decontaminate": q_decontaminate,
    "dedup_clusters": q_dedup_clusters,
    "dedup_exact": q_dedup_exact,
    "gopher_rules": q_gopher_rules,
    "heavy_hitters": q_heavy_hitters,
    "jaccard_pairs": q_jaccard_pairs,
    "pii_redaction": q_pii_redaction,
    "pricing_summary": q_pricing_summary,
    "quality_filter": q_quality_filter,
    "recipe_pipeline": q_recipe_pipeline,
    "remove_dup_spans": q_remove_dup_spans,
    "retrieval_mrr": q_retrieval_mrr,
    "salted_join": q_salted_join,
    "snapshot_diff": q_snapshot_diff,
    "star_join": q_star_join,
    "window_suite": q_window_suite,
    "promo_share": q_promo_share,
    "disjunctive_rev": q_disjunctive_rev,
    "merge_dv": q_merge_dv,
    "column_prune": q_column_prune,
    "streaming_versioned": q_streaming_versioned,
    "versioned_evolve": q_versioned_evolve,
    "merge_sync": q_merge_sync,
    "versioned_zorder": q_versioned_zorder,
    "restore_table": q_restore_table,
    "point_lookup": q_point_lookup,
    "merge_arms": q_merge_arms,
    "merge_arms_dv": q_merge_arms_dv,
    "merge_arms_sync": q_merge_arms_sync,
    "table_history": q_table_history,
    "streaming_cdf": q_streaming_cdf,
    "table_replication": q_table_replication,
    "rebucket": q_rebucket,
    "compact_binpack": q_compact_binpack,
    "constraint_gate": q_constraint_gate,
    "shallow_clone": q_shallow_clone,
    "as_of_timestamp": q_as_of_timestamp,
    "tagged_read": q_tagged_read,
    "cosine_topk": q_cosine_topk,
    "cube": q_cube,
    "forecast_revenue": q_forecast_revenue,
    "hourly_rollup": q_hourly_rollup,
    "intersect": q_intersect,
    "json_extract": q_json_extract,
    "lang_markers": q_lang_markers,
    "merge_counts": q_merge_counts,
    "merge_upsert_outer": q_merge_upsert_outer,
    "percentiles": q_percentiles,
    "pivot": q_pivot,
    "posexplode": q_posexplode,
    "ratio_report": q_ratio_report,
    "rollup": q_rollup,
    "sessionize": q_sessionize,
    "shipping_priority": q_shipping_priority,
    "unpivot": q_unpivot,
    "window_lag_running": q_window_lag_running,
    "window_rank": q_window_rank,
    "window_range_frame": q_window_range_frame,
    "big_orders": q_big_orders,
    "bool_defaults": q_bool_defaults,
    "epoch_dates": q_epoch_dates,
    "json_roundtrip": q_json_roundtrip,
    "market_share": q_market_share,
    "clean_text": q_clean_text,
    "csv_roundtrip": q_csv_roundtrip,
    "grouped_counts": q_grouped_counts,
    "streaming_transitions_state": q_streaming_transitions_state,
    "cc_star": q_cc_star,
    "merge_fileskip": q_merge_fileskip,
    "time_travel": q_time_travel,
    "version_diff": q_version_diff,
    "data_health": q_data_health,
    "rrf_fusion": q_rrf_fusion,
    "retrieval_ndcg": q_retrieval_ndcg,
    "l_diversity": q_l_diversity,
    "readability": q_readability,
    "interval_join": q_interval_join,
    "winsorize": q_winsorize,
    "robust_zscore": q_robust_zscore,
    "stratified_sample": q_stratified_sample,
    "membership_split": q_membership_split,
    "c4_line_filter": q_c4_line_filter,
    "line_dedup": q_line_dedup,
    "winnow_fingerprints": q_winnow_fingerprints,
    "winnow_pairs": q_winnow_pairs,
    "encode_token_ids": q_encode_token_ids,
    "contrastive_triplets": q_contrastive_triplets,
    "curriculum_shards": q_curriculum_shards,
    "scalar_subquery": q_scalar_subquery,
    "decimal_agg": q_decimal_agg,
    "orc_roundtrip": q_orc_roundtrip,
    "variant_extract": q_variant_extract,
    "lang_id": q_lang_id,
    "media_frames": q_media_frames,
    "mixture_upsample": q_mixture_upsample,
    "quota_sample": q_quota_sample,
    "fuzzy_name_pairs": q_fuzzy_name_pairs,
    "partitioned_prune": q_partitioned_prune,
    "date_arithmetic": q_date_arithmetic,
    "array_hof": q_array_hof,
    "streaming_pii": q_streaming_pii,
    "streaming_decontam": q_streaming_decontam,
    "streaming_classify": q_streaming_classify,
    "media_resize": q_media_resize,
    "lm_scores": q_lm_scores,
    "fingerprints": q_fingerprints,
    "quality_scores": q_quality_scores,
    "order_priority_check": q_order_priority_check,
    "volume_shipping": q_volume_shipping,
    "customer_distribution": q_customer_distribution,
    "top_supplier": q_top_supplier,
    "small_qty_revenue": q_small_qty_revenue,
    "sales_opportunity": q_sales_opportunity,
    "returned_items": q_returned_items,
    "exists_subquery": q_exists_subquery,
    "priority_case_counts": q_priority_case_counts,
    "resample_interp": q_resample_interp,
    "streaming_resample": q_streaming_resample,
    "triangle_counts": q_triangle_counts,
    "sorted_neighborhood": q_sorted_neighborhood,
    "curriculum_packing": q_curriculum_packing,
    "bpe_encode_new": q_bpe_encode_new,
    "ccnet_buckets": q_ccnet_buckets,
    "vocab_coverage": q_vocab_coverage,
    "temperature_sample": q_temperature_sample,
    "shuffle_shards": q_shuffle_shards,
    "streaming_quality_gate": q_streaming_quality_gate,
    "hard_negatives": q_hard_negatives,
    "streaming_scd2": q_streaming_scd2,
    "priority_dedup": q_priority_dedup,
    "bpe_fast_deep": q_bpe_fast_deep,
    "hard_negatives_ann": q_hard_negatives_ann,
    "retrieval_mrr_ann": q_retrieval_mrr_ann,
    "pca_project": q_pca_project,
    "semantic_dedup_pca": q_semantic_dedup_pca,
    "cluster_documents": q_cluster_documents,
    "semantic_dedup_clustered": q_semantic_dedup_clustered,
    "lsh_topk": q_lsh_topk,
    "ivf_topk": q_ivf_topk,
    "ivf_topk_prebuilt": q_ivf_topk_prebuilt,
    "lsh_topk_prebuilt": q_lsh_topk_prebuilt,
    "pq_topk": q_pq_topk,
    "ivfpq_topk": q_ivfpq_topk,
    "simhash_near_pairs": q_simhash_near_pairs,
    "minhash_pairs": q_minhash_pairs,
    "simhash_groups": q_simhash_groups,
    "embedding_dups": q_embedding_dups,
    "incremental_embedding_dups_banded": q_incremental_embedding_dups_banded,
    "html_clean": q_html_clean,
}



ORACLES: dict[str, str] = {
    "pricing_summary": _ORACLE_PRICING,
    "grouped_counts": _ORACLE_GROUPED_COUNTS,
    "count_distinct": _ORACLE_COUNT_DISTINCT,
    "rollup": _ORACLE_ROLLUP,
    "cube": _ORACLE_CUBE,
    "distinct_keys": _ORACLE_DISTINCT_KEYS,
    "anti_join": _ORACLE_ANTI_JOIN,
    "semi_join": _ORACLE_SEMI_JOIN,
    "star_join": _ORACLE_STAR_JOIN,
    "top_customers": _ORACLE_TOP_CUSTOMERS,
    "window_rank": _ORACLE_WINDOW_RANK,
    "window_lag_running": _ORACLE_WINDOW_LAG,
    "paginate": _ORACLE_PAGINATE,
    "set_ops": _ORACLE_SET_OPS,
    "intersect": _ORACLE_INTERSECT,
    "epoch_dates": _ORACLE_EPOCH_DATES,
    "clean_text": _ORACLE_CLEAN_TEXT,
    "json_extract": _ORACLE_JSON_EXTRACT,
    "bool_defaults": _ORACLE_BOOL_DEFAULTS,
    "merge_upsert": _ORACLE_MERGE_UPSERT,
    "merge_upsert_outer": _ORACLE_MERGE_UPSERT,
    "merge_counts": _ORACLE_MERGE_COUNTS,
    "json_roundtrip": _ORACLE_JSON_ROUNDTRIP,
    "dedup_exact": _ORACLE_DEDUP_EXACT,
    "jaccard_pairs": _ORACLE_JACCARD_PAIRS,
    # minhash_pairs / simhash_groups / embedding_dups / lsh_topk: rows-only
    "embedding_dups_exact": _ORACLE_EMBEDDING_DUPS_EXACT,
    # FFD packing replayed exactly via a recursive-CTE state machine
    "pack_sequences": _ORACLE_PACK_SEQUENCES,
    "assemble_bins": _ORACLE_ASSEMBLE_BINS,
    "recipe_pipeline": _ORACLE_RECIPE_PIPELINE,
    "cosine_topk": _ORACLE_COSINE_TOPK,
    "cosine_topk_np": _ORACLE_COSINE_TOPK,
    # the streamed-absorb index at full probe must equal exact brute
    # force over the whole corpus — same oracle BY DESIGN
    "streaming_ann_absorb": _ORACLE_COSINE_TOPK,
    # full probe == exact brute force (see q_ivf_full_probe docstring)
    "ivf_full_probe": _ORACLE_COSINE_TOPK,
    # r14 promotions: held-index full probe, PQ full re-rank, and
    # IVF-PQ at both anchors are each provably equal to brute force
    "ivf_prebuilt_full_probe": _ORACLE_COSINE_TOPK,
    "pq_full_rerank": _ORACLE_COSINE_TOPK,
    "ivfpq_full_probe": _ORACLE_COSINE_TOPK,
    "lakehouse_sql": _ORACLE_LAKEHOUSE_SQL,
    "sql_time_travel": _ORACLE_SQL_TIME_TRAVEL,
    "incremental_optimize": _ORACLE_INCREMENTAL_OPTIMIZE,
    "sql_update_delete": _ORACLE_SQL_UPDATE_DELETE,
    "table_changes_batch": _ORACLE_TABLE_CHANGES_BATCH,
    "membership_split": _ORACLE_MEMBERSHIP_SPLIT,
    # simhash_near_pairs: rows-only (fingerprint isn't SQL-expressible)
    "token_topk": _ORACLE_TOKEN_TOPK,
    "text_stats": _ORACLE_TEXT_STATS,
    "lang_markers": _ORACLE_LANG_MARKERS,
    "quality_filter": _ORACLE_QUALITY_FILTER,
    "sessionize": _ORACLE_SESSIONIZE,
    "hourly_rollup": _ORACLE_HOURLY_ROLLUP,
    "pivot": _ORACLE_PIVOT,
    "shipping_priority": _ORACLE_SHIPPING_PRIORITY,
    "forecast_revenue": _ORACLE_FORECAST_REVENUE,
    "grouping_sets_sql": _ORACLE_GROUPING_SETS,
    "window_suite": _ORACLE_WINDOW_SUITE,
    "asof_join": _ORACLE_ASOF_JOIN,
    "range_join": _ORACLE_RANGE_JOIN,
    "unpivot": _ORACLE_UNPIVOT,
    "percentiles": _ORACLE_PERCENTILES,
    "ratio_report": _ORACLE_RATIO_REPORT,
    "posexplode": _ORACLE_POSEXPLODE,
    "salted_join": _ORACLE_SALTED_JOIN,
    "udaf_geomean": _ORACLE_UDAF_GEOMEAN,
    "udtf_sentences": _ORACLE_UDTF_SENTENCES,
    "scalar_subquery": _ORACLE_SCALAR_SUBQUERY,
    "exists_subquery": _ORACLE_EXISTS_SUBQUERY,
    "priority_case_counts": _ORACLE_PRIORITY_CASE,
    "promo_share": _ORACLE_PROMO_SHARE,
    "big_orders": _ORACLE_BIG_ORDERS,
    "disjunctive_rev": _ORACLE_DISJUNCTIVE_REV,
    "fuzzy_name_pairs": _ORACLE_FUZZY_NAME_PAIRS,
    "partitioned_prune": _ORACLE_PARTITIONED_PRUNE,
    "date_arithmetic": _ORACLE_DATE_ARITHMETIC,
    "array_hof": _ORACLE_ARRAY_HOF,
    "sql_cte": _ORACLE_SQL_CTE,
    "sync_pipeline": _ORACLE_SYNC_PIPELINE,
    "lang_id": _ORACLE_LANG_ID,
    "quality_scores": _ORACLE_QUALITY_SCORES,
    "fingerprints": _ORACLE_FINGERPRINTS,
    "decontaminate": _ORACLE_DECONTAMINATE,
    "dup_ngram_spans": _ORACLE_DUP_NGRAM_SPANS,
    "remove_dup_spans": _ORACLE_REMOVE_DUP_SPANS,
    "incremental_dedup": _ORACLE_INCREMENTAL_DEDUP,
    "stateful_dedup": _ORACLE_INCREMENTAL_DEDUP,
    "incremental_embedding_dups": _ORACLE_INCREMENTAL_EMBEDDING_DUPS,
    "semantic_dedup": _ORACLE_SEMANTIC_DEDUP,
    "pii_redaction": _ORACLE_PII_REDACTION,
    "heavy_hitters": _ORACLE_HEAVY_HITTERS,
    "bm25_topk": _ORACLE_BM25_TOPK,
    "pmi_collocations": _ORACLE_PMI_COLLOCATIONS,
    "tfidf_pairs": _ORACLE_TFIDF_PAIRS,
    "chunk_documents": _ORACLE_CHUNK_DOCUMENTS,
    # stateless streaming projection == the batch projection
    "streaming_pii": _ORACLE_PII_REDACTION,
    "streaming_decontam": _ORACLE_DECONTAMINATE,
    "streaming_classify": _ORACLE_NB_CLASSIFY,
    "media_frames": _ORACLE_MEDIA_FRAMES,
    "media_resize": _ORACLE_MEDIA_RESIZE,
    "media_features": _ORACLE_MEDIA_FEATURES,
    "csv_roundtrip": _ORACLE_CSV_ROUNDTRIP,
    "order_priority_check": _ORACLE_ORDER_PRIORITY_CHECK,
    "volume_shipping": _ORACLE_VOLUME_SHIPPING,
    "market_share": _ORACLE_MARKET_SHARE,
    "customer_distribution": _ORACLE_CUSTOMER_DISTRIBUTION,
    "top_supplier": _ORACLE_TOP_SUPPLIER,
    "small_qty_revenue": _ORACLE_SMALL_QTY_REVENUE,
    "sales_opportunity": _ORACLE_SALES_OPPORTUNITY,
    "decimal_agg": _ORACLE_DECIMAL_AGG,
    "regex_extract": _ORACLE_REGEX_EXTRACT,
    "window_range_frame": _ORACLE_WINDOW_RANGE_FRAME,
    "returned_items": _ORACLE_RETURNED_ITEMS,
    "orc_roundtrip": _ORACLE_ORC_ROUNDTRIP,
    "dedup_clusters": _ORACLE_DEDUP_CLUSTERS,
    "variant_extract": _ORACLE_VARIANT_EXTRACT,
    "hash_split": _ORACLE_HASH_SPLIT,
    "quota_sample": _ORACLE_QUOTA_SAMPLE,
    "mixture_sample": _ORACLE_MIXTURE_SAMPLE,
    "mixture_upsample": _ORACLE_MIXTURE_UPSAMPLE,
    "lm_scores": _ORACLE_LM_SCORES,
    "importance_resample": _ORACLE_IMPORTANCE_RESAMPLE,
    "ccnet_buckets": _ORACLE_CCNET_BUCKETS,
    "vocab_coverage": _ORACLE_VOCAB_COVERAGE,
    "temperature_sample": _ORACLE_TEMPERATURE_SAMPLE,
    "gopher_rules": _ORACLE_GOPHER_RULES,
    "shuffle_shards": _ORACLE_SHUFFLE_SHARDS,
    "selection_pipeline": _ORACLE_SELECTION_PIPELINE,
    "corpus_report": _ORACLE_CORPUS_REPORT,
    "streaming_quality_gate": _ORACLE_STREAMING_QUALITY_GATE,
    "ingest_pipeline": _ORACLE_INGEST_PIPELINE,
    "hard_negatives": _ORACLE_HARD_NEGATIVES,
    "retrieval_mrr": _ORACLE_RETRIEVAL_MRR,
    # r14 promotions: ANN retrieval twins at full probe with the
    # candidate cut removed are provably equal to their exact paths
    "hard_negatives_full_probe": _ORACLE_HARD_NEGATIVES,
    "retrieval_mrr_full_probe": _ORACLE_RETRIEVAL_MRR,
    "bloom_screen": _ORACLE_STREAMING_INCREMENTAL_DEDUP,
    "pagerank": _ORACLE_PAGERANK,
    "snapshot_diff": _ORACLE_SNAPSHOT_DIFF,
    "scd2_apply": _ORACLE_SCD2_APPLY,
    # key-disjoint micro-batches at one batch_ts compose to the one-shot
    # MERGE (see q_streaming_scd2) -> the batch oracle replays the stream
    "streaming_scd2": _ORACLE_SCD2_APPLY,
    "semantic_decontam": _ORACLE_SEMANTIC_DECONTAM,
    "resample_ffill": _ORACLE_RESAMPLE_FFILL,
    "resample_interp": _ORACLE_RESAMPLE_INTERP,
    # streamed cell absorb must equal the one-shot resample (max of
    # maxes) — same oracle BY DESIGN
    "streaming_resample": _ORACLE_RESAMPLE_FFILL,
    "triangle_counts": _ORACLE_TRIANGLE_COUNTS,
    "sorted_neighborhood": _ORACLE_SORTED_NEIGHBORHOOD,
    "bucketed_join": _ORACLE_BUCKETED_JOIN,
    "constraint_audit": _ORACLE_CONSTRAINT_AUDIT,
    "kmv_set_ops": _ORACLE_KMV_SET_OPS,
    "weighted_sample": _ORACLE_WEIGHTED_SAMPLE,
    "rolling_anomaly": _ORACLE_ROLLING_ANOMALY,
    "schema_evolution": _ORACLE_SCHEMA_EVOLUTION,
    "hist_quantiles": _ORACLE_HIST_QUANTILES,
    "hist_drift": _ORACLE_HIST_DRIFT,
    "rolling_active": _ORACLE_ROLLING_ACTIVE,
    "hll_distinct": _ORACLE_HLL_DISTINCT,
    "cms_counts": _ORACLE_CMS_COUNTS,
    "zorder_layout": _ORACLE_ZORDER_LAYOUT,
    "profile_table": _ORACLE_PROFILE_TABLE,
    "sequence_pattern": _ORACLE_SEQUENCE_PATTERN,
    "streaming_hll": _ORACLE_HLL_DISTINCT,
    "streaming_hist": _ORACLE_STREAMING_HIST,
    "priority_dedup": _ORACLE_PRIORITY_DEDUP,
    "contrastive_triplets": _ORACLE_CONTRASTIVE_TRIPLETS,
    "curriculum_shards": _ORACLE_CURRICULUM_SHARDS,
    "curriculum_packing": _ORACLE_CURRICULUM_PACKING,
    "winnow_fingerprints": _ORACLE_WINNOW_FINGERPRINTS,
    "winnow_pairs": _ORACLE_WINNOW_PAIRS,
    "encode_token_ids": _ORACLE_ENCODE_TOKEN_IDS,
    "quality_ensemble": _ORACLE_QUALITY_ENSEMBLE,
    "session_sequences": _ORACLE_SESSION_SEQUENCES,
    "dup_line_signals": _ORACLE_DUP_LINE_SIGNALS,
    "iqr_outliers": _ORACLE_IQR_OUTLIERS,
    "funnel_conversion": _ORACLE_FUNNEL_CONVERSION,
    "embedding_covariance": _ORACLE_EMBEDDING_COVARIANCE,
    # the foreachBatch absorb must equal the full-corpus covariance —
    # same oracle as the one-shot query BY DESIGN (moments are additive)
    "streaming_covariance": _ORACLE_EMBEDDING_COVARIANCE,
    "bpe_merges": _ORACLE_BPE_MERGES,
    # the vocab-scale driver-side tier replays the SAME 6-round oracle
    # as the relational trainer — the window certifies tier agreement
    "bpe_fast_merges": _ORACLE_BPE_MERGES,
    # ...and the fast encoder replays the relational apply_merges oracle
    "bpe_encode_fast": _ORACLE_BPE_ENCODE_NEW,
    "bpe_segment": _ORACLE_BPE_SEGMENT,
    "streaming_iqr_gate": _ORACLE_STREAMING_IQR_GATE,
    "bpe_encode": _ORACLE_BPE_ENCODE,
    "cohort_retention": _ORACLE_COHORT_RETENTION,
    "incremental_covariance": _ORACLE_EMBEDDING_COVARIANCE,
    "kmv_distinct": _ORACLE_KMV_DISTINCT,
    "pivot_report": _ORACLE_PIVOT_REPORT,
    "asof_forward": _ORACLE_ASOF_FORWARD,
    "bpe_encode_new": _ORACLE_BPE_ENCODE_NEW,
    "streaming_kmv": _ORACLE_KMV_DISTINCT,
    "window_dist": _ORACLE_WINDOW_DIST,
    "c4_line_filter": _ORACLE_C4_LINE_FILTER,
    "line_dedup": _ORACLE_LINE_DEDUP,
    "lm_scores_foreign": _ORACLE_LM_SCORES_FOREIGN,
    "lm_scores_bigram": _ORACLE_LM_SCORES_BIGRAM,
    "nb_classify": _ORACLE_NB_CLASSIFY,
    "repetition_scores": _ORACLE_REPETITION_SCORES,
    "curation_pipeline": _ORACLE_CURATION_PIPELINE,
    "streaming_join": _ORACLE_STREAMING_JOIN,
    "streaming_tumbling": _ORACLE_STREAMING_TUMBLING,
    # streaming_upsert finishes as the batch MERGE result: same oracle.
    "streaming_upsert": _ORACLE_MERGE_UPSERT,
    "streaming_sliding": _ORACLE_STREAMING_SLIDING,
    "streaming_dedup": _ORACLE_STREAMING_DEDUP,
    "streaming_stateful": _ORACLE_STREAMING_STATEFUL,
    "streaming_incremental_dedup": _ORACLE_STREAMING_INCREMENTAL_DEDUP,
    # append mode emits exactly the watermark-closed sessions, which is
    # deterministic once the stream is driven to completion — replayed
    # as a gaps-and-islands CTE + watermark filter.
    "streaming_session": _ORACLE_STREAMING_SESSION,
    # html_clean: rows-only (python HTMLParser UDF semantics aren't
    # SQL-expressible) — covered by pytest instead.
    "skyline_customers": _ORACLE_SKYLINE_CUSTOMERS,
    "target_encode": _ORACLE_TARGET_ENCODE,
    "impute_missing": _ORACLE_IMPUTE_MISSING,
    "pit_join": _ORACLE_PIT_JOIN,
    "attribution": _ORACLE_ATTRIBUTION,
    "bfs_reachability": _ORACLE_BFS_REACHABILITY,
    "ivm_aggregate": _ORACLE_IVM_AGGREGATE,
    # exact integer mergeability: the streamed end-state replays the
    # batch twin's full-recompute oracle in any batching
    "streaming_ivm": _ORACLE_IVM_AGGREGATE,
    "entity_resolution": _ORACLE_ENTITY_RESOLUTION,
    "k_anonymity": _ORACLE_K_ANONYMITY,
    "quantile_calibration": _ORACLE_QUANTILE_CALIBRATION,
    "event_transitions": _ORACLE_EVENT_TRANSITIONS,
    "rfm_segments": _ORACLE_RFM_SEGMENTS,
    "scd3_apply": _ORACLE_SCD3_APPLY,
    "surrogate_keys": _ORACLE_SURROGATE_KEYS,
    "fk_integrity": _ORACLE_FK_INTEGRITY,
    "shortest_paths": _ORACLE_SHORTEST_PATHS,
    "revenue_trend": _ORACLE_REVENUE_TREND,
    # user-complete batches + exact count mergeability: the streamed
    # end-state replays the batch twin's oracle in any batching
    "streaming_transitions": _ORACLE_EVENT_TRANSITIONS,
    # the carried-state tier is exact under ADVERSARIAL interleaving
    # (users split mid-sequence across batches) — same oracle, zero
    # layout preconditions
    "streaming_transitions_state": _ORACLE_EVENT_TRANSITIONS,
    "cc_star": _ORACLE_CC_STAR,
    "merge_fileskip": _ORACLE_MERGE_FILESKIP,
    "merge_dv": _ORACLE_MERGE_DV,
    "column_prune": _ORACLE_COLUMN_PRUNE,
    "streaming_versioned": _ORACLE_MERGE_UPSERT,
    "versioned_evolve": _ORACLE_VERSIONED_EVOLVE,
    "merge_sync": _ORACLE_MERGE_SYNC,
    "versioned_zorder": _ORACLE_VERSIONED_ZORDER,
    "restore_table": _ORACLE_RESTORE_TABLE,
    "point_lookup": _ORACLE_POINT_LOOKUP,
    "compact_binpack": _ORACLE_COMPACT_BINPACK,
    "merge_arms": _ORACLE_MERGE_ARMS,
    "merge_arms_dv": _ORACLE_MERGE_ARMS_DV,
    "merge_arms_sync": _ORACLE_MERGE_ARMS_SYNC,
    "table_history": _ORACLE_TABLE_HISTORY,
    "streaming_cdf": _ORACLE_STREAMING_CDF,
    "table_replication": _ORACLE_TABLE_REPLICATION,
    "rebucket": _ORACLE_REBUCKET,
    "constraint_gate": _ORACLE_CONSTRAINT_GATE,
    "shallow_clone": _ORACLE_SHALLOW_CLONE,
    "as_of_timestamp": _ORACLE_AS_OF_TIMESTAMP,
    "tagged_read": _ORACLE_TAGGED_READ,
    "data_health": _ORACLE_DATA_HEALTH,
    "rrf_fusion": _ORACLE_RRF_FUSION,
    "time_travel": _ORACLE_TIME_TRAVEL,
    "version_diff": _ORACLE_VERSION_DIFF,
    "retrieval_ndcg": _ORACLE_RETRIEVAL_NDCG,
    "l_diversity": _ORACLE_L_DIVERSITY,
    "readability": _ORACLE_READABILITY,
    "interval_join": _ORACLE_INTERVAL_JOIN,
    "winsorize": _ORACLE_WINSORIZE,
    "robust_zscore": _ORACLE_ROBUST_ZSCORE,
    "stratified_sample": _ORACLE_STRATIFIED_SAMPLE,
    "python_datasource": _ORACLE_PYTHON_DATASOURCE,
    "media_dedup": _ORACLE_MEDIA_DEDUP,
    "spatial_join": _ORACLE_SPATIAL_JOIN,
    "table_reconcile": _ORACLE_TABLE_RECONCILE,
    "benford_audit": _ORACLE_BENFORD_AUDIT,
    # additive summary over disjoint rows: the streamed held state
    # equals the one-shot scan, so the batch oracle replays the drill
    "streaming_reconcile": _ORACLE_TABLE_RECONCILE,
    "basket_rules": _ORACLE_BASKET_RULES,
    "sql_table_meta": _ORACLE_SQL_TABLE_META,
    "optimize_zorder_sql": _ORACLE_OPTIMIZE_ZORDER_SQL,
    "table_changes_ts": _ORACLE_TABLE_CHANGES_TS,
    "sql_ctas_insert": _ORACLE_SQL_CTAS_INSERT,
    "table_changes_delta": _ORACLE_TABLE_CHANGES_DELTA,
    "column_mapping": _ORACLE_COLUMN_MAPPING,
    "reorg_purge": _ORACLE_REORG_PURGE,
    "schema_evolution_merge": _ORACLE_SCHEMA_EVOLUTION_MERGE,
    "scoped_optimize": _ORACLE_SCOPED_OPTIMIZE,
    "concurrent_commits": _ORACLE_CONCURRENT_COMMITS,
}
