"""The reference's end-to-end sync flow (SURVEY §3 E1/E3), re-expressed
as one lazy Spark pipeline:

    page-scan ids (S2) -> split new/existing vs target (J2/J3)
    -> distributed detail fetch (S3) -> declarative transform (P3 +
    §2.8 scalar layer) -> MERGE upsert (J1) -> report (A3/A4)

The reference executed this eagerly with driver-side sets and a thread
pool (main.py:391-471); here every stage is a DataFrame -> DataFrame
function and the only actions are the final write/report. The ticket
schema is the reference's 44-field transform distilled to its distinct
shapes (strings, epochs, bools, struct, array<struct>, JSON-string).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_bigquery_to_sftp_server_spark.functions import scalar
from data_pipeline_bigquery_to_sftp_server_spark.operators import merge, relational
from data_pipeline_bigquery_to_sftp_server_spark.sources import rest

# Raw shape as fetched from the API (reference main.py:179-194).
TICKET_RAW_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType(), False),
        T.StructField("subject", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("createdTimestamp", T.LongType(), True),
        T.StructField("updatedTimestamp", T.LongType(), True),
        T.StructField("deleted", T.BooleanType(), True),
        T.StructField("fromEmail", T.StringType(), True),
        T.StructField("fromName", T.StringType(), True),
        T.StructField("toEmails", T.ArrayType(T.StringType()), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("meta", T.StringType(), True),
        T.StructField("sendEmailFailureCount", T.LongType(), True),
        # list-of-dict field the reference flattens with str(list)
        # (main.py:305 `discounts`) — exercises the generalized py_repr.
        T.StructField(
            "discounts",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("code", T.StringType(), True),
                        T.StructField("amount", T.LongType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)


def transform_tickets(raw: DataFrame) -> DataFrame:
    """The reference transform (main.py:270-320) as one declarative
    select — every quirky rule from §2.8 applied:

    - epochs kept as strings AND derived datetime/date (0 -> NULL)
    - description HTML-cleaned, empty -> NULL
    - fromEmail -> struct{email,name}; toEmails -> array<struct>
    - tags flattened to a Python-repr string (lossy, main.py:301-305)
    - meta JSON round-tripped, empty -> NULL
    - bools coerced with False default; counts stringified
    """
    to_email_structs = scalar.map_to_structs(
        F.col("toEmails"),
        lambda e: F.struct(e.alias("email"), F.lit(None).cast("string").alias("name")),
    )
    return raw.select(
        F.col("_id"),
        scalar.to_str(F.col("subject")).alias("subject"),
        scalar.clean_html(F.col("description")).alias("description"),
        scalar.to_str(F.col("createdTimestamp")).alias("createdTimestamp"),
        scalar.seconds_to_readable(F.col("createdTimestamp")).alias("createdDatetime"),
        scalar.seconds_to_date_only(F.col("createdTimestamp")).alias("createdDate"),
        scalar.seconds_to_readable(F.col("updatedTimestamp")).alias("updatedDatetime"),
        scalar.bool_with_default(F.col("deleted")).alias("deleted"),
        scalar.email_struct(F.col("fromEmail"), F.col("fromName")).alias("fromEmail"),
        scalar.empty_array_to_null(to_email_structs).alias("toEmails"),
        scalar.py_list_str(F.col("tags")).alias("tags"),
        scalar.json_serialize(
            scalar.json_parse(F.col("meta"), "k STRING, v STRING")
        ).alias("meta"),
        scalar.to_str(scalar.default_on_missing(F.col("sendEmailFailureCount"), 0)).alias(
            "sendEmailFailureCount"
        ),
        # .get('discounts', []) default (main.py:301-305 pattern): a
        # missing list renders as '[]', not NULL.
        # KNOWN DIVERGENCE: the reference distinguishes an ABSENT key
        # (dict .get default -> '[]') from an explicit null value
        # (str(None) -> the reference would emit 'None' through to_str).
        # A DataFrame schema collapses absent-vs-null into one NULL, so
        # both render '[]' here. Same caveat applies to the tags and
        # toEmails defaults. Acceptable because the upstream API emits
        # the key as absent, never as an explicit null.
        scalar.py_repr(
            F.coalesce(
                F.col("discounts"),
                F.array().cast(TICKET_RAW_SCHEMA["discounts"].dataType),
            ),
            TICKET_RAW_SCHEMA["discounts"].dataType,
        ).alias("discounts"),
    )


def observed_transform(raw: DataFrame, name: str = "sync_stats"):
    """The reference's progress/summary counters (success/failed tallies
    and percent prints, main.py:323-329, 449-450, 463-469) re-expressed
    as a Spark ``Observation``: the metrics accumulate inside the ONE
    action that materializes the batch — no second scan, no driver-side
    loop over records.

    Returns ``(transformed_df, observation)``; read
    ``observation.get`` after any action on the returned frame. At
    100 TB a second counting pass over the input is a full extra scan —
    observations make the reference's reporting effectively free.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    staged = transform_tickets(raw).observe(
        obs,
        F.count(F.lit(1)).alias("processed"),
        F.sum(F.when(F.col("description").isNull(), 1).otherwise(0)).alias(
            "null_descriptions"
        ),
        F.sum(F.when(F.col("deleted"), 1).otherwise(0)).alias("deleted_count"),
    )
    return staged, obs


def sync_tickets(
    spark: SparkSession,
    target: DataFrame,
    page_fetcher: rest.PageFetcher,
    detail_fetcher: rest.DetailFetcher,
    key: str = "_id",
) -> tuple[DataFrame, DataFrame]:
    """Full sync: returns (merged_target, report). Lazy until acted on.

    Stage mapping to the reference (main.py:391-471): scan keys ->
    page scan -> new/existing split (logged there, computed here as
    real semi/anti DataFrames) -> distributed fetch -> transform ->
    upsert -> counts report.
    """
    api_ids = rest.scan_pages(spark, page_fetcher, id_field=key)
    existing = relational.distinct_keys(target, key)

    new_ids = relational.anti_join(api_ids, existing, key)
    existing_ids = relational.semi_join(api_ids, existing, key)

    raw = rest.fetch_details(api_ids, detail_fetcher, TICKET_RAW_SCHEMA, id_field=key)
    staged = transform_tickets(raw.where(F.col("subject").isNotNull() | F.col(key).isNotNull()))

    merged = merge.upsert_anti_union(target, staged, key)
    report = (
        new_ids.select(F.lit("inserted").alias("outcome"))
        .unionByName(existing_ids.select(F.lit("updated").alias("outcome")))
        .groupBy("outcome")
        .agg(F.count("*").alias("n"))
    )
    return merged, report
