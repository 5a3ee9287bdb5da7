"""Operator library (SURVEY §2.2-§2.7, §2.11)."""

from data_pipeline_bigquery_to_sftp_server_spark.operators import (  # noqa: F401
    asof,
    decontam,
    dedup,
    merge,
    multimodal,
    packing,
    relational,
    retrieval,
    sampling,
    scale,
    similarity,
    sketch,
    skew,
)
