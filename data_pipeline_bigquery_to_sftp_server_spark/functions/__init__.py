"""Scalar + text function library (SURVEY §2.8 F1-F18, §2.11 X5)."""

from data_pipeline_bigquery_to_sftp_server_spark.functions import scalar, text  # noqa: F401
