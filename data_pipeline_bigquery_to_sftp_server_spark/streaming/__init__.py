"""Structured Streaming surface (SURVEY §2.9 / §2.11 X7)."""

from data_pipeline_bigquery_to_sftp_server_spark.streaming import stateful, windows  # noqa: F401
