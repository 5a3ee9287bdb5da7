"""Sources & sinks (SURVEY §2.1 S1-S10)."""

from data_pipeline_bigquery_to_sftp_server_spark.sources import files, rest, sftp  # noqa: F401
