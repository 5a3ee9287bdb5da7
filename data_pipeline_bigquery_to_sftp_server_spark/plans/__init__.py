"""Plan-inspection helpers."""

from data_pipeline_bigquery_to_sftp_server_spark.plans.explain import (  # noqa: F401
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
)
