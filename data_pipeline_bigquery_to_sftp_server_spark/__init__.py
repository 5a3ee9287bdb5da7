"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL job (HiZweli2/Data-pipeline-Bigquery-to-sftp-server),
re-expressed Spark-first, plus LLM-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis) designed for
100 TB scale.

Layout
------
- ``session``    : SparkSession builder (UTC, AQE, Arrow).
- ``catalog``    : load the harness parquet tables as DataFrames/views.
- ``sources``    : file readers/writers, REST page-scan and SFTP adapters.
- ``functions``  : scalar expression library (reference transform parity)
                   and text-analysis functions.
- ``operators``  : relational wrappers, MERGE/upsert, dedup, similarity,
                   multimodal.
- ``plans``      : plan-inspection helpers (pushdown/broadcast assertions).
- ``streaming``  : Structured Streaming surface (windows, watermark,
                   streaming upsert).
"""

from data_pipeline_bigquery_to_sftp_server_spark.session import get_spark  # noqa: F401

__all__ = ["get_spark"]
__version__ = "0.1.0"
