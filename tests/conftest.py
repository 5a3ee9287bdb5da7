import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_bigquery_to_sftp_server_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark(app_name="tests", shuffle_partitions=8)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
