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


SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_dir_med():
    """The mid-scale fixture dir — for tests that need enough rows for
    cluster structure (sf0.001's 50 embeddings can't exercise k=8
    multi-probe k-means meaningfully)."""
    return SF_DIR_MED
