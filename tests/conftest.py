from __future__ import annotations

import pytest

from mini_log_lakehouse_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="mini-log-lakehouse-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
