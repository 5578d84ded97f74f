from __future__ import annotations

import pytest

from mini_log_lakehouse_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    spark = get_spark(
        app_name="mini-log-lakehouse-tests",
        master="local[4]",
        shuffle_partitions=4,
        # static conf: managed test tables (bucketing demos etc.) must not
        # land in the repo's ./spark-warehouse
        extra_conf={
            "spark.sql.warehouse.dir": str(tmp_path_factory.mktemp("warehouse"))
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
