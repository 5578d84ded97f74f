from __future__ import annotations

import os

import pytest

from mini_log_lakehouse_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def _slow_test_ids() -> set[str]:
    """Node ids listed in tests/slow_tests.txt — the ≥5 s cases from the
    pinned full-suite durations run (see that file's header)."""
    path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    ids: set[str] = set()
    if os.path.exists(path):
        with open(path) as fh:
            for line in fh:
                entry = line.split("#", 1)[0].strip()
                if entry:
                    ids.add(entry)
    return ids


def pytest_collection_modifyitems(config, items):
    """Driver-budget profile (VERDICT r15 ask 1): the full suite grew to
    ~39 min wall-clock and the driver's pytest budget times out around
    70% — a suite the driver cannot finish protects nothing. Tests
    marked ``slow`` or listed in tests/slow_tests.txt (the multi-second
    per-entry integration sweeps, each a broader re-check of invariants
    that faster tests already pin) are SKIPPED by default — visibly, as
    skips — so the default ``pytest tests/`` run fits the budget;
    ``SPARK_GRAFT_FULL_SUITE=1`` runs everything (the round-close ritual
    pins that full run — see FULL_SUITE_r16.log)."""
    if os.environ.get("SPARK_GRAFT_FULL_SUITE"):
        return
    slow_ids = _slow_test_ids()
    skip = pytest.mark.skip(
        reason="slow: excluded from the driver-budget run "
        "(SPARK_GRAFT_FULL_SUITE=1 runs it)"
    )
    for item in items:
        if "slow" in item.keywords or item.nodeid in slow_ids:
            item.add_marker(skip)


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
