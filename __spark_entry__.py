"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (errors-by-type, the reference's
errors_by_endpoint shape, reference serve/api.py:33-41) on sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2, each Spark callable paired with a DuckDB oracle; pairs are
defined side-by-side in mini_log_lakehouse_spark/operators/*.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mini_log_lakehouse_spark.entry_registry import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mini_log_lakehouse_spark.operators.events import errors_by_type

    return errors_by_type(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
