"""Serving error contract (reference serve/api.py): 400 on malformed
date, limit clamped to [1, 100], /health ok vs 500 when the warehouse
table is missing."""

from __future__ import annotations

import pytest

from mini_log_lakehouse_spark.operators.serve import (
    ServeError,
    clamp_limit,
    health,
    top_endpoints,
    validate_date,
)


def test_validate_date_accepts_and_canonicalizes():
    assert validate_date("2025-11-10") == "2025-11-10"


@pytest.mark.parametrize("bad", ["2025/11/10", "10-11-2025", "2025-13-01", "nope", "", None])
def test_validate_date_400(bad):
    with pytest.raises(ServeError) as e:
        validate_date(bad)
    assert e.value.status == 400


def test_clamp_limit_bounds():
    assert clamp_limit(10) == 10
    assert clamp_limit(0) == 1
    assert clamp_limit(10_000) == 100
    with pytest.raises(ServeError) as e:
        clamp_limit("ten")
    assert e.value.status == 400


def test_bad_date_rejected_before_any_job(spark):
    # the DataFrame-building function itself raises — no Spark job runs
    with pytest.raises(ServeError) as e:
        top_endpoints(spark.range(0), "not-a-date")
    assert e.value.status == 400


def test_health_contract(spark):
    spark.range(1).createOrReplaceTempView("fct_requests_hourly")
    try:
        assert health(spark)["status"] == "ok"
    finally:
        spark.catalog.dropTempView("fct_requests_hourly")
    with pytest.raises(ServeError) as e:
        health(spark, warehouse_probe="definitely_missing_table")
    assert e.value.status == 500
