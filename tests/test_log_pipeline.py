"""Golden end-to-end test of the log pipeline on the reference's 7-line
fixture (FIXTURES.md §A): expected stg_logs = 7 rows, fct = 6 groups,
dim_client = 2, dim_endpoint = 3.
"""

from __future__ import annotations

import datetime

import pytest

from mini_log_lakehouse_spark.operators import serve
from mini_log_lakehouse_spark.plans.pipeline import run_pipeline
from mini_log_lakehouse_spark.plans.quality import run_quality_checks

FIXTURE = "tests/fixtures/nginx_access.log"


@pytest.fixture(scope="module")
def models(spark, tmp_path_factory):
    bronze = str(tmp_path_factory.mktemp("bronze"))
    return run_pipeline(spark, FIXTURE, bronze)


def test_stg_logs_golden(models):
    stg = models["stg_logs"]
    rows = {r["ts"]: r for r in stg.collect()}
    assert len(rows) == 7
    r = rows[datetime.datetime(2025, 11, 10, 10, 21, 34)]
    assert r["endpoint"] == "/api/v1/items"  # query string stripped
    assert r["status"] == 200 and r["is_error"] == 0
    assert r["bytes_sent"] == 1234
    assert r["date"] == datetime.date(2025, 11, 10)
    assert r["hour"] == "10"  # zero-padded string
    r2 = rows[datetime.datetime(2025, 11, 11, 12, 59, 59)]
    assert r2["status"] == 503 and r2["is_error"] == 1


def test_malformed_and_blank_lines_dropped(spark, tmp_path):
    from mini_log_lakehouse_spark.sources.logs import parse_logs

    p = tmp_path / "bad.log"
    p.write_text(
        "\n"
        "garbage line that does not match\n"
        '127.0.0.1 - - [10/Nov/2025:10:21:34 +0530] "GET /x HTTP/1.1" 200 - "-" "ua"\n'
    )
    out = parse_logs(spark, str(p)).collect()
    assert len(out) == 1
    assert out[0]["bytes_sent"] == 0  # '-' coerced


def test_fct_golden(models):
    fct = models["fct_requests_hourly"]
    rows = {(str(r["date"]), r["hour"], r["endpoint"]): r for r in fct.collect()}
    assert len(rows) == 6
    g = rows[("2025-11-10", "10", "/api/v1/items")]
    assert g["requests"] == 2 and g["errors"] == 0
    # exact interpolated p95 of [0, 1234] = 0 + 0.95*1234
    assert g["p95_bytes"] == pytest.approx(1172.3)
    g2 = rows[("2025-11-10", "11", "/auth/login")]
    assert g2["requests"] == 1 and g2["errors"] == 1 and g2["p95_bytes"] == 512.0


def test_dims_golden(models):
    # 3 distinct (client_ip, user_agent) pairs: 127.0.0.1 appears with both UAs
    assert models["dim_client"].count() == 3
    eps = {r["endpoint"] for r in models["dim_endpoint"].collect()}
    assert eps == {"/api/v1/items", "/auth/login", "/health"}


def test_quality_checks_pass(models):
    results = run_quality_checks(
        {n: models[n] for n in ("stg_logs", "fct_requests_hourly")}
    )
    assert results and all(r.passed for r in results)


def test_serving_queries(models):
    fct = models["fct_requests_hourly"]
    ebe = serve.errors_by_endpoint(fct, "2025-11-10").collect()
    assert [r["endpoint"] for r in ebe][:2] == ["/api/v1/items", "/auth/login"]
    by_ep = {r["endpoint"]: r for r in ebe}
    assert by_ep["/api/v1/items"]["requests"] == 3
    assert by_ep["/api/v1/items"]["errors"] == 1

    top = serve.top_endpoints(fct, "2025-11-10", limit=2).collect()
    assert len(top) == 2 and top[0]["endpoint"] == "/api/v1/items"

    dates = [str(r["date"]) for r in serve.available_dates(fct).collect()]
    assert dates == ["2025-11-10", "2025-11-11"]

    kpi = serve.kpi_totals(fct, "2025-11-10").collect()[0]
    assert kpi["total_requests"] == 5 and kpi["total_errors"] == 2
    assert kpi["error_rate_pct"] == pytest.approx(40.0)

    trend = serve.hourly_trend(fct, "2025-11-10").collect()
    assert [r["hour"] for r in trend] == ["10", "11", "12"]


def test_bronze_partition_pruning(spark, models, tmp_path):
    """The date filter must prune bronze partitions (PartitionFilters)."""
    from mini_log_lakehouse_spark.sources.logs import read_bronze, write_bronze, parse_logs
    import pyspark.sql.functions as F

    bronze_root = str(tmp_path / "bronze2")
    write_bronze(parse_logs(spark, FIXTURE), bronze_root)
    df = read_bronze(spark, bronze_root).filter(F.col("date") == "2025-11-10")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "2025-11-10" in plan
