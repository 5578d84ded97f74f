"""Pipeline DAG (SURVEY.md §2.12): etl -> build models -> quality checks.

The reference orchestrates subprocesses with Prefect
(reference orchestration/flow.py:29-32) and dbt resolves model order from
``ref()`` edges. Here the DAG is plain Python in topological order —
stg_logs -> {dim_client, dim_endpoint, fct_requests_hourly} — with every
step a lazy DataFrame; only materialization points trigger jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mini_log_lakehouse_spark.sources.logs import parse_logs, read_bronze, write_bronze
from mini_log_lakehouse_spark.plans.models import (
    build_dim_client,
    build_dim_endpoint,
    build_fct_requests_hourly,
    build_stg_logs,
)
from mini_log_lakehouse_spark.plans.quality import (
    assert_all_passed,
    run_quality_checks,
)


def run_pipeline(
    spark: SparkSession,
    raw_path: str,
    bronze_root: str,
    fail_on_quality: bool = True,
) -> dict[str, DataFrame]:
    """X1-X4: full batch pipeline; returns the built model DataFrames."""
    # X1: ETL (bronze). One distributed write; no shuffle.
    write_bronze(parse_logs(spark, raw_path), bronze_root)

    # X2a: models, in ref() order.
    stg = build_stg_logs(read_bronze(spark, bronze_root))
    models = {
        "stg_logs": stg,
        "dim_client": build_dim_client(stg),
        "dim_endpoint": build_dim_endpoint(stg),
        "fct_requests_hourly": build_fct_requests_hourly(stg),
    }
    # X2b: quality gates (dbt-test semantics — fail iff violating rows).
    results = run_quality_checks({n: models[n] for n in ("stg_logs", "fct_requests_hourly")})
    if fail_on_quality:
        assert_all_passed(results)
    return models
