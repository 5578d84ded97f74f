from mini_log_lakehouse_spark.plans.models import (
    build_stg_logs,
    build_dim_client,
    build_dim_endpoint,
    build_fct_requests_hourly,
)
from mini_log_lakehouse_spark.plans.pipeline import run_pipeline
from mini_log_lakehouse_spark.plans.quality import run_quality_checks

__all__ = [
    "build_stg_logs",
    "build_dim_client",
    "build_dim_endpoint",
    "build_fct_requests_hourly",
    "run_pipeline",
    "run_quality_checks",
]
