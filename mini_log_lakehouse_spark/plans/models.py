"""Warehouse models: silver staging + gold star schema.

Rebuilds the reference's dbt DAG (stg_logs -> {dim_client, dim_endpoint,
fct_requests_hourly}; reference dbt_project/models/) as pure DataFrame
functions. Each takes its upstream DataFrame and returns a lazy plan;
materialization is the caller's choice (``materialize``), mirroring dbt's
view-vs-table configs (reference dbt_project/dbt_project.yml:9-12).

Scale notes:
- the fact build is one hash-aggregate with map-side partial aggregation;
  grain (date, hour, endpoint) has bounded cardinality so the reduce side
  is tiny regardless of input size.
- ``percentile`` here is Spark's *exact* interpolated percentile to match
  DuckDB's ``percentile_cont`` bit-for-bit (reference
  fct_requests_hourly.sql:8). Exact percentile needs the group's values
  collected per reducer; at 100 TB with this bounded grain that is still
  fine, but for high-cardinality grains switch ``approx=True`` (t-digest
  style ``percentile_approx``, fully streaming/mergeable).
- dims are global DISTINCTs: partial-dedup map-side then a small shuffle
  of unique values only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_stg_logs(bronze: DataFrame) -> DataFrame:
    """Silver staging model (reference dbt stg_logs.sql:7-16).

    Bronze already carries correctly-typed columns; staging re-selects the
    published column set, recasts defensively (the reference re-casts
    because DuckDB *infers* parquet schemas), and converts the bronze
    string ``date`` partition key into a proper DATE.
    """
    return bronze.select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("status").cast("int").alias("status"),
        F.col("bytes_sent").cast("long").alias("bytes_sent"),
        F.substring_index("request_path", "?", 1).alias("endpoint"),
        "client_ip",
        "user_agent",
        F.to_date("ts").alias("date"),
        F.date_format("ts", "HH").alias("hour"),
        F.when(F.col("status") >= 400, F.lit(1)).otherwise(F.lit(0)).alias("is_error"),
    )


def build_dim_client(stg_logs: DataFrame) -> DataFrame:
    """dim_client (reference dim_client.sql:1): distinct (client_ip, user_agent)."""
    return stg_logs.select(
        F.col("client_ip").alias("client_id"), "user_agent"
    ).distinct()


def build_dim_endpoint(stg_logs: DataFrame) -> DataFrame:
    """dim_endpoint (reference dim_endpoint.sql:1): distinct endpoint."""
    return stg_logs.select("endpoint").distinct()


def build_fct_requests_hourly(stg_logs: DataFrame, approx: bool = False) -> DataFrame:
    """fct_requests_hourly (reference fct_requests_hourly.sql:1-12).

    Grain (date, hour, endpoint); measures requests, errors, p95_bytes.
    """
    p95 = (
        F.percentile_approx("bytes_sent", F.lit(0.95)).cast("double")
        if approx
        else F.percentile("bytes_sent", F.lit(0.95))
    )
    return stg_logs.groupBy("date", "hour", "endpoint").agg(
        F.count(F.lit(1)).alias("requests"),
        F.sum("is_error").cast("long").alias("errors"),
        p95.alias("p95_bytes"),
    )


def materialize(
    df: DataFrame, name: str, as_table: bool = False, format: str | None = None
) -> DataFrame:
    """S6/S7: dbt-style materialization.

    ``as_table=True`` -> managed table (CTAS); else a temp view. Returns
    the re-read table (for CTAS) so downstream models read the
    materialized data, exactly like dbt's ``ref()``.

    ``format`` plugs the table format per the north star (Delta when the
    runtime is importable, parquet otherwise — this container ships no
    Delta/Iceberg jars and no network; see plans/lakehouse.py for the
    full managed-table layer: MERGE, time travel, compaction)."""
    spark = df.sparkSession
    if as_table:
        if format is None:
            from mini_log_lakehouse_spark.plans.lakehouse import delta_available

            format = "delta" if delta_available() else "parquet"
        df.write.format(format).mode("overwrite").saveAsTable(name)
        return spark.table(name)
    df.createOrReplaceTempView(name)
    return spark.table(name)
