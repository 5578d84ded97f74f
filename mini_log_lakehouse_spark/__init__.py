"""mini_log_lakehouse_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the capability surface of the
reference log-lakehouse (Bhargavvxx/mini-log-lakehouse): raw Nginx access
logs -> partitioned bronze parquet -> silver/gold star schema -> serving
queries — plus a generalized relational operator surface (joins, windows,
set ops), Structured Streaming ingest, and LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing), all
expressed declaratively with the DataFrame API so Catalyst/Tungsten pick
the physical strategy.

Layout:
    session     — SparkSession factory + runtime tuning for foreign sessions
    sources/    — text-log source, testdata registry, partitioned parquet IO
    plans/      — lakehouse models (stg/dim/fct), pipeline DAG, quality gates
    operators/  — serving queries, joins, windows, set ops, dedup, similarity,
                  text analysis, multimodal plumbing
    functions/  — reusable column-expression helpers (vector math, text)
    streaming/  — Structured Streaming ingest + incremental hourly fact
"""

__version__ = "0.1.0"
