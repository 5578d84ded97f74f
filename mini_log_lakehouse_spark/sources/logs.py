"""Nginx access-log source: text lines -> typed bronze DataFrame.

Capability parity with the reference ETL (reference etl/ingest_logs.py:8-30
parse, 40-53 materialize, 58-61 derive, 63-70 partitioned sink), re-expressed
as one lazy DataFrame chain so Catalyst fuses parse+derive into a single
WholeStageCodegen stage and the write distributes across executors:

    text -> filter(non-blank) -> filter(regex match) -> regexp_extract ×7
         -> typed casts -> derived cols -> write.partitionBy("date")

Semantics preserved exactly (for oracle parity):
- unparseable / blank lines silently dropped, never fail the job
- timestamp: TZ offset *discarded* before parse (naive local time)
- ``bytes`` field ``-`` coerced to 0
- ``date`` is a *string* ``YYYY-MM-DD`` at bronze (it is the partition key)
- ``hour`` is a zero-padded string ``"00".."23"``
- ``endpoint`` is the request path before any ``?``

Scale notes: a regex over a text scan is embarrassingly parallel — no
shuffle anywhere in this plan; each input split parses and writes its own
partition files. At 100 TB you'd raise ``spark.sql.files.maxPartitionBytes``
and let dynamic partition overwrite handle incremental daily loads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mini_log_lakehouse_spark.session import tune

#: Tolerant Nginx "combined" grammar (same language as the reference's
#: parser, reference etl/ingest_logs.py:8-12):
#:   ip - - [ts] "METHOD path proto" status bytes|- "referrer" "ua"
#: Java regex (JVM-side regexp_extract), one capture group per field.
LOG_REGEX = (
    r"^(\S+)\s+\S+\s+\S+\s+\[([^\]]+)\]\s+"
    r'"(\S+)\s+(\S+)\s+([^"]+)"\s+'
    r'(\d{3})\s+(\d+|-)\s+"[^"]*"\s+"([^"]*)"$'
)

# Capture-group ordinals.
_G_IP, _G_TS, _G_METHOD, _G_PATH, _G_PROTO, _G_STATUS, _G_BYTES, _G_UA = range(1, 9)

#: Explicit bronze schema (SURVEY.md §1.3: schema inference is a correctness
#: hazard at scale — one all-null/empty partition flips a type or breaks the
#: read entirely). ``date`` last: it is the Hive partition column.
BRONZE_SCHEMA = T.StructType(
    [
        T.StructField("client_ip", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("request_path", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("bytes_sent", T.LongType()),
        T.StructField("user_agent", T.StringType()),
        T.StructField("hour", T.StringType()),
        T.StructField("endpoint", T.StringType()),
        T.StructField("is_error", T.IntegerType()),
        T.StructField("date", T.StringType()),
    ]
)

BRONZE_COLUMNS = tuple(f.name for f in BRONZE_SCHEMA.fields)


def read_raw_lines(spark: SparkSession, path: str) -> DataFrame:
    """S1: line source; blank lines skipped (reference etl/ingest_logs.py:43-44)."""
    tune(spark)
    return spark.read.text(path).filter(F.trim("value") != "")


def _extract(g: int) -> Column:
    return F.regexp_extract("value", LOG_REGEX, g)


def parse_lines(lines: DataFrame) -> DataFrame:
    """S2 + derives: regex parse into the typed bronze schema.

    Non-matching lines are dropped (tolerant semantics, reference
    etl/ingest_logs.py:16-17). All expressions are built-in — the whole
    parse runs JVM-side inside one codegen stage, no Python boundary.
    """
    matched = lines.filter(F.regexp_like("value", F.lit(LOG_REGEX)))
    # "10/Nov/2025:10:21:34 +0530" -> drop the offset, parse naive
    # (reference etl/ingest_logs.py:19-20).
    ts = F.to_timestamp(
        F.substring_index(_extract(_G_TS), " ", 1), "dd/MMM/yyyy:HH:mm:ss"
    )
    bytes_raw = _extract(_G_BYTES)
    status = _extract(_G_STATUS).cast("int")
    return matched.select(
        _extract(_G_IP).alias("client_ip"),
        ts.alias("ts"),
        _extract(_G_PATH).alias("request_path"),
        status.alias("status"),
        # '-' -> 0 (reference etl/ingest_logs.py:21-22)
        F.when(bytes_raw == "-", F.lit(0))
        .otherwise(bytes_raw.cast("long"))
        .alias("bytes_sent"),
        _extract(_G_UA).alias("user_agent"),
        # bronze 'date' is a STRING partition key (reference etl/ingest_logs.py:58)
        F.date_format(ts, "yyyy-MM-dd").alias("date"),
        F.date_format(ts, "HH").alias("hour"),
        F.substring_index(_extract(_G_PATH), "?", 1).alias("endpoint"),
        F.when(status >= 400, F.lit(1)).otherwise(F.lit(0)).alias("is_error"),
    )


def parse_logs(spark: SparkSession, path: str) -> DataFrame:
    """Full bronze plan: raw text file(s) -> typed DataFrame (lazy)."""
    return parse_lines(read_raw_lines(spark, path))


def write_bronze(
    df: DataFrame, out_root: str, mode: str = "overwrite", batch_id: str = "full"
) -> None:
    """S3: Hive-style partitioned parquet sink, ``ingest_batch=<id>/
    date=<d>/`` (reference etl/ingest_logs.py:63-70 writes date=<d>/ dirs
    one by one; Spark's partitionBy does the same layout in one
    distributed write).

    The extra ``ingest_batch`` partition level is what makes incremental
    loads REPLAY-IDEMPOTENT: ``mode="append"`` is implemented as a
    *dynamic partition overwrite* scoped to the batch's own
    (ingest_batch, date) partitions — a microbatch re-run after a
    mid-batch failure (e.g. foreachBatch, which is at-least-once)
    overwrites exactly the files it wrote last time instead of
    double-appending them. Callers that can replay MUST pass a
    deterministic ``batch_id`` (the streaming checkpoint's batch id, a
    source-path digest, ...); a fresh id per run degrades to plain
    append semantics. ``mode="overwrite"`` is the full rebuild: a static
    overwrite that replaces the whole bronze root."""
    writer = df.withColumn("ingest_batch", F.lit(str(batch_id))).write.partitionBy(
        "ingest_batch", "date"
    )
    if mode == "append":
        writer = writer.mode("overwrite").option("partitionOverwriteMode", "dynamic")
    else:
        writer = writer.mode(mode)
    writer.parquet(out_root)


def read_bronze(spark: SparkSession, out_root: str) -> DataFrame:
    """S4: partitioned scan; partition discovery restores the ``date``
    column (the reference globs date=*/ in stg_logs.sql:5) and the
    ``ingest_batch`` load bookkeeping level, which is dropped — it is
    physical layout, not data.

    The explicit schema (a) survives an empty bronze directory — zero
    parsed rows then fails the *quality gate* with a clear message instead
    of UNABLE_TO_INFER_SCHEMA — and (b) skips footer-based schema
    inference/merging, which at 100 TB is a driver-side metadata storm.
    """
    tune(spark)
    return spark.read.schema(BRONZE_SCHEMA).parquet(out_root).drop("ingest_batch")
