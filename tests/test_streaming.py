"""Streaming extension tests: incremental ingest equals batch ingest,
the streaming hourly fact equals the batch aggregation, and the stateful
sessionizer's closed sessions equal batch sessionization minus each
user's final (still-open) session."""

from __future__ import annotations

from pyspark.sql import functions as F

from mini_log_lakehouse_spark.operators.sessions import sessionize
from mini_log_lakehouse_spark.sources.logs import parse_logs, read_bronze
from mini_log_lakehouse_spark.sources.registry import load_table
from mini_log_lakehouse_spark.streaming.ingest import stream_ingest_logs
from mini_log_lakehouse_spark.streaming.sessions import stream_closed_sessions

FIXTURE_DIR = "tests/fixtures"


def test_stream_ingest_matches_batch(spark, tmp_path):
    bronze = str(tmp_path / "bronze_stream")
    ckpt = str(tmp_path / "ckpt")
    stream_ingest_logs(spark, FIXTURE_DIR, bronze, ckpt)
    streamed = read_bronze(spark, bronze)
    batch = parse_logs(spark, f"{FIXTURE_DIR}/nginx_access.log")
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.select(*streamed.columns).collect())
    )

    # incremental: a second availableNow run with no new files adds nothing
    stream_ingest_logs(spark, FIXTURE_DIR, bronze, ckpt)
    assert read_bronze(spark, bronze).count() == 7


def test_streaming_hourly_fact_matches_batch(spark, sf_dir):
    from mini_log_lakehouse_spark.streaming.ingest import stream_hourly_fact

    streamed = stream_hourly_fact(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(
            F.to_date("ts").alias("date"),
            F.date_format("ts", "HH").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("requests"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("errors"),
        )
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, batch.collect()))


def test_stateful_sessions_match_batch(spark, sf_dir):
    closed = stream_closed_sessions(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    batch = sessionize(ev)
    # streaming emits only CLOSED sessions; each user's last session stays
    # open in state, so batch minus last-per-user == streamed closed set.
    last = batch.groupBy("user_id").agg(F.max("session_id").alias("session_id"))
    batch_closed = batch.join(last, ["user_id", "session_id"], "left_anti").select(
        "user_id", "session_start", "session_end", "n_events"
    )
    assert sorted(map(tuple, closed.collect())) == sorted(
        map(tuple, batch_closed.collect())
    )
