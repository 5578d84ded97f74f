"""Sessionization over the events stream (gaps-and-islands).

Batch implementation: two windows per user — a lag to flag session
starts (gap > 30 min), a running sum to number sessions — then a group
by (user, session). Partitioned by user_id, so the shuffle is one
exchange on the natural key and each user's timeline sorts locally;
no global sort anywhere. At 100 TB this is the standard pattern: state
never leaves the per-key partition.

The streaming twin (applyInPandasWithState) lives in
streaming/sessions.py; tests assert the two agree on closed sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mini_log_lakehouse_spark.sources.registry import load_table

SESSION_GAP_MINUTES = 30


def with_session_ids(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = SESSION_GAP_MINUTES,
) -> DataFrame:
    """THE gaps-and-islands session-id definition, shared by every
    consumer (sessionize, funnels.session_funnel; the streaming twin
    folds the same rule in µs): events plus a per-user ``session_id``.

    The gap compares MICROSECOND epochs (unix_micros), exactly matching
    the oracle's timestamp-interval comparison and the streaming
    sessionizer's µs state. (An earlier form compared second-truncated
    casts, which agrees with the exact rule only while no per-user gap
    lands inside the 1-second truncation window around the boundary —
    true of current testdata, but a regenerated corpus could flip it.)"""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(
        F.lag(F.col(ts_col)).over(w)
    )
    new_session = F.when(
        gap_us.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("__new", new_session).withColumn(
        "session_id", F.sum("__new").over(run).cast("long")
    ).drop("__new")


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = SESSION_GAP_MINUTES,
) -> DataFrame:
    """Per-session rows: (user, session_id, start, end, n_events)."""
    with_ids = with_session_ids(events, user_col, ts_col, gap_minutes)
    return (
        with_ids.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: all sessions with a 30-min gap rule."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return sessionize(ev).orderBy("user_id", "session_id")


def user_session_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: per-user session statistics."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    s = sessionize(ev)
    return (
        s.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.max("n_events").cast("long").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


def sql_session_ids_cte(extra_cols: str = "", where: str = "TRUE") -> str:
    """The session-id rule as reusable SQL CTEs (``e``→``flagged``→
    ``ids``), in lockstep with with_session_ids — every oracle that
    needs session boundaries interpolates THIS, so the gap rule exists
    in exactly two places (one Spark, one SQL), both parameterized by
    SESSION_GAP_MINUTES. ``extra_cols`` carries additional event
    columns through (e.g. ``, event_type``); ``where`` pre-filters the
    event rows (session boundaries are computed AFTER the filter)."""
    return f"""
    e AS (
        SELECT user_id{extra_cols}, CAST(ts AS TIMESTAMP) AS ts FROM events
        WHERE {where}
    ),
    flagged AS (
        SELECT user_id{extra_cols}, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MINUTES} MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    ids AS (
        SELECT user_id{extra_cols}, ts,
               CAST(SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM flagged
    )"""


_SESSIONS_SQL = f"""
    WITH {sql_session_ids_cte()}
    SELECT user_id, session_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM ids
    GROUP BY 1, 2
"""

ORACLES: dict[str, str] = {
    "user_sessions": f"{_SESSIONS_SQL} ORDER BY user_id, session_id",
    "user_session_summary": f"""
        WITH sessions AS ({_SESSIONS_SQL})
        SELECT user_id,
               COUNT(*) AS n_sessions,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               CAST(MAX(n_events) AS BIGINT) AS max_session_events
        FROM sessions
        GROUP BY 1
        ORDER BY user_id
    """,
}

QUERIES = {
    "user_sessions": user_sessions,
    "user_session_summary": user_session_summary,
}
