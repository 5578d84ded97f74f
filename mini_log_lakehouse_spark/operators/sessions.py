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


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = SESSION_GAP_MINUTES,
) -> DataFrame:
    """Per-session rows: (user, session_id, start, end, n_events)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col)).over(w).cast("long")
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_ids = events.withColumn("__new", new_session).withColumn(
        "session_id", F.sum("__new").over(run).cast("long")
    )
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


_SESSIONS_SQL = f"""
    WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MINUTES} MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    ids AS (
        SELECT user_id, ts,
               CAST(SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM flagged
    )
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
