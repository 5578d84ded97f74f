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


def session_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: for every purchase, credit
    the LAST non-purchase event in the same session before it ("what
    was the user doing when they converted"), aggregated to credited
    event_type × purchase count — the marketing-attribution query every
    product-analytics stack ships, composed from the shared session-id
    rule. Purchases opening a session get the explicit '(direct)'
    bucket, not a dropped row.

    Shape at 100 TB: one more window over the SAME (user × time) sort
    the session-id rule already shuffled for — Catalyst reuses the
    exchange; the aggregate is type-grain."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    sess = with_session_ids(ev.select("user_id", "event_type", "ts", "event_id"))
    w = (
        Window.partitionBy("user_id", "session_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        sess.withColumn("_prior", prior)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("_prior", F.lit("(direct)")).alias("credited_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"))
        .orderBy("credited_type")
    )


def event_burst_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length profile per event type: the longest streak of
    consecutive same-type events in any user's timeline, plus how many
    streaks reach length ≥ 3 — the burst/flood signal ("errors arrive
    in bursts, clicks arrive alone") behind rate-limiting and incident
    triage. Pure gaps-and-islands: island key = rn_overall − rn_by_type
    over the same (user × (ts, event_id)) sort, so the whole profile is
    two windows + two aggregates, exact integers throughout."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wt = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    runs = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("_isl", F.row_number().over(wu) - F.row_number().over(wt))
        .groupBy("user_id", "event_type", "_isl")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return (
        runs.groupBy("event_type")
        .agg(
            F.max("run_len").cast("long").alias("longest_run"),
            F.sum((F.col("run_len") >= 3).cast("long"))
            .cast("long")
            .alias("n_runs_ge3"),
            F.count(F.lit(1)).cast("long").alias("n_runs"),
        )
        .orderBy("event_type")
    )


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

ORACLES["session_attribution"] = f"""
    WITH {sql_session_ids_cte(extra_cols=", event_type, event_id", where="user_id IS NOT NULL")}
    SELECT COALESCE(prior, '(direct)') AS credited_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM (
        SELECT event_type,
               LAST_VALUE(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id, session_id
                         ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prior
        FROM ids
    )
    WHERE event_type = 'purchase'
    GROUP BY 1
    ORDER BY 1
"""

ORACLES["event_burst_runs"] = """
    WITH e AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        FROM events WHERE user_id IS NOT NULL
    ), isl AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
               - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS g
        FROM e
    ), runs AS (
        SELECT user_id, event_type, g, COUNT(*) AS run_len
        FROM isl GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(MAX(run_len) AS BIGINT) AS longest_run,
           CAST(SUM(CASE WHEN run_len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_runs_ge3,
           CAST(COUNT(*) AS BIGINT) AS n_runs
    FROM runs
    GROUP BY 1
    ORDER BY 1
"""

QUERIES = {
    "user_sessions": user_sessions,
    "user_session_summary": user_session_summary,
    "session_attribution": session_attribution,
    "event_burst_runs": event_burst_runs,
}
