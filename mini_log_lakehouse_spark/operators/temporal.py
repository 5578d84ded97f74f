"""Temporal joins Spark lacks as built-ins: the as-of join.

The as-of join (each left row matched to the latest right row with
``right.ts <= left.ts`` within a key) is a canonical "custom operator"
for a Spark-first engine: it is NOT expressible as an equi-join, but it
IS expressible as a composition of built-ins — union the two sides,
window by key ordered by (ts, side), carry the last-seen right payload
forward (``last(..., ignorenulls=True)`` over an unbounded-preceding
frame), keep left rows. One shuffle on the key, one linear in-partition
scan, no join explosion, no Python.

Scale notes: cost is a single hash shuffle of |L|+|R| rows plus a sort
within each key partition — the same price as a regular join on the key,
independent of time-proximity density (a naive theta-join
``l.ts >= r.ts`` explodes quadratically per key). Hot keys serialize
within their window task; mitigate by splitting the timeline into
buckets carrying each bucket's last right row into the next (classic
boundary-replication trick) — not needed at bench scale.

Oracle: DuckDB has a native ASOF JOIN, so this operator gets a true
cross-engine value check (rare for "custom" operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mini_log_lakehouse_spark.sources.registry import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: list[str],
    left_cols: list[str],
    right_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """ASOF JOIN: for each left row, the right row with the greatest
    ``ts_col`` <= the left row's, within ``by_cols``.

    Output columns: ``by_cols + [ts_col] + left_cols + right_cols``
    (right payload columns keep their names — callers pre-alias to avoid
    collisions). ``how``: 'inner' drops unmatched left rows, 'left'
    keeps them with nulls.

    Tie discipline: right rows sort BEFORE left rows at equal ts (side 0
    < side 1), giving <= semantics; equal-ts ties *within* the right side
    are the caller's job to make unique (pre-aggregate), same as DuckDB's
    ASOF requires for determinism.
    """
    l2 = left.select(
        *by_cols,
        F.col(ts_col).alias("_ts"),
        F.struct(*left_cols).alias("_lpay"),
        F.lit(1).alias("_side"),
    )
    r2 = right.select(
        *by_cols,
        F.col(ts_col).alias("_ts"),
        F.struct(*right_cols).alias("_rpay"),
        F.lit(0).alias("_side"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by_cols)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_match", F.last("_rpay", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )
    if how == "inner":
        carried = carried.filter(F.col("_match").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return carried.select(
        *by_cols,
        F.col("_ts").alias(ts_col),
        *[F.col(f"_lpay.{c}").alias(c) for c in left_cols],
        *[F.col(f"_match.{c}").alias(c) for c in right_cols],
    )


def asof_error_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: attribute each error event to the user's most recent
    prior (or same-instant) non-error event — the log-analytics as-of
    shape ("what was the user doing when it broke?").

    The right side is pre-aggregated to one row per (user, ts) with a
    deterministic representative (max event_id), making the as-of match
    unique; gap_seconds is the whole-second distance to the match.
    """
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    prior = (
        ev.filter(F.col("event_type") != "error")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("prev_event_id"),
            F.max_by("event_type", "event_id").alias("prev_event_type"),
        )
        .withColumn("prev_ts", F.col("ts"))
    )
    out = asof_join(
        errors,
        prior,
        ts_col="ts",
        by_cols=["user_id"],
        left_cols=["event_id"],
        right_cols=["prev_event_id", "prev_event_type", "prev_ts"],
    )
    return out.select(
        "event_id",
        "user_id",
        "prev_event_id",
        "prev_event_type",
        (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts"))
        .cast("long")
        .alias("gap_seconds"),
    ).orderBy("event_id")


def incident_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range (interval-containment) join, broadcast-interval form:
    derive the 3 worst error minutes, then classify EVERY event falling
    inside those windows — ``ts ∈ [w_start, w_end)`` with no equi-key.

    A rangeless theta-join is only scalable when one side is tiny; here
    the interval side is bounded (top-K incidents) and broadcast, so the
    100 TB fact side streams map-only through a BroadcastNestedLoopJoin
    against 3 rows. (For two BIG interval sets you'd bucketize the
    timeline and equi-join on bucket — same trick as the as-of note.)"""
    ev = load_table(spark, sf_dir, "events")
    minutes = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("minute", "ts").alias("w_start"))
        .agg(F.count(F.lit(1)).alias("errors"))
        .orderBy(F.desc("errors"), "w_start")
        .limit(3)
    )
    w = minutes.select(
        "w_start", (F.col("w_start") + F.expr("INTERVAL 1 MINUTE")).alias("w_end")
    )
    return (
        ev.join(
            F.broadcast(w),
            (ev.ts >= F.col("w_start")) & (ev.ts < F.col("w_end")),
        )
        .groupBy("w_start", "event_type")
        .agg(F.count(F.lit(1)).alias("events"))
        .orderBy("w_start", "event_type")
    )


ORACLES: dict[str, str] = {
    "incident_window_events": """
        WITH minutes AS (
            SELECT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS w_start,
                   COUNT(*) AS errors
            FROM events WHERE event_type = 'error'
            GROUP BY 1
            ORDER BY errors DESC, w_start
            LIMIT 3
        )
        SELECT m.w_start, e.event_type, COUNT(*) AS events
        FROM events e
        JOIN minutes m
          ON CAST(e.ts AS TIMESTAMP) >= m.w_start
         AND CAST(e.ts AS TIMESTAMP) < m.w_start + INTERVAL 1 MINUTE
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "asof_error_attribution": """
        WITH errors AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'error'
        ),
        prior AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                   MAX(event_id) AS prev_event_id,
                   arg_max(event_type, event_id) AS prev_event_type
            FROM events WHERE event_type != 'error'
            GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id, p.prev_event_id, p.prev_event_type,
               CAST(date_diff('second', p.ts, e.ts) AS BIGINT) AS gap_seconds
        FROM errors e
        ASOF JOIN prior p ON e.user_id = p.user_id AND e.ts >= p.ts
        ORDER BY e.event_id
    """,
}

QUERIES = {
    "asof_error_attribution": asof_error_attribution,
    "incident_window_events": incident_window_events,
}
