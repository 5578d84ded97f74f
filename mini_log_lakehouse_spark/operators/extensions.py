"""Coverage extensions beyond the reference surface (SURVEY.md §2.4/§2.7
"not present" notes): CUBE grouping sets, exact + approximate distinct
aggregation, UNION ALL, and a scalar-function battery — each an
oracle-checkable pair.

approx_count_distinct is the genuinely scale-relevant one: at 100 TB the
exact COUNT(DISTINCT user_id) shuffles every distinct value; the HLL++
sketch is mergeable map-side state of a few KB. The HLL estimate is
deterministic for fixed data but not shared with DuckDB, so the approx
query reports the estimate alongside the exact count and the oracle
checks only the exact column... rows-only for the sketch itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_log_lakehouse_spark.sources.registry import load_table


def daily_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation per group (COUNT(DISTINCT ...))."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("date"))
        .agg(
            F.countDistinct("user_id").alias("distinct_users"),
            F.count(F.lit(1)).alias("events"),
        )
        .orderBy("date")
    )


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch vs exact, corpus-wide (rows-only: sketch estimates are
    engine-specific; tests assert the relative error bound instead)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
    )


def orders_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 combinations of the two keys)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("orders"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def setop_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) + re-aggregation."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return (
        c.unionAll(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("nationkey")
    )


def scalar_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F10-style scalar surface over documents: substring_index, case
    manipulation, padding, concat, conditional — one row per doc."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_upper"),
        F.substring("text", 1, 12).alias("prefix12"),
        F.substring_index("source", "c", 1).alias("source_head"),
        F.lpad(F.col("doc_id").cast("string"), 6, "0").alias("doc_key"),
        F.concat_ws("|", "lang", "source").alias("lang_source"),
        F.when(F.col("n_chars") >= 300, F.lit("long"))
        .otherwise(F.lit("short"))
        .alias("size_class"),
        F.length(F.trim("text")).cast("long").alias("trimmed_len"),
    ).orderBy("doc_id")


def events_hour_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (crosstab): event counts per type × 6 four-hour buckets.

    The pivot value list is FIXED (h00..h20) — an open-ended pivot needs
    a distinct-scan planning pass, which at 100 TB is a full extra job;
    declaring the domain keeps it one aggregation."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (F.floor(F.date_format("ts", "HH").cast("int") / 4) * 4).cast("int")
    buckets = [0, 4, 8, 12, 16, 20]
    return (
        ev.select("event_type", bucket.alias("h"))
        .groupBy("event_type")
        .pivot("h", buckets)
        .agg(F.count(F.lit(1)))
        .select(
            "event_type",
            *[F.coalesce(F.col(str(b)), F.lit(0)).alias(f"h{b:02d}") for b in buckets],
        )
        .orderBy("event_type")
    )


def grouping_sets_status_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither pure ROLLUP nor CUBE): totals by
    (status), by (priority), and grand total — one pass, three grains."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS orders
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


def user_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax aggregate (max_by): each user's latest event type — one
    aggregation pass, no self-join/window (the classic "latest row per
    key" anti-pattern killer at scale). Deterministic via the (ts,
    event_id) tiebreak struct."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by("event_type", F.struct("ts", "event_id")).alias("last_event_type"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("events"),
        )
        .orderBy("user_id")
    )


ORACLES: dict[str, str] = {
    "daily_distinct_users": """
        SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS date,
               COUNT(DISTINCT user_id) AS distinct_users,
               COUNT(*) AS events
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    "orders_cube_status_priority": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS orders
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
    "setop_union_all_counts": """
        SELECT nationkey, COUNT(*) AS n FROM (
            SELECT c_nationkey AS nationkey FROM customer
            UNION ALL
            SELECT s_nationkey FROM supplier
        )
        GROUP BY 1
        ORDER BY 1
    """,
    "events_hour_pivot": """
        WITH b AS (
            SELECT event_type,
                   CAST(FLOOR(CAST(strftime(CAST(ts AS TIMESTAMP), '%H') AS INT) / 4) * 4 AS INT) AS h
            FROM events
        )
        SELECT event_type,
               COUNT(*) FILTER (WHERE h = 0)  AS h00,
               COUNT(*) FILTER (WHERE h = 4)  AS h04,
               COUNT(*) FILTER (WHERE h = 8)  AS h08,
               COUNT(*) FILTER (WHERE h = 12) AS h12,
               COUNT(*) FILTER (WHERE h = 16) AS h16,
               COUNT(*) FILTER (WHERE h = 20) AS h20
        FROM b
        GROUP BY 1
        ORDER BY 1
    """,
    "grouping_sets_status_day": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
    # max_by with a (ts, event_id) tiebreak struct has no DuckDB arg_max
    # twin (arg_max takes scalar ordering only) — the oracle derives the
    # same row via a window, same deterministic (ts DESC, event_id DESC).
    "user_last_event": """
        WITH e AS (
            SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events
        ),
        agg AS (
            SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS events
            FROM e GROUP BY 1
        ),
        last AS (
            SELECT user_id, event_type AS last_event_type FROM (
                SELECT user_id, event_type,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                       ) AS rn
                FROM e
            ) WHERE rn = 1
        )
        SELECT a.user_id, l.last_event_type, a.last_ts, a.events
        FROM agg a JOIN last l USING (user_id)
        ORDER BY user_id
    """,
    "scalar_function_battery": """
        SELECT doc_id,
               upper(lang) AS lang_upper,
               substring(text, 1, 12) AS prefix12,
               split_part(source, 'c', 1) AS source_head,
               lpad(CAST(doc_id AS VARCHAR), 6, '0') AS doc_key,
               concat_ws('|', lang, source) AS lang_source,
               CASE WHEN n_chars >= 300 THEN 'long' ELSE 'short' END AS size_class,
               CAST(length(trim(text)) AS BIGINT) AS trimmed_len
        FROM documents
        ORDER BY doc_id
    """,
}

QUERIES = {
    "daily_distinct_users": daily_distinct_users,
    "approx_distinct_users": approx_distinct_users,
    "orders_cube_status_priority": orders_cube_status_priority,
    "setop_union_all_counts": setop_union_all_counts,
    "scalar_function_battery": scalar_function_battery,
    "events_hour_pivot": events_hour_pivot,
    "grouping_sets_status_day": grouping_sets_status_day,
    "user_last_event": user_last_event,
}
