"""Funnel and retention-cohort invariants beyond the oracle compare."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mini_log_lakehouse_spark.operators import funnels
from mini_log_lakehouse_spark.sources.registry import load_table


def test_funnel_counts_are_monotone_nonincreasing(spark, sf_dir):
    rows = funnels.events_funnel(spark, sf_dir).collect()
    assert [r["step"] for r in rows] == list(funnels.FUNNEL_STEPS)
    counts = [r["users_reached"] for r in rows]
    assert counts[0] > 0
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts


def test_funnel_strict_ordering_on_known_sequence(spark):
    """Hand-built log: u1 completes the funnel in order, u2 purchases
    BEFORE clicking (must stop at click... i.e. count for click only if
    ordered), u3 never clicks."""
    t = datetime.datetime(2024, 1, 1)

    def ts(m):
        return t + datetime.timedelta(minutes=m)

    rows = [
        (1, ts(0), "signup"), (1, ts(1), "click"), (1, ts(2), "purchase"),
        (2, ts(0), "signup"), (2, ts(5), "purchase"), (2, ts(9), "click"),
        (3, ts(0), "signup"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r["step"]: r["users_reached"]
        for r in funnels.funnel_counts(ev, funnels.FUNNEL_STEPS).collect()
    }
    # u2's click happened after signup, so step 2 counts u1 and u2; but
    # u2's purchase preceded the click, so only u1 converts fully.
    assert got == {"signup": 3, "click": 2, "purchase": 1}


def test_retention_offset_zero_equals_cohort_size(spark, sf_dir):
    rows = funnels.events_retention_cohorts(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    sizes = {
        r["cohort_day"]: r["n"]
        for r in ev.select("user_id", F.to_date("ts").alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("cohort_day"))
        .groupBy("cohort_day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    zero = {r["cohort_day"]: r["active_users"] for r in rows if r["day_offset"] == 0}
    assert zero == sizes
    for r in rows:
        assert 0 <= r["active_users"] <= sizes[r["cohort_day"]]
        assert r["day_offset"] >= 0


def test_daily_trend_slope_matches_numpy(spark, sf_dir):
    """slope_micro is the micro-truncation of numpy's lstsq slope on
    the same (day offset, count) points."""
    import numpy as np

    rows = funnels.events_daily_trend(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .count()
        .collect()
    )
    d0 = min(r["day"] for r in daily)
    pts = {}
    for r in daily:
        pts.setdefault(r["event_type"], []).append(
            ((r["day"] - d0).days, r["count"])
        )
    for r in rows:
        xs, ys = zip(*pts[r["event_type"]])
        assert r["active_days"] == len(xs)
        assert r["total_events"] == sum(ys)
        if len(set(xs)) < 2:
            assert r["slope_micro"] is None
            continue
        slope = np.polyfit(np.array(xs, dtype=float), np.array(ys, dtype=float), 1)[0]
        # micro-truncation of an exact rational vs float lstsq: within 1 micro
        assert abs(r["slope_micro"] - int(slope * 1e6)) <= 1, (
            r["event_type"], r["slope_micro"], slope)
