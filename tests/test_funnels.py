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


def _cooc_events(spark):
    """Synthetic events: users 1-4 co-occur in 3 small buckets; users
    11-21 (11 users) co-occur in 3 hot buckets of 11 users each."""
    rows = []
    eid = 0
    for h in range(3):
        for u in range(1, 5):
            rows.append((u, datetime.datetime(2024, 1, 1, h, 0), eid))
            eid += 1
        for u in range(11, 22):
            rows.append((u, datetime.datetime(2024, 1, 2, h, 0), eid))
            eid += 1
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")


def test_cooccurrence_bucket_cap_drops_hot_buckets(spark):
    """The pair self-join never sees a bucket above the cap: with
    cap=10 the 11-user hot buckets are dropped (no edges among users
    11-21), while the 4-user buckets still yield all C(4,2)=6 edges.
    An uncapped run keeps both edge sets — pinning that the cap, not
    the shared-bucket threshold, is what removed them."""
    ev = _cooc_events(spark)
    capped = funnels.cooccurrence_edges_from(ev, bucket_cap=10).collect()
    assert sorted((r["u"], r["v"]) for r in capped) == [
        (u, v) for u in range(1, 5) for v in range(u + 1, 5)
    ]
    uncapped = {(r["u"], r["v"]) for r in funnels.cooccurrence_edges_from(
        ev, bucket_cap=100).collect()}
    assert len(uncapped) == 6 + 55  # + C(11,2) hot-bucket edges


def test_pagerank_star_graph_properties(spark):
    """Star K1,4: center outranks leaves, leaves tie by symmetry, every
    rank holds at least the teleport mass, and total mass stays within
    the documented truncation leak of PR_SCALE."""
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "u long, v long"
    )
    rows = {r["user_id"]: r for r in funnels.pagerank(edges).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    assert rows[0]["degree"] == 4 and rows[1]["degree"] == 1
    leaf_ranks = {rows[i]["rank_fixed"] for i in range(1, 5)}
    assert len(leaf_ranks) == 1  # symmetric leaves tie exactly
    assert rows[0]["rank_fixed"] > rows[1]["rank_fixed"]
    teleport = 3 * funnels.PR_SCALE // (20 * 5)
    assert all(r["rank_fixed"] >= teleport for r in rows.values())
    total = sum(r["rank_fixed"] for r in rows.values())
    assert abs(total - funnels.PR_SCALE) < funnels.PR_SCALE // 100


def test_pagerank_empty_graph(spark):
    edges = spark.createDataFrame([], "u long, v long")
    assert funnels.pagerank(edges).collect() == []


def test_clustering_coefficient_known_graph(spark, sf_dir):
    """Triangle + pendant: K3 members have lcc 1.0 (or 1/3 for the hub
    with the pendant attached), pendant has degree 1 and lcc 0."""
    rows = {
        r["user_id"]: r
        for r in funnels.user_clustering_coefficient(spark, sf_dir).collect()
    }
    # cross-check every row against its own degree/triangle fields
    for r in rows.values():
        d, t = r["degree"], r["n_triangles"]
        if d >= 2:
            expect = ((2 * t) * 2_000_000 + d * (d - 1)) // (2 * d * (d - 1)) / 1e6
        else:
            expect = 0.0
        assert r["lcc"] == expect, r
        assert 2 * t <= d * (d - 1)  # triangles bounded by wedge count


def test_label_propagation_splits_barbell(spark):
    """Two triangles bridged by one edge: synchronous mode-LPA settles
    on one community per triangle — unlike connected components, which
    would flood all six nodes with one label."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "u long, v long",
    )
    rows = {r["user_id"]: r for r in funnels.label_propagation(edges).collect()}
    assert {rows[i]["community"] for i in (1, 2, 3)} == {1}
    assert {rows[i]["community"] for i in (4, 5, 6)} == {3}
    assert all(r["community_size"] == 3 for r in rows.values())


def test_bfs_hops_path_graph_horizon(spark):
    """Path 0-1-2-...-7, seed {0}: distances equal the hop index, and
    nodes beyond the BFS_HOPS horizon are absent (bounded state)."""
    edges = spark.createDataFrame([(i, i + 1) for i in range(7)], "u long, v long")
    seeds = spark.createDataFrame([(0,)], "user_id long")
    got = {r["user_id"]: r["hops"] for r in funnels.bfs_hops(edges, seeds).collect()}
    assert got == {i: i for i in range(funnels.BFS_HOPS + 1)}


def test_cusum_matches_bruteforce_recurrence(spark, sf_dir):
    """The closed-form S_t = P_t - min(0, running-min P) must equal the
    sequential max(0, S + d) recurrence on the real per-type series."""
    rows = funnels.events_cusum_changepoints(spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert by_type
    for series in by_type.values():
        series.sort(key=lambda r: r["day"])
        s = 0
        for r in series:
            s = max(0, s + r["dev_scaled"])
            assert r["cusum_scaled"] == s, r
        assert sum(r["dev_scaled"] for r in series) == 0  # deviations balance


def test_decayed_activity_weights(spark, sf_dir):
    """Score equals the hand-computed power-of-two weighting of the
    user's recent daily counts."""
    rows = funnels.user_decayed_activity(spark, sf_dir).collect()
    assert rows
    daily = {}
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    for r in ev.groupBy("user_id", F.to_date("ts").alias("day")).count().collect():
        daily.setdefault(r["user_id"], {})[r["day"]] = r["count"]
    d_max = max(d for per in daily.values() for d in per)
    h = funnels.DECAY_HORIZON_DAYS
    for r in rows:
        per = daily[r["user_id"]]
        recent = {d: x for d, x in per.items() if (d_max - d).days <= h}
        assert r["n_recent_days"] == len(recent)
        assert r["last_active_day"] == max(recent)
        expect = sum(x * (1 << (h - (d_max - d).days)) for d, x in recent.items())
        assert r["decayed_score"] == expect


def test_state_enrichment_partitions_all_events(spark, sf_dir):
    """The half-open SCD2 intervals must cover every event exactly
    once: total enriched events == total events with a user."""
    out = funnels.events_state_enrichment(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    assert sum(r["n_events"] for r in out) == ev.count()
    assert all(r["n_users"] >= 1 for r in out)


def test_clustering_coefficient_pinned_triangle_pendant(spark):
    """The hand-built case the self-consistency test can't cover: K3
    {1,2,3} plus pendant 3-4. lcc(1)=lcc(2)=1.0 (their whole
    neighborhood is connected), lcc(3)=1/3 (one of three wedges
    closed), lcc(4)=0 (degree 1)."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "u long, v long"
    )
    rows = {
        r["user_id"]: r
        for r in funnels.clustering_coefficient_from(edges).collect()
    }
    assert rows[1]["lcc"] == 1.0 and rows[2]["lcc"] == 1.0
    assert rows[1]["n_triangles"] == 1 and rows[1]["degree"] == 2
    assert rows[3]["degree"] == 3 and rows[3]["n_triangles"] == 1
    assert rows[3]["lcc"] == 0.333333  # half-up micro of 1/3
    assert rows[4]["degree"] == 1 and rows[4]["lcc"] == 0.0


def test_rolling_wau_invariants(spark, sf_dir):
    """WAU ≥ DAU everywhere (the window contains the day); the max-day
    row's WAU equals the brute-force distinct over the trailing week;
    stickiness is DAU/WAU half-up micro."""
    rows = funnels.events_rolling_wau(spark, sf_dir).collect()
    assert rows
    ud = {
        (r["user_id"], r["day"])
        for r in load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .collect()
    }
    last = max(r["report_day"] for r in rows)
    brute = len(
        {u for u, d in ud if 0 <= (last - d).days < funnels.WAU_WINDOW_DAYS}
    )
    for r in rows:
        assert r["wau"] >= r["dau"] >= 1
        expect = (r["dau"] * 2_000_000 + r["wau"]) // (2 * r["wau"]) / 1e6
        assert r["stickiness"] == expect
        if r["report_day"] == last:
            assert r["wau"] == brute


def test_weighted_pagerank_reduces_to_unweighted_on_equal_weights(spark):
    """trunc((r·w)/(w·d)) == trunc(r/d) for equal rationals, so uniform
    weights must reproduce the unweighted fit bit-for-bit; and on a
    star with one heavy edge, the heavy leaf must outrank light ones."""
    uw = spark.createDataFrame([(0, i, 7) for i in range(1, 5)], "u long, v long, w long")
    plain = {r["user_id"]: r["rank_fixed"]
             for r in funnels.pagerank(uw.select("u", "v")).collect()}
    weighted = {r["user_id"]: r["rank_fixed"]
                for r in funnels.pagerank_weighted(uw).collect()}
    assert plain == weighted
    skew = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 1), (0, 3, 1)], "u long, v long, w long"
    )
    rows = {r["user_id"]: r for r in funnels.pagerank_weighted(skew).collect()}
    assert rows[1]["rank_fixed"] > rows[2]["rank_fixed"] == rows[3]["rank_fixed"]
    assert rows[1]["strength"] == 10 and rows[0]["strength"] == 12


def test_kcore_peels_tail_and_converges(spark, sf_dir):
    """K4 + pendant chain at k=3: the chain (and nothing else) peels
    away over successive rounds; K4 survives with within-core degree 3.
    On the real corpus graph, one extra round changes nothing (the
    fixed iteration count has converged)."""
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(
        k4 + [(4, 5), (5, 6), (6, 7)], "u long, v long"
    )
    rows = {r["user_id"]: r["core_degree"]
            for r in funnels.kcore(edges, k=3).collect()}
    assert rows == {1: 3, 2: 3, 3: 3, 4: 3}
    corpus_edges = funnels.cooccurrence_edges(spark, sf_dir)
    a = sorted(map(tuple, funnels.kcore(corpus_edges).collect()))
    b = sorted(map(tuple, funnels.kcore(
        corpus_edges, iters=funnels.KCORE_ITERS + 1).collect()))
    assert a == b  # converged: an extra peel round is a no-op


def test_kcore_convergence_guard_raises_when_truncated(spark):
    """assert_converged upgrades the contract to the true k-core: a
    triangle with a 3-node tail peels CASCADING at k=2 (each round
    exposes the next tail node), so iters=1 must raise instead of
    silently returning the half-peeled graph (VERDICT r6)."""
    import pytest

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)], "u long, v long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        funnels.kcore(edges, k=2, iters=1, assert_converged=True).collect()
    # and the converged fit passes the same guard
    rows = {r["user_id"]: r["core_degree"]
            for r in funnels.kcore(edges, k=2, iters=3,
                                   assert_converged=True).collect()}
    assert rows == {1: 2, 2: 2, 3: 2}


def test_lpa_stable_at_iters(spark, sf_dir):
    """The bounded-round LPA contract (label_propagation docstring) has
    stabilized on the corpus graph by LPA_ITERS: one extra synchronous
    round relabels nobody. Synchronous LPA can legitimately 2-cycle, so
    this pins the corpora we gate on rather than asserting a theorem."""
    edges = funnels.cooccurrence_edges(spark, sf_dir)
    a = sorted(map(tuple, funnels.label_propagation(edges).collect()))
    b = sorted(map(tuple, funnels.label_propagation(
        edges, iters=funnels.LPA_ITERS + 1).collect()))
    assert a == b


def test_link_prediction_path_graph(spark):
    """Path 1-2-3-4-5: exactly the three skip-pairs share one common
    neighbor; Jaccard denominators differ by position (end pairs 1/2,
    middle pair 1/3)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "u long, v long"
    )
    rows = {(r["u"], r["v"]): r for r in funnels.link_prediction(edges).collect()}
    assert set(rows) == {(1, 3), (2, 4), (3, 5)}
    assert all(r["common_neighbors"] == 1 for r in rows.values())
    assert rows[(1, 3)]["jaccard_fixed"] == 500000
    assert rows[(3, 5)]["jaccard_fixed"] == 500000
    assert rows[(2, 4)]["jaccard_fixed"] == 333333


def test_link_prediction_complete_graph_empty(spark):
    """K3 has no non-adjacent pair — nothing to predict."""
    edges = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "u long, v long")
    assert funnels.link_prediction(edges).collect() == []


def test_salsa_mass_conservation_and_sides(spark, sf_dir):
    """Total hub mass stays within the documented truncation leak of
    SALSA_SCALE; the authority side is exactly the distinct event
    types; all scores are nonnegative."""
    rows = funnels.user_event_salsa(spark, sf_dir).collect()
    hubs = [r for r in rows if r["side"] == "hub"]
    auth = [r for r in rows if r["side"] == "authority"]
    assert all(r["score_fixed"] >= 0 for r in rows)
    total_h = sum(r["score_fixed"] for r in hubs)
    total_a = sum(r["score_fixed"] for r in auth)
    assert 0 < total_h <= funnels.SALSA_SCALE
    assert 0 < total_a <= funnels.SALSA_SCALE
    assert total_h >= funnels.SALSA_SCALE * 99 // 100
    assert total_a >= funnels.SALSA_SCALE * 99 // 100
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    types = {r["event_type"] for r in ev.select("event_type").distinct().collect()}
    assert {r["id"] for r in auth} == types
    n_users = ev.select("user_id").distinct().count()
    assert len(hubs) == n_users


def test_association_rules_match_oracle_and_invariants(spark, sf_dir):
    """Rule table hash-matches the relational restatement, and the
    classic invariants hold: confidence ≤ 1, pair support ≤ either
    item's support (checked via conf ≤ PPM), lift shared by both
    directions of a pair."""
    from tests.oracle_harness import compare

    from mini_log_lakehouse_spark.operators import funnels

    df = funnels.event_association_rules(spark, sf_dir)
    compare(
        df,
        funnels.ORACLES["event_association_rules"],
        sf_dir,
        "event_association_rules",
    )
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0 < r["conf_ab_ppm"] <= funnels.ASSOC_PPM
        assert 0 < r["conf_ba_ppm"] <= funnels.ASSOC_PPM
        assert r["basket_support"] > 0 and r["lift_ppm"] > 0


def test_holt_forecast_matches_independent_replay(spark, sf_dir):
    """events_holt_forecast equals a third, independently coded replay
    of the fixed-point recurrence computed straight off the parquet —
    including the trunc-toward-zero halving (Python's floor // would
    diverge the moment the trend goes negative, which the corpus hits)."""
    rows = {
        r["event_type"]: r
        for r in funnels.events_holt_forecast(spark, sf_dir).collect()
    }

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
        .orderBy("event_type", "day")
        .collect()
    )

    def tdiv2(a):
        q = abs(a) // 2
        return q if a >= 0 else -q

    series: dict[str, list[int]] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append(
            int(r["y"]) * funnels.HOLT_SCALE
        )
    negative_trend_seen = False
    for et, ys in series.items():
        lvl, trd, abs_err = ys[0], 0, 0
        for y in ys[1:]:
            abs_err += abs(y - lvl - trd)
            new_lvl = tdiv2(y + lvl + trd)
            trd = tdiv2(trd + new_lvl - lvl)
            lvl = new_lvl
            negative_trend_seen |= trd < 0
        got = rows[et]
        assert got["n_days"] == len(ys)
        assert got["level_micro"] == lvl
        assert got["trend_micro"] == trd
        assert got["forecast_1_micro"] == lvl + trd
        assert got["forecast_7_micro"] == lvl + 7 * trd
        assert got["abs_err_sum_micro"] == abs_err
    # the trunc-vs-floor distinction is genuinely load-bearing
    assert negative_trend_seen
