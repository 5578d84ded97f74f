from __future__ import annotations

from mini_log_lakehouse_spark.operators import extensions


def test_heavy_hitter_sketch_guarantee_under_pressure(spark, sf_dir, monkeypatch):
    """Force the Misra–Gries capacity far below the distinct-key count:
    the sketch must keep the classic guarantees — reported counts are
    lower bounds of the true counts, and the dominant key (true
    frequency far above n/CAPACITY) still surfaces on top."""
    monkeypatch.setattr(extensions, "HEAVY_HITTER_CAPACITY", 8)
    truth = {
        r["user_id"]: r["n"]
        for r in extensions.load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(extensions.F.count(extensions.F.lit(1)).alias("n"))
        .collect()
    }
    rows = extensions.events_heavy_hitters(spark, sf_dir).collect()
    assert rows, "sketch emitted nothing"
    for r in rows:
        assert r["n_events"] <= truth[r["user_id"]]
    top_true = max(truth, key=lambda k: (truth[k], -k))
    # the true #1 must survive an 8-counter sketch over this skew
    assert any(r["user_id"] == top_true for r in rows)


def test_approx_distinct_within_rsd(spark, sf_dir):
    row = extensions.approx_distinct_users(spark, sf_dir).collect()[0]
    exact, approx = row["exact_users"], row["approx_users"]
    assert exact > 0
    assert abs(approx - exact) / exact < 0.1  # rsd 0.02, generous bound


def test_cube_has_all_grouping_sets(spark, sf_dir):
    rows = extensions.orders_cube_status_priority(spark, sf_dir).collect()
    shapes = {(r["o_orderstatus"] is None, r["o_orderpriority"] is None) for r in rows}
    assert shapes == {(False, False), (False, True), (True, False), (True, True)}


def test_cms_is_an_upper_bound_and_sketch_mass_conserved(spark, sf_dir):
    """CMS invariants: every estimate >= the true count (one-sided
    error), and the estimate equals the true count whenever the key
    collides with nothing in at least one hash row. Mass conservation:
    the sketch distributes exactly DEPTH increments per event, so
    sum(estimates' row cells) can't exceed DEPTH * n_events."""
    from mini_log_lakehouse_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    rows = extensions.events_cms_user_counts(spark, sf_dir).collect()
    assert rows
    truth = {
        r["user_id"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(rows) == len(truth)
    for r in rows:
        assert r["exact_count"] == truth[r["user_id"]]
        assert r["cms_estimate"] >= r["exact_count"]
        assert r["overcount"] == r["cms_estimate"] - r["exact_count"]


def test_gapfilled_spine_is_dense_and_mass_conserving(spark, sf_dir):
    """The hourly spine must be contiguous (every consecutive pair one
    hour apart), zero-filled hours flagged, and the filled counts must
    sum to the probe user's true event total (no rows lost or invented
    by the join)."""
    import datetime

    from pyspark.sql import functions as F
    from mini_log_lakehouse_spark.sources.registry import load_table

    rows = extensions.user_hourly_gapfilled(spark, sf_dir).collect()
    hours = [r["hour"] for r in rows]
    assert all(
        b - a == datetime.timedelta(hours=1) for a, b in zip(hours, hours[1:])
    )
    assert any(r["is_gap"] == 1 for r in rows), "expected real gaps"
    assert all((r["n_events"] == 0) == (r["is_gap"] == 1) for r in rows)
    ev = load_table(spark, sf_dir, "events")
    probe = ev.agg(F.min("user_id")).collect()[0][0]
    total = ev.filter(F.col("user_id") == probe).count()
    assert sum(r["n_events"] for r in rows) == total


def test_hll_quality_gate_all_green_and_flag_is_load_bearing(spark, sf_dir):
    """The driver entry's per-day bound check holds on the fixed data,
    and the shared bound expression genuinely flips: an estimate just
    outside the 3x-rsd envelope evaluates false, one just inside true."""
    from pyspark.sql import functions as F

    rows = extensions.approx_distinct_quality_report(spark, sf_dir).collect()
    assert rows and all(r["within_bound"] for r in rows)
    # flip check: envelope for exact=1000 at 3 x 0.02 is +/-60
    probe = spark.createDataFrame(
        [(1000, 1060), (1000, 1061), (1000, 940), (1000, 939)],
        "exact long, approx long",
    ).select(
        "approx",
        extensions.hll_within_bound(F.col("approx"), F.col("exact")).alias("ok"),
    )
    got = {r["approx"]: r["ok"] for r in probe.collect()}
    assert got == {1060: True, 1061: False, 940: True, 939: False}


def test_kmv_estimator_branch_matches_oracle_and_flag_flips(spark, sf_dir):
    """At k=16 the sf0.001 corpus (221+ distinct orders per group) is
    deep in the ESTIMATOR regime the fixed-k driver entry only reaches
    at sf0.01 — the Spark sketch must still be hash-identical to the
    relational restatement, and the 3σ envelope (calibrated for k=512)
    must visibly flip to False for some group, proving within_bound is
    a live check rather than a constant."""
    from tests.oracle_harness import compare

    li = extensions.load_table(spark, sf_dir, "lineitem")
    df = extensions.kmv_distinct_orders(li, k=16)
    compare(df, extensions.kmv_oracle_sql(16), sf_dir, "kmv_k16")
    rows = df.collect()
    assert any(r["kmv_estimate"] != r["exact_orders"] for r in rows), (
        "estimator branch never fired at k=16"
    )
    assert any(not r["within_bound"] for r in rows)


def test_kmv_exact_regime_is_exact(spark, sf_dir):
    """Groups with fewer than k distinct keys keep every hash — the
    sketch must degrade to the exact count, not an estimate."""
    li = extensions.load_table(spark, sf_dir, "lineitem")
    for r in extensions.kmv_distinct_orders(li, k=4096).collect():
        assert r["kmv_estimate"] == r["exact_orders"] and r["within_bound"]


def test_approx_percentile_gate_all_green_and_flag_flips(spark, sf_dir):
    """The rank-envelope flags hold on the fixed corpus (measured worst
    GK rank error 0.00102 vs the n/1000 + 1 envelope), and the shared
    bound expression genuinely flips: the true median passes, a value
    at rank 20/100 fails the p50 check."""
    from pyspark.sql import functions as F

    rows = extensions.approx_percentile_quality_report(spark, sf_dir).collect()
    assert rows and all(r["within_p50"] and r["within_p95"] for r in rows)
    df = spark.range(1, 101).select(F.col("id").alias("x"))
    got = df.agg(
        extensions.rank_within_bound(
            F.col("x"), F.lit(50), 1, 2, F.lit(100), 1000
        ).alias("ok"),
        extensions.rank_within_bound(
            F.col("x"), F.lit(20), 1, 2, F.lit(100), 1000
        ).alias("bad"),
    ).collect()[0]
    assert got["ok"] and not got["bad"]


def test_kmv_set_report_matches_oracle_and_exact_regime(spark, sf_dir):
    """The sketch set-algebra estimates hash-match the relational
    restatement; at sf0.001 (147 distinct union keys < k) the sketches
    are exact and both estimates must equal the exact counts."""
    from tests.oracle_harness import compare

    df = extensions.orders_kmv_set_report(spark, sf_dir)
    compare(df, extensions.kmv_set_oracle_sql(), sf_dir, "kmv_set")
    r = df.collect()[0]
    assert r["union_within"] and r["inter_within"]
    if r["exact_union"] < extensions.KMV_K:
        assert r["kmv_union"] == r["exact_union"]
        assert r["kmv_inter"] == r["exact_inter"]


def test_kmv_set_estimator_regime_small_k(spark, sf_dir):
    """k=32 forces the estimator branch on sf0.001 (147 union keys):
    the sketch algebra must still hash-match the restatement, and the
    estimates must genuinely differ from exact — proving the estimator
    path, not the exact-degradation path, produced them."""
    from tests.oracle_harness import compare

    orders = extensions.load_table(spark, sf_dir, "orders")
    df = extensions.kmv_set_report(orders, k=32)
    compare(df, extensions.kmv_set_oracle_sql(32), sf_dir, "kmv_set_k32")
    r = df.collect()[0]
    assert r["kmv_union"] != r["exact_union"] or r["kmv_inter"] != r["exact_inter"]
