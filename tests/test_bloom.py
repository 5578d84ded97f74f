"""Bloom-filter semi-join reduction (operators/bloom.py): the prefilter
must be a true superset filter (no false negatives, strict reduction),
semantically invisible in the final result, and physically shuffle-free
on the fact side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mini_log_lakehouse_spark.operators import bloom
from mini_log_lakehouse_spark.sources.registry import load_table


def _seg(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == bloom.BLOOM_SEGMENT)
        .select("c_custkey")
    )


def test_prefilter_superset_and_reduction(spark, sf_dir):
    """Candidates ⊇ true matches (false negatives impossible) and
    candidates ⊊ fact (the filter actually eliminates rows)."""
    orders = load_table(spark, sf_dir, "orders")
    seg = _seg(spark, sf_dir)
    cand = bloom.bloom_prefilter(orders, "o_custkey", seg, "c_custkey")
    true_keys = {
        r["o_custkey"]
        for r in orders.join(
            seg, orders["o_custkey"] == seg["c_custkey"], "left_semi"
        )
        .select("o_custkey")
        .collect()
    }
    cand_keys = {r["o_custkey"] for r in cand.select("o_custkey").collect()}
    assert true_keys <= cand_keys
    assert cand.count() < orders.count()


def test_entry_matches_plain_join_oracle(spark, sf_dir):
    from tests.oracle_harness import compare

    compare(
        bloom.orders_bloom_prefilter_revenue(spark, sf_dir),
        bloom.ORACLES["orders_bloom_prefilter_revenue"],
        sf_dir,
        "orders_bloom_prefilter_revenue",
    )


def test_false_positives_die_in_the_exact_join(spark):
    """Force heavy false positives (4-bit bitmap, every word saturated)
    — the prefilter then passes nearly everything, but the entry-shaped
    exact semi join must still return only the true matches."""
    fact = spark.range(0, 500).select(F.col("id").alias("k"))
    dim = spark.range(0, 500, 50).select(F.col("id").alias("d"))
    import pytest

    mp = pytest.MonkeyPatch()
    mp.setattr(bloom, "BLOOM_BITS", 4)
    try:
        cand = bloom.bloom_prefilter(fact, "k", dim, "d")
        n_cand = cand.count()
    finally:
        mp.undo()
    assert n_cand > dim.count(), "saturated bitmap produced no false positives"
    got = {
        r["k"]
        for r in cand.join(dim, cand["k"] == dim["d"], "left_semi").collect()
    }
    assert got == set(range(0, 500, 50))


def test_bitmap_is_bounded_and_mergeable(spark):
    """The bitmap never exceeds BLOOM_BITS/64 rows however many keys go
    in, and OR-ing two key sets' bitmaps equals the union's bitmap —
    the mergeable-sketch property the partial aggregation relies on."""
    a = spark.range(0, 2000).select(F.col("id").alias("k"))
    b = spark.range(1000, 4000).select(F.col("id").alias("k"))
    both = a.union(b)
    bm_a = {r["word"]: r["bits"] for r in bloom.bloom_bitmap(a, "k").collect()}
    bm_b = {r["word"]: r["bits"] for r in bloom.bloom_bitmap(b, "k").collect()}
    bm_u = {
        r["word"]: r["bits"] for r in bloom.bloom_bitmap(both, "k").collect()
    }
    assert len(bm_u) <= bloom.BLOOM_BITS // 64
    merged = {
        w: bm_a.get(w, 0) | bm_b.get(w, 0) for w in set(bm_a) | set(bm_b)
    }
    assert merged == bm_u


def test_fact_side_never_shuffles_before_the_filter(spark, sf_dir):
    """Physical contract: every join in the entry is a broadcast hash
    join (bitmap words + the dim semi join) — a SortMergeJoin would
    mean the fact shuffled, defeating the reduction."""
    plan = (
        bloom.orders_bloom_prefilter_revenue(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 4, plan
