"""Physical-plan assertions (SURVEY.md §4): the declarative plans must
actually produce the physical strategies the 100 TB design relies on —
filter pushdown into the parquet scan, column pruning, broadcast joins
for dims, TakeOrderedAndProject for top-K. These run with table caching
disabled so the scan properties are observable."""

from __future__ import annotations

import pytest

from mini_log_lakehouse_spark.operators import events as ev_ops
from mini_log_lakehouse_spark.operators import relational as rel_ops


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _plan_formatted(df) -> str:
    """explain('formatted') text — unlike executedPlan().toString(), scan
    node metadata (PushedFilters, ReadSchema) is NOT width-truncated."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(autouse=True)
def no_table_cache(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_CACHE_TABLES", raising=False)


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(rel_ops.tpch_q1_pricing_summary(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    # errors_by_type needs only ts + event_type; the scan must not read
    # props/value/user_id.
    plan = _plan(ev_ops.errors_by_type(spark, sf_dir))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "ts" in read_schema and "event_type" in read_schema
    for col in ("props", "value", "user_id"):
        assert col not in read_schema


def test_dim_joins_are_broadcast(spark, sf_dir):
    plan = _plan(rel_ops.region_customer_rollup(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_topk_plans_take_ordered(spark, sf_dir):
    plan = _plan(ev_ops.top_event_types(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_semi_anti_join_strategies(spark, sf_dir):
    semi = _plan(rel_ops.customers_with_orders(spark, sf_dir))
    anti = _plan(rel_ops.customers_without_orders(spark, sf_dir))
    assert "LeftSemi" in semi and "LeftAnti" in anti


def test_day_filter_pushes_ts_range(spark, sf_dir):
    # the one-day serving queries must express the day as a ts RANGE so it
    # reaches PushedFilters (a to_date(ts) == day predicate cannot push).
    plan = _plan(ev_ops.errors_by_type(spark, sf_dir))
    assert "GreaterThanOrEqual(ts," in plan and "LessThan(ts," in plan


def test_asof_join_is_one_shuffle_no_join(spark, sf_dir):
    # the as-of composition must plan as union + window (ONE hash shuffle
    # on the key), never as a quadratic theta-join.
    from mini_log_lakehouse_spark.operators import temporal

    plan = _plan(temporal.asof_error_attribution(spark, sf_dir))
    assert "Window" in plan and "Union" in plan
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in plan


def test_revenue_aggregates_below_join(spark, sf_dir):
    # lineitem must collapse to orderkey grain BEFORE joining orders: a
    # partial_sum over l_extendedprice appears in the plan upstream of the
    # join (HashAggregate before the orders-side join operator).
    plan = _plan(rel_ops.top_customers_by_revenue(spark, sf_dir))
    # the orderkey-grain aggregate is the distinctive marker of the
    # agg-below-join shape (its keys are the join key, not the group key)
    assert "HashAggregate(keys=[l_orderkey" in plan


def test_reservoir_sample_uses_window_group_limit(spark, sf_dir):
    # the per-source rank<=K filter must push a WindowGroupLimit below the
    # full window sort (Spark 3.5+/4.x): each shard forwards only ~K
    # candidate rows into the shuffle instead of every row.
    from mini_log_lakehouse_spark.operators import sampling

    plan = _plan(sampling.doc_reservoir_per_source(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_tfidf_topk_uses_window_group_limit(spark, sf_dir):
    # doc_tfidf_top_terms ranks doc-term pairs per doc and keeps rank<=K:
    # the filter must push a WindowGroupLimit (each task forwards ~K rows
    # per doc into the window sort, not the full posting list), and the
    # corpus-size scalar must ride a broadcast, not a shuffled join.
    from mini_log_lakehouse_spark.operators import textstats

    plan = _plan(textstats.doc_tfidf_top_terms(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row n_docs scalar


def test_q3_aggregates_lineitem_below_join(spark, sf_dir):
    # the Q3 shape must collapse lineitem to orderkey grain before any
    # join, and plan the top-10 as TakeOrderedAndProject.
    plan = _plan(rel_ops.tpch_q3_shipping_priority(spark, sf_dir))
    assert "HashAggregate(keys=[l_orderkey" in plan
    assert "TakeOrderedAndProject" in plan


def test_q5_region_dims_broadcast_and_filter_pushed(spark, sf_dir):
    # region/nation prune the customer side via broadcast joins, the
    # region filter reaches the region scan, and the supplier join takes
    # the nation-equality as a join key (no post-join filter on it).
    plan = _plan(rel_ops.tpch_q5_local_supplier_volume(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    supplier_joins = [l for l in plan.splitlines() if "Join" in l and "s_suppkey" in l]
    assert supplier_joins, "no join on s_suppkey found in plan"
    assert "s_nationkey" in supplier_joins[0]


def test_q6_all_predicates_pushed_no_shuffle_rows(spark, sf_dir):
    # Q6 is the pure scan-and-fold shape: every predicate must reach the
    # parquet scan, there must be no join, and only the two-column
    # projection may be read.
    plan = _plan_formatted(rel_ops.tpch_q6_forecast_revenue(spark, sf_dir))
    assert "Join" not in plan
    for pushed in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    ):
        assert pushed in plan, f"missing pushed filter {pushed}"
    assert "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate" in plan


def test_q17_brand_filter_broadcasts_into_threshold_build(spark, sf_dir):
    # the decorrelated scalar subquery: brand-pruned part keys broadcast
    # into BOTH the per-part average build and the probe — the per-part
    # aggregate must not run over unfiltered lineitem.
    plan = _plan(rel_ops.tpch_q17_small_quantity_revenue(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "PushedFilters: [IsNotNull(p_brand), EqualTo(p_brand,Brand#19)" in plan


def test_curation_is_join_free_single_fp_shuffle(spark, sf_dir):
    # the composed curation pipeline must stay one map pass + one shuffle
    # on the content fingerprint (for the dedup window) + the final tiny
    # aggregate — no joins anywhere.
    from mini_log_lakehouse_spark.operators import curation

    plan = _plan(curation.doc_curation_summary(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("hashpartitioning(_fp") == 1


def test_q1_partial_aggregation_stays_in_longs(spark, sf_dir):
    # the split-radix money sums must keep wide-decimal arithmetic out of
    # the per-row path: no decimal(38,...) in any partial aggregate — the
    # recombine may only appear in the final per-group result expressions.
    plan = _plan(rel_ops.tpch_q1_pricing_summary(spark, sf_dir))
    partials = [l for l in plan.splitlines() if "partial_sum" in l]
    assert partials, "no partial aggregation found"
    for line in partials:
        assert "decimal(38" not in line, f"wide decimal in partial agg: {line}"


def test_q2_min_joinback_broadcasts_at_catalog_grain(spark, sf_dir):
    # after the single (partkey, suppkey) aggregation of lineitem, the
    # part slice, region roster, and per-part min must all broadcast —
    # exactly one exchange may partition fact-derived data.
    plan = _plan(rel_ops.tpch_q2_min_cost_supplier(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "HashAggregate(keys=[l_partkey" in plan


def test_q8_part_prunes_fact_before_shuffle_joins(spark, sf_dir):
    # the ECONOMY part slice must broadcast into lineitem (killing rows
    # before the orders shuffle), and the region-customer membership test
    # must plan as a semi join, not an inner join carrying columns.
    plan = _plan(rel_ops.tpch_q8_market_share(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(p_type), EqualTo(p_type,ECONOMY)" in plan
    assert "LeftSemi" in plan


def test_q13_outer_join_two_level_aggregation(spark, sf_dir):
    # customer LEFT OUTER orders with the priority filter INSIDE the join
    # condition (pushing it below the outer join would drop zero-order
    # customers), then custkey-grain count, then the histogram re-agg.
    plan = _plan(rel_ops.tpch_q13_customer_distribution(spark, sf_dir))
    assert "LeftOuter" in plan
    assert "HashAggregate(keys=[c_custkey" in plan
    assert "HashAggregate(keys=[c_count" in plan


def test_q20_nested_subqueries_become_broadcast_semi(spark, sf_dir):
    # both decorrelated IN-subqueries must reach the supplier dimension
    # as broadcasts, the roster membership as LEFT SEMI.
    plan = _plan(rel_ops.tpch_q20_excess_stock_suppliers(spark, sf_dir))
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)" in plan


def test_q21_fact_work_stays_on_orderkey_partitioning(spark, sf_dir):
    # the per-order aggregate and the max-shipdate self-join must both
    # key on l_orderkey (one partitioning reused), and the supplier/
    # nation/region attribution must broadcast at the end.
    plan = _plan(rel_ops.tpch_q21_waiting_orders(spark, sf_dir))
    assert "hashpartitioning(l_orderkey" in plan
    assert "BroadcastHashJoin" in plan
    assert "partial_count(distinct l_suppkey" in plan or "count(distinct l_suppkey" in plan


def test_fk_orphan_audit_finds_planted_orphans(spark):
    """The integrity audit must actually count orphans, NULL keys must
    not be counted as orphans, and an intact edge reports zero."""
    from mini_log_lakehouse_spark.operators.relational import fk_orphan_counts

    child = spark.createDataFrame(
        [(1,), (2,), (2,), (99,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = fk_orphan_counts(child, "fk", parent, "pk", "t.fk->p.pk").collect()[0]
    assert row["relationship"] == "t.fk->p.pk"
    assert row["n_child_rows"] == 5
    assert row["n_orphans"] == 1  # only 99; NULL is unknown, not orphan
