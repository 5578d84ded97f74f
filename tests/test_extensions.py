from __future__ import annotations

from mini_log_lakehouse_spark.operators import extensions


def test_approx_distinct_within_rsd(spark, sf_dir):
    row = extensions.approx_distinct_users(spark, sf_dir).collect()[0]
    exact, approx = row["exact_users"], row["approx_users"]
    assert exact > 0
    assert abs(approx - exact) / exact < 0.1  # rsd 0.02, generous bound


def test_cube_has_all_grouping_sets(spark, sf_dir):
    rows = extensions.orders_cube_status_priority(spark, sf_dir).collect()
    shapes = {(r["o_orderstatus"] is None, r["o_orderpriority"] is None) for r in rows}
    assert shapes == {(False, False), (False, True), (True, False), (True, True)}
