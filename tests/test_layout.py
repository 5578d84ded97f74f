"""Z-order clustering + zonemap data skipping (functions/zorder.py,
plans/lakehouse.py compact/zonemap/read_pruned, operators/layout.py).

What must hold:
- the Morton-code expression interleaves bucket bits correctly (pure
  unit checks on small literals);
- a Z-ordered rewrite changes NO answers (pruned read == plain filter);
- the zonemap actually SKIPS files on range predicates over EITHER
  Z-order key — the property lexicographic clustering cannot give the
  trailing key;
- an empty pruning result still returns the right (empty) schema.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mini_log_lakehouse_spark.functions.zorder import (
    interleave_bits,
    quantile_boundaries,
    range_bucket,
    zorder_key,
)
from mini_log_lakehouse_spark.plans.lakehouse import LakehouseTable


def test_interleave_bits_small_values(spark):
    # 2 dims, 2 bits: x=0b10, y=0b01 -> z bits (x1 y1 x0 y0) = 1 0 0 1 = 9
    df = spark.createDataFrame([Row(x=2, y=1)])
    z = df.select(
        interleave_bits([F.col("x"), F.col("y")], bits=2).alias("z")
    ).first()
    assert z.z == 0b1001


def test_range_bucket_is_boundary_count(spark):
    bounds = [10.0, 20.0, 30.0]
    df = spark.createDataFrame(
        [Row(v=float(v)) for v in (5, 10, 15, 30, 99)] + [Row(v=None)]
    )
    got = [
        r.b
        for r in df.select(range_bucket(F.col("v"), bounds).alias("b"))
        .orderBy(F.col("v").asc_nulls_first())
        .collect()
    ]
    # null -> 0; 5 -> 0; 10 -> 1 (>=10); 15 -> 1; 30 -> 3; 99 -> 3
    assert got == [0, 0, 1, 1, 3, 3]


def test_quantile_boundaries_are_sorted_distinct(spark, sf_dir):
    from mini_log_lakehouse_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events")
    bounds = quantile_boundaries(ev, ["user_id", "value"], bits=4)
    for c in ("user_id", "value"):
        bs = bounds[c]
        assert bs == sorted(bs)
        assert len(bs) == len(set(bs))
        assert len(bs) <= 15


@pytest.fixture(scope="module")
def ztable(spark, sf_dir, tmp_path_factory):
    from mini_log_lakehouse_spark.sources.registry import load_table

    root = str(tmp_path_factory.mktemp("zorder"))
    tbl = LakehouseTable(spark, root, "events_z")
    tbl.write(load_table(spark, sf_dir, "events"))
    tbl.compact(target_partitions=8, zorder_by=["user_id", "value"])
    return tbl


def test_zorder_rewrite_preserves_rows(spark, sf_dir, ztable):
    from mini_log_lakehouse_spark.sources.registry import load_table

    raw = load_table(spark, sf_dir, "events")
    assert ztable.read().count() == raw.count()
    # exact multiset equality via symmetric EXCEPT ALL
    assert ztable.read().exceptAll(raw).count() == 0
    assert raw.exceptAll(ztable.read()).count() == 0


def test_pruned_read_equals_plain_filter(spark, sf_dir, ztable):
    from mini_log_lakehouse_spark.sources.registry import load_table

    raw = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").between(10, 40) & F.col("value").between(20.0, 60.0)
    )
    pruned = ztable.read_pruned({"user_id": (10, 40), "value": (20.0, 60.0)})
    assert pruned.exceptAll(raw).count() == 0
    assert raw.exceptAll(pruned).count() == 0


def _files_read(tbl: LakehouseTable, predicates: dict) -> tuple[int, int]:
    zm = tbl.zonemap()
    total = zm.count()
    cond = F.lit(True)
    for c, (lo, hi) in predicates.items():
        if lo is not None:
            cond = cond & (F.col(f"max_{c}") >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(f"min_{c}") <= F.lit(hi))
    return zm.filter(cond).count(), total


def _quarter_ranges(tbl: LakehouseTable) -> tuple[tuple, tuple]:
    """Bottom-quartile ranges of both keys, derived from the data so the
    test holds at any corpus size (a fixed literal can cover the whole
    key domain at the smallest sf and prune nothing)."""
    df = tbl.read()
    u_hi = df.stat.approxQuantile("user_id", [0.25], 0.01)[0]
    v_hi = df.stat.approxQuantile("value", [0.25], 0.01)[0]
    return (None, u_hi), (None, v_hi)


def test_zonemap_skips_on_both_dimensions(ztable):
    # A narrow range on EITHER key must prune files: that is the Z-order
    # property (lexicographic layout would only prune the leading key).
    u_range, v_range = _quarter_ranges(ztable)
    read_u, total = _files_read(ztable, {"user_id": u_range})
    assert total >= 8
    assert read_u < total
    read_v, _ = _files_read(ztable, {"value": v_range})
    assert read_v < total
    # the 2-D rectangle prunes at least as hard as either single key
    read_uv, _ = _files_read(ztable, {"user_id": u_range, "value": v_range})
    assert read_uv <= min(read_u, read_v)


def test_lexicographic_layout_misses_trailing_key(spark, sf_dir, tmp_path_factory):
    """The control experiment: cluster_by (lexicographic on user_id,
    value) leaves value spread across every file, so a value-only
    predicate reads everything — motivating the Morton interleave."""
    from mini_log_lakehouse_spark.sources.registry import load_table

    root = str(tmp_path_factory.mktemp("lex"))
    tbl = LakehouseTable(spark, root, "events_lex")
    tbl.write(load_table(spark, sf_dir, "events"))
    tbl.compact(target_partitions=8, cluster_by=["user_id", "value"])
    _, v_range = _quarter_ranges(tbl)
    read_v, total = _files_read(tbl, {"value": v_range})
    assert total >= 8
    assert read_v == total


def test_pruned_read_empty_rectangle(ztable):
    out = ztable.read_pruned({"user_id": (10**9, None)})
    assert out.count() == 0
    assert out.columns == ztable.read().columns


def test_zorder_driver_query_matches_oracle(spark, sf_dir):
    import duckdb

    from mini_log_lakehouse_spark.operators import layout

    got = (
        layout.events_zorder_pruned(spark, sf_dir)
        .toPandas()
        .to_dict("records")
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = (
        con.execute(layout.ORACLES["events_zorder_pruned"]).fetchdf().to_dict("records")
    )
    assert got == want


def test_zorder_key_single_column_is_monotone(spark):
    df = spark.createDataFrame([Row(v=float(i)) for i in range(100)])
    out = (
        df.select("v", zorder_key(df, ["v"], bits=4).alias("z"))
        .orderBy("v")
        .collect()
    )
    zs = [r.z for r in out]
    assert zs == sorted(zs)
    assert zs[-1] <= 15
