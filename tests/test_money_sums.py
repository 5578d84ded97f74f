"""Property-based exactness of the split-radix money accumulation
(relational._split/_split_sum/_cents_sum): for arbitrary money values the
Spark result must equal an exact Python-Decimal reference — the split
into (hi, lo) longs, the per-group recombine, and the half-up cents
quantization must never lose a cent, for either sign, at any magnitude
a real money column can hold."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mini_log_lakehouse_spark.operators.relational import (
    _SPLIT,
    _cents_sum,
    _cents_total,
    _split,
    _split_combine,
)

# 2-decimal money values across sign and magnitude (up to ~1e9: far past
# any per-row money value in the schema; the 2^53 exactness bound for the
# split division is at 9e15 cents).
monies = st.lists(
    st.integers(-10**11, 10**11).map(lambda c: c / 100.0),
    min_size=1,
    max_size=50,
)

_SETTINGS = settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


def _ref_cents(x: float, decimals: int = 2) -> int:
    """floor(x·10^d + 0.5), computed the way Spark evaluates it (double
    multiply, then floor)."""
    return math.floor(x * 10**decimals + 0.5)


@given(vals=monies)
@_SETTINGS
def test_split_sum_matches_decimal_reference(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = df.agg(
        _cents_total(F.col("x")).alias("total"),
        _cents_sum(F.col("x")).alias("rounded"),
    ).collect()[0]
    exact = sum(_ref_cents(v) for v in vals)
    assert int(got["total"]) == exact
    want = float(
        (Decimal(exact) / 100).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    )
    assert got["rounded"] == want


@given(vals=monies)
@_SETTINGS
def test_split_halves_recombine_exactly(spark, vals):
    """hi·10^6 + lo == c per row, and the two-stage (sum halves as longs,
    combine per group) total equals the one-stage total — the invariant
    top_customers_by_revenue's orderkey→custkey re-aggregation relies on."""
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    c = F.floor(F.col("x") * 100 + F.lit(0.5))
    hi, lo = _split(c)
    rows = df.select(
        c.alias("c"), hi.alias("hi"), lo.alias("lo")
    ).collect()
    for r in rows:
        assert r["hi"] * _SPLIT + r["lo"] == r["c"]
    two_stage = (
        df.select(hi.alias("h"), lo.alias("l"))
        .agg(_split_combine(F.sum("h"), F.sum("l")).alias("total"))
        .collect()[0]["total"]
    )
    assert int(two_stage) == sum(_ref_cents(v) for v in vals)
