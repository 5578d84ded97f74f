"""The harness itself must catch cross-engine TYPE divergence, not just
value divergence: the driver's hash gate compares Arrow-materialized
results, where DuckDB types a bare SUM(int) as HUGEINT -> decimal128(38,0)
while Spark emits int64 — identical values, red row (observed:
tpch_q12_late_shipment_priority, CORRECTNESS_r04). fetchall() hides the
hazard by converting HUGEINT to plain Python int, so run_oracle must go
through Arrow and reject decimal output types.
"""

from __future__ import annotations

import pytest

from tests.oracle_harness import run_oracle


def test_bare_sum_case_is_rejected(sf_dir):
    # Pre-r5 q12 shape: bare SUM(CASE ...) -> DuckDB HUGEINT. Must fail
    # locally instead of sailing through to a driver hash mismatch.
    sql = """
        SELECT o_orderpriority,
               SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS n
        FROM orders GROUP BY 1
    """
    with pytest.raises(AssertionError, match="decimal128"):
        run_oracle(sql, sf_dir)


def test_bare_decimal_literal_sum_is_rejected(sf_dir):
    sql = "SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s FROM orders"
    with pytest.raises(AssertionError, match="decimal"):
        run_oracle(sql, sf_dir)


def test_cast_bigint_passes(sf_dir):
    sql = """
        SELECT CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n
        FROM orders
    """
    cols, rows = run_oracle(sql, sf_dir)
    assert cols == ["n"]
    assert len(rows) == 1 and isinstance(rows[0][0], int)
