"""Local replica of the driver's correctness gate: run a Spark query and
its DuckDB oracle over the same parquet, compare row count + column names
+ values (order-insensitive, exact).

Exact value equality is intentional — the driver hash-compares, so any
float divergence must be engineered away in the queries themselves
(decimal-exact sums + rounding), not tolerated here.
"""

from __future__ import annotations

import decimal
import math
import os

import duckdb

from mini_log_lakehouse_spark.sources.registry import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        # Materialize through Arrow, not fetchall(): DuckDB's Python client
        # returns HUGEINT (bare SUM(int) output) as a plain Python int, which
        # would sail past the DECIMAL trap in _norm() — but the driver's gate
        # compares Arrow types, where HUGEINT surfaces as decimal128(38,0) and
        # hash-mismatches a Spark int64 even when values are identical
        # (observed: tpch_q12, CORRECTNESS_r04). Catch it here instead.
        tbl = cur.fetch_arrow_table()
        _assert_arrow_types_hashable(tbl.schema, sql)
        rows = [tuple(r) for r in zip(*(c.to_pylist() for c in tbl.columns))]
        if not tbl.columns:
            rows = []
        return cols, rows
    finally:
        con.close()


def _assert_arrow_types_hashable(schema, sql: str) -> None:
    import pyarrow.types as pat

    for field in schema:
        t = field.type
        if pat.is_decimal(t):
            raise AssertionError(
                f"oracle column {field.name!r} materializes as Arrow {t} "
                "(DuckDB DECIMAL/HUGEINT); the driver's hash gate is "
                "type-sensitive and Spark emits int64/double — wrap the "
                "aggregate in CAST(.. AS BIGINT) or CAST(.. AS DOUBLE). "
                f"SQL head: {sql.strip()[:120]!r}"
            )


def _norm(v):
    if isinstance(v, decimal.Decimal):
        # The driver's hasher canonicalizes DECIMAL differently per engine
        # (Arrow Decimal vs float64 depending on materialization path), so a
        # Decimal output can hash-fail even when values are digit-identical
        # on both sides. Reproduce that hazard locally as a hard failure:
        # queries must emit ROUND(CAST(.. AS DOUBLE), n) or a string instead.
        raise AssertionError(
            "query output contains DECIMAL, which the driver's hash gate "
            f"does not compare reliably (value={v!r}); emit "
            "ROUND(CAST(.. AS DOUBLE), n) or a canonical string instead"
        )
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        if v == 0.0:
            v = 0.0  # collapse -0.0
        return ("float", repr(v))
    return (type(v).__name__, str(v))


def _sorted_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out)


def compare(spark_df, oracle_sql: str, sf_dir: str, name: str = "?"):
    s_cols = spark_df.columns
    s_rows = [tuple(row) for row in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)

    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} oracle={len(o_rows)}"
    )
    s_sorted = _sorted_rows(s_cols, s_rows)
    o_sorted = _sorted_rows(o_cols, o_rows)
    if s_sorted != o_sorted:
        diffs = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(s_sorted, o_sorted))
            if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
