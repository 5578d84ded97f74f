"""Run every (queries, oracle_sql) pair exactly as the driver does, at
sf0.001 for speed (the driver uses sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_harness import compare

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["event_type", "errors", "requests"]


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir, name)
