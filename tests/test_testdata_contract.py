"""Loud, early detection of driver testdata schema drift.

The driver regenerates /root/testdata each round and has already shipped
events.ts in three parquet flavors (TIMESTAMP(NANOS), non-UTC
TIMESTAMP(MICROS)/NTZ, UTC TIMESTAMP(MICROS) — see sources/registry.py).
Round 3 lost a session to diagnosing that silently: the streaming reader
hard-coded one flavor and an interval join over-matched 20×. This test
pins every assumption the operators make about the tables, so the NEXT
drift fails here with a named column and type instead of as a value
mismatch deep inside some oracle.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from mini_log_lakehouse_spark.sources.registry import TABLES, load_table

#: (table, column) -> allowed pyarrow type strings at the FILE level.
_FILE_LEVEL = {
    ("events", "ts"): {"int64", "timestamp[ns]", "timestamp[us]", "timestamp[us, tz=UTC]"},
    ("embeddings", "embedding"): {"list<element: float>", "list<item: float>"},
    ("documents", "text"): {"string", "large_string"},
    ("lineitem", "l_quantity"): {"double"},
    ("lineitem", "l_extendedprice"): {"double"},
    ("orders", "o_totalprice"): {"double"},
    ("customer", "c_acctbal"): {"double"},
}

#: After load_table normalization, the Spark-level dtype every operator
#: may rely on.
_NORMALIZED = {
    ("events", "ts"): {"timestamp"},
    ("events", "event_id"): {"bigint"},
    ("events", "user_id"): {"bigint"},
    ("events", "event_type"): {"string"},
    ("events", "value"): {"double"},
    ("events", "props"): {"string"},
    ("documents", "doc_id"): {"bigint"},
    ("documents", "n_chars"): {"bigint"},
    ("embeddings", "vec_id"): {"bigint"},
    ("embeddings", "embedding"): {"array<float>"},
    ("lineitem", "l_shipdate"): {"timestamp", "timestamp_ntz", "date"},
    ("orders", "o_orderdate"): {"timestamp", "timestamp_ntz", "date"},
}


@pytest.mark.parametrize("table", sorted({t for t, _ in _FILE_LEVEL}))
def test_file_level_schema(sf_dir, table):
    schema = pq.read_schema(f"{sf_dir}/{table}.parquet")
    for (t, col), allowed in _FILE_LEVEL.items():
        if t != table:
            continue
        got = str(schema.field(col).type)
        assert got in allowed, (
            f"{t}.{col}: parquet type {got!r} is not one of {sorted(allowed)} — "
            "the driver changed the testdata schema; audit every reader of "
            f"this column (grep for {col!r}) before trusting oracle results."
        )


def test_normalized_spark_dtypes(spark, sf_dir):
    for table in sorted({t for t, _ in _NORMALIZED}):
        dtypes = dict(load_table(spark, sf_dir, table).dtypes)
        for (t, col), allowed in _NORMALIZED.items():
            if t != table:
                continue
            assert dtypes.get(col) in allowed, (
                f"{t}.{col}: normalized dtype {dtypes.get(col)!r} not in "
                f"{sorted(allowed)} — loader normalization in "
                "sources/registry.py no longer covers this testdata flavor."
            )


def test_all_tables_load_nonempty(spark, sf_dir):
    for t in TABLES:
        assert load_table(spark, sf_dir, t).limit(1).count() == 1, f"{t} is empty"
