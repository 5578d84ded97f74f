"""Degenerate-corpus robustness: every registry entry must SURVIVE an
empty warehouse and a 1-row warehouse with dangling foreign keys.

At 100 TB these shapes are routine, not exotic: an empty date
partition, a shard holding a single record, a filter or partition
prune that matches nothing, a dimension delivered before its facts.
They are also exactly where distributed pipelines crash in practice —
``.collect()[0]`` on an empty model frame, numpy reductions over a
zero-length sample (k-means/IVF training), zero denominators in
ratios, ``max()`` of an empty sequence in driver-side index builds.

The contract here is deliberately weaker than the oracle hash-compare
(tests/test_entry_contract.py): the entry must PLAN and EXECUTE
without raising, and the result schema must be identical to the
schema produced on the real sf0.001 corpus (a schema that mutates
when the input is empty breaks downstream consumers that bound their
columns before the partition arrived). Row VALUES on degenerate input
are checked by the few entries with explicit zero-guard oracles; this
suite is the crash gate.

The 1-row warehouse intentionally has inconsistent FKs (each table is
``limit(1)`` taken independently, so e.g. the single customer row may
reference a nation that is not the single nation row): joins must
degrade to empty results, never to errors.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

SOURCE_SF_DIR = "/root/testdata/sf0.001"


def _build_variant(spark, out_dir: str, n_rows: int) -> str:
    for name in TABLES:
        df = spark.read.parquet(f"{SOURCE_SF_DIR}/{name}.parquet").limit(n_rows)
        df.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
    return out_dir


@pytest.fixture(scope="session")
def empty_sf_dir(spark, tmp_path_factory) -> str:
    return _build_variant(spark, str(tmp_path_factory.mktemp("sf_empty")), 0)


@pytest.fixture(scope="session")
def tiny_sf_dir(spark, tmp_path_factory) -> str:
    return _build_variant(spark, str(tmp_path_factory.mktemp("sf_tiny")), 1)


@pytest.fixture(scope="session")
def tail_shard_sf_dir(spark, tmp_path_factory) -> str:
    """Embeddings whose vec_ids ALL sit above IVF_TRAIN_SAMPLE and
    KNN_QUERY_COUNT (ids shifted +1000) — a tail shard of an
    append-only id space: no quantizer training sample, no query
    vectors. Found in review: the empty-quantizer (0, 0) shape escaped
    incremental_ann_ivf_topk's guards into a numpy matmul."""
    import duckdb

    out = str(tmp_path_factory.mktemp("sf_tail"))
    for name in TABLES:
        if name != "embeddings":
            df = spark.read.parquet(f"{SOURCE_SF_DIR}/{name}.parquet")
            df.coalesce(1).write.parquet(f"{out}/{name}.parquet")
    con = duckdb.connect()
    try:
        con.execute(
            f"""COPY (SELECT vec_id + 1000 AS vec_id, embedding, label
                FROM read_parquet('{SOURCE_SF_DIR}/embeddings.parquet'))
                TO '{out}/embeddings.parquet' (FORMAT PARQUET)"""
        )
    finally:
        con.close()
    return out


@pytest.mark.parametrize(
    "name",
    [
        "incremental_ann_ivf_topk",
        "ann_ivf_topk",
        "ann_ivfpq_topk",
        "ann_knn_join",
        "ann_cosine_topk",
        "ann_recall_report",
        "embedding_kmeans_clusters",
    ],
)
def test_ann_entry_survives_tail_shard(spark, tail_shard_sf_dir, name):
    QUERIES[name](spark, tail_shard_sf_dir).collect()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_entry_survives_degenerate_corpora(
    spark, sf_dir, empty_sf_dir, tiny_sf_dir, name
):
    fn = QUERIES[name]
    reference_schema = [
        (f.name, f.dataType.simpleString()) for f in fn(spark, sf_dir).schema.fields
    ]
    for variant in (empty_sf_dir, tiny_sf_dir):
        df = fn(spark, variant)
        got_schema = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
        assert got_schema == reference_schema, (
            f"{name}: schema drifted on degenerate input {variant!r}"
        )
        df.collect()  # must execute, not just plan
