"""JSONL source/sink: lossless roundtrip and partitioned layout."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mini_log_lakehouse_spark.sources import jsonl
from mini_log_lakehouse_spark.sources.registry import load_table


def test_jsonl_roundtrip_is_lossless(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_jsonl")
    jsonl.write_jsonl(d, path, partition_by=("lang",))
    back = jsonl.read_jsonl(spark, path, jsonl.DOCUMENTS_JSONL_SCHEMA)

    orig = {r["doc_id"]: r for r in d.collect()}
    got = {r["doc_id"]: r for r in back.collect()}
    assert set(orig) == set(got)
    for i, r in got.items():
        o = orig[i]
        # text must survive JSON escaping byte-for-byte; the partition
        # column must round-trip through the directory name
        assert r["text"] == o["text"]
        assert r["lang"] == o["lang"]
        assert r["source"] == o["source"]
        assert r["n_chars"] == o["n_chars"]


def test_jsonl_write_is_hive_partitioned_and_compressed(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_part")
    jsonl.write_jsonl(d, path, partition_by=("lang",))
    langs = {r["lang"] for r in d.select("lang").distinct().collect()}
    dirs = {n for n in os.listdir(path) if n.startswith("lang=")}
    assert dirs == {f"lang={v}" for v in langs}
    some = next(iter(dirs))
    files = [
        f
        for f in os.listdir(os.path.join(path, some))
        if f.endswith(".json.gz")
    ]
    assert files, "expected gzip JSONL part files"


def test_jsonl_partition_pruning(spark, sf_dir, tmp_path):
    """A lang filter on the partitioned layout must prune to one
    directory — PartitionFilters in the scan, nothing read elsewhere."""
    d = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_prune")
    jsonl.write_jsonl(d, path, partition_by=("lang",))
    back = jsonl.read_jsonl(spark, path, jsonl.DOCUMENTS_JSONL_SCHEMA).filter(
        F.col("lang") == "zh"
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan or "lang#" in plan
    n_zh = d.filter(F.col("lang") == "zh").count()
    assert back.count() == n_zh
