"""ORC + RFC 4180 CSV interchange: lossless roundtrips, partitioned
layout, and the load-bearing quote/newline machinery."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mini_log_lakehouse_spark.sources import formats
from mini_log_lakehouse_spark.sources.registry import load_table


def test_orc_roundtrip_is_lossless(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_orc")
    formats.write_orc(d, path, partition_by=("source",))
    back = formats.read_orc(spark, path, formats.DOCUMENTS_ORC_SCHEMA)

    orig = {r["doc_id"]: r for r in d.collect()}
    got = {r["doc_id"]: r for r in back.collect()}
    assert set(orig) == set(got)
    for i, r in got.items():
        o = orig[i]
        assert r["text"] == o["text"]
        assert r["lang"] == o["lang"]
        # the partition column round-trips through the directory name
        assert r["source"] == o["source"]
        assert r["n_chars"] == o["n_chars"]
    dirs = {n for n in os.listdir(path) if n.startswith("source=")}
    assert dirs, "expected Hive source= partition directories"


def test_csv_roundtrip_survives_embedded_hazards(spark, sf_dir, tmp_path):
    """Every decorated text embeds a quote, a comma and a NEWLINE; the
    RFC 4180 writer/reader pair must carry all three byte-for-byte."""
    d = formats._csv_decorate(load_table(spark, sf_dir, "documents"))
    path = str(tmp_path / "docs_csv")
    formats.write_csv(d, path)
    back = formats.read_csv(spark, path, formats.DOCUMENTS_CSV_SCHEMA)

    orig = {r["doc_id"]: r["csv_text"] for r in d.collect()}
    got = {r["doc_id"]: r["csv_text"] for r in back.collect()}
    assert orig == got
    some = next(iter(orig.values()))
    assert '"' in some and "," in some and "\n" in some


def test_csv_multiline_read_is_load_bearing(spark, sf_dir, tmp_path):
    """Reading the quoted-newline export WITHOUT multiLine shreds rows
    — the roundtrip gate is genuinely exercising the option, not
    passing by luck on hazard-free data."""
    d = formats._csv_decorate(load_table(spark, sf_dir, "documents"))
    path = str(tmp_path / "docs_csv_shred")
    formats.write_csv(d, path)
    n = d.count()
    naive = (
        spark.read.schema(formats.DOCUMENTS_CSV_SCHEMA)
        .options(**formats._CSV_OPTS)
        .csv(path)
    )
    assert naive.count() != n
    good = formats.read_csv(spark, path, formats.DOCUMENTS_CSV_SCHEMA)
    assert good.count() == n


def test_format_roundtrip_queries_agree_with_each_other(spark, sf_dir):
    """The ORC and JSONL roundtrip aggregates describe the same corpus:
    per-(lang, source) doc counts and char totals must agree exactly
    (they differ only in which export tier they passed through)."""
    from mini_log_lakehouse_spark.sources import jsonl

    orc = {
        (r["lang"], r["source"]): (r["n_docs"], r["total_chars"])
        for r in formats.documents_orc_roundtrip(spark, sf_dir).collect()
    }
    js = {
        (r["lang"], r["source"]): (r["n_docs"], r["total_chars"])
        for r in jsonl.documents_jsonl_roundtrip(spark, sf_dir).collect()
    }
    assert orc == js
