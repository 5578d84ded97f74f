"""ZIP archive ingestion: distributed member expansion and lossless
roundtrip through the DEFLATE layer."""

from __future__ import annotations

import os
import zipfile

from mini_log_lakehouse_spark.sources import archives
from mini_log_lakehouse_spark.sources.registry import load_table


def test_zip_members_roundtrip_losslessly(spark, sf_dir, tmp_path):
    import pandas as pd

    docs = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    path = str(tmp_path / "zips")
    archives.write_zip_archives(docs, path)
    # one DEFLATE archive per lang on disk
    names = sorted(os.listdir(path))
    assert names == sorted(f"{v}.zip" for v in docs["lang"].unique())
    with zipfile.ZipFile(os.path.join(path, names[0])) as zf:
        assert all(
            i.compress_type == zipfile.ZIP_DEFLATED for i in zf.infolist()
        )

    back = archives.read_zip_members(spark, path).collect()
    got = {r["doc_id"]: (r["archive"], r["text"]) for r in back}
    assert len(got) == len(docs)
    for _, row in docs.iterrows():
        a, t = got[int(row["doc_id"])]
        assert a == row["lang"] and t == row["text"]


def test_zip_expansion_ignores_foreign_members(spark, tmp_path):
    """Non-document members (manifests, checksums) are skipped, not
    crashed on or miscounted."""
    path = str(tmp_path / "zips2")
    os.makedirs(path)
    with zipfile.ZipFile(
        os.path.join(path, "xx.zip"), "w", zipfile.ZIP_DEFLATED
    ) as zf:
        zf.writestr("doc_7.txt", b"seven")
        zf.writestr("MANIFEST.txt", b"ignore me")
        zf.writestr("doc_bad.csv", b"ignore me too")
        zf.writestr("doc_index.txt", b"name matches, id does not parse")
        zf.writestr("doc_9.txt", b"\xff\xfe latin-1, not utf-8")
    rows = archives.read_zip_members(spark, path).collect()
    assert [(r["archive"], r["doc_id"], r["text"]) for r in rows] == [
        ("xx", 7, "seven")
    ]


def test_zip_roundtrip_query_matches_corpus(spark, sf_dir):
    rows = {
        r["lang"]: r
        for r in archives.documents_zip_roundtrip(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import functions as F

    want = {
        r["lang"]: r
        for r in docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("doc_id_sum"),
        )
        .collect()
    }
    assert set(rows) == set(want)
    for lang in rows:
        assert rows[lang]["n_docs"] == want[lang]["n_docs"]
        assert rows[lang]["doc_id_sum"] == want[lang]["doc_id_sum"]
