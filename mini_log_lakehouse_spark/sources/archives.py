"""ZIP archive ingestion — the shape crawl dumps and annotation
exports actually arrive in: many modest archives, each holding many
small text members. Reading them distributed is a two-level source
problem Spark has no built-in for:

- **Archive grain parallelism.** ``binaryFile`` lists and reads whole
  archives as (path, content) rows — one task per archive, parallelism
  from archive COUNT (a zip's central directory lives at EOF, so an
  archive is not splittable; the 100 TB rule is "keep archives modest
  and numerous", same as gzip JSONL). ``binaryFile`` caps a single
  file at spark.sql.sources.binaryFile.maxLength (int32) — oversized
  archives must be split upstream.
- **Member expansion in Arrow batches.** A ``mapInPandas`` pass opens
  each archive with stdlib ``zipfile`` (DEFLATE decode included) and
  explodes members to (archive, member, text) rows — vectorized
  batch-out, no row-at-a-time Python, no driver-side unzipping.

The roundtrip entry exports one DEFLATE zip per lang (driver-side prep
— synthesis is not the operator under test), reads them back through
the distributed path, and hash-gates the aggregate against the
parquet-side oracle: member naming, UTF-8 decode and the inflate loop
must all round-trip every byte.

Reference parity: no archive surface exists in the reference (nginx
regex ingest only); this extends the interchange tier next to JSONL /
ORC / CSV (sources/jsonl.py, sources/formats.py).
"""

from __future__ import annotations

import io
import os
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ZIP_MEMBERS_SCHEMA = T.StructType(
    [
        T.StructField("archive", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def read_zip_members(spark: SparkSession, path: str) -> DataFrame:
    """Distributed zip expansion: archives at file grain via
    ``binaryFile``, members inflated inside an Arrow-batched pass.
    Member names are ``doc_<id>.txt``; the archive column is the
    file's basename without extension (its partition label)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.zip")
        .load(path)
        .select("path", "content")
    )

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"archive": [], "doc_id": [], "text": []}
            for p, content in zip(pdf["path"], pdf["content"]):
                label = os.path.basename(p)[: -len(".zip")]
                with zipfile.ZipFile(io.BytesIO(content)) as zf:
                    for name in zf.namelist():
                        stem = os.path.basename(name)
                        if not stem.startswith("doc_") or not stem.endswith(
                            ".txt"
                        ):
                            continue
                        try:
                            doc_id = int(stem[4:-4])
                            text = zf.read(name).decode("utf-8")
                        except (ValueError, UnicodeDecodeError):
                            # doc_index.txt / non-UTF-8 payloads are
                            # foreign members too: skip, never fail
                            # the task (tolerant-source contract)
                            continue
                        out["archive"].append(label)
                        out["doc_id"].append(doc_id)
                        out["text"].append(text)
            yield pd.DataFrame(out)

    return raw.mapInPandas(expand, schema=ZIP_MEMBERS_SCHEMA)


def write_zip_archives(df_pandas: pd.DataFrame, path: str) -> None:
    """One DEFLATE zip per lang under ``path`` (driver-side export
    prep; deterministic member order by doc_id)."""
    os.makedirs(path, exist_ok=True)
    # NULL contract (found by the null-text corpus): a missing/empty
    # lang shards into the visible 'unknown' archive — pandas groupby
    # silently DROPS the NULL group, and a ''-named shard would write
    # ".zip", a dotfile Hadoop file sources ignore; missing text is the
    # empty member (str(None) wrote the literal string "None")
    lang_filled = df_pandas["lang"].fillna("").replace("", "unknown")
    df_pandas = df_pandas.assign(
        lang=lang_filled, text=df_pandas["text"].fillna("")
    )
    for lang, g in df_pandas.groupby("lang"):
        with zipfile.ZipFile(
            os.path.join(path, f"{lang}.zip"), "w", zipfile.ZIP_DEFLATED
        ) as zf:
            for _, row in g.sort_values("doc_id").iterrows():
                zf.writestr(
                    f"doc_{int(row['doc_id'])}.txt",
                    str(row["text"]).encode("utf-8"),
                )


def _exported_archives(spark: SparkSession, sf_dir: str) -> str:
    """Session-memoized zip export, sharing the formats._export cache
    (one memo implementation for every interchange tier)."""
    from mini_log_lakehouse_spark.sources.formats import _export

    def write(path: str) -> None:
        docs = pd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "lang"],
        )
        write_zip_archives(docs, path)

    return _export(spark, sf_dir, "zip", write)


def documents_zip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: pack documents into one DEFLATE zip per lang,
    read them back through the distributed binaryFile + mapInPandas
    expansion, and aggregate per archive — doc counts, char totals,
    distinct text fingerprints and the doc_id checksum only match the
    parquet-side oracle if member naming, the inflate loop and UTF-8
    decoding round-tripped every byte of every member."""
    path = _exported_archives(spark, sf_dir)
    members = read_zip_members(spark, path)
    return (
        members.groupBy(F.col("archive").alias("lang"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
            F.countDistinct(F.md5("text")).alias("n_distinct_texts"),
            F.sum("doc_id").cast("long").alias("doc_id_sum"),
        )
        .orderBy("lang")
    )


ORACLES: dict[str, str] = {
    "documents_zip_roundtrip": """
        SELECT CASE WHEN lang IS NULL OR lang = '' THEN 'unknown' ELSE lang END AS lang,
               COUNT(*) AS n_docs,
               CAST(SUM(length(COALESCE(text, ''))) AS BIGINT) AS total_chars,
               COUNT(DISTINCT md5(COALESCE(text, ''))) AS n_distinct_texts,
               CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
        FROM documents
        GROUP BY 1
        ORDER BY 1
    """,
}

QUERIES = {
    "documents_zip_roundtrip": documents_zip_roundtrip,
}
