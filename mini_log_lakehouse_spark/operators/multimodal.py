"""Multimodal columns (north-star surface): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
pandas iterators (mapInPandas).

The container has no image/audio libraries, so the actual codec step is
STUBBED exactly as the brief requires: ``decode_image``/``decode_audio``
raise NotImplementedError unless the real library is importable, and a
clearly-marked deterministic FAKE decoder exercises the full Spark-side
plumbing — schema, binary Arrow transfer, batch iteration, multi-row
yield (frame sampling) — which is the part that must be real and tested.

Scale notes: media processing is a map-only stage; binary payloads ride
Arrow record batches into Python once (no per-row pickling). Partition
sizing is governed by bytes not rows — at 100 TB you bound
``spark.sql.files.maxPartitionBytes`` and let each task stream its
batches; nothing here shuffles.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mini_log_lakehouse_spark.sources.registry import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("mime", T.StringType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media table over the documents testdata: the utf-8 bytes of
    ``text`` play the opaque payload, so every downstream byte-level
    operator has a DuckDB-checkable ground truth."""
    d = load_table(spark, sf_dir, "documents")
    kind = F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio")
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
            F.when(F.col("doc_id") % 2 == 0, "image/fake").otherwise("audio/fake").alias("mime"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


# --- codec layer -------------------------------------------------------------

def decode_image(content: bytes):
    """Real image decode — requires pillow, which is NOT in this
    container. Gated import-try per the environment contract."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(content))
    except ImportError as exc:  # pragma: no cover - env has no pillow
        raise NotImplementedError(
            "image decode requires pillow; not available in this environment "
            "— use fake_decode for plumbing tests"
        ) from exc


def decode_audio(content: bytes):
    """Real audio decode — requires soundfile/librosa (absent here)."""
    try:
        import soundfile  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "audio decode requires soundfile; not available in this "
            "environment — use fake_decode for plumbing tests"
        ) from exc


def fake_decode(content: bytes) -> dict:
    """FAKE deterministic decoder (clearly marked): derives stable
    pseudo-dimensions from the payload hash. Stands in for a codec so the
    Spark-side plumbing is exercised end-to-end."""
    h = hashlib.md5(content).digest()
    return {
        "width": 16 + h[0] % 64,
        "height": 16 + h[1] % 64,
        "channels": 1 + h[2] % 3,
    }


# --- Arrow-batched operators --------------------------------------------------

BYTE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("first_byte", T.LongType()),
    ]
)


def extract_byte_features(media: DataFrame) -> DataFrame:
    """Codec-free byte features via mapInPandas (oracle-checkable)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(len).astype("int64"),
                    "checksum": content.map(lambda b: hashlib.md5(b).hexdigest()),
                    "first_byte": content.map(lambda b: b[0] if len(b) else -1).astype("int64"),
                }
            )

    return media.mapInPandas(run, schema=BYTE_FEATURES_SCHEMA)


MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def extract_media_features(
    media: DataFrame, decoder: Callable[[bytes], dict] = fake_decode
) -> DataFrame:
    """Decode + feature-extract per media row (pluggable decoder; the
    default is the deterministic fake — swap decode_image/decode_audio in
    an environment that has codecs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["content"].map(decoder)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": feats.map(lambda f: f["width"]).astype("int32"),
                    "height": feats.map(lambda f: f["height"]).astype("int32"),
                    "channels": feats.map(lambda f: f["channels"]).astype("int32"),
                }
            )

    return media.mapInPandas(run, schema=MEDIA_FEATURES_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def frame_sample(media: DataFrame, frame_bytes: int = 64, every: int = 4) -> DataFrame:
    """Video-style frame sampling: split the payload into fixed-size
    chunks ("frames") and keep every Nth — a one-to-many mapInPandas
    (each input row yields multiple output rows)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n_frames = max(1, len(content) // frame_bytes)
                for i in range(0, n_frames, every):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(content[i * frame_bytes : (i + 1) * frame_bytes]))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


# --- driver-contract queries --------------------------------------------------

def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(spark, sf_dir)
    return extract_byte_features(media).orderBy("media_id")


def multimodal_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked: the FAKE decoder derives pseudo-dimensions from
    md5-digest bytes, which DuckDB reproduces from hex(md5) substrings —
    so even the stubbed codec path gets a cross-engine value check."""
    media = documents_as_media(spark, sf_dir)
    return extract_media_features(media).orderBy("media_id")


def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling rollup — oracle-checkable arithmetic on lengths."""
    media = documents_as_media(spark, sf_dir)
    frames = frame_sample(media)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(F.octet_length("frame")).cast("long").alias("sampled_bytes"),
        )
        .orderBy("media_id")
    )


ORACLES: dict[str, str] = {
    # first_byte is byte-true: the first UTF-8 *byte* of the payload (hex of
    # the blob, not ascii() which returns the Unicode code point and diverges
    # on any non-ASCII leading char), with -1 for empty matching the Spark
    # side's empty-payload sentinel.
    "multimodal_byte_features": """
        SELECT doc_id AS media_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS checksum,
               CASE WHEN text = '' THEN -1
                    ELSE ('0x' || substring(hex(encode(text)), 1, 2))::BIGINT
               END AS first_byte
        FROM documents
        ORDER BY media_id
    """,
    # The fake decoder's dims come from md5-digest bytes h[0..2]
    # (fake_decode above); DuckDB's md5() returns the hex string of the
    # same utf-8-byte digest, so byte i is ('0x' || hex[2i+1..2i+2])::INT.
    "multimodal_media_features": """
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
               CAST(16 + ('0x' || substring(md5(text), 1, 2))::INT % 64 AS INT) AS width,
               CAST(16 + ('0x' || substring(md5(text), 3, 2))::INT % 64 AS INT) AS height,
               CAST(1 + ('0x' || substring(md5(text), 5, 2))::INT % 3 AS INT) AS channels
        FROM documents
        ORDER BY media_id
    """,
    # frame sampling closed-form: chunk count floor-divides, so every kept
    # chunk is a full 64 bytes (except the nb<64 single-chunk case);
    # kept = ((nb//64 − 1) // 4) + 1.
    "multimodal_frame_stats": """
        WITH m AS (
            SELECT doc_id AS media_id,
                   octet_length(encode(text)) AS nb,
                   greatest(octet_length(encode(text)) // 64, 1) AS nf
            FROM documents
        )
        SELECT media_id,
               CAST((nf - 1) // 4 + 1 AS BIGINT) AS n_frames,
               CAST(CASE WHEN nb >= 64 THEN ((nf - 1) // 4 + 1) * 64
                         ELSE nb END AS BIGINT) AS sampled_bytes
        FROM m
        ORDER BY media_id
    """,
}

QUERIES = {
    "multimodal_byte_features": multimodal_byte_features,
    "multimodal_media_features": multimodal_media_features,
    "multimodal_frame_stats": multimodal_frame_stats,
}
