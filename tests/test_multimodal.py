"""Multimodal plumbing tests: binary Arrow round-trip, stubbed codecs,
one-to-many frame sampling, and determinism of the fake decoder."""

from __future__ import annotations

import pytest

from mini_log_lakehouse_spark.operators import multimodal as mm


def test_media_table_schema(spark, sf_dir):
    media = mm.documents_as_media(spark, sf_dir)
    # compare names/types, ignoring nullability flags
    assert [(f.name, f.dataType.simpleString()) for f in media.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in mm.MEDIA_SCHEMA.fields
    ]
    row = media.orderBy("media_id").first()
    assert isinstance(row["content"], (bytes, bytearray))
    assert row["meta"]["n_bytes"] == len(row["content"])


def test_decode_stubs_raise_without_codecs():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"not-an-image")
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"not-audio")


def test_fake_decoder_deterministic(spark, sf_dir):
    media = mm.documents_as_media(spark, sf_dir)
    a = sorted(map(tuple, mm.extract_media_features(media).collect()))
    b = sorted(map(tuple, mm.extract_media_features(media).collect()))
    assert a == b
    _, _, w, h, c = a[0]
    assert 16 <= w < 80 and 16 <= h < 80 and 1 <= c <= 3


def test_frame_sampling_shape(spark, sf_dir):
    media = mm.documents_as_media(spark, sf_dir).limit(5)
    frames = mm.frame_sample(media, frame_bytes=64, every=4).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    content_len = {
        r["media_id"]: r["meta"]["n_bytes"] for r in media.collect()
    }
    for mid, rows in by_id.items():
        total_frames = max(1, content_len[mid] // 64)
        assert len(rows) == len(range(0, total_frames, 4))
        for r in rows:
            assert len(r["frame"]) <= 64
