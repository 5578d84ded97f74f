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


def test_wav_roundtrip_known_fixture():
    """decode_wav on a hand-assembled canonical WAV (no JUNK chunk)
    recovers the exact header fields and sample statistics."""
    import struct

    samples = [0, 1000, -1000, 7]
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    f = mm.decode_wav(wav)
    assert f == {
        "sample_rate": 8000,
        "n_channels": 1,
        "bits_per_sample": 16,
        "n_samples": 4,
        "peak": 1000,
        "energy": 1000**2 + 1000**2 + 49,
        "duration_ms": 0,
    }


def test_wav_parser_walks_chunks_and_padding():
    """synthesize_wav embeds an odd-sized JUNK chunk before data — a
    parser that assumed fixed offsets or skipped the even-padding rule
    would misread the data chunk."""
    wav = mm.synthesize_wav(3)
    assert b"JUNK" in wav
    n, sr = mm._wav_params(3)
    f = mm.decode_wav(wav)
    assert f["n_samples"] == n and f["sample_rate"] == sr
    assert f["peak"] == max(abs(mm._wav_sample(3, i)) for i in range(n))
    assert f["energy"] == sum(mm._wav_sample(3, i) ** 2 for i in range(n))


def test_wav_parser_rejects_corruption():
    import struct

    import pytest

    wav = bytearray(mm.synthesize_wav(5))
    with pytest.raises(ValueError, match="RIFF"):
        mm.decode_wav(b"OggS" + bytes(wav[4:]))
    truncated = bytes(wav[:-3])
    with pytest.raises(ValueError):
        mm.decode_wav(truncated)
    # declared RIFF size must cover the payload
    bad = bytearray(wav)
    bad[4:8] = struct.pack("<I", 10)
    with pytest.raises(ValueError, match="RIFF size"):
        mm.decode_wav(bytes(bad))


def test_wav_features_query_matches_generation_law(spark, sf_dir):
    rows = {
        r["media_id"]: r
        for r in mm.multimodal_wav_features(spark, sf_dir).collect()
    }
    d = {r["doc_id"] for r in spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id").collect()}
    assert set(rows) == d
    for mid in list(sorted(d))[:20]:
        n, sr = mm._wav_params(mid)
        r = rows[mid]
        assert (r["n_samples"], r["sample_rate"]) == (n, sr)
        assert r["duration_ms"] == n * 1000 // sr


def test_bmp_roundtrip_matches_pixel_law():
    """decode_bmp on synthesized payloads recovers exactly what the
    integer pixel law encoded, across ids covering all four padding
    widths."""
    for mid in (0, 1, 2, 3, 7, 12, 90):
        w, h = mm._bmp_dims(mid)
        f = mm.decode_bmp(mm.synthesize_bmp(mid))
        sums = {"r": 0, "g": 0, "b": 0}
        mx = pw = 0
        for y in range(h):
            for x in range(w):
                b, g, r = mm._bmp_pixel(mid, x, y)
                sums["r"] += r
                sums["g"] += g
                sums["b"] += b
                luma = 299 * r + 587 * g + 114 * b
                mx = max(mx, luma)
                pw += (y * w + x + 1) * luma
        assert f == {
            "width": w,
            "height": h,
            "n_pixels": w * h,
            "sum_r": sums["r"],
            "sum_g": sums["g"],
            "sum_b": sums["b"],
            "max_luma_milli": mx,
            "pos_weighted": pw,
        }


def test_bmp_parser_bottom_up_flip_is_load_bearing():
    """Re-ordering the stored rows top-down keeps the (order-invariant)
    channel sums but MUST change pos_weighted — i.e. the decoder really
    undoes the bottom-up storage order."""
    mid = 9
    raw = mm.synthesize_bmp(mid)
    w, h = mm._bmp_dims(mid)
    stride = 3 * w + ((-3 * w) % 4)
    body = raw[54:]
    flipped = b"".join(
        body[(h - 1 - i) * stride : (h - i) * stride] for i in range(h)
    )
    d0 = mm.decode_bmp(raw)
    d1 = mm.decode_bmp(raw[:54] + flipped)
    assert d0["sum_r"] == d1["sum_r"]
    assert d0["pos_weighted"] != d1["pos_weighted"]


def test_bmp_parser_rejects_corruption():
    import struct

    import pytest

    raw = bytearray(mm.synthesize_bmp(5))
    with pytest.raises(ValueError, match="BMP"):
        mm.decode_bmp(b"PNG" + bytes(raw[3:]))
    with pytest.raises(ValueError):
        mm.decode_bmp(bytes(raw[:-2]))  # size field no longer matches
    bad = bytearray(raw)
    bad[28:30] = struct.pack("<H", 8)  # 8bpp palette variant unsupported
    with pytest.raises(ValueError, match="unsupported"):
        mm.decode_bmp(bytes(bad))


def test_bmp_features_query_covers_all_docs(spark, sf_dir):
    rows = {
        r["media_id"]: r
        for r in mm.multimodal_bmp_features(spark, sf_dir).collect()
    }
    d = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    assert set(rows) == d


def test_png_roundtrip_matches_pixel_law():
    """decode_png on synthesized payloads recovers exactly what the
    integer pixel law encoded, across ids whose heights together
    exercise all five scanline filter types (filter = (id + y) % 5)."""
    filters_seen = set()
    for mid in (0, 1, 2, 3, 4, 8, 13, 44, 90):
        w, h = mm._png_dims(mid)
        filters_seen |= {(mid + y) % 5 for y in range(h)}
        f = mm.decode_png(mm.synthesize_png(mid))
        sums = {"r": 0, "g": 0, "b": 0}
        mx = pw = 0
        for y in range(h):
            for x in range(w):
                r, g, b = mm._png_pixel(mid, x, y)
                sums["r"] += r
                sums["g"] += g
                sums["b"] += b
                luma = 299 * r + 587 * g + 114 * b
                mx = max(mx, luma)
                pw += (y * w + x + 1) * luma
        assert f == {
            "width": w,
            "height": h,
            "n_pixels": w * h,
            "sum_r": sums["r"],
            "sum_g": sums["g"],
            "sum_b": sums["b"],
            "max_luma_milli": mx,
            "pos_weighted": pw,
            "filter_weighted": sum((y + 1) * ((mid + y) % 5) for y in range(h)),
        }
    assert filters_seen == {0, 1, 2, 3, 4}


def test_png_parser_filter_reversal_is_load_bearing():
    """Swapping one scanline's filter byte for a different type (while
    leaving the filtered bytes intact) must change the decoded pixels —
    i.e. the decoder really applies the per-row filter reversal rather
    than ignoring the filter bytes."""
    import struct
    import zlib

    mid = 6  # h=9: rows cover every filter type
    raw = mm.synthesize_png(mid)
    w, h = mm._png_dims(mid)
    stride = 3 * w
    # rebuild the stream with row 1's filter byte flipped (Up <-> Sub)
    blob, off, idat = raw, 8, bytearray()
    chunks = []
    while off + 12 <= len(blob):
        (size,) = struct.unpack(">I", blob[off : off + 4])
        ctype = blob[off + 4 : off + 8]
        body = blob[off + 8 : off + 8 + size]
        chunks.append((ctype, body))
        if ctype == b"IDAT":
            idat += body
        off += 12 + size
        if ctype == b"IEND":
            break
    stream = bytearray(zlib.decompress(bytes(idat)))
    pos = 1 * (1 + stride)
    stream[pos] = 1 if stream[pos] != 1 else 2
    z = zlib.compress(bytes(stream))

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    # keep chunk order: IHDR, tEXt, IDAT, IEND
    tampered = (
        b"\x89PNG\r\n\x1a\n"
        + b"".join(chunk(t, b) for t, b in chunks if t in (b"IHDR", b"tEXt"))
        + chunk(b"IDAT", z)
        + chunk(b"IEND", b"")
    )
    d0 = mm.decode_png(raw)
    d1 = mm.decode_png(tampered)
    assert d0 != d1
    assert d0["filter_weighted"] != d1["filter_weighted"]


def test_png_parser_concatenates_all_idat_chunks():
    """The synthesizer splits the zlib stream across two IDAT chunks;
    a decoder that stops at the first cannot inflate. Verify the split
    is real (two IDATs present) and decode still succeeds."""
    import struct

    raw = mm.synthesize_png(7)
    off, n_idat = 8, 0
    while off + 12 <= len(raw):
        (size,) = struct.unpack(">I", raw[off : off + 4])
        if raw[off + 4 : off + 8] == b"IDAT":
            n_idat += 1
        off += 12 + size
    assert n_idat == 2
    assert mm.decode_png(raw)["width"] == mm._png_dims(7)[0]


def test_png_parser_rejects_corruption():
    import pytest

    raw = bytearray(mm.synthesize_png(5))
    with pytest.raises(ValueError, match="PNG"):
        mm.decode_png(b"BM" + bytes(raw[2:]))
    bad = bytearray(raw)
    bad[-6] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        mm.decode_png(bytes(bad))
    bad = bytearray(raw)
    bad[24] = 16  # IHDR bit depth 16 unsupported — but CRC now wrong
    with pytest.raises(ValueError):
        mm.decode_png(bytes(bad))


def test_png_features_query_covers_all_docs(spark, sf_dir):
    rows = {
        r["media_id"]: r
        for r in mm.multimodal_png_features(spark, sf_dir).collect()
    }
    d = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    assert set(rows) == d


def test_gif_lzw_roundtrip_and_edge_cases():
    """The LZW pair is a real codec: round-trips the corpus law (which
    forces variable-width growth through 31/63/127 and mid-stream CLEAR
    resets on most images), plus adversarial shapes — single symbol,
    KwKwK-inducing repeats, and seeded random streams."""
    import random

    for mid in (0, 1, 5, 11, 23, 777):
        w, h = mm._gif_dims(mid)
        idx = [mm._gif_index(mid, x, y) for y in range(h) for x in range(w)]
        z = mm._lzw_encode(idx, 4)
        assert mm._lzw_decode(z, 4, len(idx)) == idx, mid
    for seq in ([0], [1] * 8, [0, 1] * 50, [3] * 700, list(range(16)) * 40):
        z = mm._lzw_encode(seq, 4)
        assert mm._lzw_decode(z, 4, len(seq)) == seq
    for seed in range(8):
        rng = random.Random(seed)
        seq = [rng.randrange(16) for _ in range(rng.randrange(1, 2500))]
        z = mm._lzw_encode(seq, 4)
        assert mm._lzw_decode(z, 4, len(seq)) == seq, seed


def test_gif_clear_resets_fire_on_corpus():
    """_GIF_CLEAR_AT must actually trigger on the synthesized corpus —
    otherwise the decoder's reset path is dead code in the gate."""
    hit = 0
    for mid in range(30):
        w, h = mm._gif_dims(mid)
        idx = [mm._gif_index(mid, x, y) for y in range(h) for x in range(w)]
        clear = 16
        table = {(i,): i for i in range(clear)}
        next_code, seq, clears = 18, (), 0
        for sym in idx:
            cand = seq + (sym,)
            if cand in table:
                seq = cand
                continue
            table[cand] = next_code
            next_code += 1
            seq = (sym,)
            if next_code >= mm._GIF_CLEAR_AT:
                clears += 1
                table = {(i,): i for i in range(clear)}
                next_code = 18
        hit += clears > 0
    assert hit >= 15, hit  # most of the corpus exercises the reset


def test_gif_roundtrip_matches_pixel_law():
    for mid in (0, 3, 7, 12, 29, 777):
        w, h = mm._gif_dims(mid)
        f = mm.decode_gif(mm.synthesize_gif(mid))
        sums = [0, 0, 0]
        mx = pw = 0
        for y in range(h):
            for x in range(w):
                r, g, b = mm._gif_palette(mid, mm._gif_index(mid, x, y))
                sums[0] += r
                sums[1] += g
                sums[2] += b
                luma = 299 * r + 587 * g + 114 * b
                mx = max(mx, luma)
                pw += (y * w + x + 1) * luma
        assert f == {
            "width": w,
            "height": h,
            "n_pixels": w * h,
            "sum_r": sums[0],
            "sum_g": sums[1],
            "sum_b": sums[2],
            "max_luma_milli": mx,
            "pos_weighted": pw,
        }


def test_gif_parser_rejects_corruption():
    import pytest

    raw = bytearray(mm.synthesize_gif(5))
    with pytest.raises(ValueError, match="GIF"):
        mm.decode_gif(b"BM" + bytes(raw[2:]))
    with pytest.raises(ValueError, match="trailer"):
        mm.decode_gif(bytes(raw[:-1]))
    # truncating one LZW sub-block byte breaks the stream mid-decode
    bad = bytearray(raw)
    # find first sub-block after the min-code byte and shrink it
    import struct
    n_colors = 16
    off = 13 + 3 * n_colors + 10 + 1
    blen = bad[off]
    assert blen > 0
    del bad[off + 1]  # drop one payload byte
    bad[off] = blen - 1
    with pytest.raises(ValueError):
        mm.decode_gif(bytes(bad))


def test_gif_features_query_covers_all_docs(spark, sf_dir):
    rows = {
        r["media_id"]: r
        for r in mm.multimodal_gif_features(spark, sf_dir).collect()
    }
    d = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    assert set(rows) == d


def test_gif_lzw_tail_boundary_class():
    """Regression: when the FINAL data code lands exactly on the
    2^width−1 dictionary boundary, the decoder bumps width (it adds an
    entry for that code) before reading END — the encoder must write
    END one bit wider. The (33, 11)-dims corpus class (ids ≡ 75 mod 84)
    hits this; a sweep over lengths crosses every boundary."""
    for mid in (75, 159, 243):
        assert mm.decode_gif(mm.synthesize_gif(mid))["width"] == mm._gif_dims(mid)[0]
    for n in range(1, 200):
        seq = (list(range(16)) * (n // 16 + 1))[:n]
        z = mm._lzw_encode(seq, 4)
        assert mm._lzw_decode(z, 4, n) == seq, n


def test_jpeg_dc_roundtrip_matches_laws():
    """decode_jpeg_dc on synthesized baseline JFIF recovers exactly the
    DC/AC/quant laws, across ids covering non-multiple-of-8 dims."""
    for mid in (0, 1, 5, 12, 20, 75, 777):
        w, h = mm._jpeg_dims(mid)
        bx, by = (w + 7) // 8, (h + 7) // 8
        nb = bx * by
        dcs = [mm._jpeg_dc(mid, b) for b in range(nb)]
        acs = [mm._jpeg_ac(mid, b) for b in range(nb)]
        f = mm.decode_jpeg_dc(mm.synthesize_jpeg(mid))
        assert f == {
            "width": w,
            "height": h,
            "blocks_x": bx,
            "blocks_y": by,
            "sum_dc": sum(dcs),
            "max_abs_dc": max(abs(d) for d in dcs),
            "pos_weighted_dc": sum((i + 1) * d for i, d in enumerate(dcs)),
            "sum_ac": sum(acs),
            "pos_weighted_ac": 17 * sum(acs),
            "quant_sum": sum((mid + i) % 99 + 1 for i in range(64)),
        }


def test_jpeg_byte_stuffing_is_exercised_and_load_bearing():
    """The ZRL code is engineered to 111111110, so FF bytes really
    occur in the scan (495/500 corpus ids measured) — and removing one
    stuffed 00 desynchronizes the decode (error or wrong values), i.e.
    the unstuffing path is load-bearing, not dead code."""
    hit = None
    for mid in range(20):
        raw = mm.synthesize_jpeg(mid)
        sos = raw.find(b"\xff\xda")
        if raw[sos + 2 :].count(b"\xff\x00"):
            hit = mid
            break
    assert hit is not None, "no corpus id in 0..19 produced a stuffed byte"
    raw = mm.synthesize_jpeg(hit)
    good = mm.decode_jpeg_dc(raw)
    sos = raw.find(b"\xff\xda")
    i = raw.find(b"\xff\x00", sos + 2)
    tampered = raw[: i + 1] + raw[i + 2 :]  # drop the stuffing 00
    try:
        bad = mm.decode_jpeg_dc(tampered)
        assert bad != good
    except ValueError:
        pass  # desync detected — equally load-bearing


def test_jpeg_parser_rejects_corruption():
    import pytest

    raw = bytearray(mm.synthesize_jpeg(3))
    with pytest.raises(ValueError, match="SOI"):
        mm.decode_jpeg_dc(b"GIF" + bytes(raw[3:]))
    with pytest.raises(ValueError):
        mm.decode_jpeg_dc(bytes(raw[:40]))  # truncated mid-segments
    # flip SOF0 to report 2 components (unsupported variant)
    sof = bytes(raw).find(b"\xff\xc0")
    bad = bytearray(raw)
    bad[sof + 9] = 2
    with pytest.raises(ValueError, match="unsupported"):
        mm.decode_jpeg_dc(bytes(bad))


def test_jpeg_fill_bytes_and_multi_table_dqt():
    """Two legal-JFIF layouts the synthesizer never emits (ADVICE r9):
    0xFF fill bytes preceding a marker, and a single DQT segment
    carrying multiple tables with SOF0's Tq selecting among them."""
    import struct

    raw = mm.synthesize_jpeg(11)
    good = mm.decode_jpeg_dc(raw)
    # fill bytes: pad before SOF0's marker byte
    sof = raw.find(b"\xff\xc0")
    padded = raw[:sof] + b"\xff\xff\xff" + raw[sof:]
    assert mm.decode_jpeg_dc(padded) == good
    # multi-table DQT: prepend a decoy table 1 in the SAME segment;
    # Tq=0 in SOF0 must still select the real table 0
    dqt = raw.find(b"\xff\xdb")
    size = int.from_bytes(raw[dqt + 2 : dqt + 4], "big")
    body = raw[dqt + 4 : dqt + 2 + size]
    decoy = b"\x01" + bytes(64)  # Tq=1, all-zero entries
    two = struct.pack(">HH", 0xFFDB, len(decoy + body) + 2) + decoy + body
    multi = raw[:dqt] + two + raw[dqt + 2 + size :]
    assert mm.decode_jpeg_dc(multi) == good
    # and pointing Tq at a missing table must fail loudly
    sof = multi.find(b"\xff\xc0")
    bad = bytearray(multi)
    bad[sof + 12] = 7  # component Tq -> table 7 (absent)
    try:
        mm.decode_jpeg_dc(bytes(bad))
        raise AssertionError("missing-DQT-table selection not detected")
    except ValueError as e:
        assert "DQT" in str(e)


def test_tiff_truncated_short_array_raises_valueerror():
    """The out-of-line SHORT array read mirrors the LONG path's bounds
    guard (ADVICE r9): a count that points past the file must raise the
    decoder's ValueError contract, not struct.error."""
    import struct

    import pytest

    # minimal II header + one SHORT tag (count=3, voff far past EOF)
    ifd = struct.pack("<H", 1) + struct.pack(
        "<HHII", 258, 3, 3, 9999
    ) + struct.pack("<I", 0)
    raw = b"II" + struct.pack("<HI", 42, 8) + ifd
    with pytest.raises(ValueError, match="truncated out-of-line"):
        mm.decode_tiff(raw)


def test_jpeg_features_query_covers_all_docs(spark, sf_dir):
    rows = {
        r["media_id"]: r
        for r in mm.multimodal_jpeg_dc_features(spark, sf_dir).collect()
    }
    d = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    assert set(rows) == d


def test_jpeg_integer_idct_matches_float_reference():
    """The fixed-point IDCT (basis table + biased truncating descale)
    must agree with the textbook float IDCT within one gray level for
    arbitrary coefficient blocks — the property that makes it a REAL
    inverse DCT rather than an ad-hoc law."""
    import math

    import numpy as np

    def float_idct(fm):
        out = np.zeros((8, 8))
        for y in range(8):
            for x in range(8):
                s = 0.0
                for v in range(8):
                    for u in range(8):
                        cu = 1 / math.sqrt(2) if u == 0 else 1.0
                        cv = 1 / math.sqrt(2) if v == 0 else 1.0
                        s += (
                            cv * cu * fm[v][u]
                            * math.cos((2 * y + 1) * v * math.pi / 16)
                            * math.cos((2 * x + 1) * u * math.pi / 16)
                        )
                out[y][x] = s / 4
        return out

    basis = np.asarray(mm._IDCT_BASIS, dtype=np.int64)
    rng = np.random.default_rng(7)
    for _ in range(20):
        fm = rng.integers(-2000, 2000, size=(8, 8))
        tot = np.einsum("vy,vu,ux->yx", basis, fm.astype(np.int64), basis)
        fixed = ((tot + mm._IDCT_ROUND + mm._IDCT_BIAS) >> 26) - mm._IDCT_UNBIAS
        assert np.abs(fixed - np.round(float_idct(fm))).max() <= 1


def test_jpeg_pixel_decode_matches_law_replay():
    """decode_jpeg_pixels on the synthesized corpus equals an
    independent replay of the coefficient laws through the same
    fixed-point IDCT — exercising dequant, zig-zag placement, block
    tiling and the crop (non-multiple-of-8 dims included)."""
    import numpy as np

    basis = np.asarray(mm._IDCT_BASIS, dtype=np.int64)
    for mid in (0, 1, 5, 12, 20, 75, 777):
        w, h = mm._jpeg_dims(mid)
        bx, by = (w + 7) // 8, (h + 7) // 8
        q0 = mid % 99 + 1
        q17 = (mid + 17) % 99 + 1
        img = np.zeros((by * 8, bx * 8), dtype=np.int64)
        for b in range(bx * by):
            fm = np.zeros((8, 8), dtype=np.int64)
            fm[0, 0] = mm._jpeg_dc(mid, b) * q0
            fm[2, 3] = mm._jpeg_ac(mid, b) * q17  # zig-zag 17 = (v2,u3)
            tot = np.einsum("vy,vu,ux->yx", basis, fm, basis)
            px = np.clip(
                ((tot + mm._IDCT_ROUND + mm._IDCT_BIAS) >> 26)
                - mm._IDCT_UNBIAS + 128,
                0,
                255,
            )
            r, c = divmod(b, bx)
            img[r * 8 : (r + 1) * 8, c * 8 : (c + 1) * 8] = px
        flat = img[:h, :w].reshape(-1)
        pos = np.arange(w * h, dtype=np.int64) + 1
        f = mm.decode_jpeg_pixels(mm.synthesize_jpeg(mid))
        assert f == {
            "width": w,
            "height": h,
            "n_pixels": w * h,
            "sum_px": int(flat.sum()),
            "max_px": int(flat.max()),
            "pos_weighted_px": int((pos * flat).sum()),
        }


def test_jpeg_pixel_features_query_covers_all_docs(spark, sf_dir):
    rows = {
        r["media_id"]
        for r in mm.multimodal_jpeg_pixel_features(spark, sf_dir).collect()
    }
    d = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    assert rows == d


def test_tiff_roundtrip_both_endiannesses_and_strip_shapes():
    """decode_tiff recovers the pixel law for both byte orders (even
    ids II, odd ids MM) and across 1..4 strips — including the
    single-strip INLINE tag-value case and the out-of-line arrays."""
    strip_counts = set()
    endians = set()
    # ids chosen to cover strip counts 1 (9, 27), 2 (0..3), 3 (5, 7),
    # and 4 (15, 25) under the dims/rows-per-strip laws
    for mid in (0, 1, 2, 3, 5, 7, 9, 15, 25, 27, 777):
        w, h = mm._tiff_dims(mid)
        rps = mm._tiff_rows_per_strip(mid)
        n = -(-h // rps)
        strip_counts.add(n)
        f = mm.decode_tiff(mm.synthesize_tiff(mid))
        endians.add(f["big_endian"])
        vals = [mm._tiff_pixel(mid, x, y) for y in range(h) for x in range(w)]
        assert f == {
            "width": w,
            "height": h,
            "n_pixels": w * h,
            "n_strips": n,
            "big_endian": mid % 2,
            "sum_v": sum(vals),
            "max_v": max(vals),
            "pos_weighted": sum((i + 1) * v for i, v in enumerate(vals)),
        }
    assert endians == {0, 1}
    assert 1 in strip_counts and len(strip_counts) >= 3


def test_tiff_endianness_is_load_bearing():
    """Flipping the byte-order marker without re-encoding the fields
    must fail parsing (bad magic under the other order) — i.e. the
    decoder really dispatches on II/MM rather than assuming one."""
    import pytest

    raw = bytearray(mm.synthesize_tiff(4))  # II
    raw[:2] = b"MM"
    with pytest.raises(ValueError):
        mm.decode_tiff(bytes(raw))


def test_tiff_parser_rejects_corruption():
    import pytest

    raw = bytearray(mm.synthesize_tiff(7))
    with pytest.raises(ValueError, match="TIFF"):
        mm.decode_tiff(b"GI" + bytes(raw[2:]))
    with pytest.raises(ValueError):
        mm.decode_tiff(bytes(raw[:-3]))  # truncated final strip
    bad = bytearray(mm.synthesize_tiff(6))
    # compression tag (259) value -> 5 (LZW, unsupported): find its entry
    import struct
    n_tags = struct.unpack("<H", bad[8:10])[0]
    for i in range(n_tags):
        off = 10 + i * 12
        if struct.unpack("<H", bad[off : off + 2])[0] == 259:
            bad[off + 8] = 5
    with pytest.raises(ValueError, match="unsupported"):
        mm.decode_tiff(bytes(bad))


def test_tiff_features_query_covers_all_docs(spark, sf_dir):
    rows = {
        r["media_id"]: r
        for r in mm.multimodal_tiff_features(spark, sf_dir).collect()
    }
    d = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    assert set(rows) == d


def test_mulaw_expansion_matches_g711_reference_points():
    """decode_wav's format-7 branch is the published G.711 expansion:
    canonical extremes pinned (0xFF -> 0, 0x00 -> -32124, 0x80 ->
    +32124, 0x7F -> -0-region smallest magnitudes) and every one of
    the 256 codes occurs across the synthesized corpus."""
    import struct

    def one(code):
        data = bytes([code])
        fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
        chunks = (
            b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 1) + data + b"\x00"
        )
        wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        f = mm.decode_wav(wav)
        return f["peak"], f["energy"]

    assert one(0xFF) == (0, 0)
    assert one(0x00) == (32124, 32124 * 32124)
    assert one(0x80) == (32124, 32124 * 32124)
    assert one(0x7F) == (0, 0)  # negative zero (both zeros decode to 0)
    assert one(0x7E) == (8, 64)  # smallest nonzero magnitude, negative side
    codes = set()
    for mid in range(60):
        n, _ = mm._mulaw_params(mid)
        codes |= {mm._mulaw_byte(mid, i) for i in range(n)}
    assert codes == set(range(256))


def test_alaw_expansion_matches_g711_reference_points():
    """decode_wav's format-6 branch is the published G.711 A-law
    expansion: canonical extremes pinned (0x55 -> -8, 0xD5 -> +8 —
    sign bit set is POSITIVE, inverted vs µ-law; 0xAA -> +32256,
    0x2A -> -32256; no zero code exists), every one of the 256 codes
    decodes to the CCITT alaw2linear scalar reference, and every code
    occurs across the synthesized corpus."""
    import struct

    def one(code):
        data = bytes([code])
        fmt = struct.pack("<HHIIHH", 6, 1, 8000, 8000, 1, 8)
        chunks = (
            b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 1) + data + b"\x00"
        )
        wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        return mm.decode_wav(wav)

    def ref(code):  # CCITT alaw2linear
        v = code ^ 0x55
        t = (v & 0x0F) << 4
        seg = (v & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        return t if v & 0x80 else -t

    assert (one(0x55)["peak"], ref(0x55)) == (8, -8)
    assert (one(0xD5)["peak"], ref(0xD5)) == (8, 8)
    assert (one(0xAA)["peak"], ref(0xAA)) == (32256, 32256)
    assert (one(0x2A)["peak"], ref(0x2A)) == (32256, -32256)
    for code in range(256):
        f = one(code)
        r = ref(code)
        assert f["peak"] == abs(r) and f["energy"] == r * r, (code, f, r)
        assert f["peak"] >= 8  # A-law has no zero code
    codes = set()
    for mid in range(60):
        n, _ = mm._alaw_params(mid)
        codes |= {mm._alaw_byte(mid, i) for i in range(n)}
    assert codes == set(range(256))


def test_alaw_wav_roundtrip_matches_laws(spark, sf_dir):
    rows = {
        r["media_id"]: r
        for r in mm.multimodal_alaw_features(spark, sf_dir).collect()
    }
    for mid in list(rows)[:10]:
        n, sr = mm._alaw_params(mid)
        assert rows[mid]["n_samples"] == n
        assert rows[mid]["bits_per_sample"] == 8
        assert rows[mid]["sample_rate"] == sr


def test_mulaw_wav_roundtrip_matches_laws(spark, sf_dir):
    rows = {
        r["media_id"]: r
        for r in mm.multimodal_mulaw_features(spark, sf_dir).collect()
    }
    for mid in list(rows)[:10]:
        n, sr = mm._mulaw_params(mid)
        assert rows[mid]["n_samples"] == n
        assert rows[mid]["bits_per_sample"] == 8
        assert rows[mid]["sample_rate"] == sr


def test_jpeg_trailing_fill_bytes_raise_valueerror():
    """A malformed stream ending in a run of 0xFF fill bytes must hit
    the decoder's ValueError contract, not IndexError (review r10)."""
    import pytest

    with pytest.raises(ValueError):
        mm.decode_jpeg_dc(b"\xff\xd8" + b"\xff" * 4)


def test_avi_roundtrip_matches_law_replay():
    """decode_avi recovers exactly the per-frame laws through the same
    integer IDCT the still-image path uses — frame stacking, playback
    position weights, and the inter-frame motion sum included."""
    import numpy as np

    basis = np.asarray(mm._IDCT_BASIS, dtype=np.int64)
    for mid in (0, 1, 5, 12, 777):
        w, h = mm._jpeg_dims(mid)
        nf = mm._avi_frames(mid)
        bx, by = (w + 7) // 8, (h + 7) // 8
        q0, q17 = mid % 99 + 1, (mid + 17) % 99 + 1
        grids = []
        for fr in range(nf):
            img = np.zeros((by * 8, bx * 8), dtype=np.int64)
            for b in range(bx * by):
                fmat = np.zeros((8, 8), dtype=np.int64)
                fmat[0, 0] = mm._avi_dc(mid, fr, b) * q0
                fmat[2, 3] = mm._avi_ac(mid, fr, b) * q17
                tot = np.einsum("vy,vu,ux->yx", basis, fmat, basis)
                px = np.clip(
                    ((tot + mm._IDCT_ROUND + mm._IDCT_BIAS) >> 26)
                    - mm._IDCT_UNBIAS + 128,
                    0,
                    255,
                )
                r, c = divmod(b, bx)
                img[r * 8 : (r + 1) * 8, c * 8 : (c + 1) * 8] = px
            grids.append(img[:h, :w])
        video = np.stack(grids)
        flat = video.reshape(-1)
        pos = np.arange(flat.size, dtype=np.int64) + 1
        assert mm.decode_avi(mm.synthesize_avi(mid)) == {
            "n_frames": nf,
            "width": w,
            "height": h,
            "n_pixels": flat.size,
            "sum_px": int(flat.sum()),
            "max_px": int(flat.max()),
            "pos_weighted_px": int((pos * flat).sum()),
            "motion_abs": int(np.abs(np.diff(video, axis=0)).sum()),
        }


def test_avi_parser_rejects_corruption_and_checks_consistency():
    import struct

    import pytest

    raw = mm.synthesize_avi(7)
    with pytest.raises(ValueError, match="AVI"):
        mm.decode_avi(b"RIFX" + raw[4:])
    with pytest.raises(ValueError):
        mm.decode_avi(raw[:-5])  # RIFF size no longer matches
    # declared-frame-count cross-check: bump avih dwTotalFrames
    i = raw.find(b"avih") + 8 + 16
    bad = bytearray(raw)
    bad[i : i + 4] = struct.pack("<I", 99)
    with pytest.raises(ValueError, match="declared"):
        mm.decode_avi(bytes(bad))
    # frame-dims cross-check: tamper avih width
    j = raw.find(b"avih") + 8 + 32
    bad = bytearray(raw)
    bad[j : j + 4] = struct.pack("<I", 640)
    with pytest.raises(ValueError, match="frame dims"):
        mm.decode_avi(bytes(bad))


def test_avi_features_query_covers_all_docs(spark, sf_dir):
    rows = {
        r["media_id"]
        for r in mm.multimodal_avi_features(spark, sf_dir).collect()
    }
    d = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    assert rows == d


def test_mp4_roundtrip_both_layouts_match_law_replay():
    """decode_mp4 recovers the per-sample laws through the shared
    integer IDCT for BOTH box orders (even ids mdat-first, odd ids
    moov-first) — the collect-then-interpret walk and the stsz/stco
    framing are load-bearing in each."""
    import numpy as np

    basis = np.asarray(mm._IDCT_BASIS, dtype=np.int64)
    for mid in (0, 1, 6, 13, 776, 777):
        w, h = mm._jpeg_dims(mid)
        nf = mm._mp4_frames(mid)
        bx, by = (w + 7) // 8, (h + 7) // 8
        q0, q17 = mid % 99 + 1, (mid + 17) % 99 + 1
        grids = []
        for fr in range(nf):
            img = np.zeros((by * 8, bx * 8), dtype=np.int64)
            for b in range(bx * by):
                fmat = np.zeros((8, 8), dtype=np.int64)
                fmat[0, 0] = mm._mp4_dc(mid, fr, b) * q0
                fmat[2, 3] = mm._mp4_ac(mid, fr, b) * q17
                tot = np.einsum("vy,vu,ux->yx", basis, fmat, basis)
                px = np.clip(
                    ((tot + mm._IDCT_ROUND + mm._IDCT_BIAS) >> 26)
                    - mm._IDCT_UNBIAS + 128,
                    0,
                    255,
                )
                r, c = divmod(b, bx)
                img[r * 8 : (r + 1) * 8, c * 8 : (c + 1) * 8] = px
            grids.append(img[:h, :w])
        video = np.stack(grids)
        flat = video.reshape(-1)
        pos = np.arange(flat.size, dtype=np.int64) + 1
        assert mm.decode_mp4(mm.synthesize_mp4(mid)) == {
            "n_frames": nf,
            "width": w,
            "height": h,
            "n_pixels": flat.size,
            "sum_px": int(flat.sum()),
            "max_px": int(flat.max()),
            "pos_weighted_px": int((pos * flat).sum()),
            "motion_abs": int(np.abs(np.diff(video, axis=0)).sum()),
        }


def test_mp4_parser_rejects_corruption_and_checks_tables():
    import struct

    import pytest

    raw = mm.synthesize_mp4(3)  # odd id: moov before mdat
    with pytest.raises(ValueError, match="ftyp"):
        mm.decode_mp4(b"XXXX" + raw[4:])
    # stsz/stts cross-check: bump the stts sample count
    i = raw.find(b"stts") + 4 + 8  # type + version/flags + entry_count
    bad = bytearray(raw)
    bad[i : i + 4] = struct.pack(">I", 99)
    with pytest.raises(ValueError, match="stts"):
        mm.decode_mp4(bytes(bad))
    # tkhd dims cross-check
    j = raw.find(b"tkhd")
    tk_end = j + 4 + struct.unpack(">I", raw[j - 4 : j])[0] - 8
    bad = bytearray(raw)
    bad[tk_end - 8 : tk_end - 4] = struct.pack(">I", 640 << 16)
    with pytest.raises(ValueError, match="tkhd"):
        mm.decode_mp4(bytes(bad))
    # truncated largesize payload (even id: mdat-first)
    raw2 = mm.synthesize_mp4(2)
    with pytest.raises(ValueError):
        mm.decode_mp4(raw2[:-7])


def test_mp4_features_query_covers_all_docs(spark, sf_dir):
    rows = {
        r["media_id"]
        for r in mm.multimodal_mp4_features(spark, sf_dir).collect()
    }
    d = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    assert rows == d


def _adpcm_one_block(pred0, idx0, nibbles, fact=None, reserved=0):
    """Hand-build a single-block IMA ADPCM WAV (nibbles low-first)."""
    import struct

    body = struct.pack("<hBB", pred0, idx0, reserved)
    padded = list(nibbles) + [0] * (16 - len(nibbles))
    for m in range(8):
        body += bytes([padded[2 * m] | (padded[2 * m + 1] << 4)])
    fmt = struct.pack("<HHIIHHHH", 17, 1, 8000, 5647, 12, 4, 2, 17)
    n = 17 if fact is None else fact
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", 4) + struct.pack("<I", n)
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_adpcm_single_steps_match_ima_reference_points():
    """Pinned single-nibble transitions from the IMA recommendation:
    delta accumulation per bit, sign-bit subtraction, both predictor
    clamps (note |−32768| = 32768 as a peak), and both index clamps."""
    # pred 0, idx 0 (step 7), code 2: diff = 7//8 + 7//2 = 3 -> sample 3
    f = mm.decode_wav(_adpcm_one_block(0, 0, [2], fact=2))
    assert (f["n_samples"], f["peak"], f["energy"]) == (2, 3, 9)
    # code 7 from idx 88 (step 32767): diff = 4095+8191+16383+32767 =
    # 61436 -> predictor clamps at +32767 from pred0 32000
    f = mm.decode_wav(_adpcm_one_block(32000, 88, [7], fact=2))
    assert f["peak"] == 32767
    assert f["energy"] == 32000 * 32000 + 32767 * 32767
    # code 15 (sign bit) from the same state clamps at -32768
    f = mm.decode_wav(_adpcm_one_block(-32000, 88, [15], fact=2))
    assert f["peak"] == 32768
    assert f["energy"] == 32000 * 32000 + 32768 * 32768
    # index clamps: idx 0 with code 0 stays 0 (not -1); a second code-0
    # nibble therefore reuses step 7 -> both samples are pred0
    f = mm.decode_wav(_adpcm_one_block(100, 0, [0, 0], fact=3))
    assert f["energy"] == 100 * 100 + 100 * 100 + 100 * 100


def test_adpcm_decode_matches_independent_replay():
    """decode_wav's format-17 branch equals an independently coded
    textbook IMA loop over the synthesized corpus, sample for sample
    (via energy/peak), including block re-seeding and fact truncation."""

    def replay(mid):
        n, _sr = mm._adpcm_params(mid)
        out = []
        for b in range((n + 16) // 17):
            pred = mm._adpcm_pred0(mid, b)
            sidx = mm._adpcm_idx0(mid, b)
            out.append(pred)
            for j in range(16):
                c = mm._adpcm_nibble(mid, b, j)
                step = mm._ADPCM_STEPS[sidx]
                diff = (step >> 3) + (step >> 2 if c & 1 else 0) \
                    + (step >> 1 if c & 2 else 0) + (step if c & 4 else 0)
                pred = pred + (-diff if c & 8 else diff)
                pred = min(32767, max(-32768, pred))
                sidx = min(88, max(0, sidx + mm._ADPCM_INDEX_DELTA[c & 7]))
                out.append(pred)
        return out[:n]

    clamps_hit = 0
    for mid in range(120):
        want = replay(mid)
        f = mm.decode_wav(mm.synthesize_wav_adpcm(mid))
        assert f["n_samples"] == len(want) == mm._adpcm_params(mid)[0]
        assert f["peak"] == max(abs(x) for x in want)
        assert f["energy"] == sum(x * x for x in want)
        if 32767 in want or -32768 in want:
            clamps_hit += 1
    # the corpus genuinely exercises the int16 clamps
    assert clamps_hit > 0


def test_adpcm_fact_truncation_is_load_bearing():
    """Two files differing only in the fact count decode to different
    energies — the padded tail of the last block must be dropped."""
    full = mm.decode_wav(_adpcm_one_block(500, 30, list(range(16)), fact=17))
    cut = mm.decode_wav(_adpcm_one_block(500, 30, list(range(16)), fact=9))
    assert cut["n_samples"] == 9 and full["n_samples"] == 17
    assert cut["energy"] != full["energy"]


def test_adpcm_rejects_corruption():
    good = _adpcm_one_block(0, 0, [2], fact=2)

    def mutate(**kw):
        return _adpcm_one_block(0, 0, [2], **kw)

    with pytest.raises(ValueError):  # reserved byte must be zero
        mm.decode_wav(mutate(fact=2, reserved=1))
    with pytest.raises(ValueError):  # step index out of table
        mm.decode_wav(_adpcm_one_block(0, 89, [2], fact=2))
    with pytest.raises(ValueError):  # fact over-claims the block count
        mm.decode_wav(mutate(fact=18))
    with pytest.raises(ValueError):  # fact under-claims into prior block
        mm.decode_wav(mutate(fact=0))
    # locate the fact / data chunks by walking, then corrupt surgically
    import struct

    fact_off = good.index(b"fact")
    data_off = good.index(b"data")
    # missing fact chunk entirely
    no_fact = good[:fact_off] + good[fact_off + 12 :]
    no_fact = no_fact[:4] + struct.pack("<I", len(no_fact) - 8) + no_fact[8:]
    with pytest.raises(ValueError):
        mm.decode_wav(no_fact)
    # ragged data (not a whole number of blocks): drop the final byte
    # and shrink both the data-chunk and RIFF size fields to match
    bad = bytearray(good[:-1])
    bad[4:8] = struct.pack("<I", len(bad) - 8)
    bad[data_off + 4 : data_off + 8] = struct.pack("<I", 11)
    with pytest.raises(ValueError):
        mm.decode_wav(bytes(bad))


def test_adpcm_features_query_covers_all_docs(spark, sf_dir):
    from mini_log_lakehouse_spark.sources.registry import load_table

    rows = {
        r["media_id"]: r
        for r in mm.multimodal_adpcm_features(spark, sf_dir).collect()
    }
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    for mid in list(rows)[:10]:
        n, sr = mm._adpcm_params(mid)
        assert rows[mid]["n_samples"] == n
        assert rows[mid]["bits_per_sample"] == 4
        assert rows[mid]["sample_rate"] == sr


def _mk_flac(samples, order, p=2, escape_width=None):
    """Hand-build a one-frame FLAC stream for arbitrary fixed-predictor
    order / Rice parameter / escape coding — the decoder paths the
    corpus law (always order 2, non-escape) leaves unexercised."""
    import hashlib
    import struct

    n = len(samples)
    si = mm._BitWriter()
    si.write(n, 16); si.write(n, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(8000, 20); si.write(0, 3); si.write(15, 5); si.write(n, 36)
    pcm = b"".join(struct.pack("<h", s) for s in samples)
    streaminfo = bytes(si.buf) + hashlib.md5(pcm).digest()
    blocks = bytes([0x80]) + struct.pack(">I", 34)[1:] + streaminfo

    hdr = bytes([0xFF, 0xF8, 0x74, 0x08, 0x00]) + struct.pack(">H", n - 1)
    hdr += bytes([mm._crc8(hdr)])
    bw = mm._BitWriter()
    bw.write(0, 1)
    bw.write(0b001000 | order, 6)
    bw.write(0, 1)
    for s in samples[:order]:
        bw.write(s & 0xFFFF, 16)
    coefs = mm._FLAC_FIXED_COEFS[order]
    bw.write(0, 2)
    bw.write(0, 4)
    if escape_width is not None:
        # RFC 9639 escape layout: parameter 0b1111, then the 5-bit raw
        # width ONCE for the partition, then all residuals at that width
        bw.write(0b1111, 4)
        bw.write(escape_width, 5)
    else:
        bw.write(p, 4)
    for t in range(order, n):
        pred = sum(
            c * samples[t - 1 - i] for i, c in enumerate(coefs)
        )
        r = samples[t] - pred
        if escape_width is not None:
            bw.write(r & ((1 << escape_width) - 1), escape_width)
        else:
            u = (-r << 1) - 1 if r < 0 else r << 1
            q, rem = u >> p, u & ((1 << p) - 1)
            bw.write(1, q + 1)
            if p:
                bw.write(rem, p)
    bw.align()
    frame = hdr + bytes(bw.buf)
    frame += struct.pack(">H", mm._crc16(frame))
    return b"fLaC" + blocks + frame


def test_flac_crcs_match_published_vectors():
    """The two FLAC CRCs are the published polynomials: CRC-8 poly
    0x07 init 0 ("123456789" -> 0xF4, the CRC-8/SMBUS check value) and
    CRC-16 poly 0x8005 init 0 unreflected ("123456789" -> 0xFEE8, the
    CRC-16/UMTS check value)."""
    assert mm._crc8(b"123456789") == 0xF4
    assert mm._crc16(b"123456789") == 0xFEE8


def test_flac_roundtrip_matches_law_replay():
    """decode_flac recovers exactly the law-generated samples through
    the full stack (metadata walk incl. the odd-id PADDING block, Rice
    decode, order-2 reconstruction, CRC + MD5 gates) — all four Rice
    parameters occur across the corpus, p = 0 (pure unary) included."""
    ps = set()
    for mid in range(80):
        want = mm._flac_samples(mid)
        f = mm.decode_flac(mm.synthesize_flac(mid))
        assert f["n_samples"] == len(want) == mm._flac_params(mid)[0]
        assert f["peak"] == max(abs(s) for s in want)
        assert f["energy"] == sum(s * s for s in want)
        ps.add(mm._flac_rice_p(mid))
    assert ps == {0, 1, 2, 3}


def test_flac_decodes_all_fixed_orders_and_escape():
    """Orders 0-4 reconstruct through the spec's binomial recurrences,
    and the Rice escape code (raw-width residuals) decodes — paths a
    corpus pinned to order 2 never touches."""
    samples = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    for order in range(5):
        f = mm.decode_flac(_mk_flac(samples, order, p=3))
        assert f["n_samples"] == len(samples)
        assert f["energy"] == sum(s * s for s in samples), order
    f = mm.decode_flac(_mk_flac(samples, 2, escape_width=9))
    assert f["energy"] == sum(s * s for s in samples)


def test_flac_escape_edge_widths():
    """RFC 9639 escape layout edges: the 5-bit width is read ONCE per
    partition — width 0 encodes a run of all-zero residuals in zero
    bits (samples follow the order-2 recurrence exactly), and a width
    wide enough for negative residuals roundtrips two's-complement."""
    # order-2 prediction 2a[t-1]-a[t-2]: arithmetic sequence -> residual 0
    arith = [5 + 3 * t for t in range(10)]
    f = mm.decode_flac(_mk_flac(arith, 2, escape_width=0))
    assert f["energy"] == sum(s * s for s in arith)
    # descending sequence forces negative residuals through the raw path
    desc = [100, 90, 70, 30, 10, 5, 2, 1]
    f = mm.decode_flac(_mk_flac(desc, 2, escape_width=8))
    assert f["energy"] == sum(s * s for s in desc)


def test_flac_integrity_gates_are_layered():
    """A flipped residual bit trips the CRC-16 first; with the CRC-16
    recomputed to match the corrupted bytes, the STREAMINFO MD5 gate
    still catches the wrong PCM — two independent integrity layers."""
    import struct

    good = mm.synthesize_flac(4)
    bad = bytearray(good)
    bad[-8] ^= 0x10  # inside the residual bits
    with pytest.raises(ValueError, match="CRC-16"):
        mm.decode_flac(bytes(bad))
    bad[-2:] = struct.pack(">H", mm._crc16(bytes(bad[46:-2])))
    # frame starts after fLaC(4) + streaminfo block(38) + padding block
    start = 4 + 38
    if good[4] & 0x80 == 0:  # padding block present (odd ids) — not here
        start = None
    assert start == 42 or start is None
    with pytest.raises(ValueError, match="MD5"):
        frame = bytes(bad[42:])
        fixed = bytes(bad[:-2]) + struct.pack(
            ">H", mm._crc16(frame[:-2])
        )
        mm.decode_flac(fixed)


def test_flac_rejects_corruption():
    good = mm.synthesize_flac(3)
    with pytest.raises(ValueError):  # not a fLaC stream
        mm.decode_flac(b"fLaX" + good[4:])
    bad = bytearray(good)
    i = bad.index(b"\xff\xf8")
    bad[i + 1] = 0xF9  # blocking-strategy bit set
    with pytest.raises(ValueError):
        mm.decode_flac(bytes(bad))
    with pytest.raises(ValueError):  # truncated mid-frame
        mm.decode_flac(good[:-3])
    bad = bytearray(good)
    bad[i + 6] ^= 0xFF  # header CRC-8 byte
    with pytest.raises(ValueError):
        mm.decode_flac(bytes(bad))


def test_flac_features_query_covers_all_docs(spark, sf_dir):
    from mini_log_lakehouse_spark.sources.registry import load_table

    rows = {
        r["media_id"]: r
        for r in mm.multimodal_flac_features(spark, sf_dir).collect()
    }
    assert len(rows) == load_table(spark, sf_dir, "documents").count()
    for mid in list(rows)[:10]:
        n, sr = mm._flac_params(mid)
        assert rows[mid]["n_samples"] == n
        assert rows[mid]["bits_per_sample"] == 16
        assert rows[mid]["sample_rate"] == sr
