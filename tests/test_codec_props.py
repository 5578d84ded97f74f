"""Property-based tests (hypothesis) for the pure-python codec layers —
the code whose failure modes are bit-level and therefore worth fuzzing
beyond the law-based corpus: LZW round-trip over arbitrary symbol
streams, PNG filter/unfilter inversion over arbitrary scanlines, and
JPEG amplitude coding over the full value range."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mini_log_lakehouse_spark.operators import multimodal as mm


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=15), min_size=1, max_size=2000))
def test_lzw_roundtrip_arbitrary_streams(seq):
    """Any 4-bit symbol stream round-trips through the GIF LZW pair —
    covers width bumps at every boundary, CLEAR resets, and KwKwK
    patterns hypothesis shrinks toward."""
    z = mm._lzw_encode(seq, 4)
    assert mm._lzw_decode(z, 4, len(seq)) == seq


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=4),
    st.lists(st.integers(min_value=0, max_value=255), min_size=3, max_size=60),
    st.lists(st.integers(min_value=0, max_value=255), min_size=3, max_size=60),
)
def test_png_filter_unfilter_inverts(ftype, raw, prev):
    """For every filter type and arbitrary scanline bytes, subtracting
    then adding the shared predictor reconstructs the original — the
    exact lockstep the synthesize/decode pair relies on. Sub/Average/
    Paeth chain left-to-right, so reconstruction must use already-
    reconstructed bytes as `a`, exactly like decode_png."""
    n = min(len(raw), len(prev))
    raw, prev = raw[:n], prev[:n]
    bpp = 3
    filt = []
    for i in range(n):
        a = raw[i - bpp] if i >= bpp else 0
        c = prev[i - bpp] if i >= bpp else 0
        filt.append((raw[i] - mm._png_predict(ftype, a, prev[i], c)) % 256)
    recon = []
    for i in range(n):
        a = recon[i - bpp] if i >= bpp else 0
        c = prev[i - bpp] if i >= bpp else 0
        recon.append((filt[i] + mm._png_predict(ftype, a, prev[i], c)) % 256)
    assert recon == raw


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-255, max_value=255), min_size=1, max_size=64))
def test_jpeg_dc_amplitude_coding_roundtrips(dcs):
    """Differential DC encode/decode round-trips any coefficient
    sequence in the supported range: build a JPEG whose block DCs are
    the given list by monkey-laws, via the public synthesize/decode
    pair is law-bound, so exercise the amplitude math directly — the
    spec's ones'-complement negative form is the classic off-by-one
    spot."""
    prev = 0
    bits = []
    for dc in dcs:
        diff = dc - prev
        prev = dc
        size = abs(diff).bit_length()
        amp = diff if diff > 0 else diff + (1 << size) - 1
        bits.append((size, amp))
    # decode
    prev = 0
    out = []
    for size, amp in bits:
        if size:
            diff = amp if amp >= (1 << (size - 1)) else amp - (1 << size) + 1
        else:
            diff = 0
        prev += diff
        out.append(prev)
    assert out == dcs
