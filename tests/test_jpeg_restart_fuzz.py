"""Fuzz + contract suite for JPEG restart intervals (DRI/RSTn) — the r17
VERDICT gap #1: digital cameras and many hardware encoders emit restart
markers routinely, so on a real crawl the old loud-fail gate fired
constantly.

The load-bearing contract is the same EXACT differential discipline the
progressive suite uses: a restart interval changes ONLY the entropy-stream
framing (byte-aligned segments, DC predictors reset, EOB runs expire at
each RSTn), never the quantized coefficients — so for any image, quality,
sampling and interval, ``decode(encode(px, restart_interval=r)) ==
decode(encode(px))`` pixel-for-pixel, on BOTH codec modes.  Malformed
restart streams (stray RSTn without DRI, out-of-sequence markers, missing
segments) stay loud.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.operators.jpeg import (
    jpeg_decode,
    jpeg_encode_rgb,
    jpeg_encode_rgb_progressive,
)


def _rand(seed, h, w):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    w=st.integers(8, 48),
    h=st.integers(8, 48),
    q=st.sampled_from([30, 60, 85, 95]),
    s=st.sampled_from(["4:4:4", "4:2:0", "4:2:2"]),
    r=st.integers(1, 9),
)
def test_baseline_restart_equals_plain_random(seed, w, h, q, s, r):
    px = _rand(seed, h, w)
    plain = jpeg_decode(jpeg_encode_rgb(px, quality=q, sampling=s))
    rst = jpeg_decode(
        jpeg_encode_rgb(px, quality=q, sampling=s, restart_interval=r)
    )
    assert np.array_equal(plain, rst)


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    w=st.integers(8, 48),
    h=st.integers(8, 48),
    q=st.sampled_from([30, 60, 90]),
    s=st.sampled_from(["4:4:4", "4:2:0", "4:2:2"]),
    r=st.integers(1, 7),
)
def test_progressive_restart_equals_baseline_random(seed, w, h, q, s, r):
    """The full cross-product differential: progressive-with-restarts ==
    baseline-with-restarts == plain baseline, pixel-for-pixel (shared
    quantized coefficients)."""
    px = _rand(seed, h, w)
    plain = jpeg_decode(jpeg_encode_rgb(px, quality=q, sampling=s))
    prog = jpeg_decode(
        jpeg_encode_rgb_progressive(
            px, quality=q, sampling=s, restart_interval=r
        )
    )
    assert np.array_equal(plain, prog)


@pytest.mark.parametrize("s", ["4:4:4", "4:2:0"])
def test_structured_images_with_restarts(s):
    """Shapes that stress the restart-specific state: flat images make
    every post-restart DC diff equal the full DC value (predictor reset
    visible); gradients accumulate large predictors that MUST reset; the
    one-hot image puts EOB runs right up against segment boundaries."""
    flat = np.full((40, 40, 3), 200, dtype=np.uint8)
    grad = np.tile(
        np.linspace(0, 255, 40, dtype=np.uint8)[None, :, None], (40, 1, 3)
    )
    onehot = np.full((40, 40, 3), 64, dtype=np.uint8)
    onehot[13, 21] = (255, 0, 128)
    for px in (flat, grad, onehot):
        plain = jpeg_decode(jpeg_encode_rgb(px, quality=80, sampling=s))
        for r in (1, 2, 3):
            got_b = jpeg_decode(
                jpeg_encode_rgb(px, quality=80, sampling=s, restart_interval=r)
            )
            got_p = jpeg_decode(
                jpeg_encode_rgb_progressive(
                    px, quality=80, sampling=s, restart_interval=r
                )
            )
            assert np.array_equal(plain, got_b), (s, r)
            assert np.array_equal(plain, got_p), (s, r)


def test_interval_exactly_divides_and_exceeds_mcus():
    """Edge intervals: r divides the MCU count exactly (last segment full,
    no trailing RSTn) and r >= total MCUs (DRI present, zero RSTn)."""
    px = _rand(7, 32, 32)  # 16 MCUs at 4:4:4
    plain = jpeg_decode(jpeg_encode_rgb(px, quality=85, sampling="4:4:4"))
    for r in (4, 8, 16, 17, 1000):
        blob = jpeg_encode_rgb(
            px, quality=85, sampling="4:4:4", restart_interval=r
        )
        assert np.array_equal(plain, jpeg_decode(blob)), r
    # r >= MCUs: DRI declared but stream has no RSTn at all
    blob = jpeg_encode_rgb(px, quality=85, sampling="4:4:4", restart_interval=99)
    assert blob.count(b"\xff\xdd") == 1
    for n in range(8):
        assert bytes([0xFF, 0xD0 + n]) not in _entropy_part(blob)


def _entropy_part(blob: bytes) -> bytes:
    """Bytes after the (single, baseline) SOS header."""
    i = blob.find(b"\xff\xda")
    assert i > 0
    seglen = int.from_bytes(blob[i + 2 : i + 4], "big")
    return blob[i + 2 + seglen :]


def test_stray_restart_marker_without_dri_is_loud():
    px = _rand(11, 24, 24)
    blob = jpeg_encode_rgb(px, quality=80, sampling="4:4:4", restart_interval=2)
    no_dri = blob.replace(b"\xff\xdd\x00\x04\x00\x02", b"", 1)
    assert no_dri != blob
    with pytest.raises(ValueError, match="DRI interval is 0"):
        jpeg_decode(no_dri)


def test_out_of_sequence_restart_marker_is_loud():
    """RSTn numbering must cycle RST0,RST1,... from the scan start —
    a swapped marker means dropped/duplicated segments on a real stream."""
    px = _rand(13, 32, 32)
    blob = jpeg_encode_rgb(px, quality=80, sampling="4:4:4", restart_interval=2)
    ent = _entropy_part(blob)
    assert b"\xff\xd0" in ent
    head = blob[: len(blob) - len(ent)]
    bad = head + ent.replace(b"\xff\xd0", b"\xff\xd3", 1)
    with pytest.raises(ValueError, match="out of sequence"):
        jpeg_decode(bad)


def test_wrong_segment_count_is_loud():
    """Dropping one whole restart segment (data + marker) must fail the
    ceil(MCUs/interval) segment-count check, not decode garbage."""
    px = _rand(17, 32, 32)
    blob = jpeg_encode_rgb(px, quality=80, sampling="4:4:4", restart_interval=2)
    ent = _entropy_part(blob)
    first_rst = ent.find(b"\xff\xd0")
    second_rst = ent.find(b"\xff\xd1")
    assert 0 < first_rst < second_rst
    # remove segment 1 (between RST0 and RST1) AND renumber by dropping
    # RST0 itself — the remaining run RST1.. is out of sequence OR short
    head = blob[: len(blob) - len(ent)]
    bad = head + ent[:first_rst] + ent[second_rst:]
    with pytest.raises(ValueError):
        jpeg_decode(bad)


def test_progressive_restart_marker_counter_resets_per_scan():
    """E.2.4: the RSTn modulo-8 counter restarts at RST0 in every scan —
    a progressive file with >= 2 restart-bearing scans must contain at
    least two RST0 markers, and still decode to the plain pixels."""
    px = _rand(23, 40, 40)
    blob = jpeg_encode_rgb_progressive(
        px, quality=80, sampling="4:4:4", restart_interval=2
    )
    assert blob.count(b"\xff\xd0") >= 2
    plain = jpeg_decode(jpeg_encode_rgb(px, quality=80, sampling="4:4:4"))
    assert np.array_equal(plain, jpeg_decode(blob))


def test_corpus_variants_hash_identically_with_restarts():
    """The image_jpeg_phash_dups planted truth survives the r18 variant
    table (two of three copies now carry restart intervals): every
    variant of a class hashes identically to the class's lossless
    pixels."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
        _block_mean_grid,
        class_grid_image,
    )
    from robi_biometric_qdrant_vector_db_service_spark.workload_sources import (
        JPEG_VARIANTS,
        JPEGP_VARIANTS,
    )

    def bits(px):
        g = _block_mean_grid(np.asarray(px, dtype=np.int64), "t")
        return (g[:, :-1] < g[:, 1:]).reshape(64)

    assert any(r for _q, _s, r in JPEG_VARIANTS)
    assert any(r for _q, _s, _p, r in JPEGP_VARIANTS)
    from robi_biometric_qdrant_vector_db_service_spark.operators.jpeg import (
        jpeg_encode_gray,
    )

    for cls in (0, 3, 17):
        px = class_grid_image(cls, width=36, height=32)
        ref = bits(px)
        for q, samp, rst in JPEG_VARIANTS:
            if samp == "gray":
                blob = jpeg_encode_gray(px, quality=q, restart_interval=rst)
            else:
                blob = jpeg_encode_rgb(px, quality=q, sampling=samp,
                                       restart_interval=rst)
            out = jpeg_decode(blob)
            assert np.array_equal(bits(out), ref), (cls, q, samp, rst)
        for q, samp, prog, rst in JPEGP_VARIANTS:
            enc = jpeg_encode_rgb_progressive if prog else jpeg_encode_rgb
            out = jpeg_decode(
                enc(px, quality=q, sampling=samp, restart_interval=rst)
            )
            assert np.array_equal(bits(out), ref), (cls, q, samp, prog, rst)
