"""Fuzz + contract suite for the progressive (SOF2) JPEG codec — the r16
VERDICT gap #5 ("progressive JPEG is ubiquitous in web-crawled corpora; a
real 100 TB crawl would gate on a large fraction of images").

The load-bearing contract is an EXACT cross-codec differential: the
progressive encoder shares `_quantized_planes` with the baseline one, so
the two files carry identical quantized coefficients and
``jpeg_decode(progressive) == jpeg_decode(baseline)`` pixel-for-pixel —
any defect anywhere in the 10-scan script (DC successive approximation,
spectral bands, EOBn runs, refinement correction bits, per-scan DHT
redefinition) breaks the equality.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.operators.jpeg import (
    _scan_ops_ac_first,
    _scan_ops_ac_refine,
    jpeg_decode,
    jpeg_encode_rgb,
    jpeg_encode_rgb_progressive,
)


def _diff(px: np.ndarray, q: int, s: str) -> None:
    base = jpeg_decode(jpeg_encode_rgb(px, quality=q, sampling=s))
    prog = jpeg_decode(jpeg_encode_rgb_progressive(px, quality=q, sampling=s))
    assert np.array_equal(base, prog)


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    w=st.integers(8, 56),
    h=st.integers(8, 56),
    q=st.sampled_from([20, 35, 60, 85, 90, 95]),
    s=st.sampled_from(["4:4:4", "4:2:0", "4:2:2"]),
)
def test_progressive_equals_baseline_random(seed, w, h, q, s):
    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    _diff(px, q, s)


@pytest.mark.parametrize("s", ["4:4:4", "4:2:0", "4:2:2"])
@pytest.mark.parametrize("q", [40, 90])
def test_progressive_equals_baseline_structured(q, s):
    """The shapes that stress specific coder paths: flat (EOBn runs span
    hundreds of blocks), one-hot (long ZRL runs + isolated significants),
    checkerboard (max-frequency AC), gradients (dense low band)."""
    flat = np.full((64, 64, 3), 137, dtype=np.uint8)
    onehot = np.full((64, 64, 3), 42, dtype=np.uint8)
    onehot[32, 32] = 250
    cb = (np.indices((40, 40)).sum(axis=0) % 2 * 255).astype(np.uint8)
    checker = np.stack([cb, cb, cb], axis=-1)
    g = np.linspace(0, 255, 48 * 48).reshape(48, 48).astype(np.uint8)
    grad = np.stack([g, g.T, 255 - g], axis=-1)
    for px in (flat, onehot, checker, grad):
        _diff(px, q, s)


def test_eobn_runs_are_emitted_and_sized():
    """The encoder folds consecutive end-of-band blocks into ONE EOBn
    symbol (n = floor(log2(run)) in the high nibble, run - 2^n extension
    bits) — pin it at the op level so the decoder's EOBRUN arithmetic is
    verified against a known run length, not just round-trips."""
    blocks = np.zeros((300, 64), dtype=np.int64)
    ops = _scan_ops_ac_first(blocks, 1, 63, 0)
    assert ops == [("sym", 0, 8 << 4), ("bits", 300 - 256, 8)]
    # refinement: all-zero-history blocks fold the same way, and blocks
    # with already-significant coefficients ride their correction bits
    blocks2 = np.zeros((5, 64), dtype=np.int64)
    blocks2[2, 7] = 6   # |6| >> 1 = 3 > 1: history coefficient, LSB 1
    blocks2[4, 9] = 4   # |4| >> 1 = 2 > 1: history coefficient, LSB 0
    ops2 = _scan_ops_ac_refine(blocks2, 1, 63, 1)
    assert ops2 == [
        ("sym", 0, 2 << 4),   # EOB4 (run of 5 blocks, no new significance)
        ("bits", 5 - 4, 2),
        ("bits", 1, 1),       # correction bit of block 2's coefficient
        ("bits", 0, 1),       # correction bit of block 4's coefficient
    ]


def test_progressive_rejects_unsupported_and_corrupt():
    px = np.random.default_rng(3).integers(0, 256, size=(16, 16, 3),
                                           dtype=np.uint8)
    good = jpeg_encode_rgb_progressive(px, quality=90)
    # truncation inside a scan must be loud
    with pytest.raises(ValueError):
        jpeg_decode(good[: len(good) // 2])
    # a nonzero DRI spliced after SOF2: SUPPORTED since r18 — an interval
    # covering every scan's unit count (no RSTn in the stream) must
    # decode to exactly the plain pixels, not gate
    sof2_at = good.find(b"\xff\xc2")
    (sof2_len,) = struct.unpack(">H", good[sof2_at + 2 : sof2_at + 4])
    cut = sof2_at + 2 + sof2_len
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 1000)
    assert np.array_equal(
        jpeg_decode(good[:cut] + dri + good[cut:]), jpeg_decode(good)
    )
    # still a JPEG gate for garbage
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"gif89a" + good)


def test_progressive_mixed_geometry_grid_path():
    """raw_jpeg_grid (the dHash decoder) hashes baseline and progressive
    files of DIFFERENT sizes in one batch — the dispatch is per blob."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
        _block_mean_grid,
        raw_jpeg_grid,
    )

    rng = np.random.default_rng(4)
    blobs = []
    want = []
    for w, h, prog in [(36, 32, False), (18, 16, True), (27, 24, True)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        enc = jpeg_encode_rgb_progressive if prog else jpeg_encode_rgb
        blob = enc(px, quality=90)
        blobs.append(blob)
        want.append(_block_mean_grid(jpeg_decode(blob), "t"))
    data = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    lens = np.array([len(b) for b in blobs], dtype=np.int64)
    ends = np.cumsum(lens)
    grids = raw_jpeg_grid(data, ends - lens, ends, lens)
    for i, w_ in enumerate(want):
        assert np.array_equal(grids[i], w_)


def test_planted_cross_codec_corpus_truth_exhaustive():
    """Exactly the identity the image_jpeg_progressive_phash_dups oracle
    states: per class, the BASELINE copy and the two PROGRESSIVE copies
    (each at a different quality and chroma sampling) decode to dHashes
    exactly 0 bits apart — the same-image-saved-by-different-tools dedup
    story, now across codec MODES; cross-class floor clears the 3-bit
    verify bar."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
        _block_mean_grid,
        class_grid_image,
    )
    from robi_biometric_qdrant_vector_db_service_spark.workload_sources import (
        JPEGP_CLASSES,
        JPEGP_SEED_BASE,
        JPEGP_VARIANTS,
    )

    def bits(px):
        g = _block_mean_grid(px, "t")
        return (g[:, :-1] < g[:, 1:]).reshape(64)

    all_bits = {}
    for cls in range(JPEGP_CLASSES):
        px = class_grid_image(JPEGP_SEED_BASE + cls, width=36, height=32)
        for vi, (q, samp, prog, rst) in enumerate(JPEGP_VARIANTS):
            enc = jpeg_encode_rgb_progressive if prog else jpeg_encode_rgb
            all_bits[(cls, vi)] = bits(
                jpeg_decode(enc(px, quality=q, sampling=samp,
                                restart_interval=rst))
            )
    assert any(p for _q, _s, p, _r in JPEGP_VARIANTS) and not all(
        p for _q, _s, p, _r in JPEGP_VARIANTS
    )  # the corpus genuinely crosses the codec-mode boundary
    assert any(r for _q, _s, _p, r in JPEGP_VARIANTS)  # and restart framing
    for cls in range(JPEGP_CLASSES):
        for v1 in range(3):
            for v2 in range(v1 + 1, 3):
                assert not (
                    all_bits[(cls, v1)] ^ all_bits[(cls, v2)]
                ).any(), (cls, v1, v2)
    min_cross = 64
    for c1 in range(JPEGP_CLASSES):
        for c2 in range(c1 + 1, JPEGP_CLASSES):
            d = int((all_bits[(c1, 0)] != all_bits[(c2, 0)]).sum())
            min_cross = min(min_cross, d)
    assert min_cross > 3, min_cross
