"""Fuzz + contract suite for the REAL resize pipeline (r16 VERDICT item 2):
`resize_sum2_png` (PNG decode + exact 2x2 sum-pool + raw-i32 interchange)
and `raw_i32_grid` (the downstream GridDecoder).

The load-bearing contract is EXACT hash preservation: for images whose 8x9
grid boundaries are even (w % 18 == 0, h % 16 == 0 — the planted-corpus
geometry), the pooled image's block grid is exactly 4x the original's
(sum pooling is integer-closed and Rec.601 luminance is linear), so every
dHash gradient bit survives a 2x resize bit-for-bit.  Any resize defect —
mean rounding, a dropped scanline, channel swap, pool misalignment —
flips bits and fails these differentials.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
    _block_mean_grid,
    _png_pixels,
    _raw_i32_encode,
    _raw_i32_pixels,
    class_grid_image,
    dhash_bands,
    png_encode_rgb,
    raw_i32_grid,
    raw_png_grid,
    resize_sum2_png,
)
from tests.test_multimodal import _blob_df


def _rand_img(seed: int, w: int, h: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


def _ref_pool2(px: np.ndarray) -> np.ndarray:
    """Independent per-pixel 2x2 sum pool (loops, not reshape tricks)."""
    h, w = px.shape[:2]
    out = np.zeros((h // 2, w // 2, 3), dtype=np.int64)
    for r in range(h // 2):
        for c in range(w // 2):
            for ch in range(3):
                out[r, c, ch] = int(
                    px[2 * r : 2 * r + 2, 2 * c : 2 * c + 2, ch].sum()
                )
    return out


def test_raw_i32_roundtrip_and_rejects():
    px = _rand_img(0, 6, 4).astype(np.int64) * 7  # values past uint8
    blob = _raw_i32_encode(px)
    assert (_raw_i32_pixels(blob) == px).all()
    with pytest.raises(ValueError, match="not a raw-i32"):
        _raw_i32_pixels(b"PNG!" + blob[4:])
    with pytest.raises(ValueError, match="declares"):
        _raw_i32_pixels(blob[:-4])
    with pytest.raises(ValueError, match="expected \\(h, w, 3\\)"):
        _raw_i32_encode(px[..., 0])


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**32 - 1),
       dims=st.sampled_from([(18, 16), (36, 32), (54, 48)]),
       filt=st.integers(0, 4))
def test_resize_preserves_dhash_exactly(spark, seed, dims, filt):
    """dhash(resize2x(png)) == dhash(png), bit for bit, for ANY pixel
    content at grid-aligned geometry — the registered query's zero,
    earned on random images, not just the planted corpus."""
    w, h = dims
    px = _rand_img(seed, w, h)
    blob = png_encode_rgb(px, filt=filt)
    orig = dhash_bands(_blob_df(spark, [blob]), decoder=raw_png_grid).collect()
    res = dhash_bands(
        resize_sum2_png(_blob_df(spark, [blob])), decoder=raw_i32_grid
    ).collect()
    assert len(orig) == len(res) == 1
    for j in range(4):
        assert orig[0][f"b{j}"] == res[0][f"b{j}"], (seed, dims, filt, j)


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**32 - 1),
       dims=st.sampled_from([(18, 16), (36, 32), (10, 8), (24, 20)]))
def test_pooled_pixels_match_reference_and_grid_scales_4x(seed, dims):
    """The engine's reshape-based pool == an independent per-pixel loop;
    and at grid-aligned dims the pooled block grid is exactly 4x."""
    w, h = dims
    px = _rand_img(seed, w, h)
    pooled_engine = (
        px.astype(np.int64).reshape(h // 2, 2, w // 2, 2, 3).sum(axis=(1, 3))
    )
    assert (pooled_engine == _ref_pool2(px)).all()
    if w % 18 == 0 and h % 16 == 0:
        g1 = _block_mean_grid(px.astype(np.int64), "t")
        g2 = _block_mean_grid(pooled_engine, "t")
        assert np.array_equal(g2, 4 * g1)


def test_resize_rejects_odd_dimensions(spark):
    px = _rand_img(3, 19, 16)
    blob = png_encode_rgb(px)
    with pytest.raises(Exception, match="even"):
        resize_sum2_png(_blob_df(spark, [blob])).collect()


def test_resize_planted_corpus_identity(spark):
    """The registered query's planted truth, stated independently: all 5
    filter re-encodings of one class image resize to the same hash, and
    the pooled pixels decode back exactly through the interchange blob."""
    px = class_grid_image(7)  # 18x16
    blobs = [png_encode_rgb(px, filt=f) for f in range(5)]
    res = dhash_bands(
        resize_sum2_png(_blob_df(spark, blobs)), decoder=raw_i32_grid
    ).collect()
    vals = {(r["b0"], r["b1"], r["b2"], r["b3"]) for r in res}
    assert len(res) == 5 and len(vals) == 1
    # interchange round-trip against the direct pool of the decoded PNG
    want = (
        _png_pixels(blobs[0]).reshape(8, 2, 9, 2, 3).sum(axis=(1, 3))
    )
    got_rows = resize_sum2_png(_blob_df(spark, blobs[:1])).collect()
    assert (_raw_i32_pixels(bytes(got_rows[0]["blob"])) == want).all()
