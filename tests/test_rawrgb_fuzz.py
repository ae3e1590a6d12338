"""Differential fuzz of the raw-RGB dHash decoder
(``operators.multimodal.raw_rgb_grid``) against a per-pixel pure-Python
evaluator of the documented semantics: integer Rec.601 luminance
(299R + 587G + 114B), 8x9 blocks at boundaries (height*i)//8 x
(width*j)//9, cell = block MEAN; then the shared packing (left < right
gradient bit, little-endian 16-bit bands) re-derived bit by bit.

The reference shares nothing with the engine: nested Python loops over
pixels, fractions.Fraction for exact means (the engine divides float64 —
the comparison is on the derived BITS, which only depend on mean ORDER,
plus a direct grid compare under an exactness tolerance).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
    _flatten,
    dhash_bands,
    raw_rgb_grid,
)


def ref_grid(img: np.ndarray) -> list[list[float]]:
    """(h, w, 3) uint8 -> 8x9 block-mean luminance, nested-loop Python."""
    from fractions import Fraction

    h, w, _ = img.shape
    out = []
    for r in range(8):
        row = []
        r0, r1 = (h * r) // 8, (h * (r + 1)) // 8
        for c in range(9):
            c0, c1 = (w * c) // 9, (w * (c + 1)) // 9
            acc = Fraction(0)
            n = 0
            for y in range(r0, r1):
                for x in range(c0, c1):
                    px = img[y, x]
                    acc += int(px[0]) * 299 + int(px[1]) * 587 + int(px[2]) * 114
                    n += 1
            row.append(acc / n)
        out.append(row)
    return out


def ref_bands(grid) -> tuple[int, int, int, int]:
    """Gradient bits + band packing, re-derived from the docstring."""
    bands = [0, 0, 0, 0]
    for r in range(8):
        for c in range(8):
            bidx = r * 8 + c
            if grid[r][c] < grid[r][c + 1]:
                bands[bidx // 16] |= 1 << (bidx % 16)
    return tuple(bands)


@settings(max_examples=12, deadline=None)
@given(
    w=st.integers(min_value=9, max_value=20),
    h=st.integers(min_value=8, max_value=18),
    seed=st.integers(min_value=0, max_value=10_000),
    n_imgs=st.integers(min_value=1, max_value=4),
)
def test_raw_rgb_decoder_matches_per_pixel_reference(spark, w, h, seed, n_imgs):
    rng = np.random.default_rng(seed)
    imgs = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for _ in range(n_imgs)]
    blobs = [im.tobytes() for im in imgs]

    # the decoder, driven directly on the flattened batch shape
    import pandas as pd

    data, starts, ends, lens = _flatten(pd.Series([bytearray(b) for b in blobs]))
    got_grids = raw_rgb_grid(w, h)(data, starts, ends, lens)

    df = spark.createDataFrame(
        [(i, bytearray(b), "image/raw-rgb", len(b)) for i, b in enumerate(blobs)],
        "doc_id bigint, blob binary, media_type string, n_bytes bigint",
    )
    got_bands = {
        r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in dhash_bands(df, decoder=raw_rgb_grid(w, h)).collect()
    }
    for i, im in enumerate(imgs):
        grid = ref_grid(im)
        # grid values match to float64 exactness (integer sums / integer
        # counts — both representable; compare within 1e-9 relative)
        for r in range(8):
            for c in range(9):
                assert abs(got_grids[i][r][c] - float(grid[r][c])) <= 1e-9 * max(
                    1.0, float(grid[r][c])
                ), (i, r, c)
        assert got_bands[i] == ref_bands(grid), (i, w, h, seed)
