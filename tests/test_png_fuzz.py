"""Differential fuzz of the stdlib-only PNG GridDecoder
(``operators.multimodal.raw_png_grid`` — zlib inflate + scanline
unfilter): encode random pixel arrays with a from-scratch PNG writer that
exercises ALL FIVE scanline filters (None/Sub/Up/Average/Paeth, chosen
per row), then require the decoded 8x9 block-mean grid to equal
``raw_rgb_grid``'s grid over the same raw pixels EXACTLY — PNG is
lossless, so any difference is a decode bug, not tolerance.

Also pins: grayscale (color type 0) decodes as R=G=B, mixed image sizes
hash in one batch, planted duplicate PNGs pair identically to their
raw-RGB twins through the full dhash pipeline, and corrupt/unsupported
files fail loud.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
    _flatten,
    _png_pixels,
    dhash_bands,
    phash_dup_pairs,
    raw_png_grid,
    raw_rgb_grid,
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def png_encode(px: np.ndarray, filters: list[int], gray: bool = False) -> bytes:
    """From-scratch PNG writer (the test's independent reference): 8-bit
    truecolor or grayscale, one caller-chosen filter per scanline —
    filtering is the ENCODER's free choice, so a decoder must accept any
    mix.  Filter math is the RFC 2083 definition in per-pixel pure Python,
    deliberately NOT the decoder's vectorized restatement."""
    h, w = px.shape[:2]
    if gray:
        assert np.all(px[..., 0] == px[..., 1]) and np.all(px[..., 1] == px[..., 2])
        samples = px[..., 0].astype(np.int64)
        ch, ctype = 1, 0
    else:
        samples = px.reshape(h, w * 3).astype(np.int64)
        ch, ctype = 3, 2
    stride = samples.shape[1] if gray else w * 3
    samples = samples.reshape(h, stride)
    raw = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        raw.append(f)
        for x in range(stride):
            v = int(samples[y][x])
            a = int(samples[y][x - ch]) if x >= ch else 0
            b = int(samples[y - 1][x]) if y else 0
            c = int(samples[y - 1][x - ch]) if (y and x >= ch) else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            raw.append((v - pred) % 256)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _grids_for(blobs: list[bytes], decoder) -> np.ndarray:
    import pandas as pd

    data, starts, ends, lens = _flatten(pd.Series([bytearray(b) for b in blobs]))
    return decoder(data, starts, ends, lens)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(9, 40),
    h=st.integers(8, 40),
    seed=st.integers(0, 2**32 - 1),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=6),
)
def test_png_grid_equals_raw_rgb_grid(w, h, seed, filters):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    png_grid = _grids_for([png_encode(px, filters)], raw_png_grid)
    rgb_grid = _grids_for([px.tobytes()], raw_rgb_grid(w, h))
    assert np.array_equal(png_grid, rgb_grid)  # lossless => exact


@settings(max_examples=10, deadline=None)
@given(
    w=st.integers(9, 30),
    h=st.integers(8, 30),
    seed=st.integers(0, 2**32 - 1),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=4),
)
def test_grayscale_png_decodes_as_rgb_triple(w, h, seed, filters):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 256, size=(h, w, 1)).astype(np.uint8)
    px = np.repeat(g, 3, axis=2)
    got = _png_pixels(png_encode(px, filters, gray=True))
    assert np.array_equal(got, px.astype(np.int64))


def test_mixed_sizes_decode_in_one_batch():
    """IHDR carries each file's dims — unlike the fixed-layout raw-RGB
    factory, one batch may mix sizes."""
    rng = np.random.default_rng(3)
    imgs = [
        rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        for w, h in [(9, 8), (20, 12), (33, 31)]
    ]
    grids = _grids_for([png_encode(px, [0, 1, 2, 3, 4]) for px in imgs], raw_png_grid)
    for i, px in enumerate(imgs):
        h, w = px.shape[:2]
        want = _grids_for([px.tobytes()], raw_rgb_grid(w, h))[0]
        assert np.array_equal(grids[i], want)


def test_png_planted_dups_pair_like_raw_rgb(spark):
    """End-to-end through dhash_bands + phash_dup_pairs: duplicate PNGs
    (even when re-encoded with DIFFERENT scanline filters) pair exactly
    as their raw-RGB twins — decoder-invariance of the pair pipeline,
    extended to the compressed-codec decoder."""
    from tests.test_multimodal import W, H, _blob_df, _grid_image

    rng = np.random.default_rng(17)
    originals = [_grid_image(rng) for _ in range(5)]
    pngs = [png_encode(px, [y % 5]) for y, px in enumerate(originals)]
    # doc 5 re-encodes doc 0's pixels with a different filter schedule —
    # same content, different bytes — and doc 6 duplicates doc 2
    blobs = pngs + [png_encode(originals[0], [4, 3]), png_encode(originals[2], [1])]
    hashes = dhash_bands(_blob_df(spark, blobs), decoder=raw_png_grid)
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in phash_dup_pairs(hashes).collect()
    }
    raw_blobs = [px.tobytes() for px in originals] + [
        originals[0].tobytes(),
        originals[2].tobytes(),
    ]
    raw_hashes = dhash_bands(_blob_df(spark, raw_blobs), decoder=raw_rgb_grid(W, H))
    want = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in phash_dup_pairs(raw_hashes).collect()
    }
    assert got == want == {(0, 5): 0, (2, 6): 0}


def test_png_rejects_corrupt_and_unsupported():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(8, 9, 3)).astype(np.uint8)
    good = png_encode(px, [0])
    with pytest.raises(ValueError, match="bad signature"):
        _grids_for([b"JFIF" + good], raw_png_grid)
    with pytest.raises(ValueError, match="missing IHDR"):
        _grids_for([good[:8] + _chunk(b"IEND", b"")], raw_png_grid)
    # 16-bit depth: flip IHDR's depth byte (offset 8+8+8 = 24)
    deep = bytearray(good)
    deep[24] = 16
    with pytest.raises(ValueError, match="unsupported PNG"):
        _grids_for([bytes(deep)], raw_png_grid)
    # undersized image: 8x8 < 9 columns
    small = png_encode(px[:, :8], [0])
    with pytest.raises(ValueError, match="at least 9x8"):
        _grids_for([small], raw_png_grid)
    # truncated IDAT stream
    trunc = png_encode(px, [0]).replace(
        _chunk(b"IDAT", zlib.compress(_idat_raw(px))),
        _chunk(b"IDAT", zlib.compress(_idat_raw(px)[:-5])),
    )
    with pytest.raises(ValueError, match="IDAT stream"):
        _grids_for([trunc], raw_png_grid)


def _idat_raw(px: np.ndarray) -> bytes:
    h = px.shape[0]
    out = bytearray()
    for y in range(h):
        out.append(0)
        out.extend(px[y].tobytes())
    return bytes(out)


def test_raw_rgb_factory_rejects_undersized_dims():
    """r14 ADVICE: width<9 or height<8 previously minted all-zero NaN
    grids (0/0 block areas) that paired every undersized image at
    hamming 0 — now a loud factory-time contract."""
    with pytest.raises(ValueError, match="at least 9x8"):
        raw_rgb_grid(8, 8)
    with pytest.raises(ValueError, match="at least 9x8"):
        raw_rgb_grid(9, 7)
    raw_rgb_grid(9, 8)  # the minimum legal layout constructs fine


# ---------------------------------------------------------------------------
# post-artifact r15 additions: chunk-layout robustness + engine-encoder
# round-trip.  Real PNGs split their compressed stream across many IDAT
# chunks and interleave ancillary chunks (tEXt, pHYs, ...); the decoder
# must concatenate IDATs in order and skip everything it doesn't know.
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(9, 24),
    h=st.integers(8, 24),
    seed=st.integers(0, 2**32 - 1),
    cuts=st.lists(st.integers(1, 5000), max_size=4),
    anc_at=st.lists(st.integers(0, 5), max_size=3),
)
def test_png_multi_idat_and_ancillary_chunks(w, h, seed, cuts, anc_at):
    """Splitting the zlib stream across multiple IDAT chunks at arbitrary
    byte offsets and sprinkling ancillary chunks between them must decode
    identically to the single-IDAT file."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    single = png_encode(px, [0, 3, 4])
    want = _png_pixels(single)

    # rebuild: magic + IHDR + split IDATs (+ ancillary noise) + IEND
    ihdr_end = 8 + 8 + 13 + 4
    idat_start = single.index(b"IDAT") - 4
    idat_len = struct.unpack(">I", single[idat_start : idat_start + 4])[0]
    stream = single[idat_start + 8 : idat_start + 8 + idat_len]
    pieces, prev = [], 0
    for c in sorted(set(min(c, len(stream) - 1) for c in cuts if c < len(stream))):
        if c > prev:
            pieces.append(stream[prev:c])
            prev = c
    pieces.append(stream[prev:])
    anc = _chunk(b"tEXt", b"Comment\x00not image data")
    out = single[:ihdr_end]
    for i, piece in enumerate(pieces):
        if i in anc_at:
            out += anc
        out += _chunk(b"IDAT", piece)
    out += anc + _chunk(b"IEND", b"")
    got = _png_pixels(out)
    assert np.array_equal(got, want)


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(9, 32),
    h=st.integers(8, 32),
    seed=st.integers(0, 2**32 - 1),
    filt=st.integers(0, 4),
)
def test_engine_encoder_roundtrips_through_decoder(w, h, seed, filt):
    """The ENGINE-side vectorized encoder (png_encode_rgb, used by the
    image_png_phash_dups corpus) must round-trip losslessly through the
    decoder for every scanline filter — and must byte-agree in pixels
    (not bytes) with the test's independent per-pixel encoder."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
        png_encode_rgb,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    engine_blob = png_encode_rgb(px, filt=filt)
    assert np.array_equal(_png_pixels(engine_blob), px.astype(np.int64))
    ref_blob = png_encode(px, [filt])
    assert np.array_equal(_png_pixels(ref_blob), _png_pixels(engine_blob))


# ---------------------------------------------------------------------------
# r18: color types 3/4/6 + Adam7 interlace
# ---------------------------------------------------------------------------


def _png_multi(samples: np.ndarray, ctype: int, ch: int,
               filters: list[int], *, plte: bytes | None = None,
               trns: bytes | None = None, interlace: int = 0) -> bytes:
    """Independent reference writer for arbitrary channel counts and
    Adam7 layouts — per-pixel pure-Python filter math like png_encode,
    generalized to ``ch`` sample bytes per pixel."""
    h, w = samples.shape[0], samples.shape[1] // ch

    def filter_block(block: np.ndarray) -> bytes:
        bh, stride = block.shape
        raw = bytearray()
        for y in range(bh):
            f = filters[y % len(filters)]
            raw.append(f)
            for x in range(stride):
                v = int(block[y][x])
                a = int(block[y][x - ch]) if x >= ch else 0
                b = int(block[y - 1][x]) if y else 0
                c = int(block[y - 1][x - ch]) if (y and x >= ch) else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c)
                raw.append((v - pred) % 256)
        return bytes(raw)

    if interlace:
        from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
            _ADAM7,
        )

        grid = samples.reshape(h, w, ch)
        raw = b"".join(
            filter_block(
                grid[y0::dy, x0::dx].reshape(grid[y0::dy, x0::dx].shape[0], -1)
            )
            for x0, y0, dx, dy in _ADAM7
            if grid[y0::dy, x0::dx].size
        )
    else:
        raw = filter_block(samples)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def _comp_white(c, a):
    return (a * c + (255 - a) * 255 + 127) // 255


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(9, 32),
    h=st.integers(8, 32),
    seed=st.integers(0, 2**32 - 1),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=4),
    interlace=st.booleans(),
)
def test_rgba_decode_matches_composite_reference(w, h, seed, filters,
                                                 interlace):
    from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
        _png_pixels,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.int64)
    alpha = rng.integers(0, 256, size=(h, w), dtype=np.int64)
    rgba = np.concatenate([px, alpha[..., None]], axis=2)
    blob = _png_multi(rgba.reshape(h, w * 4), 6, 4, filters,
                      interlace=1 if interlace else 0)
    got = _png_pixels(blob)
    want = _comp_white(px, alpha[..., None])
    assert np.array_equal(got, want)


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(9, 28),
    h=st.integers(8, 28),
    seed=st.integers(0, 2**32 - 1),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=3),
)
def test_gray_alpha_decode_matches_reference(w, h, seed, filters):
    from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
        _png_pixels,
    )

    rng = np.random.default_rng(seed)
    g = rng.integers(0, 256, size=(h, w), dtype=np.int64)
    a = rng.integers(0, 256, size=(h, w), dtype=np.int64)
    ga = np.stack([g, a], axis=2)
    blob = _png_multi(ga.reshape(h, w * 2), 4, 2, filters)
    got = _png_pixels(blob)
    lum = _comp_white(g, a)
    assert np.array_equal(got, np.stack([lum, lum, lum], axis=2))


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(9, 28),
    h=st.integers(8, 28),
    seed=st.integers(0, 2**32 - 1),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=3),
    n_trns=st.integers(0, 6),
)
def test_palette_decode_matches_reference(w, h, seed, filters, n_trns):
    from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
        _png_pixels,
    )

    rng = np.random.default_rng(seed)
    n_pal = int(rng.integers(2, 17))
    pal = rng.integers(0, 256, size=(n_pal, 3), dtype=np.int64)
    idx = rng.integers(0, n_pal, size=(h, w), dtype=np.int64)
    trns_vals = rng.integers(0, 256, size=min(n_trns, n_pal), dtype=np.int64)
    blob = _png_multi(
        idx, 3, 1, filters,
        plte=pal.astype(np.uint8).tobytes(),
        trns=bytes(int(v) for v in trns_vals) if len(trns_vals) else None,
    )
    got = _png_pixels(blob)
    alpha = np.full(n_pal, 255, dtype=np.int64)
    alpha[: len(trns_vals)] = trns_vals
    want = pal[idx]
    if len(trns_vals):
        want = _comp_white(want, alpha[idx][..., None])
    assert np.array_equal(got, want)


def test_interlaced_engine_writer_roundtrip_all_filters():
    """Engine writer's Adam7 layout vs the decoder, and vs the
    independent reference writer byte-for-byte pixel equality."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
        _png_pixels,
        png_encode_rgb,
    )

    rng = np.random.default_rng(12)
    for (h, w) in [(8, 9), (13, 17), (32, 36)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for f in range(5):
            got = _png_pixels(png_encode_rgb(px, filt=f, interlace=True))
            assert np.array_equal(got, px.astype(np.int64)), (h, w, f)
            ref = _png_multi(
                px.reshape(h, w * 3).astype(np.int64), 2, 3, [f], interlace=1
            )
            assert np.array_equal(_png_pixels(ref), px.astype(np.int64))


def test_new_png_gates_stay_loud():
    from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
        _png_pixels,
        png_encode_palette,
        png_encode_rgb,
    )

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(8, 9, 3), dtype=np.uint8)
    # palette index past PLTE
    idx = np.full((8, 9), 3, dtype=np.int64)
    blob = _png_multi(idx, 3, 1, [0],
                      plte=bytes([1, 2, 3, 4, 5, 6]))  # 2 entries
    with pytest.raises(ValueError, match="palette index"):
        _png_pixels(blob)
    # palette PNG with no PLTE at all
    blob = _png_multi(np.zeros((8, 9), dtype=np.int64), 3, 1, [0])
    with pytest.raises(ValueError, match="without a valid PLTE"):
        _png_pixels(blob)
    # tRNS longer than the palette
    blob = _png_multi(np.zeros((8, 9), dtype=np.int64), 3, 1, [0],
                      plte=bytes([0, 0, 0]), trns=bytes([1, 2]))
    with pytest.raises(ValueError, match="tRNS"):
        _png_pixels(blob)
    # trailing IDAT bytes past the expected scanlines
    from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
        _filter_rows,
    )

    raw = _filter_rows(px.reshape(8, 27), 3, 0) + b"\x00"
    ihdr = struct.pack(">IIBBBBB", 9, 8, 8, 2, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="trailing IDAT"):
        _png_pixels(bad)
    # >256 distinct colors cannot palettize
    many = np.stack(np.meshgrid(np.arange(17), np.arange(17)), -1)
    px_many = np.zeros((17, 17, 3), dtype=np.uint8)
    px_many[..., 0] = many[..., 0] * 15
    px_many[..., 1] = many[..., 1] * 15
    px_many[..., 2] = (many[..., 0] * 17 + many[..., 1]) % 256
    assert len(np.unique(px_many.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="exceed the"):
        png_encode_palette(px_many)
