"""Fuzz + contract suite for the baseline JPEG codec (`operators.jpeg`)
and its GridDecoder (`operators.multimodal.raw_jpeg_grid`).

JPEG is lossy, so unlike the PNG suite there is no bit-exact pixel
differential; the contracts are:

- ROUND-TRIP BOUND: decode(encode(px)) stays within the quantization
  error budget — at quality 100 the Annex-K tables scale to all-ones, so
  the only loss is coefficient rounding, empirically <= 3 luma units even
  on pure noise (asserted with headroom).  Chroma-subsampled encodes of
  GRAYSCALE pixels (Cb = Cr = 128 everywhere, constant planes) lose
  nothing to subsampling, so they meet the same bound.
- BATCH DIFFERENTIAL: `raw_jpeg_grid` (per-blob integral image inside an
  Arrow batch, mixed sizes + mixed samplings) must equal `raw_rgb_grid`
  (the batched fixed-layout path) applied to the decoded pixels — two
  independent block-mean implementations over identical pixels.
- MARKER-LAYOUT FUZZ: APPn/COM segments sprinkled anywhere before SOS,
  and any legal reordering of DQT/DHT segments, must not change a single
  decoded pixel (a real camera file differs from our encoder's layout).
- PLANTED TRUTH, EXHAUSTIVELY: every (class, quality, sampling) variant
  the `image_jpeg_phash_dups` corpus ships hashes IDENTICALLY to the
  lossless pixels' hash — this is the exact statement the query's
  hamming-0 oracle relies on, checked for all 80 x 3 combinations, plus
  the >= 4-bit cross-class separation that makes false pairs impossible
  at the <= 3-bit verify.
- LOUD FAILURE: 16-bit DQT, truncated entropy streams, and non-JPEG
  bytes must raise, never hash (SOF2 decodes since r17; restart
  intervals and single-component grayscale since r18 — the corpus now
  ships a grayscale+restart variant).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.operators.jpeg import (
    jpeg_encode_gray,
    jpeg_decode,
    jpeg_encode_rgb,
)
from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
    _block_mean_grid,
    _flatten,
    class_grid_image,
    dhash_bands,
    phash_dup_pairs,
    raw_jpeg_grid,
    raw_rgb_grid,
)
from robi_biometric_qdrant_vector_db_service_spark.workload_sources import (
    JPEG_CLASSES,
    JPEG_VARIANTS,
)

SAMPLINGS = ("4:4:4", "4:2:2", "4:2:0")


def _grids_for(blobs: list[bytes], decoder) -> np.ndarray:
    import pandas as pd

    data, starts, ends, lens = _flatten(pd.Series([bytearray(b) for b in blobs]))
    return decoder(data, starts, ends, lens)


def _hash_bits(grid: np.ndarray) -> np.ndarray:
    return (grid[:, :-1] < grid[:, 1:]).reshape(-1)


# ---------------------------------------------------------------------------
# round-trip bounds
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(8, 40),
    h=st.integers(8, 40),
    seed=st.integers(0, 2**32 - 1),
)
def test_quality_100_roundtrip_bound(w, h, seed):
    """All-ones qtables at quality 100: the only loss is coefficient
    rounding — <= 3 units even on pure noise (empirical max 3; assert 5
    for float headroom)."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    out = jpeg_decode(jpeg_encode_rgb(px, quality=100, sampling="4:4:4"))
    assert out.shape == (h, w, 3)
    assert int(np.abs(out - px.astype(np.int64)).max()) <= 5


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(8, 40),
    h=st.integers(8, 40),
    seed=st.integers(0, 2**32 - 1),
    sampling=st.sampled_from(SAMPLINGS),
)
def test_grayscale_subsampling_is_lossless_in_chroma(w, h, seed, sampling):
    """Grayscale pixels have constant Cb = Cr = 128, so chroma subsampling
    discards nothing: every sampling mode meets the 4:4:4 bound."""
    rng = np.random.default_rng(seed)
    g = np.repeat(rng.integers(0, 256, size=(h, w, 1)), 3, axis=2).astype(np.uint8)
    out = jpeg_decode(jpeg_encode_rgb(g, quality=100, sampling=sampling))
    assert int(np.abs(out - g.astype(np.int64)).max()) <= 5


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(8, 48),
    h=st.integers(8, 48),
    seed=st.integers(0, 2**32 - 1),
    quality=st.integers(30, 99),
    sampling=st.sampled_from(SAMPLINGS),
)
def test_smooth_image_roundtrip_and_determinism(w, h, seed, quality, sampling):
    """Smooth (low-frequency) content at any mid/high quality stays within
    a generous perceptual budget, and encode + decode are bit-deterministic."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        128
        + 80 * np.sin((yy + rng.integers(0, 7)) / 7.0)
        + 60 * np.cos((xx + rng.integers(0, 9)) / 9.0)
    ).clip(0, 255)
    px = np.stack([base, base * 0.8 + 20, base * 0.6 + 40], axis=-1).astype(np.uint8)
    blob = jpeg_encode_rgb(px, quality=quality, sampling=sampling)
    assert blob == jpeg_encode_rgb(px, quality=quality, sampling=sampling)
    out = jpeg_decode(blob)
    assert np.array_equal(out, jpeg_decode(blob))
    assert float(np.abs(out - px.astype(np.int64)).mean()) <= 8.0


def test_byte_stuffing_is_exercised():
    """0xFF bytes inside the entropy stream must be stuffed (FF 00) and
    un-stuffed — pin that real blobs contain them, so the round-trip
    suite actually covers the stuffing path."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(24, 24, 3)).astype(np.uint8)
    blob = jpeg_encode_rgb(px, quality=100)
    scan = blob[blob.index(b"\xff\xda") :]
    assert b"\xff\x00" in scan
    assert int(np.abs(jpeg_decode(blob) - px.astype(np.int64)).max()) <= 5


# ---------------------------------------------------------------------------
# batch differential: raw_jpeg_grid vs raw_rgb_grid over decoded pixels
# ---------------------------------------------------------------------------


def test_mixed_sizes_and_samplings_grid_in_one_batch():
    """One Arrow batch mixing geometries and sampling modes: the per-blob
    integral-image path must equal the batched fixed-layout path applied
    to the decoded pixels (independent block-mean implementations)."""
    rng = np.random.default_rng(11)
    specs = [(9, 8, "4:4:4", 95), (20, 12, "4:2:0", 85), (33, 31, "4:2:2", 90)]
    blobs, decoded = [], []
    for w, h, samp, q in specs:
        px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        blob = jpeg_encode_rgb(px, quality=q, sampling=samp)
        blobs.append(blob)
        decoded.append(jpeg_decode(blob))
    grids = _grids_for(blobs, raw_jpeg_grid)
    for i, px in enumerate(decoded):
        h, w = px.shape[:2]
        want = _grids_for(
            [px.astype(np.uint8).tobytes()], raw_rgb_grid(w, h)
        )[0]
        assert np.array_equal(grids[i], want)


# ---------------------------------------------------------------------------
# marker-layout fuzz
# ---------------------------------------------------------------------------


def _split_segments(blob: bytes) -> tuple[list[tuple[int, bytes]], bytes]:
    """(marker, raw segment bytes) list up to and including SOS, plus the
    trailing scan bytes."""
    assert blob[:2] == b"\xff\xd8"
    pos, segs = 2, []
    while True:
        marker = blob[pos + 1]
        (ln,) = struct.unpack(">H", blob[pos + 2 : pos + 4])
        segs.append((marker, blob[pos : pos + 2 + ln]))
        pos += 2 + ln
        if marker == 0xDA:
            return segs, blob[pos:]


def _segment(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    perm_seed=st.integers(0, 2**32 - 1),
    app_at=st.lists(st.integers(0, 8), max_size=4),
)
def test_marker_reorder_and_ancillary_segments(seed, perm_seed, app_at):
    """Reordering DQT/DHT/APP0 segments (all legal before SOS) and
    inserting APPn/COM segments anywhere must not change a pixel."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(17, 19, 3)).astype(np.uint8)
    blob = jpeg_encode_rgb(px, quality=92, sampling="4:2:0")
    want = jpeg_decode(blob)
    segs, scan = _split_segments(blob)
    head, sos = segs[:-1], segs[-1]
    order = np.random.default_rng(perm_seed).permutation(len(head))
    noise = [
        _segment(0xE7, b"fuzz-app7-payload"),
        _segment(0xFE, b"a comment segment"),
    ]
    out = bytearray(b"\xff\xd8")
    for i, k in enumerate(order):
        if i in app_at:
            out += noise[i % 2]
        out += head[k][1]
    out += sos[1] + scan
    got = jpeg_decode(bytes(out))
    assert np.array_equal(got, want)


# ---------------------------------------------------------------------------
# the planted truth the image_jpeg_phash_dups oracle states
# ---------------------------------------------------------------------------


def test_every_corpus_variant_hashes_like_lossless():
    """All JPEG_CLASSES x JPEG_VARIANTS corpus blobs hash IDENTICALLY to
    their class's lossless pixels — the hamming-0 planted truth — and
    distinct classes stay >= 4 bits apart, so the <= 3-bit verify can
    emit no false pair."""
    ref_bits = []
    for cls in range(JPEG_CLASSES):
        px = class_grid_image(cls, width=36, height=32)
        ref = _hash_bits(_block_mean_grid(px.astype(np.int64), "t"))
        ref_bits.append(ref)
        for q, samp, rst in JPEG_VARIANTS:
            if samp == "gray":
                blob = jpeg_encode_gray(px, quality=q, restart_interval=rst)
            else:
                blob = jpeg_encode_rgb(px, quality=q, sampling=samp,
                                       restart_interval=rst)
            out = jpeg_decode(blob)
            got = _hash_bits(_block_mean_grid(out, "t"))
            assert np.array_equal(got, ref), (cls, q, samp, rst)
    h = np.array(ref_bits)
    cross = (h[:, None, :] != h[None, :, :]).sum(axis=-1)
    np.fill_diagonal(cross, 64)
    assert int(cross.min()) >= 4


def test_jpeg_planted_dups_pair_through_pipeline(spark):
    """End-to-end dhash_bands + phash_dup_pairs over JPEG blobs: lossy
    re-encodes of the same pixels at different (quality, sampling) pair
    at hamming 0; distinct classes never pair."""
    originals = [class_grid_image(c, width=36, height=32) for c in range(5)]
    blobs = [
        jpeg_encode_rgb(px, quality=JPEG_VARIANTS[i % 2][0],
                        sampling=JPEG_VARIANTS[i % 2][1])
        for i, px in enumerate(originals)
    ]
    # doc 5 re-encodes doc 0 at a different variant; doc 6 duplicates doc 2
    blobs += [
        jpeg_encode_rgb(originals[0], quality=85, sampling="4:2:2"),
        jpeg_encode_rgb(originals[2], quality=90, sampling="4:2:0"),
    ]
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(len(blobs)), "blob": [bytearray(b) for b in blobs]}
        ),
        schema="doc_id bigint, blob binary",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in phash_dup_pairs(dhash_bands(df, decoder=raw_jpeg_grid)).collect()
    }
    assert got == {(0, 5): 0, (2, 6): 0}


# ---------------------------------------------------------------------------
# loud failure
# ---------------------------------------------------------------------------


def test_rejects_corrupt_and_unsupported():
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    good = jpeg_encode_rgb(px, quality=90)

    with pytest.raises(ValueError, match="missing SOI"):
        jpeg_decode(b"\x89PNG" + good)

    # SOF2 now dispatches to the progressive decoder (r17) — a baseline
    # file with its marker patched to SOF2 is MALFORMED progressive (its
    # one scan has a baseline Ss=0,Se=63 header) and must still be loud
    prog = bytearray(good)
    prog[good.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        jpeg_decode(bytes(prog))
    # extended sequential (SOF1) stays unsupported
    sof1 = bytearray(good)
    sof1[good.index(b"\xff\xc0") + 1] = 0xC1
    with pytest.raises(ValueError, match="not baseline"):
        jpeg_decode(bytes(sof1))

    # 16-bit quantization table: set the DQT precision nibble
    deep = bytearray(good)
    dqt_payload = good.index(b"\xff\xdb") + 4
    deep[dqt_payload] |= 0x10
    with pytest.raises(ValueError, match="16-bit DQT"):
        jpeg_decode(bytes(deep))

    # nonzero restart interval before the scan: SUPPORTED since r18 — a
    # DRI whose interval covers the whole image (no RSTn emitted) must
    # decode to exactly the plain-stream pixels, not gate
    segs, scan = _split_segments(good)
    out = bytearray(b"\xff\xd8")
    for marker, raw in segs[:-1]:
        out += raw
    out += _segment(0xDD, struct.pack(">H", 1000)) + segs[-1][1] + scan
    assert np.array_equal(jpeg_decode(bytes(out)), jpeg_decode(good))

    # truncated entropy stream
    with pytest.raises(ValueError, match="truncated"):
        jpeg_decode(good[: len(good) // 2])

    # undersized for the 8x9 grid: decodes fine, but must not hash
    tiny = jpeg_encode_rgb(px[:8, :8], quality=90)
    assert jpeg_decode(tiny).shape == (8, 8, 3)
    with pytest.raises(ValueError, match="at least 9x8"):
        _grids_for([tiny], raw_jpeg_grid)


def test_encoder_input_contracts():
    with pytest.raises(ValueError, match="quality"):
        jpeg_encode_rgb(np.zeros((8, 9, 3), dtype=np.uint8), quality=0)
    with pytest.raises(ValueError, match="unknown sampling"):
        jpeg_encode_rgb(np.zeros((8, 9, 3), dtype=np.uint8), sampling="4:1:1")
    with pytest.raises(ValueError, match="expected \\(h, w, 3\\)"):
        jpeg_encode_rgb(np.zeros((8, 9), dtype=np.uint8))
    with pytest.raises(ValueError, match="empty image"):
        jpeg_encode_rgb(np.zeros((0, 9, 3), dtype=np.uint8))


# ---------------------------------------------------------------------------
# spec-constant pins (post-artifact r15 additions, tests only)
# ---------------------------------------------------------------------------


def test_zigzag_table_matches_spec_literal():
    """The zigzag scan order is normative (T.81 Figure 5 / Annex K) —
    pin the generated walk against the spec's literal table so a walk
    bug can't silently survive round-trips (encoder and decoder share
    the generator, so only an external literal catches it)."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.jpeg import _ZIGZAG

    spec = [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ]
    assert list(_ZIGZAG) == spec


def test_dct_matrix_is_orthonormal():
    """IDCT must invert FDCT exactly up to float rounding: C @ C.T == I."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.jpeg import _DCT

    assert np.allclose(_DCT @ _DCT.T, np.eye(8), atol=1e-12)


@settings(max_examples=20, deadline=None)
@given(
    v=st.integers(0, 255),
    quality=st.integers(10, 100),
    sampling=st.sampled_from(SAMPLINGS),
    w=st.integers(8, 24),
    h=st.integers(8, 24),
)
def test_solid_color_is_dc_only_and_uniform(v, quality, sampling, w, h):
    """A solid-gray image is pure DC: every AC coefficient is exactly 0,
    so the decode must be UNIFORM (one value everywhere) and within the
    DC quantization budget q00/16 + rounding of the original."""
    px = np.full((h, w, 3), v, dtype=np.uint8)
    out = jpeg_decode(jpeg_encode_rgb(px, quality=quality, sampling=sampling))
    flat = out.reshape(-1, 3)
    assert (flat == flat[0]).all(), "solid input must decode uniform"
    # scaled luma qtable [0][0]: libjpeg scaling of Annex-K 16
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q00 = min(max((16 * scale + 50) // 100, 1), 255)
    budget = q00 / 16.0 + 1.0  # DC step /8 (coeff) /... + final rounding
    assert abs(int(out[0, 0, 0]) - v) <= budget + 1


def _encode_gray_jpeg(plane: np.ndarray, quality: int = 95) -> bytes:
    """Test-local 1-COMPONENT baseline encoder built from the module's own
    primitives — the engine encoder always writes 3 components, but real
    corpora carry grayscale JPEGs, so the decoder's nc=1 path needs a
    producer.  Deliberately minimal: luma table + luma Huffman only."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.jpeg import (
        _AC_LUMA_BITS,
        _AC_LUMA_VALS,
        _BitWriter,
        _DC_LUMA_BITS,
        _DC_LUMA_VALS,
        _DCT,
        _ZIGZAG,
        _canonical_codes,
        _encode_block,
        _plane_blocks,
        _scaled_qtable,
        _segment,
        _QTBL_LUMA,
    )

    h, w = plane.shape
    padded = np.pad(
        plane.astype(np.float64), ((0, -h % 8), (0, -w % 8)), mode="edge"
    )
    qt = _scaled_qtable(_QTBL_LUMA, quality)
    blocks = _plane_blocks(padded - 128.0)
    coeff = _DCT @ blocks @ _DCT.T
    quant = np.clip(np.round(coeff / qt.reshape(8, 8)), -1023, 1023).astype(
        np.int64
    )
    zz = quant.reshape(-1, 64)[:, _ZIGZAG]
    dc_codes = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    writer = _BitWriter()
    prev = [0]
    for blk in zz:
        _encode_block(writer, blk, prev, 0, dc_codes, ac_codes)
    out = bytearray(b"\xff\xd8")
    out += _segment(0xDB, bytes([0]) + bytes(int(v) for v in qt[_ZIGZAG]))
    out += _segment(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _segment(0xC4, bytes([0x00]) + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS))
    out += _segment(0xC4, bytes([0x10]) + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS))
    out += _segment(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += writer.flush() + b"\xff\xd9"
    return bytes(out)


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(8, 32),
    h=st.integers(8, 32),
    seed=st.integers(0, 2**32 - 1),
)
def test_grayscale_single_component_decodes_as_rgb_triple(w, h, seed):
    """The decoder's nc=1 path: a 1-component JPEG decodes to R=G=B
    within the quality budget (no chroma math may touch it)."""
    rng = np.random.default_rng(seed)
    plane = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    out = jpeg_decode(_encode_gray_jpeg(plane, quality=100))
    assert out.shape == (h, w, 3)
    assert np.array_equal(out[..., 0], out[..., 1])
    assert np.array_equal(out[..., 1], out[..., 2])
    assert int(np.abs(out[..., 0] - plane.astype(np.int64)).max()) <= 5


def test_zrl_long_zero_runs_roundtrip():
    """ZRL (run-16 escape) coverage: a block whose only nonzero AC sits
    at the END of the zigzag (62 zeros of run before it) needs three ZRL
    symbols.  Build pixels as the exact IDCT of such a coefficient
    pattern at quality 100 (all-ones qtables) so the encoder reproduces
    the long run, and require the round-trip to stay within the usual
    rounding budget."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.jpeg import (
        _DCT,
    )

    coeff = np.zeros((8, 8))
    coeff[0, 0] = 200.0   # DC well inside range
    coeff[7, 7] = 90.0    # zigzag position 63: run of 62 zeros -> 3 ZRLs
    block = _DCT.T @ coeff @ _DCT + 128.0
    px8 = np.clip(np.round(block), 0, 255).astype(np.uint8)
    px = np.stack([px8, px8, px8], axis=-1)
    blob = jpeg_encode_rgb(px, quality=100, sampling="4:4:4")
    out = jpeg_decode(blob)
    assert int(np.abs(out - px.astype(np.int64)).max()) <= 5


@settings(max_examples=12, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    fills=st.lists(st.integers(1, 5), min_size=1, max_size=4),
)
def test_fill_bytes_before_markers_are_skipped(seed, fills):
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad the stream
    before a marker id.  Insert runs of fill bytes before interior
    markers — decode must be pixel-identical to the unpadded stream."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(9, 11, 3)).astype(np.uint8)
    blob = jpeg_encode_rgb(px, quality=95)
    want = jpeg_decode(blob)
    segs, scan = _split_segments(blob)
    out = bytearray(b"\xff\xd8")
    for i, (_m, raw) in enumerate(segs):
        out += b"\xff" * fills[i % len(fills)]
        out += raw
    out += scan
    got = jpeg_decode(bytes(out))
    assert np.array_equal(got, want)


def test_bitreader_window_reload_is_seamless():
    """The windowed peek table must decode identically when the window is
    far smaller than the entropy stream (forces many mid-stream reloads
    with genuine 16-bit lookahead across window edges)."""
    from robi_biometric_qdrant_vector_db_service_spark.operators import jpeg as J

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(24, 21, 3)).astype(np.uint8)
    blob = jpeg_encode_rgb(px, quality=90, sampling="4:2:0")
    want = jpeg_decode(blob)
    old = J._BitReader.WINDOW
    try:
        J._BitReader.WINDOW = 64  # bits — hundreds of reloads
        got = jpeg_decode(blob)
    finally:
        J._BitReader.WINDOW = old
    assert np.array_equal(got, want)
