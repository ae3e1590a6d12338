"""Pluggable dHash grid-decoder contract (operators/multimodal.py).

The decoder (blob bytes → 8x9 grayscale grid) is the ONLY codec-specific
step of the image near-dup pipeline; the gradient-bit + 16-bit band
packing, the banded candidate join and the popcount verify are shared by
every decoder.  These tests pin that contract: the default byte-span stub
and the real block-mean decoder (``raw_rgb_grid``, exercised on synthetic
raw-RGB blobs) must agree on planted exact duplicates, the real decoder
must be robust to sub-gradient pixel jitter (the property dHash exists
for), and a wrong-size blob must fail loud, not hash garbage."""

from __future__ import annotations

import numpy as np
import pytest

from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
    byte_span_grid,
    dhash_bands,
    phash_dup_pairs,
    raw_rgb_grid,
)

W, H = 18, 16  # 9 col-blocks x 8 row-blocks of exactly 2x2 pixels


def _grid_image(rng: np.random.Generator) -> np.ndarray:
    """A (H, W, 3) uint8 image whose 8x9 block-mean luminances are
    well-separated (every adjacent-cell gap >= ~8 luma units), so a +-2
    pixel jitter can never flip a gradient bit."""
    base = rng.permutation(72).reshape(8, 9) * 3 + 20  # distinct, gaps >= 3*299/1000
    px = np.repeat(np.repeat(base, H // 8, axis=0), W // 9, axis=1)
    img = np.stack([px, px, px], axis=-1).astype(np.uint8)
    return img


def _blob_df(spark, blobs: list[bytes]):
    return spark.createDataFrame(
        [(i, bytearray(b), "image/raw-rgb", len(b)) for i, b in enumerate(blobs)],
        "doc_id bigint, blob binary, media_type string, n_bytes bigint",
    )


def _pairs(spark, blobs, decoder):
    hashes = dhash_bands(_blob_df(spark, blobs), decoder=decoder)
    return {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in phash_dup_pairs(hashes).collect()
    }


def test_decoder_invariance_on_planted_exact_dups(spark):
    """Exact duplicate blobs must pair at hamming 0 under ALL THREE
    decoders (byte-span stub, raw-RGB block means, stdlib PNG decode),
    and no decoder may pair the unrelated images — the band packing and
    pair pipeline downstream of the grid are decoder-agnostic."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
        raw_png_grid,
    )
    from tests.test_png_fuzz import png_encode

    rng = np.random.default_rng(7)
    images = [_grid_image(rng) for _ in range(6)]
    originals = [px.tobytes() for px in images]
    blobs = originals + [originals[0], originals[3]]  # docs 6, 7 are dups
    expected = {(0, 6): 0, (3, 7): 0}
    for decoder in (byte_span_grid, raw_rgb_grid(W, H)):
        got = _pairs(spark, blobs, decoder)
        assert got == expected, (decoder, got)
    pngs = [png_encode(px, [i % 5]) for i, px in enumerate(images)]
    pngs += [png_encode(images[0], [2, 4]), png_encode(images[3], [3])]
    assert _pairs(spark, pngs, raw_png_grid) == expected


def test_raw_decoder_robust_to_pixel_jitter(spark):
    """The block-mean decoder keys on gradient DIRECTION: a +-2 jitter on
    every pixel (far below the planted adjacent-cell luma gaps) must keep
    the jittered copy within hamming 3 of its source — while the byte-span
    stub, hashing raw byte positions, has no such robustness guarantee.
    This is the property that makes the decoder interface worth having."""
    rng = np.random.default_rng(11)
    img = _grid_image(rng)
    jit = (
        img.astype(np.int16) + rng.integers(-2, 3, size=img.shape)
    ).clip(0, 255).astype(np.uint8)
    others = [_grid_image(rng).tobytes() for _ in range(4)]
    blobs = [img.tobytes(), jit.tobytes()] + others
    got = _pairs(spark, blobs, raw_rgb_grid(W, H))
    assert got == {(0, 1): 0}, got


def test_raw_decoder_rejects_wrong_size_blobs(spark):
    """A blob that is not exactly W*H*3 bytes is a corrupt/foreign payload
    — fail loud with the expected layout in the message."""
    df = _blob_df(spark, [b"\x00" * 10])
    with pytest.raises(Exception, match="raw RGB"):
        dhash_bands(df, decoder=raw_rgb_grid(W, H)).collect()


def test_corpus_is_pure_ascii_where_multimodal_oracles_assume_it():
    """The byte-position multimodal oracles (image_phash_dups /
    multimodal_decode in workload_sources.py — multimodal_resize and
    multimodal_frame_sample moved to real codecs in r17) index
    CODEPOINTS (len(text), unicode(text[i])) while the Spark side hashes
    UTF-8 BYTES — parity holds only while the corpus is pure ASCII
    (ADVICE r13).  Pin the invariant on every fixture scale the driver
    uses, so a corpus regeneration with non-ASCII text fails HERE with a
    message naming the oracles to fix, instead of as a silent hash
    mismatch."""
    import os

    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        n = duckdb.sql(
            f"SELECT count(*) FROM '{path}' "
            "WHERE text IS NOT NULL AND octet_length(encode(text)) != len(text)"
        ).fetchone()[0]
        assert n == 0, (
            f"{sf}: {n} non-ASCII documents — the byte-position multimodal "
            "oracles (image_phash_dups, multimodal_decode) must be "
            "rewritten over encoded bytes before this corpus can be used"
        )


def test_default_decoder_is_byte_span_grid(spark):
    """dhash_bands() without a decoder must hash exactly as the byte-span
    stub — the registered query's results cannot move under the refactor."""
    rng = np.random.default_rng(3)
    blobs = [rng.integers(0, 256, size=200).astype(np.uint8).tobytes()
             for _ in range(5)]
    default = {r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
               for r in dhash_bands(_blob_df(spark, blobs)).collect()}
    explicit = {r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
                for r in dhash_bands(_blob_df(spark, blobs),
                                     decoder=byte_span_grid).collect()}
    assert default == explicit and len(default) == 5
