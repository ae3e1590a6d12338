"""Property-based differential fuzz of the perceptual-hash image near-dup
kernel: ``dhash_bands`` (mapInPandas, vectorized cumsum/gather) against a
per-row pure-Python re-derivation of the documented bit layout, and
``phash_dup_pairs`` (banded-Hamming candidate join + JVM popcount verify)
against an exhaustive O(n²) popcount over the same hashes.

The banded join's correctness claim is sharp — recall EXACTLY 1.0 at the
≤3-bit bar by pigeonhole (4 bands of 16 bits; ≤3 flipped bits touch ≤3
bands) — so the fuzz plants exact copies and k-byte perturbations next to
unrelated random blobs and requires set-equality with the exhaustive
answer, not just containment.  Reference behavior anchor: dHash
(Krawetz), banded verify shape = ``operators/ann.py`` bq_hamming_rescore.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
    dhash_bands,
    phash_dup_pairs,
)

BLOB_SCHEMA = "doc_id bigint, blob binary, media_type string, n_bytes bigint"


def ref_dhash(data: bytes) -> list[int]:
    """Pure-Python dHash per multimodal.dhash_bands's documented layout:
    72 byte-span sums as the 8x9 grid, bit r*8+c = cell[r][c] < cell[r][c+1],
    band j = bits 16j..16j+15 little-endian."""
    n = len(data)
    bounds = [(n * i) // 72 for i in range(73)]
    cells = [sum(data[bounds[i] : bounds[i + 1]]) for i in range(72)]
    grid = [cells[r * 9 : (r + 1) * 9] for r in range(8)]
    bits = [
        1 if grid[r][c] < grid[r][c + 1] else 0 for r in range(8) for c in range(8)
    ]
    return [
        sum(bits[16 * j + k] << k for k in range(16)) for j in range(4)
    ]


def ref_pairs(hashes: dict[int, list[int]], max_hamming: int) -> set[tuple]:
    out = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = sum(
                bin(hashes[a][j] ^ hashes[b][j]).count("1") for j in range(4)
            )
            if d <= max_hamming:
                out.add((a, b, d))
    return out


@st.composite
def blob_corpus(draw):
    """2-6 random blobs, plus an exact copy of blob 0 and a perturbed copy
    (1-3 bytes changed) — guarantees hamming-0 pairs and near-miss pairs
    exist alongside far-apart random pairs."""
    blobs = draw(
        st.lists(st.binary(min_size=1, max_size=150), min_size=2, max_size=6)
    )
    base = bytearray(blobs[0])
    n_flips = draw(st.integers(min_value=1, max_value=3))
    for _ in range(n_flips):
        i = draw(st.integers(min_value=0, max_value=len(base) - 1))
        base[i] = draw(st.integers(min_value=0, max_value=255))
    return blobs + [bytes(blobs[0]), bytes(base)]


@settings(max_examples=10, deadline=None)
@given(blobs=blob_corpus(), max_hamming=st.sampled_from([0, 1, 3]))
def test_dhash_and_banded_pairs_match_exhaustive_reference(
    spark, blobs, max_hamming
):
    df = spark.createDataFrame(
        [(i, b, "image/fake", len(b)) for i, b in enumerate(blobs)], BLOB_SCHEMA
    )
    got_hashes = {
        r["doc_id"]: [r["b0"], r["b1"], r["b2"], r["b3"]]
        for r in dhash_bands(df).collect()
    }
    exp_hashes = {i: ref_dhash(b) for i, b in enumerate(blobs)}
    assert got_hashes == exp_hashes

    got_pairs = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in phash_dup_pairs(dhash_bands(df), max_hamming=max_hamming).collect()
    }
    assert got_pairs == ref_pairs(exp_hashes, max_hamming)
    # the planted exact copy must surface at hamming 0 for every bar
    assert (0, len(blobs) - 2, 0) in got_pairs


def test_dhash_invariant_under_value_scale(spark):
    """dHash keys on gradient DIRECTION, not magnitude: doubling every
    byte value (with saturation off — use small values) preserves every
    comparison, hence the hash.  The robustness property the operator's
    docstring claims for re-encoding."""
    blob = bytes(range(0, 120))  # strictly increasing values
    scaled = bytes(2 * v for v in range(0, 120))
    df = spark.createDataFrame(
        [(0, blob, "i", len(blob)), (1, scaled, "i", len(scaled))], BLOB_SCHEMA
    )
    rows = {r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
            for r in dhash_bands(df).collect()}
    assert rows[0] == rows[1]
