"""Scene-cut detection contracts: the planted corpus's Hamming margins
(in-scene exactly 0, cross-scene far above the cut threshold), the
segmentation operator's arithmetic on a hand-built hash table, and the
end-to-end registry row against planted truth."""

from __future__ import annotations

import numpy as np
import pytest

from robi_biometric_qdrant_vector_db_service_spark.operators.jpeg import (
    jpeg_decode,
    jpeg_encode_rgb,
)
from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
    _block_mean_grid,
    class_grid_image,
)
from robi_biometric_qdrant_vector_db_service_spark.operators.video import (
    video_scene_segments,
)
from robi_biometric_qdrant_vector_db_service_spark.workload_sources import (
    PHASH_MAX_HAMMING,
    SCENE_CORPUS_DOCS,
    SCENE_SEED_BASE,
    SCENE_TOTAL_FRAMES,
    VIDEO_VARIANTS,
    scene_lengths,
)
from tests.conftest import SF_SMOKE


def _dhash_bits(img, quality, sampling) -> np.ndarray:
    grid = _block_mean_grid(
        jpeg_decode(jpeg_encode_rgb(img, quality=quality, sampling=sampling)),
        "test_video_scene",
    )
    return (grid[:, :-1] < grid[:, 1:]).reshape(64)


def test_planted_scene_margins():
    """Every doc's adjacent-scene hash distance clears the cut threshold
    with margin, and same-scene frames are encode-identical (hamming 0 is
    structural: identical bytes in, identical hash out).  This is the
    seed-independent guarantee the oracle's planted truth rests on."""
    worst = 64
    for did in range(SCENE_CORPUS_DOCS):
        q, samp = VIDEO_VARIANTS[did % 3]
        bits = [
            _dhash_bits(
                class_grid_image(SCENE_SEED_BASE + did * 3 + s, width=36, height=32),
                q,
                samp,
            )
            for s in range(3)
        ]
        for a, b in ((0, 1), (1, 2)):
            d = int((bits[a] ^ bits[b]).sum())
            worst = min(worst, d)
    print(f"min adjacent-scene hamming across corpus = {worst}")
    assert worst > PHASH_MAX_HAMMING + 3  # clear margin, not a lucky pass


def test_scene_lengths_arithmetic():
    for did in range(SCENE_CORPUS_DOCS):
        lens = scene_lengths(did)
        assert sum(lens) == SCENE_TOTAL_FRAMES
        assert all(ln >= 2 for ln in lens)


def test_video_scene_segments_operator(spark):
    """The segmentation window arithmetic on a hand-built hash table:
    cuts exactly where hamming > max_hamming, scene ids dense from 0,
    inclusive [start, end] spans, single-scene doc handled."""
    rows = [
        # doc 1: frames 0-2 hash A, 3-4 hash B (flip 5 bits), 5 hash C
        (1, 0, 0b11111, 0, 0, 0),
        (1, 1, 0b11111, 0, 0, 0),
        (1, 2, 0b11111, 0, 0, 0),
        (1, 3, 0, 0, 0, 0),
        (1, 4, 0, 0, 0, 0),
        (1, 5, 0, 0b1111, 0b1, 0),  # 5 bits from B -> cut
        # doc 2: one scene, hashes drift 1 bit per frame (below threshold)
        (2, 0, 0b0001, 0, 0, 0),
        (2, 1, 0b0011, 0, 0, 0),
        (2, 2, 0b0111, 0, 0, 0),
    ]
    hashes = spark.createDataFrame(
        rows, "doc_id bigint, frame_idx int, b0 bigint, b1 bigint, b2 bigint, b3 bigint"
    )
    got = {
        (r["doc_id"], r["scene_id"]): (r["start_frame"], r["end_frame"], r["n_frames"])
        for r in video_scene_segments(hashes, max_hamming=3).collect()
    }
    assert got == {
        (1, 0): (0, 2, 3),
        (1, 1): (3, 4, 2),
        (1, 2): (5, 5, 1),
        (2, 0): (0, 2, 3),
    }
    with pytest.raises(ValueError, match="max_hamming"):
        video_scene_segments(hashes, max_hamming=-1)


def test_video_scene_cuts_registry_row(spark):
    """End-to-end on the smoke fixture: segments equal planted truth."""
    from robi_biometric_qdrant_vector_db_service_spark.workload_sources import (
        video_scene_cuts,
    )

    got = {
        (r["doc_id"], r["scene_id"]): (r["start_frame"], r["end_frame"], r["n_frames"])
        for r in video_scene_cuts(spark, SF_SMOKE).collect()
    }
    n_docs = min(
        SCENE_CORPUS_DOCS,
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count(),
    )
    assert len(got) == 3 * n_docs
    for did in range(n_docs):
        l0, l1, l2 = scene_lengths(did)
        assert got[(did, 0)] == (0, l0 - 1, l0)
        assert got[(did, 1)] == (l0, l0 + l1 - 1, l1)
        assert got[(did, 2)] == (l0 + l1, SCENE_TOTAL_FRAMES - 1, l2)
