"""Voice-activity segmentation contracts: exact block energies vs a
NumPy reference (including the trailing-partial-block drop and the
rate-independence of absolute-time blocking), the gaps-and-islands
operator on hand-built energies, a model fuzz over ARBITRARY planted
activity patterns, and the end-to-end registry row."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.operators.audio import (
    audio_active_segments,
    audio_block_energies,
    wav_encode_pcm16,
)
from robi_biometric_qdrant_vector_db_service_spark.workload_sources import (
    VAD_CORPUS_DOCS,
    VAD_TOTAL_BLOCKS,
    _vad_spans,
)
from tests.conftest import SF_SMOKE

ENERGY_SCHEMA = "doc_id bigint, block_idx int, energy bigint"


def _blob_df(spark, blobs):
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(blobs)],
        "doc_id bigint, blob binary",
    )


def test_block_energies_exact(spark):
    """Energies are exact int64 sums of squares over full blocks only;
    a trailing partial block is dropped; blocking is absolute-time so
    the block SAMPLE count tracks the rate."""
    rng = np.random.default_rng(7)
    x = rng.integers(-3000, 3000, size=505, dtype=np.int16)  # 3 full + 25 over
    rows = audio_block_energies(
        _blob_df(spark, [wav_encode_pcm16(x, 16000)]), block_sec=0.01
    ).collect()
    assert [r["block_idx"] for r in sorted(rows, key=lambda r: r["block_idx"])] == [0, 1, 2]
    for r in rows:
        blk = x[160 * r["block_idx"] : 160 * (r["block_idx"] + 1)].astype(np.int64)
        assert r["energy"] == int((blk * blk).sum())
    # same samples at 8 kHz -> 80-sample blocks -> 6 full blocks
    rows8 = audio_block_energies(
        _blob_df(spark, [wav_encode_pcm16(x, 8000)]), block_sec=0.01
    ).collect()
    assert len(rows8) == 6
    with pytest.raises(ValueError, match="block_sec"):
        audio_block_energies(_blob_df(spark, [wav_encode_pcm16(x)]), block_sec=0)


def test_active_segments_islands(spark):
    """Hand-built energies: runs of consecutive active blocks become
    [start, end] spans; a single silent block splits; seg_ids are dense
    per doc ordered by start; threshold is strict (> min_energy)."""
    rows = [
        (1, 0, 0), (1, 1, 9), (1, 2, 4), (1, 3, 0), (1, 4, 7),
        (2, 0, 5), (2, 1, 5), (2, 2, 5),
        (3, 0, 0), (3, 1, 0),          # all silence -> no segments
        (4, 0, 3), (4, 1, 1),          # energy == min_energy is SILENT
    ]
    energies = spark.createDataFrame(rows, ENERGY_SCHEMA)
    got = {
        (r["doc_id"], r["seg_id"]): (r["start_block"], r["end_block"], r["n_blocks"])
        for r in audio_active_segments(energies, min_energy=1).collect()
    }
    assert got == {
        (1, 0): (1, 2, 2),
        (1, 1): (4, 4, 1),
        (2, 0): (0, 2, 3),
        (4, 0): (0, 0, 1),
    }


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    pattern=st.lists(st.booleans(), min_size=1, max_size=24),
    amp=st.integers(min_value=1, max_value=30000),
)
def test_vad_model_fuzz(spark, pattern, amp):
    """Model fuzz: for ANY activity pattern, decode → block energies →
    islands must equal the islands computed directly on the pattern."""
    blk = 160
    x = np.zeros(len(pattern) * blk, dtype=np.int16)
    for i, on in enumerate(pattern):
        if on:
            seg = np.where(np.arange(blk) % 2 == 0, amp, -amp)
            x[i * blk : (i + 1) * blk] = seg.astype(np.int16)
    got = sorted(
        (r["seg_id"], r["start_block"], r["end_block"], r["n_blocks"])
        for r in audio_active_segments(
            audio_block_energies(
                _blob_df(spark, [wav_encode_pcm16(x, 16000)]), block_sec=0.01
            ),
            min_energy=0,
        ).collect()
    )
    want, seg_id, i = [], 0, 0
    while i < len(pattern):
        if pattern[i]:
            j = i
            while j + 1 < len(pattern) and pattern[j + 1]:
                j += 1
            want.append((seg_id, i, j, j - i + 1))
            seg_id += 1
            i = j + 1
        else:
            i += 1
    assert got == want


def test_audio_vad_registry_row(spark):
    """End-to-end on the smoke fixture: segments equal planted truth."""
    from robi_biometric_qdrant_vector_db_service_spark.workload_sources import (
        audio_vad_segments,
    )

    got = {
        (r["doc_id"], r["seg_id"]): (r["start_block"], r["end_block"], r["n_blocks"])
        for r in audio_vad_segments(spark, SF_SMOKE).collect()
    }
    n_docs = min(
        VAD_CORPUS_DOCS,
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count(),
    )
    assert len(got) == 2 * n_docs
    for did in range(n_docs):
        a, b, c = _vad_spans(did)
        assert got[(did, 0)] == (a, b - 1, b - a)
        assert got[(did, 1)] == (c, VAD_TOTAL_BLOCKS - 1, VAD_TOTAL_BLOCKS - c)
