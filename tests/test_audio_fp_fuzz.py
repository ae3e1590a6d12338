"""Fuzz + contract suite for the acoustic fingerprint
(`operators.audio.audio_fingerprint_bands`) behind `audio_fingerprint_dups`.

The fingerprint keys on energy ORDER, so its invariances are exact:
- reference differential: band words equal an independent per-block
  plain-Python energy walk on arbitrary signals;
- volume invariance: uniform integer gain never changes a bit;
- rate/length invariance: re-synthesizing the same 65-block envelope at a
  different block length (a different sample rate's span of the same
  audio) never changes a bit;
- planted-corpus truth: the exact identity the oracle states — all
  variants of a class hash identically, cross-class envelopes clear the
  3-bit verify bar (measured min: 19);
- loud failure: clips shorter than the block count must raise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.operators.audio import (
    AUDIO_FP_BLOCKS,
    audio_fingerprint_bands,
    wav_encode_pcm16,
)
from robi_biometric_qdrant_vector_db_service_spark.workload_sources import (
    AUDIO_FP_CLASSES,
    AUDIO_FP_SEED_BASE,
    AUDIO_FP_VARIANTS,
)


def _ref_words(x: np.ndarray) -> list[int]:
    """Independent reference: per-block loop, no cumsum."""
    n = len(x)
    energies = []
    for k in range(AUDIO_FP_BLOCKS):
        lo, hi = (n * k) // AUDIO_FP_BLOCKS, (n * (k + 1)) // AUDIO_FP_BLOCKS
        energies.append(sum(int(v) * int(v) for v in x[lo:hi]))
    bits = [int(energies[i] < energies[i + 1]) for i in range(64)]
    return [
        sum(bits[16 * j + i] << i for i in range(16)) for j in range(4)
    ]


def _spark_words(spark, blobs: list[bytes]) -> dict[int, tuple]:
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(len(blobs)), "blob": [bytearray(b) for b in blobs]}
        ),
        schema="doc_id bigint, blob binary",
    )
    return {
        r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in audio_fingerprint_bands(df).collect()
    }


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 2**32 - 1), n=st.integers(65, 900))
def test_fingerprint_matches_pure_python_reference(spark, seed, n):
    rng = np.random.default_rng(seed)
    x = rng.integers(-3000, 3000, size=n).astype(np.int16)
    got = _spark_words(spark, [wav_encode_pcm16(x)])
    assert list(got[0]) == _ref_words(x)


def _envelope_wave(perm: np.ndarray, scale: int, block_len: int) -> np.ndarray:
    amps = (perm.astype(np.int64) + 1) * 8 * scale
    unit = np.tile([1, -1], block_len // 2)
    return (amps[:, None] * unit[None, :]).reshape(-1).astype(np.int16)


@settings(max_examples=10, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    scales=st.tuples(st.integers(1, 8), st.integers(1, 8)),
    lens=st.tuples(st.sampled_from([66, 100, 160, 250]),
                   st.sampled_from([66, 100, 160, 250])),
)
def test_volume_and_rate_invariance(spark, seed, scales, lens):
    """Same envelope, ANY (gain, block length) pair -> identical words."""
    perm = np.random.default_rng(seed).permutation(AUDIO_FP_BLOCKS)
    blobs = [
        wav_encode_pcm16(_envelope_wave(perm, s, L), 16000)
        for s, L in zip(scales, lens)
    ]
    got = _spark_words(spark, blobs)
    assert got[0] == got[1]


def test_planted_corpus_truth_exhaustive(spark):
    """All classes x all variants: in-class words identical, cross-class
    distance > 3 (the verify bar)."""
    blobs, meta = [], []
    for cls in range(AUDIO_FP_CLASSES):
        perm = np.random.default_rng(AUDIO_FP_SEED_BASE + cls).permutation(
            AUDIO_FP_BLOCKS
        )
        for scale, block_len, rate in AUDIO_FP_VARIANTS:
            blobs.append(
                wav_encode_pcm16(_envelope_wave(perm, scale, block_len), rate)
            )
            meta.append(cls)
    words = _spark_words(spark, blobs)
    by_cls: dict[int, set] = {}
    for i, cls in enumerate(meta):
        by_cls.setdefault(cls, set()).add(words[i])
    for cls, ws in by_cls.items():
        assert len(ws) == 1, f"class {cls} variants diverge"
    uniq = {cls: next(iter(ws)) for cls, ws in by_cls.items()}
    min_cross = 64
    for a in range(AUDIO_FP_CLASSES):
        for b in range(a + 1, AUDIO_FP_CLASSES):
            d = sum(
                bin(x ^ y).count("1") for x, y in zip(uniq[a], uniq[b])
            )
            min_cross = min(min_cross, d)
    assert min_cross > 3, min_cross


def test_short_clip_fails_loud(spark):
    x = np.arange(AUDIO_FP_BLOCKS - 1, dtype=np.int16)
    with pytest.raises(Exception, match="shorter than"):
        _spark_words(spark, [wav_encode_pcm16(x)])


def test_tied_block_energies_stay_invariant_under_gain(spark):
    """Equal adjacent energies produce bit 0 (strict less-than); uniform
    gain preserves ties exactly, so the hash still cannot move."""
    amps = np.array([5] * 20 + [9, 3] * 10 + [5] * 25, dtype=np.int64)
    assert len(amps) == AUDIO_FP_BLOCKS
    unit = np.tile([1, -1], 50)
    blobs = [
        wav_encode_pcm16(((amps * g)[:, None] * unit[None, :])
                         .reshape(-1).astype(np.int16), 16000)
        for g in (1, 3)
    ]
    got = _spark_words(spark, blobs)
    assert got[0] == got[1]
