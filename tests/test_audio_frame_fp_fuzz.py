"""Fuzz + contract suite for the time-shift-robust per-frame audio
fingerprint (`operators.audio.audio_frame_fingerprints`) and the
offset-histogram matcher (`multimodal.fingerprint_offset_pairs`) — the
r16 VERDICT item 3 upgrade over the whole-clip hash.

The planted-corpus discipline (validated r15-r16): EXHAUSTIVE in-class /
cross-floor verification of exactly the identity the registered
`audio_frame_fp_dups` oracle states, plus property fuzz of the three
invariances (gain, rate, block-aligned shift) on random envelopes.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.operators.audio import (
    AUDIO_FP_FRAME_BLOCKS,
    _frame_fp_bits,
    audio_frame_fingerprints,
    wav_encode_pcm16,
)
from robi_biometric_qdrant_vector_db_service_spark.workload_sources import (
    AUDIO_FFP_CLASSES,
    AUDIO_FFP_CORPUS_DOCS,
    AUDIO_FFP_SEED_BASE,
    AUDIO_FFP_SIGNAL_BLOCKS,
    AUDIO_FFP_VARIANTS,
)


def _clip(cls: int, variant: int) -> tuple[np.ndarray, int, int]:
    """Replicate the registered corpus synthesis: (samples, rate, shift)."""
    perm = np.random.default_rng(AUDIO_FFP_SEED_BASE + cls).permutation(
        AUDIO_FFP_SIGNAL_BLOCKS
    )
    gain, rate, shift = AUDIO_FFP_VARIANTS[variant]
    amps = (perm.astype(np.int64) + 1) * 4 * gain
    if shift > 0:
        amps = amps[shift:]
    elif shift < 0:
        amps = np.concatenate([np.zeros(-shift, dtype=np.int64), amps])
    n_spb = round(rate * 0.01)
    unit = np.resize(np.array([1, -1], dtype=np.int64), n_spb)
    wave = (amps[:, None] * unit[None, :]).reshape(-1).astype(np.int16)
    return wave, rate, shift


def _envelope_wave(amps: np.ndarray, rate: int) -> np.ndarray:
    n_spb = round(rate * 0.01)
    unit = np.resize(np.array([1, -1], dtype=np.int64), n_spb)
    return (amps[:, None] * unit[None, :]).reshape(-1).astype(np.int16)


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    n_blocks=st.integers(66, 140),
    gain=st.sampled_from([2, 3, 4]),
    rates=st.sampled_from([(16000, 8000), (16000, 44100), (8000, 22050)]),
    shift=st.integers(-4, 4),
)
def test_three_invariances_exact(seed, n_blocks, gain, rates, shift):
    """gain x rate x block-aligned shift, composed on a RANDOM envelope:
    the interior frames' bits are identical, at the shift's offset."""
    amps = (
        np.random.default_rng(seed).integers(1, 500, size=n_blocks)
        .astype(np.int64)
    )
    r1, r2 = rates
    base = _frame_fp_bits(_envelope_wave(amps, r1), r1)
    if shift > 0:
        edited = amps[shift:]
    elif shift < 0:
        edited = np.concatenate([np.zeros(-shift, dtype=np.int64), amps])
    else:
        edited = amps
    if len(edited) < AUDIO_FP_FRAME_BLOCKS:
        return
    other = _frame_fp_bits(_envelope_wave(edited * gain, r2), r2)
    # edited frame j covers signal blocks starting at j + shift
    for j in range(other.shape[0]):
        s = j + shift
        if 0 <= s < base.shape[0]:
            assert (other[j] == base[s]).all(), (seed, j, shift)


def test_short_clip_and_bad_hop_fail_loud():
    amps = np.arange(1, 30, dtype=np.int64)  # 29 blocks < 65
    wave = _envelope_wave(amps, 16000)
    with pytest.raises(ValueError, match="too short"):
        _frame_fp_bits(wave, 16000)
    with pytest.raises(ValueError, match="hop_blocks"):
        _frame_fp_bits(_envelope_wave(np.arange(1, 100, dtype=np.int64), 16000),
                       16000, hop_blocks=0)
    with pytest.raises(ValueError, match="empty"):
        _frame_fp_bits(wave, 10, block_sec=0.01)


def test_planted_corpus_truth_exhaustive():
    """Exactly the identity the audio_frame_fp_dups oracle states, plus
    the cross floor: (a) every in-class variant pair matches on ALL
    interior frames at ITS shift offset with hamming exactly 0; (b) every
    other (class, frame) vs (class, frame) combination sits > 3 bits
    apart, so nothing false survives the verify and min_frames=1 is
    sound."""
    fps = {}  # (cls, variant) -> (n_frames, bits array)
    for cls in range(AUDIO_FFP_CLASSES):
        for v in range(3):
            wave, rate, shift = _clip(cls, v)
            bits = _frame_fp_bits(wave, rate)
            fps[(cls, v)] = (shift, bits)

    # (a) planted matches: offsets and overlap counts from shifts
    for cls in range(AUDIO_FFP_CLASSES):
        for va in range(3):
            for vb in range(va + 1, 3):
                ta, a = fps[(cls, va)]
                tb, b = fps[(cls, vb)]
                n_match = 0
                for ja in range(a.shape[0]):
                    s = ja + ta  # signal start of a's frame
                    jb = s - tb
                    if 0 <= jb < b.shape[0]:
                        assert (a[ja] == b[jb]).all(), (cls, va, vb, ja)
                        n_match += 1
                want = 113 - max(ta, tb)
                assert n_match == want, (cls, va, vb, n_match, want)

    # (b) cross floor: dedupe to unique (signal, start) fingerprints —
    # variants are exact copies on aligned frames, so one variant's full
    # frame set per class covers all signal-aligned content; add the
    # pad variant's leading silence frames separately.
    uniq, owner = [], []
    for cls in range(AUDIO_FFP_CLASSES):
        t2, b2 = fps[(cls, 2)]  # pad variant: covers signal starts -3..112
        for j in range(b2.shape[0]):
            uniq.append(np.packbits(b2[j]))
            owner.append((cls, j + t2))  # signal-start key
    assert len(set(owner)) == len(owner)  # one fp per (class, signal start)
    u = np.stack(uniq)  # (n, 8) uint8
    n = u.shape[0]
    pop = np.unpackbits(u[:, None, :] ^ u[None, :, :], axis=2).sum(axis=2)
    floor = pop[~np.eye(n, dtype=bool)].min()
    assert floor > 3, int(floor)


def test_spark_surface_matches_reference(spark):
    """audio_frame_fingerprints == the per-clip numpy reference: frame
    indices 0..n-1 and identical band words, across mixed rates in one
    Arrow batch."""
    import pandas as pd

    rows, want = [], {}
    for did, (cls, v) in enumerate([(0, 0), (1, 1), (2, 2)]):
        wave, rate, _ = _clip(cls, v)
        rows.append((did, bytearray(wav_encode_pcm16(wave, rate))))
        bits = _frame_fp_bits(wave, rate)
        w16 = 1 << np.arange(16, dtype=np.int64)
        want[did] = bits.reshape(-1, 4, 16) @ w16
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [r[0] for r in rows],
                      "blob": [r[1] for r in rows]}),
        schema="doc_id bigint, blob binary",
    )
    got = audio_frame_fingerprints(df).collect()
    by_doc: dict[int, dict[int, tuple]] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], {})[r["frame_idx"]] = tuple(
            r[f"b{j}"] for j in range(4)
        )
    for did, w in want.items():
        assert sorted(by_doc[did]) == list(range(w.shape[0]))
        for j in range(w.shape[0]):
            assert by_doc[did][j] == tuple(int(x) for x in w[j]), (did, j)


def test_offset_pairs_recovers_planted_alignment(spark):
    """fingerprint_offset_pairs end-to-end on two planted clips of one
    class (trimmed vs padded): exactly one output row, at the known
    offset, with the full interior overlap and max_hamming 0."""
    import pandas as pd

    from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
        fingerprint_offset_pairs,
    )

    wave1, rate1, t1 = _clip(5, 1)   # trim 5
    wave2, rate2, t2 = _clip(5, 2)   # pad 3
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [10, 20],
                      "blob": [bytearray(wav_encode_pcm16(wave1, rate1)),
                               bytearray(wav_encode_pcm16(wave2, rate2))]}),
        schema="doc_id bigint, blob binary",
    )
    rows = fingerprint_offset_pairs(audio_frame_fingerprints(df)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (10, 20)
    assert r["frame_offset"] == t2 - t1 == -8
    assert r["n_frames"] == 113 - max(t1, t2) == 108
    assert r["max_hamming"] == 0
