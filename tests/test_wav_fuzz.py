"""Fuzz + contract suite for the RIFF/WAV PCM16 codec (`operators.audio`).

WAV is lossless, so like the PNG suite the differentials are EXACT:
- round-trip: parse(encode(x)) == x bit-for-bit for arbitrary int16
  signals, and the features equal an independent pure-Python reference;
- chunk-layout fuzz: unknown chunks (including ODD-length ones, which
  carry a pad byte per the RIFF spec) inserted before/after fmt/data
  must not change a sample;
- loud failure: compressed formats, >2-channel, odd bit widths,
  frame-misaligned data, truncated chunks, and non-RIFF bytes must
  raise, never produce features;
- r18 acceptance: stereo and 8/24/32-bit PCM decode by EXACT integer
  downmix + width normalization, fuzzed against an independent
  reference model below.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.operators.audio import (
    wav_encode_pcm16,
    wav_features,
    wav_parse,
)


def _ref_features(x: np.ndarray) -> tuple[int, int, int, int]:
    """Independent per-sample reference (plain Python loop)."""
    n = len(x)
    peak = max((abs(int(v)) for v in x), default=0)
    sum_sq = sum(int(v) * int(v) for v in x)
    zc, prev = 0, 0
    for v in x:
        v = int(v)
        s = (v > 0) - (v < 0)
        if s == 0:
            continue
        if prev != 0 and s != prev:
            zc += 1
        prev = s
    return n, peak, sum_sq, zc


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    n=st.integers(0, 400),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_roundtrip_and_feature_reference(seed, n, rate):
    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, size=n).astype(np.int16)
    got, got_rate = wav_parse(wav_encode_pcm16(x, rate))
    assert got_rate == rate
    assert np.array_equal(got, x)


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**32 - 1), n=st.integers(1, 300))
def test_features_match_pure_python(spark, seed, n):
    import pandas as pd

    rng = np.random.default_rng(seed)
    # bias toward zero samples so the sign-hysteresis path is exercised
    x = rng.integers(-4, 5, size=n).astype(np.int16) * 7000
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "blob": [bytearray(wav_encode_pcm16(x))]}),
        schema="doc_id bigint, blob binary",
    )
    row = wav_features(df).collect()[0]
    n_ref, peak, sum_sq, zc = _ref_features(x)
    assert (row["n_samples"], row["peak"], row["sum_sq"],
            row["zero_crossings"]) == (n_ref, peak, sum_sq, zc)
    assert row["sample_rate"] == 16000


def _chunk(cid: bytes, payload: bytes) -> bytes:
    return cid + struct.pack("<I", len(payload)) + payload + (
        b"\x00" if len(payload) % 2 else b""
    )


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    n=st.integers(1, 120),
    pre=st.lists(st.integers(0, 7), max_size=3),
    post=st.lists(st.integers(0, 7), max_size=3),
)
def test_unknown_chunks_and_pad_bytes_are_skipped(seed, n, pre, post):
    """Real WAVs interleave LIST/INFO/cue chunks; odd-length ones carry a
    pad byte.  Rebuild the file with junk chunks around fmt/data — decode
    must be sample-identical."""
    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, size=n).astype(np.int16)
    blob = wav_encode_pcm16(x, 16000)
    fmt_payload = blob[20:36]
    data_payload = x.tobytes()
    junk = [_chunk(b"LIST", bytes(rng.integers(0, 256, size=k, dtype=np.uint8)))
            for k in (list(pre) + list(post))]  # odd sizes get pad bytes
    body = b"WAVE"
    for j in junk[: len(pre)]:
        body += j
    body += _chunk(b"fmt ", fmt_payload)
    body += _chunk(b"data", data_payload)
    for j in junk[len(pre):]:
        body += j
    rebuilt = b"RIFF" + struct.pack("<I", len(body)) + body
    got, rate = wav_parse(rebuilt)
    assert rate == 16000
    assert np.array_equal(got, x)


def test_rejects_corrupt_and_unsupported():
    x = np.arange(-50, 50, dtype=np.int16)
    good = wav_encode_pcm16(x, 16000)

    with pytest.raises(ValueError, match="not a RIFF"):
        wav_parse(b"OggS" + good[4:])

    # compressed format tag (ADPCM = 2; IEEE float 3 is ACCEPTED since
    # r18 — a 16-bit float claim fails loud on width instead)
    bad = bytearray(good)
    struct.pack_into("<H", bad, 20, 2)
    with pytest.raises(ValueError, match="compressed WAV"):
        wav_parse(bytes(bad))
    bad = bytearray(good)
    struct.pack_into("<H", bad, 20, 3)
    with pytest.raises(ValueError, match="16-bit IEEE float"):
        wav_parse(bytes(bad))

    # 3-channel stays loud (r18 widened to mono/stereo only)
    bad = bytearray(good)
    struct.pack_into("<H", bad, 22, 3)
    with pytest.raises(ValueError, match="3-channel"):
        wav_parse(bytes(bad))

    # odd bit width stays loud
    bad = bytearray(good)
    struct.pack_into("<H", bad, 34, 12)
    with pytest.raises(ValueError, match="12-bit"):
        wav_parse(bytes(bad))

    # data length not a multiple of the frame size (claim stereo over a
    # data chunk holding an odd number of 16-bit samples)
    odd = wav_encode_pcm16(np.arange(-50, 51, dtype=np.int16), 16000)
    bad = bytearray(odd)
    struct.pack_into("<H", bad, 22, 2)
    with pytest.raises(ValueError, match="not a multiple"):
        wav_parse(bytes(bad))

    with pytest.raises(ValueError, match="truncated"):
        wav_parse(good[: len(good) // 2])

    with pytest.raises(ValueError, match="missing fmt or data"):
        wav_parse(b"RIFF" + struct.pack("<I", 4) + b"WAVE")

    with pytest.raises(ValueError, match="exceed int16"):
        wav_encode_pcm16(np.array([40000]))
    with pytest.raises(ValueError, match="mono 1-D"):
        wav_encode_pcm16(np.zeros((4, 2), dtype=np.int16))


def test_square_wave_planted_truth():
    """The corpus identity the audio_wav_features oracle states: a square
    wave with period P and reps R has exactly n = P·R, peak = A,
    sum_sq = n·A², and 2R − 1 strict sign flips."""
    p, reps, a = 12, 75, 2500
    half = np.full(p // 2, a, dtype=np.int16)
    x = np.tile(np.concatenate([half, -half]), reps)
    n, peak, sum_sq, zc = _ref_features(x)
    assert (n, peak, sum_sq, zc) == (p * reps, a, p * reps * a * a,
                                     2 * reps - 1)
    got, _ = wav_parse(wav_encode_pcm16(x))
    assert np.array_equal(got, x)


def test_duplicate_and_overrunning_chunks_fail_loud():
    """r16 hardening: duplicate fmt/data chunks and a chunk overrunning
    the declared RIFF size must raise; bytes past the declared size are
    outside the container and ignored."""
    x = np.arange(-40, 40, dtype=np.int16)
    good = wav_encode_pcm16(x, 16000)
    fmt_payload = good[20:36]
    data_payload = x.tobytes()

    def rebuild(*chunks: bytes) -> bytes:
        body = b"WAVE" + b"".join(chunks)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    with pytest.raises(ValueError, match="duplicate fmt"):
        wav_parse(rebuild(_chunk(b"fmt ", fmt_payload),
                          _chunk(b"fmt ", fmt_payload),
                          _chunk(b"data", data_payload)))
    with pytest.raises(ValueError, match="duplicate data"):
        wav_parse(rebuild(_chunk(b"fmt ", fmt_payload),
                          _chunk(b"data", data_payload),
                          _chunk(b"data", data_payload)))
    # a chunk whose declared length overruns the RIFF bound
    bad = bytearray(rebuild(_chunk(b"fmt ", fmt_payload),
                            _chunk(b"data", data_payload)))
    struct.pack_into("<I", bad, 40, 1 << 28)  # data chunk length field
    with pytest.raises(ValueError, match="overruns"):
        wav_parse(bytes(bad))
    # trailing bytes PAST the declared RIFF size are not chunks: a forged
    # second data chunk appended there must not change a sample
    forged = rebuild(_chunk(b"fmt ", fmt_payload),
                     _chunk(b"data", data_payload))
    forged += _chunk(b"data", (x * 0).tobytes())
    got, rate = wav_parse(forged)
    assert rate == 16000 and np.array_equal(got, x)


# ---------------------------------------------------------------------------
# r18: stereo / 8/24/32-bit acceptance via exact integer downmix
# ---------------------------------------------------------------------------


def _reference_parse(native: np.ndarray, bits: int) -> np.ndarray:
    """Independent model of the r18 normalization contract: (n,) or (n,2)
    native-scale samples -> int16-scale mono (downmix at native width as
    floor((L+R)/2), then the width shift)."""
    x = native.astype(np.int64)
    if bits == 8:
        x = x - 128
    if x.ndim == 2:
        x = (x[:, 0] + x[:, 1]) >> 1
    if bits == 8:
        x = x << 8
    elif bits == 24:
        x = x >> 8
    elif bits == 32:
        x = x >> 16
    return x.astype(np.int16)


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    n=st.integers(1, 300),
    bits=st.sampled_from([8, 16, 24, 32]),
    stereo=st.booleans(),
)
def test_downmix_widths_match_reference(seed, n, bits, stereo):
    from robi_biometric_qdrant_vector_db_service_spark.operators.audio import (
        wav_encode_pcm,
    )

    rng = np.random.default_rng(seed)
    shape = (n, 2) if stereo else (n,)
    if bits == 8:
        native = rng.integers(0, 256, size=shape, dtype=np.int64)
    else:
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        native = rng.integers(lo, hi + 1, size=shape, dtype=np.int64)
    got, rate = wav_parse(wav_encode_pcm(native, 22050, bits=bits))
    assert rate == 22050
    assert np.array_equal(got, _reference_parse(native, bits))


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**32 - 1), n=st.integers(1, 400))
def test_lossless_containers_decode_identically(seed, n):
    """The corpus-planting identity: dual-mono stereo 16-bit, 24-bit
    (<< 8) and dual-mono 32-bit (<< 16) all decode to EXACTLY the
    original int16 samples — the property that lets the planted audio
    corpora rotate container formats without touching their oracles."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.audio import (
        wav_encode_pcm,
    )

    x = np.random.default_rng(seed).integers(
        -32768, 32768, size=n, dtype=np.int64
    )
    x16 = x.astype(np.int16)
    stereo = np.stack([x, x], axis=1)
    for blob in (
        wav_encode_pcm(stereo, 16000, bits=16),
        wav_encode_pcm(x << 8, 16000, bits=24),
        wav_encode_pcm(stereo << 16, 16000, bits=32),
    ):
        got, _ = wav_parse(blob)
        assert np.array_equal(got, x16)


def test_eight_bit_is_lossy_but_predictable():
    """8-bit widening: parse gives ((u - 128) << 8) exactly — the
    documented recenter-and-shift, not a rescale."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.audio import (
        wav_encode_pcm,
    )

    u = np.arange(256, dtype=np.int64)
    got, _ = wav_parse(wav_encode_pcm(u, 8000, bits=8))
    assert np.array_equal(got, ((u - 128) << 8).astype(np.int16))


def test_odd_byte_count_24bit_mono_pads_riff_word_alignment():
    """A 24-bit mono clip with an odd total byte count still round-trips
    (the writer adds the RIFF pad byte; the walk stays inside the
    declared size)."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.audio import (
        wav_encode_pcm,
    )

    x = np.array([1 << 10, -(1 << 12), 77], dtype=np.int64)  # 9 data bytes
    got, _ = wav_parse(wav_encode_pcm(x << 8, 16000, bits=24))
    assert np.array_equal(got, x.astype(np.int16))


# ---------------------------------------------------------------------------
# r18: WAVE_FORMAT_EXTENSIBLE and IEEE-float acceptance
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    n=st.integers(1, 200),
    bits=st.sampled_from([8, 16, 24, 32]),
    stereo=st.booleans(),
)
def test_extensible_wrapper_decodes_like_plain_pcm(seed, n, bits, stereo):
    """The 0xFFFE container with the PCM SubFormat GUID must decode to
    EXACTLY what the plain fmt-tag-1 container holding the same bytes
    decodes to."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.audio import (
        wav_encode_pcm,
    )

    rng = np.random.default_rng(seed)
    shape = (n, 2) if stereo else (n,)
    if bits == 8:
        native = rng.integers(0, 256, size=shape, dtype=np.int64)
    else:
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        native = rng.integers(lo, hi + 1, size=shape, dtype=np.int64)
    plain, r1 = wav_parse(wav_encode_pcm(native, 16000, bits=bits))
    ext, r2 = wav_parse(
        wav_encode_pcm(native, 16000, bits=bits, extensible=True)
    )
    assert r1 == r2 == 16000
    assert np.array_equal(plain, ext)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    n=st.integers(1, 200),
    bits=st.sampled_from([32, 64]),
    stereo=st.booleans(),
    ext=st.booleans(),
)
def test_float_wav_matches_reference(seed, n, bits, stereo, ext):
    """IEEE-float decode (plain format 3 and EXTENSIBLE-wrapped) equals
    the documented model: float64 downmix average, then
    clip(floor(x * 32768), int16)."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.audio import (
        wav_encode_float,
    )

    rng = np.random.default_rng(seed)
    shape = (n, 2) if stereo else (n,)
    x = rng.uniform(-1.3, 1.3, size=shape)  # deliberately beyond nominal
    stored = x.astype("<f4" if bits == 32 else "<f8").astype(np.float64)
    got, rate = wav_parse(
        wav_encode_float(x, 8000, bits=bits, extensible=ext)
    )
    ref = stored
    if stereo:
        ref = (ref[:, 0] + ref[:, 1]) / 2.0
    want = np.clip(np.floor(ref * 32768.0), -32768, 32767).astype(np.int16)
    assert rate == 8000
    assert np.array_equal(got, want)


def test_float_exact_int16_roundtrip():
    """The corpus-planting identity: float32 values x/32768 for int16 x
    are exactly representable (<= 15 mantissa bits), so dual-mono float
    decode recovers x bit-for-bit."""
    from robi_biometric_qdrant_vector_db_service_spark.operators.audio import (
        wav_encode_float,
    )

    x = np.array([-32768, -4000, -1, 0, 1, 777, 32767], dtype=np.int64)
    f = x.astype(np.float64) / 32768.0
    got, _ = wav_parse(wav_encode_float(np.stack([f, f], axis=1), 16000))
    assert np.array_equal(got, x.astype(np.int16))


def test_float_and_extensible_gates_stay_loud():
    from robi_biometric_qdrant_vector_db_service_spark.operators.audio import (
        wav_encode_float,
        wav_encode_pcm,
    )

    # NaN must never hash
    with pytest.raises(ValueError, match="non-finite"):
        wav_parse(wav_encode_float(np.array([0.5, float("nan")]), 16000))
    # unknown SubFormat GUID
    blob = bytearray(
        wav_encode_pcm(np.arange(16, dtype=np.int64), 16000, bits=16,
                       extensible=True)
    )
    guid_at = blob.index(b"\x00\x00\x00\x00\x10\x00\x80\x00")
    blob[guid_at + 4] ^= 0xFF
    with pytest.raises(ValueError, match="SubFormat GUID"):
        wav_parse(bytes(blob))
    # EXTENSIBLE fmt chunk too short for the GUID
    short = bytearray(
        wav_encode_pcm(np.arange(16, dtype=np.int64), 16000, bits=16)
    )
    struct.pack_into("<H", short, 20, 0xFFFE)  # claim extensible, 16-byte fmt
    with pytest.raises(ValueError, match="EXTENSIBLE fmt"):
        wav_parse(bytes(short))
    # 16-bit float is not a thing
    with pytest.raises(ValueError, match="16-bit float"):
        wav_encode_float(np.array([0.0]), 16000, bits=16)
