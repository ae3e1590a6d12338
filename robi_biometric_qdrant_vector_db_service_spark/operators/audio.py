"""Real audio decode for the multimodal family — stdlib RIFF/WAV PCM16.

The multimodal charter carries image/audio/video as opaque binary
columns with stubbed decodes where the container has no codec libs.
r15 made the IMAGE decode real (PNG in `multimodal.py`, baseline JPEG in
`jpeg.py`); this module does the same for AUDIO with the one format the
standard library fully specifies: RIFF/WAVE, PCM, 16-bit.

- `wav_encode_pcm16(samples, rate)` — minimal writer (the engine-side
  encoder behind the synthetic corpus, like `png_encode_rgb` /
  `jpeg_encode_rgb`: fixture tables carry text, so the registered query
  plants its own WAVs).
- `wav_parse(blob)` — RIFF chunk walk (fmt / data, unknown chunks
  skipped per spec including their pad byte), then PCM decode for the
  shapes real speech lakes actually hold (r18): 8/16/24/32-bit, mono or
  stereo.  Everything normalizes to ONE exact integer contract — stereo
  downmixes per frame as floor((L+R)/2) at native width, then the width
  maps to the 16-bit scale (8-bit: recenter and << 8; 24-bit: >> 8;
  32-bit: >> 16) — so every downstream feature (VAD, gates, both
  fingerprints) runs on int16-scale samples regardless of source
  format, and the DuckDB oracles keep hashing bit-for-bit.
  WAVE_FORMAT_EXTENSIBLE (0xFFFE) unwraps to its SubFormat GUID's real
  tag, and IEEE float (format 3, 32/64-bit) converts by the
  deterministic floor(x·32768) clip.  Everything else — compressed
  codecs, unknown GUIDs, >2-channel, odd widths, frame-misaligned or
  truncated streams, non-finite floats — fails LOUD: corrupt audio must
  never produce features.
- `wav_encode_pcm(samples, rate, bits=...)` — the general writer twin
  (native-scale ints, mono ``(n,)`` or multichannel ``(n, ch)``), used
  by the planted corpora to exercise the acceptance surface;
  `wav_encode_pcm16` stays the 16-bit-mono fast path.
- `wav_features(blobs)` — mapInPandas: one typed INTEGER feature row
  per blob (n_samples, sample_rate, peak, sum_sq, zero_crossings) — the
  standard cheap audio-quality gates (silence/clipping via peak and
  energy, spectral-crudeness via zero-crossing rate), all exact
  integers so the DuckDB oracle hashes bit-for-bit.  Partition-parallel
  projection, no shuffle; a real resample/fbank stage slots in the same
  mapInPandas position.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def wav_encode_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Minimal RIFF/WAVE writer: PCM (format 1), mono, 16-bit."""
    if samples.ndim != 1:
        raise ValueError(f"wav_encode_pcm16: expected mono 1-D, got {samples.shape}")
    if samples.dtype != np.int16:
        if np.any(samples > 32767) or np.any(samples < -32768):
            raise ValueError("wav_encode_pcm16: samples exceed int16 range")
        samples = samples.astype(np.int16)
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# Tail of the KSDATAFORMAT_SUBTYPE_{PCM,IEEE_FLOAT} GUIDs — bytes 2..15
# of the little-endian GUID {xxxx}-0000-0010-8000-00AA00389B71; the first
# two bytes carry the wrapped format code (1 = PCM, 3 = IEEE float)
_KSDATAFORMAT_GUID_TAIL = (
    b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
)


def _parse_float_data(
    data: bytes, channels: int, rate: int, bits: int
) -> tuple[np.ndarray, int]:
    """IEEE-float WAV data (format 3, plain or EXTENSIBLE-wrapped) to the
    int16-scale contract: samples are nominal [-1.0, 1.0); downmix
    averages in float64 ((L+R)/2 — exact IEEE op), conversion is the
    deterministic floor(x * 32768) clipped to int16 (out-of-range floats
    clip, like every practical converter); NaN/Inf fail LOUD — corrupt
    audio must never produce features."""
    if channels not in (1, 2):
        raise ValueError(
            f"wav_parse: {channels}-channel float unsupported (mono or stereo)"
        )
    if bits not in (32, 64):
        raise ValueError(
            f"wav_parse: {bits}-bit IEEE float unsupported (32/64)"
        )
    frame = (bits // 8) * channels
    if len(data) % frame:
        raise ValueError(
            f"wav_parse: data chunk length {len(data)} is not a multiple "
            f"of the {frame}-byte frame ({bits}-bit float x{channels})"
        )
    x = np.frombuffer(data, dtype="<f4" if bits == 32 else "<f8").astype(
        np.float64
    )
    if x.size and not np.isfinite(x).all():
        raise ValueError("wav_parse: non-finite float sample (NaN/Inf)")
    if channels == 2:
        x = x.reshape(-1, 2)
        x = (x[:, 0] + x[:, 1]) / 2.0
    out = np.clip(np.floor(x * 32768.0), -32768, 32767)
    return out.astype(np.int16), rate


def wav_parse(blob: bytes) -> tuple[np.ndarray, int]:
    """One WAV byte string -> (int16 sample array, sample_rate)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("wav_parse: not a RIFF/WAVE stream")
    (riff_size,) = struct.unpack("<I", blob[4:8])
    if riff_size + 8 > len(blob):
        raise ValueError(
            f"wav_parse: truncated RIFF (declares {riff_size + 8} bytes, "
            f"{len(blob)} present)"
        )
    # The chunk walk is bounded by the DECLARED RIFF size, not len(blob):
    # trailing garbage past the container must not be silently parsed as
    # chunks, and a chunk overrunning the declared size fails loud.
    end = 8 + riff_size
    pos, fmt, data = 12, None, None
    while pos + 8 <= end:
        cid = blob[pos : pos + 4]
        (clen,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        if pos + 8 + clen > end:
            raise ValueError(
                f"wav_parse: {cid!r} chunk overruns declared RIFF size"
            )
        chunk = blob[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if fmt is not None:
                raise ValueError("wav_parse: duplicate fmt chunk")
            fmt = chunk
        elif cid == b"data":
            if data is not None:
                raise ValueError("wav_parse: duplicate data chunk")
            data = chunk
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned (pad byte)
    if fmt is None or data is None:
        raise ValueError("wav_parse: missing fmt or data chunk")
    audio_fmt, channels, rate, _byte_rate, _align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_fmt == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE (r18): the container
        # modern encoders use for >16-bit and multichannel PCM/float —
        # the REAL format tag lives in the SubFormat GUID
        if len(fmt) < 40:
            raise ValueError(
                f"wav_parse: EXTENSIBLE fmt chunk is {len(fmt)} bytes; "
                "the SubFormat GUID needs 40"
            )
        sub = fmt[24:40]
        if sub[2:] != _KSDATAFORMAT_GUID_TAIL:
            raise ValueError(
                f"wav_parse: unknown EXTENSIBLE SubFormat GUID {sub.hex()}"
            )
        (audio_fmt,) = struct.unpack("<H", sub[:2])
    if audio_fmt == 3:  # IEEE float (r18)
        return _parse_float_data(data, channels, rate, bits)
    if audio_fmt != 1:
        raise ValueError(
            f"wav_parse: compressed WAV (format {audio_fmt}) unsupported; "
            "only PCM (1), IEEE float (3), or EXTENSIBLE wrapping either"
        )
    if channels not in (1, 2):
        raise ValueError(
            f"wav_parse: {channels}-channel PCM unsupported (mono or stereo)"
        )
    if bits not in (8, 16, 24, 32):
        raise ValueError(
            f"wav_parse: {bits}-bit PCM unsupported (8/16/24/32)"
        )
    frame = (bits // 8) * channels
    if len(data) % frame:
        raise ValueError(
            f"wav_parse: data chunk length {len(data)} is not a multiple "
            f"of the {frame}-byte frame ({bits}-bit x{channels})"
        )
    if bits == 8:
        # 8-bit WAV is UNSIGNED with midpoint 128 (the one width the RIFF
        # spec stores unsigned) — recenter before any arithmetic
        x = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
    elif bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.int64)
    elif bits == 24:
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        x = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
        x = np.where(x >= 1 << 23, x - (1 << 24), x)
    else:
        x = np.frombuffer(data, dtype="<i4").astype(np.int64)
    if channels == 2:
        # exact integer downmix at NATIVE width: floor((L+R)/2) per frame
        # (averaging before the width shift keeps the extra precision)
        x = x.reshape(-1, 2)
        x = (x[:, 0] + x[:, 1]) >> 1
    if bits == 8:
        x = x << 8
    elif bits == 24:
        x = x >> 8
    elif bits == 32:
        x = x >> 16
    return x.astype(np.int16), rate


def _wav_container(
    data: bytes, rate: int, channels: int, bits: int, fmt_tag: int,
    *, extensible: bool = False,
) -> bytes:
    """Assemble the RIFF container around packed sample ``data`` — plain
    fmt (16 bytes) or WAVE_FORMAT_EXTENSIBLE (40 bytes, ``fmt_tag``
    moved into the SubFormat GUID)."""
    block = channels * (bits // 8)
    if extensible:
        fmt = struct.pack(
            "<HHIIHH", 0xFFFE, channels, rate, rate * block, block, bits
        ) + struct.pack(
            "<HHI", 22, bits, 0x3 if channels == 2 else 0x4
        ) + struct.pack("<H", fmt_tag) + _KSDATAFORMAT_GUID_TAIL
    else:
        fmt = struct.pack(
            "<HHIIHH", fmt_tag, channels, rate, rate * block, block, bits
        )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    if len(data) % 2:
        body += b"\x00"  # RIFF chunks are word-aligned (pad byte)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_encode_float(
    samples: np.ndarray, rate: int = 16000, *, bits: int = 32,
    extensible: bool = False,
) -> bytes:
    """IEEE-float RIFF/WAVE writer (format 3, optionally wrapped in
    WAVE_FORMAT_EXTENSIBLE) — mono ``(n,)`` or multichannel ``(n, ch)``
    floats at the nominal [-1.0, 1.0) scale."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.shape[1] < 1:
        raise ValueError(
            f"wav_encode_float: expected (n,) or (n, ch) samples, got "
            f"{np.asarray(samples).shape}"
        )
    if bits not in (32, 64):
        raise ValueError(f"wav_encode_float: {bits}-bit float unsupported")
    flat = arr.reshape(-1)
    data = flat.astype("<f4" if bits == 32 else "<f8").tobytes()
    return _wav_container(
        data, rate, arr.shape[1], bits, 3, extensible=extensible
    )


def wav_encode_pcm(
    samples: np.ndarray, rate: int = 16000, *, bits: int = 16,
    extensible: bool = False,
) -> bytes:
    """General RIFF/WAVE PCM writer — 8/16/24/32-bit, mono ``(n,)`` or
    multichannel ``(n, ch)`` NATIVE-scale integers (8-bit: unsigned
    0..255; wider: signed, full width); ``extensible=True`` wraps the
    same samples in WAVE_FORMAT_EXTENSIBLE (the container modern
    encoders use for >16-bit).  Frames interleave channel-major per the
    spec.  The fixture-side twin of ``wav_parse``'s r18 acceptance
    surface; ``wav_encode_pcm16`` remains the 16-bit-mono fast path."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.shape[1] < 1:
        raise ValueError(
            f"wav_encode_pcm: expected (n,) or (n, ch) samples, got "
            f"{np.asarray(samples).shape}"
        )
    channels = arr.shape[1]
    flat = arr.reshape(-1).astype(np.int64)
    if bits == 8:
        if flat.size and (flat.min() < 0 or flat.max() > 255):
            raise ValueError("wav_encode_pcm: 8-bit samples must be 0..255")
        data = flat.astype(np.uint8).tobytes()
    elif bits in (16, 32):
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        if flat.size and (flat.min() < lo or flat.max() > hi):
            raise ValueError(
                f"wav_encode_pcm: samples exceed int{bits} range"
            )
        data = flat.astype("<i2" if bits == 16 else "<i4").tobytes()
    elif bits == 24:
        if flat.size and (flat.min() < -(1 << 23) or flat.max() > (1 << 23) - 1):
            raise ValueError("wav_encode_pcm: samples exceed int24 range")
        u = (flat & 0xFFFFFF).astype(np.int64)
        b = np.empty((flat.size, 3), dtype=np.uint8)
        b[:, 0] = u & 0xFF
        b[:, 1] = (u >> 8) & 0xFF
        b[:, 2] = (u >> 16) & 0xFF
        data = b.tobytes()
    else:
        raise ValueError(f"wav_encode_pcm: {bits}-bit PCM unsupported")
    return _wav_container(data, rate, channels, bits, 1, extensible=extensible)


WAV_FEATURE_SCHEMA = (
    "doc_id bigint, n_samples bigint, sample_rate bigint, peak bigint, "
    "sum_sq bigint, zero_crossings bigint"
)


def wav_features(blobs: DataFrame) -> DataFrame:
    """Per-blob integer audio features via mapInPandas.

    zero_crossings counts strict sign flips between CONSECUTIVE nonzero-
    sign states (sign(x) in {-1, +1}; zero samples carry the previous
    sign, the usual hysteresis-free convention that makes a square wave's
    count exactly 2L/P - 1).  peak = max |x| (int), sum_sq = Σx² (int64,
    exact — callers derive RMS as sqrt(sum_sq / n) without float drift
    inside the engine).  Decode is per blob (a RIFF file is one stream);
    the feature math is vectorized NumPy."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "n_samples", "sample_rate", "peak", "sum_sq",
                    "zero_crossings")}
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                x, rate = wav_parse(bytes(blob))
                xi = x.astype(np.int64)
                sgn = np.sign(xi)
                nz = sgn[sgn != 0]
                zc = int((nz[1:] != nz[:-1]).sum()) if nz.size else 0
                out["doc_id"].append(int(did))
                out["n_samples"].append(len(xi))
                out["sample_rate"].append(int(rate))
                out["peak"].append(int(np.abs(xi).max()) if len(xi) else 0)
                out["sum_sq"].append(int((xi * xi).sum()))
                out["zero_crossings"].append(zc)
            yield pd.DataFrame(out)

    return blobs.mapInPandas(run, schema=WAV_FEATURE_SCHEMA)


AUDIO_FP_SCHEMA = "doc_id bigint, b0 bigint, b1 bigint, b2 bigint, b3 bigint"
AUDIO_FP_BLOCKS = 65  # 65 block energies -> 64 sign-of-delta bits


def audio_fingerprint_bands(blobs: DataFrame) -> DataFrame:
    """Acoustic fingerprint of each WAV blob as four 16-bit band words —
    the AUDIO analogue of the image dHash (`multimodal.dhash_bands`),
    feeding the SAME banded-Hamming pair plan (`phash_dup_pairs`)
    verbatim.

    Fingerprint proper: split the decoded PCM stream into 65 equal spans,
    take each span's energy (exact int64 sum of squares), and emit one
    bit per adjacent span pair (left < right) — 64 bits keyed on the
    energy-ENVELOPE gradient, so a re-encode at a different volume
    (uniform gain: every energy scales by the same factor, order
    preserved) or a different sample rate (per-span energies scale with
    span length, order preserved) hashes identically, while exact byte
    hashing never can.  Sign-of-delta over block energies is the
    classic cheap audio fingerprint shape (the Haitsma-Kalker family,
    collapsed to one band).

    Vectorized per blob: one cumsum of x², a 66-boundary gather, one
    comparison — decode is per blob inside the Arrow batch (a RIFF file
    is one stream).  Partition-parallel projection, no shuffle; 36
    bytes/clip downstream.

    Scope: gain/rate-invariant but NOT time-shift-invariant — the 65
    equal spans re-derive from the clip's own length, so a trimmed or
    padded re-encode re-blocks every boundary and diverges.  The
    shift-robust member is ``audio_frame_fingerprints`` below
    (absolute-time blocks, overlapping frames, offset-histogram
    matching); this whole-clip hash stays as the cheap 36-bytes-total
    variant for corpora where durations are trusted."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w16 = 1 << np.arange(16, dtype=np.int64)
        for pdf in batches:
            out = {"doc_id": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                x, _rate = wav_parse(bytes(blob))
                n = len(x)
                if n < AUDIO_FP_BLOCKS:
                    raise ValueError(
                        f"audio_fingerprint_bands: clip of {n} samples is "
                        f"shorter than {AUDIO_FP_BLOCKS} blocks"
                    )
                xi = x.astype(np.int64)
                csum = np.concatenate(([0], np.cumsum(xi * xi)))
                bnd = (n * np.arange(AUDIO_FP_BLOCKS + 1, dtype=np.int64)
                       ) // AUDIO_FP_BLOCKS
                e = csum[bnd[1:]] - csum[bnd[:-1]]
                bits = e[:-1] < e[1:]
                out["doc_id"].append(int(did))
                for j in range(4):
                    out[f"b{j}"].append(
                        int((bits[16 * j : 16 * (j + 1)] * w16).sum())
                    )
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return blobs.mapInPandas(run, schema=AUDIO_FP_SCHEMA)


AUDIO_FRAME_FP_SCHEMA = (
    "doc_id bigint, frame_idx int, b0 bigint, b1 bigint, b2 bigint, b3 bigint"
)
AUDIO_FP_BLOCK_SEC = 0.01   # absolute-time block: 10 ms regardless of rate
AUDIO_FP_FRAME_BLOCKS = 65  # 65 block energies per frame -> 64 delta bits


def _frame_fp_bits(
    x: np.ndarray,
    rate: int,
    *,
    block_sec: float = AUDIO_FP_BLOCK_SEC,
    frame_blocks: int = AUDIO_FP_FRAME_BLOCKS,
    hop_blocks: int = 1,
) -> np.ndarray:
    """One decoded clip -> (n_frames, 64) bool fingerprint bits.

    Blocks are ABSOLUTE-TIME units (``block_sec`` seconds, so
    ``round(rate * block_sec)`` samples — 10 ms at any rate), which is
    what makes the per-FRAME hash comparable across clips that were
    trimmed, padded, or resampled; the whole-clip 65-equal-spans
    fingerprint (``audio_fingerprint_bands``) re-blocks on every edit
    and diverges.  Frame j covers blocks [j*hop, j*hop + frame_blocks);
    its 64 bits are sign-of-delta over the frame's block energies —
    computed once per clip as one delta-bit string and windowed with a
    zero-copy stride view, so the overlap costs nothing."""
    n_spb = int(round(rate * block_sec))
    if n_spb < 1:
        raise ValueError(
            f"_frame_fp_bits: rate {rate} yields an empty {block_sec}s block"
        )
    if hop_blocks < 1:
        raise ValueError(f"_frame_fp_bits: hop_blocks must be >= 1, got {hop_blocks}")
    n_blocks = len(x) // n_spb
    if n_blocks < frame_blocks:
        raise ValueError(
            f"_frame_fp_bits: clip of {n_blocks} blocks is shorter than one "
            f"{frame_blocks}-block frame — too short to fingerprint"
        )
    xi = x[: n_blocks * n_spb].astype(np.int64)
    e = (xi * xi).reshape(n_blocks, n_spb).sum(axis=1)
    d = e[:-1] < e[1:]
    return np.lib.stride_tricks.sliding_window_view(
        d, frame_blocks - 1
    )[::hop_blocks]


def audio_frame_fingerprints(
    blobs: DataFrame, *, hop_blocks: int = 1
) -> DataFrame:
    """TIME-SHIFT-ROBUST acoustic fingerprints: one (doc_id, frame_idx,
    4x16-bit band words) row per OVERLAPPING frame of each WAV blob —
    the Haitsma-Kalker shape (fingerprint fixed-duration frames densely
    hopped across the clip) that fixes the r16 VERDICT's gap #2: the
    whole-clip hash is exactly gain/rate-invariant but a 0.1s trim
    re-blocks every boundary, while HERE a trim or pad of any whole
    number of ``hop_blocks`` blocks leaves every interior frame's hash
    EXACTLY intact — the match just appears at a nonzero frame offset,
    which `multimodal.fingerprint_offset_pairs` recovers with the
    classic offset-histogram alignment.

    Invariance (exact, integers end-to-end): uniform gain scales every
    block energy by g², resampling scales by the samples-per-block
    ratio — order preserved, bits identical; block-aligned trim/pad
    shifts WHICH frames exist, not their bits.

    Scale: one cumsum-free reshape-sum per clip, a zero-copy stride
    view for the overlap, then 36 bytes per frame downstream — with the
    default hop of one 10 ms block a 3-minute clip emits ~18k frames;
    production corpora raise ``hop_blocks`` (Haitsma-Kalker uses
    window/32 ≈ 2 blocks) to trade shift granularity for volume.
    Partition-parallel mapInPandas projection, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w16 = 1 << np.arange(16, dtype=np.int64)
        for pdf in batches:
            ids, fidx = [], []
            words: list[np.ndarray] = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                x, rate = wav_parse(bytes(blob))
                bits = _frame_fp_bits(x, rate, hop_blocks=hop_blocks)
                n = bits.shape[0]
                ids.extend([int(did)] * n)
                fidx.extend(range(n))
                words.append(bits.reshape(n, 4, 16) @ w16)
            packed = (
                np.concatenate(words, axis=0)
                if words
                else np.empty((0, 4), dtype=np.int64)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    **{
                        f"b{j}": pd.Series(packed[:, j], dtype="int64")
                        for j in range(4)
                    },
                }
            )

    return blobs.mapInPandas(run, schema=AUDIO_FRAME_FP_SCHEMA)


AUDIO_ENERGY_SCHEMA = "doc_id bigint, block_idx int, energy bigint"


def audio_block_energies(blobs: DataFrame, *, block_sec: float = 0.01) -> DataFrame:
    """Per-block integer energies: each (doc_id, blob) row expands 1:N to
    one (doc_id, block_idx, energy) row per FULL ``block_sec`` block
    (a trailing partial block is dropped — rate-independent absolute-time
    blocking, the `audio_frame_fingerprints` convention).  Energy is the
    exact int64 sum of squared int16 samples, so downstream thresholds
    and the DuckDB oracle agree bit-for-bit.

    Scale: partition-parallel mapInPandas projection, no shuffle; the
    audio bytes stay put, the emitted rows are 20 bytes/block (100 rows
    per second of 16 kHz audio at the 10 ms default)."""
    if block_sec <= 0:
        raise ValueError(
            f"audio_block_energies: block_sec must be > 0, got {block_sec}"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "block_idx": [], "energy": []}
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                x, rate = wav_parse(bytes(blob))
                blk = int(round(rate * block_sec))
                if blk < 1:
                    raise ValueError(
                        f"audio_block_energies: block_sec {block_sec} is "
                        f"shorter than one sample at rate {rate}"
                    )
                n = len(x) // blk
                xi = x[: n * blk].astype(np.int64)
                e = (xi * xi).reshape(n, blk).sum(axis=1)
                out["doc_id"].extend([int(did)] * n)
                out["block_idx"].extend(range(n))
                out["energy"].extend(int(v) for v in e)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "block_idx": pd.Series(out["block_idx"], dtype="int32"),
                    "energy": pd.Series(out["energy"], dtype="int64"),
                }
            )

    return blobs.mapInPandas(run, schema=AUDIO_ENERGY_SCHEMA)


def audio_active_segments(
    energies: DataFrame, *, min_energy: int = 0
) -> DataFrame:
    """Voice-activity / silence segmentation over per-block energies —
    the speech-pipeline curation step that trims silence and splits long
    recordings into utterances before the expensive transcribe/embed
    stage pays for dead air: blocks with energy > ``min_energy`` are
    active, and maximal runs of consecutive active blocks become
    segments (doc_id, seg_id, start_block, end_block, n_blocks).

    Pure declarative gaps-and-islands — no Python in the loop: after the
    threshold filter, ``block_idx - row_number()`` is constant exactly
    within a run of consecutive survivors (the classic islands key), a
    groupBy collapses each island to its span, and a second window
    re-ranks islands into dense per-doc seg_ids ordered by start.

    Scale: ONE shuffle, on doc_id — inherent to ordering a doc's blocks;
    both windows and the groupBy reuse that partitioning, and the rows
    being shuffled are 20-byte (block, energy) pairs, never samples."""
    w = Window.partitionBy("doc_id").orderBy("block_idx")
    islands = (
        energies.filter(F.col("energy") > min_energy)
        .withColumn("grp", F.col("block_idx") - F.row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(
            F.min("block_idx").alias("start_block"),
            F.max("block_idx").alias("end_block"),
            F.count("*").cast("int").alias("n_blocks"),
        )
    )
    ws = Window.partitionBy("doc_id").orderBy("start_block")
    return islands.withColumn(
        "seg_id", (F.row_number().over(ws) - 1).cast("int")
    ).select("doc_id", "seg_id", "start_block", "end_block", "n_blocks")
