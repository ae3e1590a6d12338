"""Fuzz + contract suite for the MJPEG-in-AVI video path (`operators.video`).

The container is lossless (frame payloads are stored verbatim), so the
container differentials are EXACT, the `test_wav_fuzz.py` discipline:
- round-trip: parse(encode(frames)) == frames byte-for-byte, arbitrary
  frame count / sizes / qualities;
- chunk-layout fuzz: JUNK chunks at the top level, inside hdrl, and
  inside movi (including odd-length ones, which carry a RIFF pad byte)
  must not change a frame;
- loud failure: duplicate lists, second streams, non-MJPG handlers or
  biCompression, frame-count mismatches against EITHER header, non-JPEG
  frame payloads, overrunning chunks, and truncation must raise, never
  produce frames;
- planted truth: the exhaustive corpus identity `video_frame_phash_dups`'
  oracle states — worst in-class sampled-frame hamming is exactly 0
  across all (quality, sampling) variant pairs, min cross-class distance
  at the same frame position clears the <=3-bit verify bar;
- Spark surface: `video_frame_dhash` emits exactly the sampled frame
  positions with band words equal to an independent per-frame reference.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from robi_biometric_qdrant_vector_db_service_spark.operators.jpeg import (
    jpeg_decode,
    jpeg_encode_rgb,
)
from robi_biometric_qdrant_vector_db_service_spark.operators.multimodal import (
    _block_mean_grid,
    class_grid_image,
)
from robi_biometric_qdrant_vector_db_service_spark.operators.video import (
    _chunk,
    _list,
    avi_encode_mjpeg,
    avi_parse_mjpeg,
    video_frame_dhash,
)
from robi_biometric_qdrant_vector_db_service_spark.workload_sources import (
    VIDEO_CLASSES,
    VIDEO_FRAMES,
    VIDEO_SEED_BASE,
    VIDEO_STRIDE,
    VIDEO_VARIANTS,
)


def _frames(seed: int, n: int, w: int = 18, h: int = 16) -> list[bytes]:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        q = int(rng.choice([85, 90, 95]))
        out.append(jpeg_encode_rgb(px, quality=q))
    return out


def _dhash_bits(px: np.ndarray) -> np.ndarray:
    g = _block_mean_grid(px, "ref")
    return (g[:, :-1] < g[:, 1:]).reshape(64)


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**32 - 1), n=st.integers(1, 12),
       fps=st.sampled_from([10, 24, 30]))
def test_roundtrip(seed, n, fps):
    frames = _frames(seed, n)
    got, w, h = avi_parse_mjpeg(avi_encode_mjpeg(frames, 18, 16, fps=fps))
    assert got == frames
    assert (w, h) == (18, 16)


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    n=st.integers(1, 6),
    junk_sizes=st.lists(st.integers(0, 9), min_size=1, max_size=4),
)
def test_junk_chunks_everywhere_are_skipped(seed, n, junk_sizes):
    """Rebuild the container with JUNK chunks at every level the parser
    tolerates (top level, hdrl, movi) — frames must be byte-identical."""
    rng = np.random.default_rng(seed)
    frames = _frames(seed, n)
    blob = avi_encode_mjpeg(frames, 18, 16)

    def junk() -> bytes:
        k = junk_sizes[int(rng.integers(0, len(junk_sizes)))]
        return _chunk(b"JUNK", bytes(rng.integers(0, 256, size=k, dtype=np.uint8)))

    # re-parse the writer's own layout to splice junk in
    (riff_size,) = struct.unpack("<I", blob[4:8])
    pos, parts = 12, []
    while pos + 8 < 8 + riff_size:
        (clen,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        parts.append(blob[pos : pos + 8 + clen + (clen & 1)])
        pos += 8 + clen + (clen & 1)
    hdrl_raw, movi_raw, idx1_raw = parts
    # inside hdrl: junk between avih and strl
    hp = hdrl_raw[12:]
    (avih_len,) = struct.unpack("<I", hp[4:8])
    avih_chunk = hp[: 8 + avih_len]
    strl_chunk = hp[8 + avih_len :]
    hdrl2 = _list(b"hdrl", avih_chunk + junk() + strl_chunk)
    # inside movi: junk between frame chunks
    mp, mpos, movi_parts = movi_raw[12:], 0, []
    while mpos + 8 <= len(mp):
        (clen,) = struct.unpack("<I", mp[mpos + 4 : mpos + 8])
        movi_parts.append(mp[mpos : mpos + 8 + clen + (clen & 1)])
        mpos += 8 + clen + (clen & 1)
    movi2 = _list(b"movi", junk().join([b""] + movi_parts) + junk())
    body = b"AVI " + junk() + hdrl2 + junk() + movi2 + idx1_raw + junk()
    rebuilt = b"RIFF" + struct.pack("<I", len(body)) + body
    got, w, h = avi_parse_mjpeg(rebuilt)
    assert got == frames and (w, h) == (18, 16)


def _patch(blob: bytes, offset: int, data: bytes) -> bytes:
    b = bytearray(blob)
    b[offset : offset + len(data)] = data
    return bytes(b)


def test_rejects_corrupt_and_unsupported():
    frames = _frames(7, 3)
    good = avi_encode_mjpeg(frames, 18, 16)

    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        avi_parse_mjpeg(b"OggS" + good[4:])
    with pytest.raises(ValueError, match="truncated RIFF"):
        avi_parse_mjpeg(good[: len(good) // 2])

    # avih dwTotalFrames disagreeing with the movi chunk count
    avih_payload = good.find(b"avih") + 8
    with pytest.raises(ValueError, match="dwTotalFrames"):
        avi_parse_mjpeg(
            _patch(good, avih_payload + 16, struct.pack("<I", 99))
        )
    # strh dwLength disagreeing too
    strh_payload = good.find(b"strh") + 8
    with pytest.raises(ValueError, match="dwLength"):
        avi_parse_mjpeg(
            _patch(good, strh_payload + 32, struct.pack("<I", 99))
        )
    # second stream declared
    with pytest.raises(ValueError, match="streams declared"):
        avi_parse_mjpeg(_patch(good, avih_payload + 24, struct.pack("<I", 2)))
    # non-video stream type / non-MJPG handler / non-MJPG biCompression
    with pytest.raises(ValueError, match="not 'vids'"):
        avi_parse_mjpeg(_patch(good, strh_payload, b"auds"))
    with pytest.raises(ValueError, match="not MJPG"):
        avi_parse_mjpeg(_patch(good, strh_payload + 4, b"XVID"))
    strf_payload = good.find(b"strf") + 8
    with pytest.raises(ValueError, match="biCompression"):
        avi_parse_mjpeg(_patch(good, strf_payload + 16, b"DIB "))
    # a frame chunk that is not a JPEG
    first_frame = good.find(b"00dc") + 8
    with pytest.raises(ValueError, match="missing SOI"):
        avi_parse_mjpeg(_patch(good, first_frame, b"\x00\x00"))
    # a chunk overrunning its container
    movi_first = good.find(b"00dc") + 4
    with pytest.raises(ValueError, match="overruns"):
        avi_parse_mjpeg(_patch(good, movi_first, struct.pack("<I", 1 << 28)))
    # an audio chunk inside movi (contradicts the declared single stream)
    extra = _chunk(b"01wb", b"\x00\x00")
    movi_fourcc = good.find(b"movi")
    (movi_len,) = struct.unpack("<I", good[movi_fourcc - 4 : movi_fourcc])
    spliced = (
        good[: movi_fourcc - 4]
        + struct.pack("<I", movi_len + len(extra))
        + good[movi_fourcc : movi_fourcc + movi_len]
        + extra
        + good[movi_fourcc + movi_len :]
    )
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    with pytest.raises(ValueError, match="unexpected movi chunk"):
        avi_parse_mjpeg(spliced)

    with pytest.raises(ValueError, match="empty frame list"):
        avi_encode_mjpeg([], 18, 16)
    with pytest.raises(ValueError, match="not a JPEG"):
        avi_encode_mjpeg([b"ab"], 18, 16)


def test_planted_corpus_truth_exhaustive():
    """The exact identity the video_frame_phash_dups oracle states: for
    every class, every sampled frame position, and every variant pair,
    the decoded dHash distance is 0; across classes at the same position
    it clears the 3-bit verify bar (measured min: 17)."""
    sampled = range(0, VIDEO_FRAMES, VIDEO_STRIDE)
    bits = {}
    for cls in range(VIDEO_CLASSES):
        for vi, (q, samp) in enumerate(VIDEO_VARIANTS):
            for f in sampled:
                px = class_grid_image(
                    VIDEO_SEED_BASE + cls * VIDEO_FRAMES + f,
                    width=36, height=32,
                )
                dec = jpeg_decode(jpeg_encode_rgb(px, quality=q, sampling=samp))
                bits[(cls, vi, f)] = _dhash_bits(dec)
    for cls in range(VIDEO_CLASSES):
        for f in sampled:
            for v1 in range(3):
                for v2 in range(v1 + 1, 3):
                    assert not (bits[(cls, v1, f)] ^ bits[(cls, v2, f)]).any()
    min_cross = 64
    for f in sampled:
        for c1 in range(VIDEO_CLASSES):
            for c2 in range(c1 + 1, VIDEO_CLASSES):
                d = int((bits[(c1, 0, f)] != bits[(c2, 0, f)]).sum())
                min_cross = min(min_cross, d)
    assert min_cross > 3, min_cross


@pytest.mark.parametrize("stride,n", [(2, 8), (3, 7), (1, 4), (4, 3)])
def test_video_frame_dhash_matches_reference(spark, stride, n):
    """Spark 1:N expansion == per-frame reference: exactly the sampled
    positions (0, stride, ...), band words equal to the direct decode."""
    import pandas as pd

    frames_px = [
        class_grid_image(500 + i, width=36, height=32) for i in range(n)
    ]
    frames = [jpeg_encode_rgb(px, quality=90) for px in frames_px]
    blob = avi_encode_mjpeg(frames, 36, 32)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [5], "blob": [bytearray(blob)]}),
        schema="doc_id bigint, blob binary",
    )
    rows = video_frame_dhash(df, stride=stride).collect()
    expect_idx = list(range(0, n, stride))
    assert sorted(r["frame_idx"] for r in rows) == expect_idx
    w16 = 1 << np.arange(16, dtype=np.int64)
    for r in rows:
        b = _dhash_bits(jpeg_decode(frames[r["frame_idx"]]))
        for j in range(4):
            assert r[f"b{j}"] == int((b[16 * j : 16 * (j + 1)] * w16).sum())
        assert r["doc_id"] == 5


def test_mixed_geometry_videos_in_one_batch(spark):
    """Videos of DIFFERENT dimensions and frame counts hash in one Arrow
    batch — each file's SOF0 declares its own geometry (the mixed-size
    contract of the image decoders, extended to the 1:N frame path)."""
    import pandas as pd

    specs = [(36, 32, 5), (18, 16, 3), (27, 24, 7)]
    rows = []
    for did, (w, h, n) in enumerate(specs):
        frames = [
            jpeg_encode_rgb(class_grid_image(700 + did * 10 + i,
                                             width=w, height=h), quality=90)
            for i in range(n)
        ]
        rows.append((did, bytearray(avi_encode_mjpeg(frames, w, h))))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [r[0] for r in rows],
                      "blob": [r[1] for r in rows]}),
        schema="doc_id bigint, blob binary",
    )
    got = video_frame_dhash(df, stride=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for did, (_w, _h, n) in enumerate(specs):
        assert sorted(by_doc[did]) == list(range(0, n, 2))


def test_stride_beyond_frame_count_samples_only_first(spark):
    import pandas as pd

    frames = [jpeg_encode_rgb(class_grid_image(800 + i, width=18, height=16),
                              quality=90) for i in range(3)]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0],
                      "blob": [bytearray(avi_encode_mjpeg(frames, 18, 16))]}),
        schema="doc_id bigint, blob binary",
    )
    rows = video_frame_dhash(df, stride=10).collect()
    assert [r["frame_idx"] for r in rows] == [0]
    with pytest.raises(ValueError, match="stride"):
        video_frame_dhash(df, stride=0)


def _rebuild_with_strl(good: bytes, strl_payload: bytes) -> bytes:
    """Re-assemble the writer's container with a hand-built strl payload
    (the avih chunk and everything outside hdrl kept verbatim)."""
    (riff_size,) = struct.unpack("<I", good[4:8])
    pos, parts = 12, []
    while pos + 8 < 8 + riff_size:
        (clen,) = struct.unpack("<I", good[pos + 4 : pos + 8])
        parts.append(good[pos : pos + 8 + clen + (clen & 1)])
        pos += 8 + clen + (clen & 1)
    hdrl_raw, movi_raw, idx1_raw = parts
    hp = hdrl_raw[12:]
    (avih_len,) = struct.unpack("<I", hp[4:8])
    avih_chunk = hp[: 8 + avih_len]
    hdrl2 = _list(b"hdrl", avih_chunk + _list(b"strl", strl_payload))
    body = b"AVI " + hdrl2 + movi_raw + idx1_raw
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_rejects_duplicate_and_short_stream_headers():
    """A second strh/strf INSIDE one strl must raise (last-one-wins would
    let a smuggled second header redefine the stream), and a short strh
    that still says 'vids' must fail with the module's ValueError
    contract, not a struct.error from the dwLength unpack."""
    frames = _frames(11, 3)
    good = avi_encode_mjpeg(frames, 18, 16)
    strl = good[good.find(b"strl") + 4 :]
    (strh_len,) = struct.unpack("<I", strl[4:8])
    strh_chunk = strl[: 8 + strh_len]
    strf_start = 8 + strh_len + (strh_len & 1)
    (strf_len,) = struct.unpack("<I", strl[strf_start + 4 : strf_start + 8])
    strf_chunk = strl[strf_start : strf_start + 8 + strf_len]
    assert strh_chunk[:4] == b"strh" and strf_chunk[:4] == b"strf"

    with pytest.raises(ValueError, match="duplicate strh"):
        avi_parse_mjpeg(
            _rebuild_with_strl(good, strh_chunk + strh_chunk + strf_chunk)
        )
    with pytest.raises(ValueError, match="duplicate strf"):
        avi_parse_mjpeg(
            _rebuild_with_strl(good, strh_chunk + strf_chunk + strf_chunk)
        )
    # short strh (8..35 bytes) beginning 'vids'+'MJPG': ValueError, never
    # a struct.error at the dwLength unpack
    for cut in (8, 20, 35):
        short = _chunk(b"strh", strh_chunk[8 : 8 + cut])
        with pytest.raises(ValueError, match="short strh"):
            avi_parse_mjpeg(_rebuild_with_strl(good, short + strf_chunk))
    # the round-trip control: the rebuilt container with the ORIGINAL
    # strl payload still parses to the same frames
    got, w, h = avi_parse_mjpeg(
        _rebuild_with_strl(good, strh_chunk + strf_chunk)
    )
    assert got == frames and (w, h) == (18, 16)


@pytest.mark.parametrize("stride,n", [(2, 8), (3, 7), (1, 4), (10, 3)])
def test_video_sample_frames_structural(spark, stride, n):
    """The extraction half without decode (`video_sample_frames`, the
    real container behind the re-pointed multimodal_frame_sample row):
    exactly the sampled positions, each carrying the cross-checked
    frame count and avih geometry."""
    import pandas as pd

    from robi_biometric_qdrant_vector_db_service_spark.operators.video import (
        video_sample_frames,
    )

    frames = [
        jpeg_encode_rgb(class_grid_image(900 + i, width=36, height=32),
                        quality=90)
        for i in range(n)
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [9], "blob": [bytearray(avi_encode_mjpeg(frames, 36, 32))]}),
        schema="doc_id bigint, blob binary",
    )
    rows = video_sample_frames(df, stride=stride).collect()
    assert sorted(r["frame_idx"] for r in rows) == list(range(0, n, stride))
    for r in rows:
        assert (r["doc_id"], r["n_frames"], r["width"], r["height"]) == (9, n, 36, 32)
    with pytest.raises(ValueError, match="stride"):
        video_sample_frames(df, stride=0)
