"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched Python
(mapInPandas) because codecs are not SQL.  This container has no
image/audio libraries, so the DECODE step is a deterministic fake (clearly
marked); everything Spark-side — schema, binary column handling, Arrow
batch shape, partition-parallel UDF execution — is real and tested.

Real-decoder integration point: replace ``_fake_decode_batch`` with e.g.
PIL/torchaudio calls; the plumbing (schema, batching, partitioning) does
not change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_SCHEMA = (
    "doc_id bigint, blob binary, media_type string, n_bytes bigint"
)

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, n_frames int, "
    "byte_checksum bigint"
)


def to_blob_table(docs: DataFrame) -> DataFrame:
    """Build the opaque-binary table from `documents` (utf-8 bytes stand in
    for encoded media; at scale this is `spark.read.format('binaryFile')`
    over an object store — SURVEY §2.1 S4)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("blob"),
        F.lit("image/fake").alias("media_type"),
        F.length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
    )


def _flatten(blobs: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One Arrow batch of binary rows → a single contiguous uint8 buffer +
    per-row (start, end, len) offsets — the zero-per-row-Python batch shape
    a real vectorized codec needs (one frombuffer, C-speed everywhere
    after)."""
    n = len(blobs)
    lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=n)
    data = (
        np.frombuffer(b"".join(bytes(b) for b in blobs), dtype=np.uint8)
        if n
        else np.empty(0, dtype=np.uint8)
    )
    ends = np.cumsum(lens)
    return data, ends - lens, ends, lens


def _segment_sums(data: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Per-segment byte sums via one int64 cumsum + two gathers (robust for
    empty segments, unlike add.reduceat)."""
    csum = np.concatenate(([0], np.cumsum(data, dtype=np.int64)))
    return csum[ends] - csum[starts]


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """PIPELINE-SHAPE BENCHMARK decoder (deterministic byte arithmetic,
    not a codec): prices the Arrow-batched 1:1 decode topology over the
    FULL corpus — the real-codec decodes (PNG/JPEG/WAV/AVI) run on
    planted fixed-size corpora, so this is the row that scales with the
    table.

    Derives "image" properties purely from the byte stream so results are
    reproducible and oracle-checkable:
      width  = n_bytes % 64 + 16
      height = n_bytes % 48 + 16
      n_frames = n_bytes // 100 + 1      (a fake video frame-sample count)
      byte_checksum = sum(bytes) % 1000003
    A real decoder would raise NotImplementedError here if bytes were a
    real codec stream; the arithmetic below exercises the same batch shape
    — fully vectorized (one flattened buffer, cumsum segment sums), no
    per-row Python.
    """
    data, starts, ends, lens = _flatten(pdf["blob"])
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": lens,
            "width": (lens % 64 + 16).astype("int32"),
            "height": (lens % 48 + 16).astype("int32"),
            "n_frames": (lens // 100 + 1).astype("int32"),
            "byte_checksum": _segment_sums(data, starts, ends) % 1000003,
        }
    )


def decode_features(blobs: DataFrame) -> DataFrame:
    """mapInPandas decode/feature-extract: Arrow batches of binary rows in,
    typed feature rows out.  Partition-parallel, no shuffle — the decode is
    a projection; downstream aggs shuffle the (small) features only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_batch(pdf)

    return blobs.mapInPandas(run, schema=FEATURE_SCHEMA)


RAW_I32_MAGIC = b"RI32"


def _raw_i32_encode(px: "np.ndarray") -> bytes:
    """Serialize an (h, w, 3) int array as the raw-pixel interchange blob
    a resize stage hands to a downstream decode/hash stage: 4-byte magic
    + <II width height + little-endian int32 pixel data.  int32 (not
    uint8) because an EXACT sum-pool resize carries block sums, which
    exceed 255 — the format a lossless pixel pipeline needs between
    stages."""
    import struct

    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"_raw_i32_encode: expected (h, w, 3), got {px.shape}")
    h, w = px.shape[:2]
    return (
        RAW_I32_MAGIC
        + struct.pack("<II", w, h)
        + px.astype("<i4").tobytes()
    )


def _raw_i32_pixels(blob: bytes) -> "np.ndarray":
    """(h, w, 3) int64 pixel array from one raw-i32 interchange blob."""
    import struct

    if blob[:4] != RAW_I32_MAGIC:
        raise ValueError("_raw_i32_pixels: not a raw-i32 pixel blob")
    w, h = struct.unpack("<II", blob[4:12])
    expect = 12 + w * h * 3 * 4
    if len(blob) != expect:
        raise ValueError(
            f"_raw_i32_pixels: {w}x{h} declares {expect} bytes, "
            f"{len(blob)} present"
        )
    return (
        np.frombuffer(blob, dtype="<i4", offset=12)
        .reshape(h, w, 3)
        .astype(np.int64)
    )


def resize_sum2_png(blobs: DataFrame) -> DataFrame:
    """REAL image resize (r16 VERDICT item 2 — the byte-span resize stub
    retires): mapInPandas binary→binary, each PNG blob decoded
    (``_png_pixels``: inflate + unfilter) and downsampled 2× by EXACT
    2x2 block-sum pooling, emitted as a raw-i32 pixel blob
    (``_raw_i32_encode``) for the next pipelined stage — resize → hash
    is two Arrow stages in ONE task, no shuffle between, the topology of
    a real thumbnail/feature pipeline at 100 TB.

    Sum pooling (not mean) is deliberate: it is closed over integers, so
    the resized image's 8x9 block grid equals exactly 4× the original's
    (Rec.601 luminance is linear in RGB and the grid cells of a 2×-
    divisible image align with the 2x2 pools) — which makes dHash
    PRESERVATION under resize an exact, oracle-checkable contract
    instead of an approximate one.  Odd dimensions fail loud: a
    production resampler handles them with fractional kernels; silently
    cropping a row would break the exactness contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_blobs, out_lens = [], []
            for blob in pdf["blob"]:
                px = _png_pixels(bytes(blob))
                h, w = px.shape[:2]
                if h % 2 or w % 2:
                    raise ValueError(
                        f"resize_sum2_png: 2x2 sum-pool needs even "
                        f"dimensions, got {w}x{h}"
                    )
                pooled = (
                    px.reshape(h // 2, 2, w // 2, 2, 3)
                    .sum(axis=(1, 3))
                )
                enc = _raw_i32_encode(pooled)
                out_blobs.append(enc)
                out_lens.append(len(enc))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "blob": out_blobs,
                    "media_type": "image/raw-i32",
                    "n_bytes": pd.Series(out_lens, dtype="int64"),
                }
            )

    return blobs.mapInPandas(run, schema=BLOB_SCHEMA)


DHASH_SCHEMA = "doc_id bigint, b0 bigint, b1 bigint, b2 bigint, b3 bigint"

# A GRID DECODER turns one flattened Arrow batch of blobs — (data, starts,
# ends, lens) as produced by ``_flatten`` — into a (n_rows, 8, 9) array of
# grayscale cell values.  Everything downstream of the grid (gradient bits,
# 16-bit band packing, the banded join, the popcount verify) is
# decoder-agnostic: swapping the decoder changes WHAT is hashed, never the
# hash layout or the pair pipeline (pinned in tests/test_multimodal.py).


def byte_span_grid(
    data: np.ndarray, starts: np.ndarray, ends: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """DEFAULT decoder — a PIPELINE-SHAPE BENCHMARK, not a codec: the 8x9
    "grayscale grid" is the byte stream split into 72 equal spans, cell =
    span byte-sum — deterministic and oracle-checkable, pricing the
    banded-Hamming plan at full-corpus scale with zero decode cost.  The
    real-codec members of the family are ``raw_png_grid`` /
    ``raw_jpeg_grid`` / ``raw_i32_grid`` (registered as
    ``image_png_phash_dups`` / ``image_jpeg_phash_dups`` /
    ``multimodal_resize``); this one stays registered as
    ``image_phash_dups`` because its corpus is every document, not a
    planted 240, so it is the row that exercises the join at size.  One
    flattened-buffer cumsum + one (rows x 73) boundary gather, no per-row
    Python."""
    grid_i = np.arange(73, dtype=np.int64)
    csum = np.concatenate(([0], np.cumsum(data, dtype=np.int64)))
    bounds = starts[:, None] + (lens[:, None] * grid_i) // 72
    cs = csum[bounds]
    return (cs[:, 1:] - cs[:, :-1]).reshape(-1, 8, 9)


def raw_rgb_grid(width: int, height: int):
    """Decoder factory for RAW 8-bit RGB blobs (row-major h x w x 3, the
    shape a real codec's decode step emits): 8x9 block-MEAN luminance grid
    — actual dHash downsampling, exercised on synthetic raw-RGB fixtures.
    Vectorized across the batch: blobs of one raw layout are fixed-size,
    so the flattened buffer reshapes to (n, h, w, 3) directly; luminance
    is integer Rec.601 (299R + 587G + 114B), and the 72 block means come
    from one 2-D integral image + a 9x10 boundary gather — no per-row or
    per-pixel Python.  A real codec (PIL/libjpeg) slots in the same way:
    decode to pixels, then this exact block-mean + packing path."""
    if width < 9 or height < 8:
        # mirror the loud wrong-size-blob contract (r14 ADVICE): an 8x9
        # grid over a smaller image yields zero-area blocks whose 0/0
        # means silently hash every undersized image to identical
        # all-zero bands — false hamming-0 duplicates
        raise ValueError(
            f"raw_rgb_grid: image must be at least 9x8 for an 8x9 block "
            f"grid, got {width}x{height}"
        )
    expect = width * height * 3

    def decode(
        data: np.ndarray, starts: np.ndarray, ends: np.ndarray, lens: np.ndarray
    ) -> np.ndarray:
        if len(lens) == 0:
            return np.empty((0, 8, 9), dtype=np.float64)
        if not np.all(lens == expect):
            bad = lens[lens != expect]
            raise ValueError(
                f"raw_rgb_grid({width}x{height}): expected {expect}-byte "
                f"raw RGB blobs, got lengths {bad[:5].tolist()}"
            )
        # _flatten concatenates rows in order, so the fixed-size segments
        # reshape without a gather
        img = data.reshape(len(lens), height, width, 3).astype(np.int64)
        luma = img[..., 0] * 299 + img[..., 1] * 587 + img[..., 2] * 114
        ii = np.zeros((len(lens), height + 1, width + 1), dtype=np.int64)
        ii[:, 1:, 1:] = luma.cumsum(axis=1).cumsum(axis=2)
        rb = (height * np.arange(9, dtype=np.int64)) // 8
        cb = (width * np.arange(10, dtype=np.int64)) // 9
        g = ii[:, rb][:, :, cb]
        block = g[:, 1:, 1:] - g[:, :-1, 1:] - g[:, 1:, :-1] + g[:, :-1, :-1]
        areas = np.diff(rb)[:, None] * np.diff(cb)[None, :]
        return block / areas

    return decode


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _filter_rows(s: "np.ndarray", ch: int, filt: int) -> bytes:
    """Filter an (h, w·ch) sample array into the filter-byte-prefixed raw
    scanline stream (one filter type for every row).  Vectorized: the
    predictor reads ORIGINAL neighbor samples, which equal the
    reconstructed ones during encoding.  ``ch`` is the pixel byte width
    — the left-neighbor offset of RFC 2083 §6."""
    s = s.astype(np.int64)
    h = s.shape[0]
    a = np.zeros_like(s)
    a[:, ch:] = s[:, :-ch]  # left neighbor (per channel)
    b = np.zeros_like(s)
    b[1:] = s[:-1]  # up neighbor
    c = np.zeros_like(s)
    c[1:, ch:] = s[:-1, :-ch]  # up-left neighbor
    if filt == 0:
        pred = np.zeros_like(s)
    elif filt == 1:
        pred = a
    elif filt == 2:
        pred = b
    elif filt == 3:
        pred = (a + b) // 2
    else:
        p = a + b - c
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    delta = ((s - pred) % 256).astype(np.uint8)
    return np.concatenate(
        [np.full((h, 1), filt, dtype=np.uint8), delta], axis=1
    ).tobytes()


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def png_encode_rgb(
    px: "np.ndarray", filt: int = 0, *, interlace: bool = False
) -> bytes:
    """Minimal stdlib PNG writer (8-bit truecolor, one filter type for
    every scanline, optional Adam7 interlacing): the engine-side encoder
    behind the synthetic compressed-image corpus (``workload_sources.
    image_png_phash_dups``) — a real corpus arrives already encoded, but
    the fixture tables carry text, so the query plants its own PNGs and
    the decoder must earn the pairs back through inflate + unfilter.
    The independent per-pixel encoder in tests/test_png_fuzz.py
    cross-checks the decoder, not this writer."""
    import struct
    import zlib

    h, w, ch = px.shape
    if ch != 3:
        raise ValueError(f"png_encode_rgb: expected 3 channels, got {ch}")
    if filt not in (0, 1, 2, 3, 4):
        raise ValueError(f"png_encode_rgb: unknown filter {filt}")
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.size:
                parts.append(
                    _filter_rows(sub.reshape(sub.shape[0], -1), 3, filt)
                )
        raw = b"".join(parts)
    else:
        raw = _filter_rows(px.reshape(h, w * 3), 3, filt)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1 if interlace else 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def png_encode_rgba(
    px: "np.ndarray", alpha: "np.ndarray", filt: int = 0
) -> bytes:
    """8-bit RGBA (color type 6) writer — ``px`` (h, w, 3) + ``alpha``
    (h, w) uint8.  The transparency-bearing fixture twin of the r18
    decoder surface: alpha 255 everywhere decodes to exactly ``px``
    (white-compositing identity), partial alpha exercises the exact
    integer compositing."""
    import struct
    import zlib

    h, w, ch = px.shape
    if ch != 3 or alpha.shape != (h, w):
        raise ValueError(
            f"png_encode_rgba: need (h,w,3) px + (h,w) alpha, got "
            f"{px.shape} / {alpha.shape}"
        )
    if filt not in (0, 1, 2, 3, 4):
        raise ValueError(f"png_encode_rgba: unknown filter {filt}")
    rgba = np.concatenate([px, alpha[..., None]], axis=2)
    raw = _filter_rows(rgba.reshape(h, w * 4), 4, filt)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def png_encode_palette(
    px: "np.ndarray", filt: int = 0, *, trns: list[int] | None = None
) -> bytes:
    """8-bit palette (color type 3) writer: palette = the image's unique
    colors in first-appearance order (≤ 256 or loud), scanlines carry
    indices.  ``trns`` prepends per-entry alpha values as a tRNS chunk
    (entries past it default opaque, as the decoder assumes).  The
    fixture twin of the most common web-PNG shape (icons, screenshots,
    logos are overwhelmingly palettized)."""
    import struct
    import zlib

    h, w, ch = px.shape
    if ch != 3:
        raise ValueError(f"png_encode_palette: expected 3 channels, got {ch}")
    if filt not in (0, 1, 2, 3, 4):
        raise ValueError(f"png_encode_palette: unknown filter {filt}")
    flat = px.reshape(-1, 3).astype(np.uint8)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    # first-appearance order (np.unique sorts): remap for a stable,
    # content-derived palette
    first = np.zeros(len(colors), dtype=np.int64)
    seen: dict[int, int] = {}
    order = []
    for i in idx:
        if int(i) not in seen:
            seen[int(i)] = len(order)
            order.append(int(i))
    for sorted_i, appear_i in seen.items():
        first[sorted_i] = appear_i
    if len(colors) > 256:
        raise ValueError(
            f"png_encode_palette: {len(colors)} distinct colors exceed the "
            "256-entry PLTE"
        )
    pal = colors[order]
    indices = first[idx].reshape(h, w)
    raw = _filter_rows(indices.reshape(h, w), 1, filt)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    out = _PNG_MAGIC + _png_chunk(b"IHDR", ihdr) + _png_chunk(
        b"PLTE", pal.astype(np.uint8).tobytes()
    )
    if trns is not None:
        if len(trns) > len(pal):
            raise ValueError(
                f"png_encode_palette: {len(trns)} tRNS entries for a "
                f"{len(pal)}-entry palette"
            )
        out += _png_chunk(b"tRNS", bytes(trns))
    return out + _png_chunk(
        b"IDAT", zlib.compress(raw)
    ) + _png_chunk(b"IEND", b"")


def class_grid_image(cls: int, *, width: int = 18, height: int = 16) -> "np.ndarray":
    """Deterministic well-separated (height, width, 3) uint8 image for
    planted-duplicate class ``cls``: the 72 block-mean luminances are a
    seeded permutation with adjacent gaps >= 3 luma units, so every class
    hashes to a distinct dHash and copies hash identically — the planted
    truth an exact pair oracle can state without replicating pixel math."""
    rng = np.random.default_rng(cls)
    base = rng.permutation(72).reshape(8, 9) * 3 + 20
    px = np.repeat(np.repeat(base, height // 8, axis=0), width // 9, axis=1)
    return np.stack([px, px, px], axis=-1).astype(np.uint8)


# Adam7 pass origins/strides (x0, y0, dx, dy) — RFC 2083 §2.6
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _unfilter_rows(raw: bytes, h: int, stride: int, ch: int) -> "np.ndarray":
    """Reconstruct ``h`` scanlines of ``stride`` samples from the
    filter-byte-prefixed raw stream (all five RFC 2083 §6 filters; the
    left-neighbor offset is the pixel's byte width ``ch``)."""
    recon = np.zeros((h, stride), dtype=np.int64)
    for y in range(h):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        f = row[0]
        line = np.frombuffer(row, dtype=np.uint8)[1:].astype(np.int64)
        prior = recon[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if f == 0:
            rec = line
        elif f == 2:  # Up — no left dependency, vectorizes
            rec = (line + prior) & 0xFF
        elif f in (1, 3, 4):  # Sub/Average/Paeth carry a left dependency
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prior[x]
                c = prior[x - ch] if x >= ch else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"raw_png_grid: unknown scanline filter {f}")
        recon[y] = rec
    return recon


def _composite_white(color: "np.ndarray", alpha: "np.ndarray") -> "np.ndarray":
    """Exact integer alpha compositing over WHITE — the deterministic
    perceptual-hash convention for transparency (pixels under alpha 0
    are arbitrary bytes; hashing them raw would split visually identical
    logos): nearest integer of (a·c + (255−a)·255) / 255 (255 is odd, so
    exact halves cannot occur and +127 floor-division IS round-to-
    nearest)."""
    return (alpha * color + (255 - alpha) * 255 + 127) // 255


def _png_pixels(blob: bytes) -> "np.ndarray":
    """(h, w, 3) int64 pixel array from one PNG byte string — pure stdlib
    (``zlib`` inflate + struct chunk walk + scanline unfilter), no codec
    libs.  Supported (r18 widened to what web crawls actually hold): bit
    depth 8, color types 0 (grayscale), 2 (truecolor RGB), 3 (palette,
    with optional tRNS transparency), 4 (grayscale+alpha), 6 (RGBA);
    non-interlaced AND Adam7-interlaced; all five scanline filters
    (None/Sub/Up/Average/Paeth, RFC 2083 §6).  Alpha composites over
    white by the exact integer convention of ``_composite_white``.
    Anything else — 16-bit depth, sub-byte palette depths, unknown
    filters, short/trailing IDAT bytes, palette indices past PLTE —
    fails loud with the offending field: corrupt or exotic files must
    never hash."""
    import struct
    import zlib

    if blob[:8] != _PNG_MAGIC:
        raise ValueError("raw_png_grid: not a PNG (bad signature)")
    pos, idat, hdr, plte, trns = 8, [], None, None, None
    while pos + 8 <= len(blob):
        (ln,), typ = struct.unpack(">I", blob[pos : pos + 4]), blob[pos + 4 : pos + 8]
        pos += 8
        chunk = blob[pos : pos + ln]
        pos += ln + 4  # payload + CRC (integrity is zlib's adler32's job here)
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", chunk)
        elif typ == b"PLTE":
            plte = chunk
        elif typ == b"tRNS":
            trns = chunk
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if hdr is None:
        raise ValueError("raw_png_grid: missing IHDR chunk")
    w, h, depth, ctype, comp, filt, interlace = hdr
    if (
        depth != 8
        or ctype not in _PNG_CHANNELS
        or comp
        or filt
        or interlace not in (0, 1)
    ):
        raise ValueError(
            f"raw_png_grid: unsupported PNG (depth={depth} color_type={ctype} "
            f"compression={comp} filter={filt} interlace={interlace}); "
            "supported: 8-bit color types 0/2/3/4/6, interlace 0/1"
        )
    ch = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    passes = ((0, 0, 1, 1),) if interlace == 0 else _ADAM7
    out = np.zeros((h, w, ch), dtype=np.int64)
    pos = 0
    for x0, y0, dx, dy in passes:
        wp = -(-(w - x0) // dx) if w > x0 else 0
        hp = -(-(h - y0) // dy) if h > y0 else 0
        if wp <= 0 or hp <= 0:
            continue  # empty pass contributes zero bytes (RFC 2083 §2.6)
        stride = wp * ch
        need = hp * (stride + 1)
        if len(raw) - pos < need:
            raise ValueError(
                f"raw_png_grid: IDAT stream is {len(raw)} bytes, short of "
                f"pass at ({x0},{y0}) needing {need} more"
            )
        recon = _unfilter_rows(raw[pos : pos + need], hp, stride, ch)
        pos += need
        out[y0::dy, x0::dx] = recon.reshape(hp, wp, ch)
    if pos != len(raw):
        raise ValueError(
            f"raw_png_grid: {len(raw) - pos} trailing IDAT bytes past the "
            "expected scanlines"
        )
    if ctype == 2:
        return out
    if ctype == 0:
        return np.repeat(out, 3, axis=2)
    if ctype == 6:
        return _composite_white(out[..., :3], out[..., 3:])
    if ctype == 4:
        gray = _composite_white(out[..., :1], out[..., 1:])
        return np.repeat(gray, 3, axis=2)
    # ctype 3: palette lookup, tRNS alpha (entries past the table are 255)
    if plte is None or len(plte) % 3 or not plte:
        raise ValueError(
            "raw_png_grid: palette PNG without a valid PLTE chunk"
        )
    pal = np.frombuffer(plte, dtype=np.uint8).astype(np.int64).reshape(-1, 3)
    idx = out[..., 0]
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError(
            f"raw_png_grid: palette index {int(idx.max())} past the "
            f"{len(pal)}-entry PLTE"
        )
    rgb = pal[idx]
    if trns:
        at = np.full(len(pal), 255, dtype=np.int64)
        t = np.frombuffer(trns, dtype=np.uint8).astype(np.int64)
        if len(t) > len(pal):
            raise ValueError(
                f"raw_png_grid: tRNS has {len(t)} entries for a "
                f"{len(pal)}-entry PLTE"
            )
        at[: len(t)] = t
        rgb = _composite_white(rgb, at[idx][..., None])
    return rgb


def _block_mean_grid(px: "np.ndarray", op_name: str) -> "np.ndarray":
    """Shared pixels -> 8x9 grid step of every real-codec GridDecoder:
    integer Rec.601 luminance, one 2-D integral image, 9x10 boundary
    gather — identical math to ``raw_rgb_grid``'s batched path, applied
    to one variable-size image."""
    h, w = px.shape[:2]
    if w < 9 or h < 8:
        raise ValueError(
            f"{op_name}: image must be at least 9x8 for an 8x9 "
            f"block grid, got {w}x{h}"
        )
    luma = px[..., 0] * 299 + px[..., 1] * 587 + px[..., 2] * 114
    ii = np.zeros((h + 1, w + 1), dtype=np.int64)
    ii[1:, 1:] = luma.cumsum(axis=0).cumsum(axis=1)
    rb = (h * np.arange(9, dtype=np.int64)) // 8
    cb = (w * np.arange(10, dtype=np.int64)) // 9
    g = ii[rb][:, cb]
    block = g[1:, 1:] - g[:-1, 1:] - g[1:, :-1] + g[:-1, :-1]
    areas = np.diff(rb)[:, None] * np.diff(cb)[None, :]
    return block / areas


def raw_png_grid(
    data: np.ndarray, starts: np.ndarray, ends: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """Third GridDecoder: REAL compressed-image decode, stdlib-only — PNG
    (zlib inflate + unfilter, ``_png_pixels``) then the identical integer
    Rec.601 luminance + 8x9 integral-image block means as ``raw_rgb_grid``
    (differential-pinned against it in tests/test_png_fuzz.py: encode the
    same pixels both ways, grids must match exactly).

    Unlike the raw-RGB factory, dimensions come from each file's IHDR, so
    blobs of MIXED sizes hash in one batch; each image must still be at
    least 9x8 for a non-degenerate block grid.  Decode is per-blob inside
    the Arrow batch (a zlib stream is inherently one file), the exact
    slot a vectorized codec library would fill; everything downstream is
    the shared decoder-agnostic packing."""
    grids = np.empty((len(lens), 8, 9), dtype=np.float64)
    for i, (s, e) in enumerate(zip(starts, ends)):
        px = _png_pixels(data[s:e].tobytes())
        grids[i] = _block_mean_grid(px, "raw_png_grid")
    return grids


def raw_i32_grid(
    data: np.ndarray, starts: np.ndarray, ends: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """GridDecoder for raw-i32 interchange blobs (``resize_sum2_png``'s
    output): parse the 12-byte header, reshape, and run the shared
    Rec.601 block-mean grid — the downstream half of the resize → hash
    pipeline.  Mixed sizes hash in one batch (each blob declares its own
    geometry, like PNG's IHDR / JPEG's SOF0)."""
    grids = np.empty((len(lens), 8, 9), dtype=np.float64)
    for i, (s, e) in enumerate(zip(starts, ends)):
        px = _raw_i32_pixels(data[s:e].tobytes())
        grids[i] = _block_mean_grid(px, "raw_i32_grid")
    return grids


def raw_jpeg_grid(
    data: np.ndarray, starts: np.ndarray, ends: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """Fourth GridDecoder: baseline JPEG (`operators.jpeg.jpeg_decode` —
    DHT/DQT read back from the file, Huffman bit-decode, vectorized
    dequant + IDCT, chroma upsample, YCbCr->RGB), then the shared
    Rec.601 block-mean grid.  With PNG this completes the two
    compressed-image families a real corpus carries; mixed sizes and
    mixed sampling factors hash in one batch because each file's SOF0
    declares its own geometry.  Decode is per-blob inside the Arrow
    batch (an entropy-coded scan is inherently one file); everything
    downstream is the shared decoder-agnostic packing."""
    from .jpeg import jpeg_decode

    grids = np.empty((len(lens), 8, 9), dtype=np.float64)
    for i, (s, e) in enumerate(zip(starts, ends)):
        px = jpeg_decode(data[s:e].tobytes())
        grids[i] = _block_mean_grid(px, "raw_jpeg_grid")
    return grids


def dhash_bands(blobs: DataFrame, *, decoder=byte_span_grid) -> DataFrame:
    """Perceptual difference-hash (dHash) of each opaque image blob, as
    four 16-bit band words — the banded layout the LSH candidate join and
    the popcount verify consume directly (same banded-Hamming shape as
    ``operators.ann.bq_hamming_rescore``'s packed words).

    dHash proper: downsample to an 8x9 grayscale grid, emit one bit per
    horizontally adjacent cell pair (left < right), 64 bits total —
    robust to re-encoding/resizing because it keys on gradient direction,
    not pixel values.  The grid extraction is PLUGGABLE (``decoder``, see
    the GridDecoder contract above): ``byte_span_grid`` (default — the
    honest stub for a codec-less image) and ``raw_rgb_grid`` (real
    block-mean downsampling over raw RGB) share every line of the packing
    and pair pipeline, so a production codec swaps in without touching
    anything downstream.

    Bit layout: cell index i in 0..71 is grid (r, c) = (i // 9, i % 9);
    bit (r, c) for c < 8 is 1 iff cell[r][c] < cell[r][c+1], bit index
    b = r*8 + c; band j (0..3) packs bits 16j..16j+15 little-endian.

    Fully vectorized per Arrow batch (each decoder documents its own
    vectorization; the packing is one comparison + one matmul-shaped
    sum).  Partition-parallel projection — no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w16 = 1 << np.arange(16, dtype=np.int64)
        for pdf in batches:
            data, starts, ends, lens = _flatten(pdf["blob"])
            cells = decoder(data, starts, ends, lens)
            bits = (cells[:, :, :-1] < cells[:, :, 1:]).reshape(-1, 64)
            out = {"doc_id": pdf["doc_id"]}
            for j in range(4):
                out[f"b{j}"] = (bits[:, 16 * j : 16 * (j + 1)] * w16).sum(axis=1)
            yield pd.DataFrame(out)

    return blobs.mapInPandas(run, schema=DHASH_SCHEMA)


def phash_dup_pairs(
    hashes: DataFrame,
    *,
    max_hamming: int = 3,
    keys: tuple[str, ...] = (),
    cache=None,
) -> DataFrame:
    """Image near-duplicate pairs by banded-Hamming join over dHash words:
    (doc_a < doc_b, hamming) for every pair within ``max_hamming`` bits.

    Candidate generation is EXACT for max_hamming <= 3 by pigeonhole —
    a pair differing in <= 3 of 64 bits has at most 3 of its 4 16-bit
    bands touched, so at least one band collides; recall is 1.0, no
    LSH tuning.  Verify recomputes the exact distance with JVM-side
    popcount (bit_count(xor)) over the four words.

    Scale: each doc contributes exactly 4 (band, val) rows, so the
    candidate self-join shuffles 4n rows on (band, val) — the banded-
    bucket shape of the MinHash-LSH family (workload_dedup), never
    all-pairs; the verify joins the 5-column hash table twice keyed on
    doc id (AQE broadcasts the candidate side when it fits).  Band-value
    skew (e.g. flat images hashing to band 0) is the same DF_CAP story
    as the text LSH — a hot bucket caps at |bucket| choose 2 candidates
    that the exact verify then prunes.  Declaratively the hash table is
    recomputed per join leg; at 100 TB you materialize it once (32
    bytes/doc — a rounding error next to the blobs) and every leg reads
    the persisted column instead of re-decoding.

    ``keys``: extra equality columns that scope the banded join — e.g.
    ``("frame_idx",)`` makes the unit of comparison (doc, frame) instead
    of doc, which is how the video family compares per-sampled-frame
    hashes only against the SAME frame position of other videos.  Output
    columns are (doc_a, doc_b, *keys, hamming).

    ``cache`` (e.g. ``lambda df: track_scratch(df.persist())``)
    materializes the hash table once — the plan otherwise re-evaluates
    the decode chain for BOTH legs of the candidate self-join AND both
    verify fetches (4 full decode passes, measured in plans/r18); this
    is the "materialize it once" posture the paragraph above prices,
    applied per invocation."""
    if cache is not None:
        hashes = cache(hashes)
    kc = list(keys)
    bands = hashes.selectExpr(
        "doc_id", *kc, "stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (band, val)"
    )
    cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.val") == F.col("b.val"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    for k in kc:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), cond)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            *[F.col(f"a.{k}").alias(k) for k in kc],
        )
        .distinct()
    )
    ha = hashes.select(
        F.col("doc_id").alias("doc_a"),
        *kc,
        *[F.col(f"b{j}").alias(f"a{j}") for j in range(4)],
    )
    hb = hashes.select(
        F.col("doc_id").alias("doc_b"),
        *kc,
        *[F.col(f"b{j}").alias(f"c{j}") for j in range(4)],
    )
    ham = sum(
        F.bit_count(F.col(f"a{j}").bitwiseXOR(F.col(f"c{j}"))) for j in range(4)
    )
    return (
        cand.join(ha, ["doc_a", *kc])
        .join(hb, ["doc_b", *kc])
        .withColumn("hamming", ham.cast("bigint"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", *kc, "hamming")
    )




def fingerprint_offset_pairs(
    fps: DataFrame, *, max_hamming: int = 3, min_frames: int = 1, cache=None
) -> DataFrame:
    """Offset-histogram fingerprint matching — the TIME-SHIFTED sibling of
    ``phash_dup_pairs(keys=("frame_idx",))``: where the keyed join
    compares only SAME-position frames (right for videos cut from the
    same reel), this one lets a frame match at ANY position of the other
    doc and then histograms the alignment, the classic
    Shazam/Haitsma-Kalker recovery for clips that were trimmed or padded
    before re-encoding.

    Input is any per-frame hash table (doc_id, frame_idx, b0..b3 — e.g.
    ``audio.audio_frame_fingerprints``).  Output: one row per
    (doc_a < doc_b, frame_offset = frame_a - frame_b) whose aligned
    frame-pair count reaches ``min_frames``, with the count and the
    worst verified distance: (doc_a, doc_b, frame_offset, n_frames,
    max_hamming).  A genuine shifted copy concentrates its matches at
    ONE offset (n_frames ~ the overlap length); chance collisions
    scatter across offsets and die on ``min_frames``.

    Plan shape is the audited banded-Hamming discipline: candidates come
    from a 4-rows-per-frame (band, val) equality self-join (recall
    exactly 1.0 at <= 3 bits by pigeonhole, never all-pairs), the verify
    is JVM popcount over the four words, and the histogram is one
    group-by on (pair, offset).  Frame volume is the knob: the caller's
    hop controls rows per clip; a hot band bucket (e.g. silence frames)
    is the same bounded |bucket|^2-candidates-then-exact-verify story as
    every LSH family member.  ``cache`` materializes the per-frame hash
    table once (see ``phash_dup_pairs`` — same 4-leg re-decode
    otherwise)."""
    if cache is not None:
        fps = cache(fps)
    bands = fps.selectExpr(
        "doc_id",
        "frame_idx",
        "stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (band, val)",
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.frame_idx").alias("frame_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.frame_idx").alias("frame_b"),
        )
        .distinct()
    )
    ha = fps.select(
        F.col("doc_id").alias("doc_a"),
        F.col("frame_idx").alias("frame_a"),
        *[F.col(f"b{j}").alias(f"a{j}") for j in range(4)],
    )
    hb = fps.select(
        F.col("doc_id").alias("doc_b"),
        F.col("frame_idx").alias("frame_b"),
        *[F.col(f"b{j}").alias(f"c{j}") for j in range(4)],
    )
    ham = sum(
        F.bit_count(F.col(f"a{j}").bitwiseXOR(F.col(f"c{j}"))) for j in range(4)
    )
    return (
        cand.join(ha, ["doc_a", "frame_a"])
        .join(hb, ["doc_b", "frame_b"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .groupBy(
            "doc_a",
            "doc_b",
            (F.col("frame_a") - F.col("frame_b")).cast("int").alias("frame_offset"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_frames"),
            F.max("hamming").cast("bigint").alias("max_hamming"),
        )
        .filter(F.col("n_frames") >= min_frames)
    )
