"""JPEG codec — pure stdlib + NumPy, no codec libraries.

Closes the r14 VERDICT "What's missing #2" remainder: after r15's PNG
decoder, JPEG was the one compressed-image family the pluggable dHash
decoder (`operators.multimodal.dhash_bands`) could not hash.  This module
implements the ITU-T T.81 BASELINE process end-to-end, and (r17, closing
the r16 VERDICT gap #5 — progressive is what web encoders emit by
default, so a 100 TB crawl dedup cannot gate on it) the PROGRESSIVE
(SOF2) Huffman process: spectral selection AND successive approximation,
interleaved/single-component DC scans with raw-bit refinement, EOBn
runs, refinement correction bits, per-scan DHT redefinition — decode via
the same `jpeg_decode` entry (dispatch on the SOF marker), encode via
`jpeg_encode_rgb_progressive` (the libjpeg-shaped 10-scan script).  Both
encoders share the FDCT/quantize front half, so progressive and baseline
encodes of one image decode to EXACTLY the same pixels — the
differential tests/test_jpeg_progressive_fuzz.py pins.

- `jpeg_encode_rgb(px, quality, sampling)` — the engine-side encoder
  behind the synthetic compressed-image corpus (fixture tables carry
  text, so the registered query plants its own JPEGs, exactly like the
  PNG twin `workload_sources.image_png_phash_dups`): JFIF headers,
  quality-scaled Annex-K quantization tables, the four standard Annex-K
  Huffman tables, optional 4:2:0 / 4:2:2 chroma subsampling
  (box-average), level shift + orthonormal FDCT as two matmuls over ALL
  blocks at once, zigzag run-length + canonical Huffman entropy coding,
  0xFF byte stuffing.
- `jpeg_decode(blob)` — marker walk (SOI/APPn/COM/DQT/SOF0/DHT/SOS/EOI),
  canonical Huffman tables rebuilt from the file's own DHT segments into
  a 16-bit peek LUT, sequential bit-decode of the entropy stream (the
  one inherently serial step of any JPEG — per blob, inside the Arrow
  batch), then vectorized dezigzag + dequantize + IDCT (two matmuls over
  all blocks), MCU-interleave plane reassembly, nearest-neighbor chroma
  upsample, JFIF YCbCr -> RGB.  Restart intervals (DRI/RSTn — what
  digital cameras and hardware encoders emit routinely) decode on both
  the baseline and progressive paths (r18): the entropy stream splits at
  RSTn markers, DC predictors reset and the bit reader re-aligns per
  segment.  Anything outside the supported subset (extended-sequential
  SOF1, 12-bit precision, arithmetic coding) fails loud with the
  offending marker — corrupt or exotic streams must never hash.

The encoder clamps quantized AC coefficients to the baseline-encodable
range [-1023, 1023] (Huffman size classes stop at 10 bits; only
adversarial full-amplitude checkerboards exceed it, and JPEG is lossy by
contract).  Encoder and decoder are deliberately independent paths — the
decoder trusts nothing but the bytes (quantization and Huffman tables are
read back from DQT/DHT, never shared in memory), so the round-trip fuzz
in tests/test_jpeg_fuzz.py certifies the wire format, not a shared
in-process model.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Shared constants (ITU-T T.81 Annex K — public spec data)
# --------------------------------------------------------------------------

# K.1 luminance / K.2 chrominance quantization tables (natural order).
_QTBL_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

_QTBL_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)


def _zigzag_order() -> np.ndarray:
    """_ZIGZAG[k] = natural (row-major) index of the k-th zigzag coeff."""
    idx = np.empty(64, dtype=np.int64)
    r = c = 0
    for k in range(64):
        idx[k] = r * 8 + c
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return idx


_ZIGZAG = _zigzag_order()

# K.3 standard Huffman specs as (bits[1..16], huffval) — written to DHT by
# the encoder and (independently) read back from DHT by the decoder.
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis: row u, column x."""
    x = np.arange(8)
    m = np.cos((2 * x[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16)
    m *= np.sqrt(2.0 / 8.0)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m


_DCT = _dct_matrix()

_SAMPLINGS = {
    "4:4:4": (1, 1),
    "4:2:2": (2, 1),
    "4:2:0": (2, 2),
}


def _scaled_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling: 5000/q below 50, 200-2q at or
    above; entries clamped to [1, 255] (baseline DQT is 8-bit)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"jpeg: quality must be in [1, 100], got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


def _canonical_codes(
    bits: list[int], vals: list[int]
) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical assignment (T.81 C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


class _BitWriter:
    """Entropy-stream bit accumulator with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


def _category(v: int) -> int:
    """Size class of a DC diff / AC amplitude: bits needed for |v|."""
    return int(abs(v)).bit_length()


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) plane (multiples of 8) -> (n, 8, 8) in raster block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _segment(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _encode_block(
    writer: _BitWriter,
    zz: np.ndarray,
    prev_dc: list[int],
    ci: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> None:
    dc = int(zz[0])
    diff = dc - prev_dc[ci]
    prev_dc[ci] = dc
    size = _category(diff)
    code, length = dc_codes[size]
    writer.put(code, length)
    if size:
        amp = diff if diff > 0 else diff + (1 << size) - 1
        writer.put(amp, size)
    nz = np.nonzero(zz[1:])[0]
    last_nz = int(nz[-1]) + 1 if len(nz) else 0
    run = 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.put(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        writer.put(code, length)
        amp = v if v > 0 else v + (1 << size) - 1
        writer.put(amp, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.put(code, length)


def _quantized_planes(
    px: np.ndarray, quality: int, sampling: str, op: str
) -> tuple[list[np.ndarray], list[int], list[np.ndarray], int, int, int, int]:
    """Shared front half of BOTH encoders (baseline and progressive —
    identical quantized coefficients is what makes the cross-codec
    decode differential in tests/test_jpeg_progressive_fuzz.py exact):
    RGB -> YCbCr -> MCU-grid pad -> chroma box-average -> FDCT ->
    quantize -> zigzag.  Returns (per-component zigzag blocks,
    per-component block-row widths, the two qtables, h, w, hp, wp)."""
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"{op}: expected (h, w, 3), got {px.shape}")
    if sampling not in _SAMPLINGS:
        raise ValueError(
            f"{op}: unknown sampling {sampling!r}; "
            f"supported: {sorted(_SAMPLINGS)}"
        )
    hmax, vmax = _SAMPLINGS[sampling]
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError(f"{op}: empty image")

    # JFIF RGB -> YCbCr
    rgb = px.astype(np.float64)
    ycc = [
        0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2],
        -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1]
        + 0.5 * rgb[..., 2] + 128.0,
        0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1]
        - 0.081312 * rgb[..., 2] + 128.0,
    ]

    # pad the full image to the MCU grid by edge replication, then
    # box-average chroma down to its sampling factors
    mcu_h, mcu_w = 8 * vmax, 8 * hmax
    planes = [
        np.pad(c, ((0, -h % mcu_h), (0, -w % mcu_w)), mode="edge") for c in ycc
    ]
    hp, wp = planes[0].shape
    if (hmax, vmax) != (1, 1):
        for i in (1, 2):
            planes[i] = (
                planes[i]
                .reshape(hp // vmax, vmax, wp // hmax, hmax)
                .mean(axis=(1, 3))
            )

    qt = [_scaled_qtable(_QTBL_LUMA, quality),
          _scaled_qtable(_QTBL_CHROMA, quality)]

    # FDCT + quantize every component's blocks at once (two matmuls)
    comp_zz: list[np.ndarray] = []
    comp_nblk_w: list[int] = []
    for ci, plane in enumerate(planes):
        blocks = _plane_blocks(plane - 128.0)
        coeff = _DCT @ blocks @ _DCT.T
        quant = np.round(coeff / qt[0 if ci == 0 else 1].reshape(8, 8))
        quant = np.clip(quant, -1023, 1023).astype(np.int64)
        comp_zz.append(quant.reshape(-1, 64)[:, _ZIGZAG])
        comp_nblk_w.append(plane.shape[1] // 8)
    return comp_zz, comp_nblk_w, qt, h, w, hp, wp


def jpeg_encode_rgb(
    px: np.ndarray, quality: int = 90, sampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline JFIF JPEG.

    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker every
    that many MCUs (DC predictors reset, entropy stream re-byte-aligned —
    T.81 E.2.4), the layout digital cameras and most hardware encoders
    produce; the quantized coefficients are unchanged, so decoding a
    restart-interval encode MUST give exactly the same pixels as the
    plain encode (tests/test_jpeg_restart_fuzz.py pins the differential)."""
    comp_zz, comp_nblk_w, qt, h, w, hp, wp = _quantized_planes(
        px, quality, sampling, "jpeg_encode_rgb"
    )
    hmax, vmax = _SAMPLINGS[sampling]
    mcu_h, mcu_w = 8 * vmax, 8 * hmax

    # entropy-code in MCU interleave order
    dc_codes = [_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
                _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_codes = [_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
                _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]
    samp = [(hmax, vmax), (1, 1), (1, 1)]
    mcus_x, mcus_y = wp // mcu_w, hp // mcu_h
    chunks: list[bytes] = []
    writer = _BitWriter()
    prev_dc = [0, 0, 0]
    rst_n = 0
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                chunks.append(writer.flush())
                chunks.append(bytes([0xFF, 0xD0 + (rst_n % 8)]))
                rst_n += 1
                writer = _BitWriter()
                prev_dc = [0, 0, 0]
            for ci in range(3):
                ch, cv = samp[ci]
                tbl = 0 if ci == 0 else 1
                for by in range(cv):
                    for bx in range(ch):
                        zz = comp_zz[ci][
                            (my * cv + by) * comp_nblk_w[ci] + (mx * ch + bx)
                        ]
                        _encode_block(
                            writer, zz, prev_dc, ci, dc_codes[tbl], ac_codes[tbl]
                        )
            mcu_i += 1
    chunks.append(writer.flush())
    scan = b"".join(chunks)

    # ---- file assembly ----
    out = bytearray(b"\xff\xd8")  # SOI
    out += _segment(
        0xE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    )
    for tid, q in enumerate(qt):
        out += _segment(0xDB, bytes([tid]) + bytes(int(v) for v in q[_ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci in range(3):
        chs, cvs = samp[ci]
        sof += bytes([ci + 1, (chs << 4) | cvs, 0 if ci == 0 else 1])
    out += _segment(0xC0, sof)
    for cls, tid, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        out += _segment(
            0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )
    if restart_interval:
        out += _segment(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3])
    for ci in range(3):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += _segment(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_encode_gray(
    px: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """Single-component (grayscale) baseline JPEG — what scanners and
    document pipelines emit; the decoder's 1-component path
    (``len(planes) == 1`` replication) existed since r15 with no encoder
    to exercise it on the planted corpora (r18).  ``px``: (h, w) uint8
    luma, or (h, w, 3) with equal channels (the planted grid images'
    shape).  The luma samples ARE the component — no color transform —
    so for gray content the Y coefficients match the color encoder's
    exactly (same qtable, same FDCT), which is what keeps the planted
    dedup hashes invariant across the gray/color variants.
    ``restart_interval`` emits DRI + RSTn every N MCUs (one 8×8 block
    each in a single-component frame) like the color encoder."""
    if px.ndim == 3:
        if not (
            np.array_equal(px[..., 0], px[..., 1])
            and np.array_equal(px[..., 1], px[..., 2])
        ):
            raise ValueError(
                "jpeg_encode_gray: (h, w, 3) input must have equal "
                "channels (gray content)"
            )
        px = px[..., 0]
    if px.ndim != 2:
        raise ValueError(
            f"jpeg_encode_gray: expected (h, w) or gray (h, w, 3), got "
            f"{px.shape}"
        )
    h, w = px.shape
    if h == 0 or w == 0:
        raise ValueError("jpeg_encode_gray: empty image")
    plane = np.pad(
        px.astype(np.float64), ((0, -h % 8), (0, -w % 8)), mode="edge"
    )
    hp, wp = plane.shape
    qt = _scaled_qtable(_QTBL_LUMA, quality)
    blocks = _plane_blocks(plane - 128.0)
    coeff = _DCT @ blocks @ _DCT.T
    quant = np.clip(np.round(coeff / qt.reshape(8, 8)), -1023, 1023).astype(
        np.int64
    )
    zz = quant.reshape(-1, 64)[:, _ZIGZAG]

    dc_codes = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    chunks: list[bytes] = []
    writer = _BitWriter()
    prev_dc = [0]
    rst_n = 0
    for mcu_i in range(len(zz)):  # MCU = one 8x8 block, raster order
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            chunks.append(writer.flush())
            chunks.append(bytes([0xFF, 0xD0 + (rst_n % 8)]))
            rst_n += 1
            writer = _BitWriter()
            prev_dc = [0]
        _encode_block(writer, zz[mcu_i], prev_dc, 0, dc_codes, ac_codes)
    chunks.append(writer.flush())
    scan = b"".join(chunks)

    out = bytearray(b"\xff\xd8")
    out += _segment(
        0xE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    )
    out += _segment(0xDB, bytes([0]) + bytes(int(v) for v in qt[_ZIGZAG]))
    out += _segment(
        0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    )
    for cls, bits, vals in (
        (0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, _AC_LUMA_BITS, _AC_LUMA_VALS),
    ):
        out += _segment(0xC4, bytes([cls << 4]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _segment(0xDD, struct.pack(">H", restart_interval))
    out += _segment(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over the unstuffed entropy stream.

    peek16[i] = the 16 bits starting at bit i (zero-padded past the end of
    the stream), precomputed vectorized so every symbol decode is two array
    gathers.  The table is built one WINDOW at a time directly from the
    byte array, so peak memory is bounded at ~2 MiB of uint16 peek values
    plus one window of unpacked bits — independent of stream size (a full
    precompute would cost 16x the entropy-stream size and blow up on
    multi-MB real-world JPEGs inside mapInPandas).  Window reloads are
    rare (one per 2^20 bits) and each is the same vectorized 16-pass
    build, so total work matches the full-precompute strategy."""

    WINDOW = 1 << 20  # bits per precomputed peek window

    def __init__(self, data: bytes) -> None:
        self.data = np.frombuffer(data, dtype=np.uint8)
        self.nbits = len(data) * 8
        self.pos = 0
        self.base = 0
        self.peek: np.ndarray = np.zeros(0, dtype=np.uint16)
        if self.nbits:
            self._load(0)

    def _load(self, base: int) -> None:
        """Precompute peek16 for bits [base, base+WINDOW), reading 16 bits
        of genuine lookahead past the window end (zero-pad only past the
        true end of the stream)."""
        n = min(self.WINDOW, self.nbits - base)
        lo_byte = base >> 3
        hi_byte = min((min(base + n, self.nbits) + 16 + 7) >> 3, len(self.data))
        bits = np.unpackbits(self.data[lo_byte:hi_byte])
        off = base - (lo_byte << 3)
        padded = np.concatenate(
            [bits[off:], np.zeros(16, dtype=np.uint8)]
        ).astype(np.uint16)
        # 16 shift-or passes: after pass k, acc[i] holds bits i..i+k in its
        # low k+1 positions — uint16 never overflows (max position 15).
        acc = np.zeros(n, dtype=np.uint16)
        for k in range(16):
            acc = (acc << 1) | padded[k : k + n]
        self.peek = acc
        self.base = base

    def _peek_at(self, pos: int) -> int:
        if not (self.base <= pos < self.base + len(self.peek)):
            self._load(pos)
        return int(self.peek[pos - self.base])

    def peek16(self) -> int:
        if self.pos >= self.nbits:
            raise ValueError("jpeg_decode: entropy stream truncated")
        return self._peek_at(self.pos)

    def skip(self, n: int) -> None:
        self.pos += n
        if self.pos > self.nbits:
            raise ValueError("jpeg_decode: entropy stream truncated")

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise ValueError("jpeg_decode: entropy stream truncated")
        v = self._peek_at(self.pos) >> (16 - n)
        self.pos += n
        return v


def _extend(v: int, size: int) -> int:
    """T.81 F.12 EXTEND: map the raw size-bit amplitude to its signed
    value (low half of the range is negative)."""
    if size and v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def _build_lut(bits: list[int], vals: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """Canonical Huffman spec -> 16-bit peek LUT: sym[peek], len[peek]."""
    if len(vals) != sum(bits):
        raise ValueError(
            f"jpeg_decode: truncated or inconsistent DHT "
            f"({sum(bits)} codes declared, {len(vals)} values present)"
        )
    sym = np.full(1 << 16, -1, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.int8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return sym, ln


def _decode_sym(reader: _BitReader, sym: np.ndarray, ln: np.ndarray) -> int:
    peek = reader.peek16()
    s = int(sym[peek])
    if s < 0:
        raise ValueError("jpeg_decode: invalid Huffman code in entropy stream")
    reader.skip(int(ln[peek]))
    return s


def _find_sof(blob: bytes) -> int | None:
    """Cheap pre-walk: the frame type marker (0xC0..0xCF family), or None.
    Stops at SOS — SOF always precedes it in a well-formed stream."""
    pos = 2
    while pos + 2 <= len(blob):
        if blob[pos] != 0xFF:
            return None
        while pos + 1 < len(blob) and blob[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(blob):
            return None
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9 or marker == 0xDA:
            return None
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return marker
        if pos + 2 > len(blob):
            return None
        (seglen,) = struct.unpack(">H", blob[pos : pos + 2])
        pos += seglen
    return None


def jpeg_decode(blob: bytes) -> np.ndarray:
    """Decode one JFIF JPEG byte string to (h, w, 3) int64 RGB — baseline
    sequential (SOF0) or progressive (SOF2, r17); everything else stays
    loud."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("jpeg_decode: not a JPEG (missing SOI)")
    if _find_sof(blob) == 0xC2:
        return _decode_progressive(blob)
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    frame = None
    scan_comps = None
    scan_start = None
    restart_interval = 0
    while pos + 2 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(
                f"jpeg_decode: expected marker at byte {pos}, got {blob[pos]:#x}"
            )
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        # id — skip them so padded-but-valid files don't misread 0xFF as
        # the marker and consume a bogus segment length.
        while pos + 1 < len(blob) and blob[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(blob):
            break
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before any scan
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / bare RSTn
            continue
        if pos + 2 > len(blob):
            raise ValueError("jpeg_decode: truncated segment header")
        (seglen,) = struct.unpack(">H", blob[pos : pos + 2])
        seg = blob[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError(
                f"jpeg_decode: truncated segment (marker {marker:#x} declares "
                f"{seglen - 2} payload bytes, {len(seg)} present)"
            )
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("jpeg_decode: 16-bit DQT is not baseline")
                zz = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                if len(zz) != 64:
                    raise ValueError("jpeg_decode: truncated DQT segment")
                nat = np.empty(64, dtype=np.int64)
                nat[_ZIGZAG] = zz
                qtables[tq] = nat
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                huff[(cls, tid)] = _build_lut(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline sequential
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(
                    f"jpeg_decode: {prec}-bit precision is not baseline"
                )
            if nc not in (1, 3):
                raise ValueError(
                    f"jpeg_decode: {nc}-component frames unsupported"
                )
            comps = []
            for i in range(nc):
                cid, hv, qid = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, qid))
            frame = (fh, fw, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"jpeg_decode: SOF marker {marker:#x} is not baseline "
                "sequential (progressive/extended/arithmetic unsupported)"
            )
        elif marker == 0xDD:  # DRI (r18: restart intervals decoded)
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cid, tids = seg[1 + 2 * i : 3 + 2 * i]
                scan_comps.append((cid, tids >> 4, tids & 0x0F))
            scan_start = pos + seglen
            break
        # APPn / COM / other tables: skip
        pos += seglen
    if frame is None or scan_comps is None or scan_start is None:
        raise ValueError("jpeg_decode: missing SOF0 or SOS")
    fh, fw, comps = frame
    if fh == 0 or fw == 0:
        raise ValueError("jpeg_decode: zero-sized frame")
    if len(scan_comps) != len(comps):
        raise ValueError(
            "jpeg_decode: partial scans unsupported (baseline is one "
            "interleaved scan)"
        )

    # unstuff the entropy stream up to the next real marker, split at
    # restart markers (one segment per restart interval)
    segs, rsts, _ = _unstuff_entropy_segments(blob, scan_start)

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1:
        raise ValueError("jpeg_decode: zero sampling factor")
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    comp_by_id = {c[0]: c for c in comps}
    order = []
    for cid, dc_t, ac_t in scan_comps:
        if cid not in comp_by_id:
            raise ValueError(
                f"jpeg_decode: SOS references unknown component {cid}"
            )
        if (0, dc_t) not in huff or (1, ac_t) not in huff:
            raise ValueError("jpeg_decode: scan references a missing DHT table")
        order.append((comp_by_id[cid], dc_t, ac_t))

    _check_restart_run(segs, rsts, mcus_x * mcus_y, restart_interval)
    reader = _BitReader(segs[0])

    # --- the one serial step: Huffman-decode all blocks in MCU order ---
    blocks: list[list[np.ndarray]] = [[] for _ in order]
    prev_dc = [0] * len(order)
    for mcu_i in range(mcus_x * mcus_y):
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            # RSTn boundary: fresh byte-aligned entropy segment, DC
            # predictors reset (E.2.4 / F.2.1.3.1)
            reader = _BitReader(segs[mcu_i // restart_interval])
            prev_dc = [0] * len(order)
        for ci, ((_cid, hs, vs, _qid), dc_t, ac_t) in enumerate(order):
            dsym, dlen = huff[(0, dc_t)]
            asym, alen = huff[(1, ac_t)]
            for _b in range(hs * vs):
                zz = np.zeros(64, dtype=np.int64)
                s = _decode_sym(reader, dsym, dlen)
                prev_dc[ci] += _extend(reader.receive(s), s)
                zz[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    rs = _decode_sym(reader, asym, alen)
                    run, size = rs >> 4, rs & 0x0F
                    if size == 0:
                        if run == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += run
                    if k > 63:
                        raise ValueError(
                            "jpeg_decode: AC run overran the block"
                        )
                    zz[k] = _extend(reader.receive(size), size)
                    k += 1
                blocks[ci].append(zz)

    # --- vectorized reconstruction per component ---
    planes = []
    for ci, ((_cid, hs, vs, qid), _dc_t, _ac_t) in enumerate(order):
        if qid not in qtables:
            raise ValueError(f"jpeg_decode: missing DQT table {qid}")
        zzb = np.stack(blocks[ci])  # (n, 64) zigzag order
        nat = np.empty_like(zzb)
        nat[:, _ZIGZAG] = zzb
        coeff = (nat * qtables[qid][None, :]).reshape(-1, 8, 8).astype(np.float64)
        pix = _DCT.T @ coeff @ _DCT + 128.0
        arr = pix.reshape(mcus_y, mcus_x, vs, hs, 8, 8)
        plane = arr.transpose(0, 2, 4, 1, 3, 5).reshape(
            mcus_y * vs * 8, mcus_x * hs * 8
        )
        ch = -(-fh * vs // vmax)  # ceil(fh * vs / vmax): component height
        cw = -(-fw * hs // hmax)
        plane = plane[:ch, :cw]
        if vs != vmax or hs != hmax:
            if vmax % vs or hmax % hs:
                raise ValueError(
                    f"jpeg_decode: non-integer sampling ratio "
                    f"({hs}x{vs} vs max {hmax}x{vmax}) unsupported"
                )
            plane = np.repeat(
                np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
            )
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        y = planes[0]
        rgb = np.stack([y, y, y], axis=-1)
    else:
        y, cb, cr = planes
        rgb = np.stack(
            [
                y + 1.402 * (cr - 128.0),
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                y + 1.772 * (cb - 128.0),
            ],
            axis=-1,
        )
    return np.clip(np.round(rgb), 0, 255).astype(np.int64)


# --------------------------------------------------------------------------
# Progressive (SOF2) — spectral selection + successive approximation
# --------------------------------------------------------------------------

# The libjpeg-shaped default scan script for 3-component YCbCr: DC first
# at reduced precision, luma's low band early (the "image appears fast"
# property progressive exists for), then successive-approximation
# refinements down to full precision.  (component indices, Ss, Se, Ah, Al)
_PROGRESSIVE_SCRIPT = (
    ((0, 1, 2), 0, 0, 0, 1),   # DC, first pass, Al=1
    ((0,), 1, 5, 0, 2),        # Y  AC 1-5, first, Al=2
    ((2,), 1, 63, 0, 1),       # Cr AC, first, Al=1
    ((1,), 1, 63, 0, 1),       # Cb AC, first, Al=1
    ((0,), 6, 63, 0, 2),       # Y  AC 6-63, first, Al=2
    ((0,), 1, 63, 2, 1),       # Y  AC refine 2->1
    ((0, 1, 2), 0, 0, 1, 0),   # DC refine 1->0 (raw bits, no Huffman)
    ((2,), 1, 63, 1, 0),       # Cr AC refine 1->0
    ((1,), 1, 63, 1, 0),       # Cb AC refine 1->0
    ((0,), 1, 63, 1, 0),       # Y  AC refine 1->0
)


def _flat_table(symbols: set[int]) -> tuple[list[int], list[int]]:
    """A valid canonical Huffman spec assigning every symbol the same code
    length — the smallest L with len(symbols) < 2^L, so the all-ones code
    stays unused (the Annex-K convention that keeps 1-padding from
    decoding as a symbol).  Progressive scans choose their own symbol
    sets (EOBn, refinement codes) that the fixed Annex-K tables do not
    cover, so each scan ships its own DHT — which also exercises the
    decoder's between-scan table redefinition path."""
    n = len(symbols)
    if n == 0:
        symbols, n = {0x00}, 1  # degenerate scan: define EOB only
    length = 1
    while (1 << length) <= n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, sorted(symbols)


def _scan_ops_dc_first(
    comp_zz: list[np.ndarray],
    comp_nblk_w: list[int],
    comp_samp: list[tuple[int, int]],
    mcus_x: int,
    mcus_y: int,
    al: int,
    restart_interval: int = 0,
) -> list[list[tuple]]:
    """Interleaved DC first pass: per component ops [("sym", s), ("bits",
    v, n), ...] with diff coding on the point-transformed DC (arithmetic
    >> per G.1.2.1).  Returns one op list per DC TABLE (0=luma, 1=chroma)
    interleaved into a single stream via a merged list with table tags.
    A ("rst",) op marks each restart boundary (predictors reset here and
    in the emitter's byte-aligned segment break)."""
    ops: list[tuple] = []
    prev = [0] * len(comp_zz)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            u = my * mcus_x + mx
            if restart_interval and u and u % restart_interval == 0:
                ops.append(("rst",))
                prev = [0] * len(comp_zz)
            for ci in range(len(comp_zz)):
                ch, cv = comp_samp[ci]
                tbl = 0 if ci == 0 else 1
                for by in range(cv):
                    for bx in range(ch):
                        zz = comp_zz[ci][
                            (my * cv + by) * comp_nblk_w[ci] + (mx * ch + bx)
                        ]
                        v = int(zz[0]) >> al
                        diff = v - prev[ci]
                        prev[ci] = v
                        size = _category(diff)
                        ops.append(("sym", tbl, size))
                        if size:
                            amp = diff if diff > 0 else diff + (1 << size) - 1
                            ops.append(("bits", amp, size))
    return ops


def _scan_ops_dc_refine(
    comp_zz: list[np.ndarray],
    comp_nblk_w: list[int],
    comp_samp: list[tuple[int, int]],
    mcus_x: int,
    mcus_y: int,
    al: int,
    restart_interval: int = 0,
) -> list[tuple]:
    """DC refinement: one raw bit (bit ``al`` of the DC coefficient) per
    block in MCU interleave order — no Huffman codes at all.  ("rst",)
    ops mark restart boundaries (no predictor state to reset here; the
    emitter still byte-aligns and emits the RSTn)."""
    ops: list[tuple] = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            u = my * mcus_x + mx
            if restart_interval and u and u % restart_interval == 0:
                ops.append(("rst",))
            for ci in range(len(comp_zz)):
                ch, cv = comp_samp[ci]
                for by in range(cv):
                    for bx in range(ch):
                        zz = comp_zz[ci][
                            (my * cv + by) * comp_nblk_w[ci] + (mx * ch + bx)
                        ]
                        ops.append(("bits", (int(zz[0]) >> al) & 1, 1))
    return ops


_MAX_EOBRUN = 0x7FFF  # EOB14 ceiling (T.81 G.1.2.2)


class _EobRun:
    """Cross-block EOB-run accumulator (the emit_eobrun discipline of
    G.1.2.2/G.1.2.3): consecutive end-of-band events fold into one EOBn
    symbol — n = floor(log2(run)), run - 2^n extension bits — with any
    refinement correction bits buffered across the covered blocks riding
    after it, in block order."""

    def __init__(self, ops: list[tuple]):
        self.ops = ops
        self.run = 0
        self.pending: list[int] = []

    def add(self, bits: list[int] | None = None) -> None:
        self.run += 1
        if bits:
            self.pending.extend(bits)
        if self.run == _MAX_EOBRUN:
            self.flush()

    def flush(self) -> None:
        if self.run:
            r = self.run.bit_length() - 1
            self.ops.append(("sym", 0, r << 4))
            if r:
                self.ops.append(("bits", self.run - (1 << r), r))
            self.ops.extend(("bits", b, 1) for b in self.pending)
            self.run = 0
            self.pending = []


def _scan_ops_ac_first(
    blocks: np.ndarray, ss: int, se: int, al: int,
    restart_interval: int = 0,
) -> list[tuple]:
    """AC first pass over one component's natural-order block sequence:
    G.1.2.2 — run/size coding of the point-transformed band (signed
    division toward zero), with genuine cross-block EOBn runs.  At each
    restart boundary (every ``restart_interval`` blocks — the data unit
    of a non-interleaved scan) the pending EOB run flushes (it cannot
    cross a restart) and a ("rst",) op marks the segment break."""
    ops: list[tuple] = []
    eob = _EobRun(ops)
    for u, zz in enumerate(blocks):
        if restart_interval and u and u % restart_interval == 0:
            eob.flush()
            ops.append(("rst",))
        t = [
            (abs(int(zz[k])) >> al) * (1 if int(zz[k]) >= 0 else -1)
            for k in range(ss, se + 1)
        ]
        last = -1
        for i, tv in enumerate(t):
            if tv:
                last = i
        if last < 0:
            eob.add()  # all-zero band: fold into the run
            continue
        eob.flush()
        r = 0
        for i in range(last + 1):
            tv = t[i]
            if tv == 0:
                r += 1
                continue
            while r > 15:
                ops.append(("sym", 0, 0xF0))
                r -= 16
            size = _category(tv)
            ops.append(("sym", 0, (r << 4) | size))
            amp = tv if tv > 0 else tv + (1 << size) - 1
            ops.append(("bits", amp, size))
            r = 0
        if last < se - ss:
            eob.add()  # trailing zeros: this block's EOB starts a run
    eob.flush()
    return ops


def _scan_ops_ac_refine(
    blocks: np.ndarray, ss: int, se: int, al: int,
    restart_interval: int = 0,
) -> list[tuple]:
    """AC refinement over one component's natural-order block sequence:
    G.1.2.3 — newly-significant coefficients emit (run, 1) + a sign bit,
    already-significant ones buffer a correction bit that rides after
    the NEXT emitted code (ZRL, significant, or an EOBn), runs count
    zero-HISTORY positions only, and blocks with no new significance
    fold their correction bits into the cross-block EOB run.  EOB runs
    flush at every restart boundary, marked by a ("rst",) op."""
    ops: list[tuple] = []
    eob = _EobRun(ops)
    for u, zz in enumerate(blocks):
        if restart_interval and u and u % restart_interval == 0:
            eob.flush()
            ops.append(("rst",))
        t = [(abs(int(zz[k])) >> al) for k in range(ss, se + 1)]
        eobpos = -1
        for i, tv in enumerate(t):
            if tv == 1:
                eobpos = i
        if eobpos < 0:
            # no newly-significant coefficient: the whole band is one
            # end-of-band event carrying its correction bits
            eob.add([tv & 1 for tv in t if tv > 1])
            continue
        eob.flush()
        r = 0
        buffered: list[int] = []
        for i, tv in enumerate(t):
            if tv == 0:
                r += 1
                continue
            while r > 15 and i <= eobpos:
                ops.append(("sym", 0, 0xF0))
                r -= 16
                ops.extend(("bits", b, 1) for b in buffered)
                buffered = []
            if tv > 1:
                buffered.append(tv & 1)
                continue
            # newly significant (tv == 1): sign from the full coefficient
            ops.append(("sym", 0, (r << 4) | 1))
            ops.append(("bits", 1 if int(zz[ss + i]) > 0 else 0, 1))
            ops.extend(("bits", b, 1) for b in buffered)
            buffered = []
            r = 0
        if r > 0 or buffered:
            eob.add(buffered)  # tail corrections ride the EOB run
    eob.flush()
    return ops


def jpeg_encode_rgb_progressive(
    px: np.ndarray, quality: int = 90, sampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a PROGRESSIVE (SOF2) JFIF
    JPEG — the libjpeg-shaped 10-scan script (spectral selection AND
    successive approximation, the combination web encoders actually
    emit).  The quantized coefficients are byte-identical to
    ``jpeg_encode_rgb``'s (shared ``_quantized_planes``), so decoding
    the progressive and baseline encodes of one image MUST give exactly
    the same pixels — the differential tests/test_jpeg_progressive_fuzz
    pins.  Each scan ships its own flat-code DHT over exactly the
    symbols it uses (progressive symbol sets — EOBn, refinement codes —
    are outside the fixed Annex-K tables).

    ``restart_interval`` > 0 emits one DRI before the first scan and
    RSTn markers every that many data units INSIDE every scan (MCUs for
    the interleaved DC scans, blocks for the single-component AC scans;
    the RSTn counter restarts at RST0 per scan, E.2.4) — coefficients
    unchanged, so the cross-codec pixel-equality differential extends to
    restart streams."""
    comp_zz, comp_nblk_w, qt, h, w, hp, wp = _quantized_planes(
        px, quality, sampling, "jpeg_encode_rgb_progressive"
    )
    hmax, vmax = _SAMPLINGS[sampling]
    samp = [(hmax, vmax), (1, 1), (1, 1)]
    mcus_x, mcus_y = wp // (8 * hmax), hp // (8 * vmax)

    out = bytearray(b"\xff\xd8")
    out += _segment(
        0xE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    )
    for tid, q in enumerate(qt):
        out += _segment(0xDB, bytes([tid]) + bytes(int(v) for v in q[_ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci in range(3):
        chs, cvs = samp[ci]
        sof += bytes([ci + 1, (chs << 4) | cvs, 0 if ci == 0 else 1])
    out += _segment(0xC2, sof)  # SOF2: progressive DCT, Huffman
    if restart_interval:
        out += _segment(0xDD, struct.pack(">H", restart_interval))

    for comp_ids, ss, se, ah, al in _PROGRESSIVE_SCRIPT:
        # component blocks for non-interleaved AC scans: natural ceil grid
        # (the MCU-padded rows/cols beyond it are never AC-coded)
        if ss == 0:
            ops = (
                _scan_ops_dc_first(
                    comp_zz, comp_nblk_w, samp, mcus_x, mcus_y, al,
                    restart_interval,
                )
                if ah == 0
                else _scan_ops_dc_refine(
                    comp_zz, comp_nblk_w, samp, mcus_x, mcus_y, al,
                    restart_interval,
                )
            )
        else:
            (ci,) = comp_ids
            cw = -(-w * samp[ci][0] // hmax)
            chh = -(-h * samp[ci][1] // vmax)
            bw_nat, bh_nat = -(-cw // 8), -(-chh // 8)
            rows = []
            for by in range(bh_nat):
                for bx in range(bw_nat):
                    rows.append(comp_zz[ci][by * comp_nblk_w[ci] + bx])
            blocks = np.stack(rows)
            ops = (
                _scan_ops_ac_first(blocks, ss, se, al, restart_interval)
                if ah == 0
                else _scan_ops_ac_refine(blocks, ss, se, al, restart_interval)
            )

        # per-scan flat Huffman tables over exactly the used symbols
        used: dict[int, set[int]] = {}
        for op in ops:
            if op[0] == "sym":
                used.setdefault(op[1], set()).add(op[2])
        tables: dict[int, dict[int, tuple[int, int]]] = {}
        cls = 0 if ss == 0 else 1
        for tbl, syms in sorted(used.items()):
            bits, vals = _flat_table(syms)
            out += _segment(
                0xC4, bytes([(cls << 4) | tbl]) + bytes(bits) + bytes(vals)
            )
            tables[tbl] = _canonical_codes(bits, vals)

        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            # DC first scans use per-component-class DC tables (0=luma,
            # 1=chroma, matching the DHTs above); AC scans are single-
            # component and always ship their table as id 0; DC refine
            # reads raw bits (ids ignored)
            td = (0 if ci == 0 else 1) if (ss == 0 and ah == 0) else 0
            ta = 0
            sos += bytes([ci + 1, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _segment(0xDA, sos)

        writer = _BitWriter()
        rst_n = 0  # RSTn counter restarts at RST0 each scan (E.2.4)
        for op in ops:
            if op[0] == "rst":
                out += writer.flush()
                out += bytes([0xFF, 0xD0 + (rst_n % 8)])
                rst_n += 1
                writer = _BitWriter()
            elif op[0] == "sym":
                code, length = tables[op[1]][op[2]]
                writer.put(code, length)
            else:
                writer.put(op[1], op[2])
        out += writer.flush()

    out += b"\xff\xd9"
    return bytes(out)


def _unstuff_entropy_segments(
    blob: bytes, p: int
) -> tuple[list[bytes], list[int], int]:
    """Unstuff the entropy-coded bytes starting at ``p``, splitting at
    RSTn markers (T.81 E.2.4 — restart intervals, r18): returns
    (segments, rst_ids, position of the terminating marker's 0xFF) where
    ``rst_ids[i]`` is the modulo-8 number of the RSTn that TERMINATED
    ``segments[i]`` (so ``len(rst_ids) == len(segments) - 1``).  The
    caller validates the marker sequence and segment count against the
    declared DRI interval — a stream with restart markers but no DRI, an
    out-of-sequence RSTn, or a wrong segment count stays loud."""
    segs: list[bytes] = []
    rsts: list[int] = []
    data = bytearray()
    while p < len(blob):
        b = blob[p]
        if b == 0xFF:
            nxt = blob[p + 1] if p + 1 < len(blob) else 0xD9
            if nxt == 0x00:
                data.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segs.append(bytes(data))
                rsts.append(nxt & 7)
                data = bytearray()
                p += 2
                continue
            break
        data.append(b)
        p += 1
    segs.append(bytes(data))
    return segs, rsts, p


def _check_restart_run(
    segs: list[bytes], rsts: list[int], units: int, restart_interval: int
) -> None:
    """Shared restart validation: marker numbering must count RST0..RST7
    cyclically from the start of the scan (E.2.4), restart markers
    require a non-zero DRI, and the segment count must match
    ceil(units / interval) for the scan's data-unit count."""
    if rsts and not restart_interval:
        raise ValueError(
            "jpeg_decode: restart marker in scan but DRI interval is 0"
        )
    for i, r in enumerate(rsts):
        if r != i % 8:
            raise ValueError(
                f"jpeg_decode: restart marker out of sequence "
                f"(RST{r} where RST{i % 8} expected)"
            )
    if restart_interval:
        expected = -(-units // restart_interval)
        if len(segs) != expected:
            raise ValueError(
                f"jpeg_decode: {len(segs)} entropy segments for "
                f"{expected} restart intervals of {restart_interval} MCUs"
            )


def _refine_coef(zz: np.ndarray, k: int, reader: "_BitReader", p1: int) -> None:
    """One AC-refinement correction bit for an already-significant
    coefficient (G.1.2.3 / libjpeg decode_mcu_AC_refine): a 1-bit grows
    the magnitude by 1<<Al iff that bit is not already set."""
    if reader.receive(1) and not (int(zz[k]) & p1):
        zz[k] += p1 if zz[k] >= 0 else -p1


def _decode_progressive(blob: bytes) -> np.ndarray:
    """Decode one PROGRESSIVE (SOF2, Huffman) JFIF JPEG to (h, w, 3) int64
    RGB — closes the r16 VERDICT gap #5: progressive is ubiquitous in
    web-crawled corpora, so a 100 TB image dedup pass cannot gate on it.

    Full Annex G Huffman subset: spectral selection AND successive
    approximation, interleaved or single-component DC scans (first +
    raw-bit refinement), single-component AC scans with EOBRUN (EOBn
    codes) and refinement correction bits, per-scan DHT redefinition.
    Coefficients accumulate in zigzag order across scans; dequantize +
    IDCT + upsample + color convert run once at the end, vectorized over
    all blocks.  Restart intervals decode (r18, per-scan RSTn runs —
    E.2.4 applied to progressive); outside the subset (arithmetic
    coding, 12-bit) stays loud."""
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    frame = None
    coefs: list[np.ndarray] = []
    geom: list[tuple] = []  # per comp: (hs, vs, qid, bw_pad, bh_pad, bw_nat, bh_nat)
    mcus_x = mcus_y = 0
    hmax = vmax = 1
    n_scans = 0
    restart_interval = 0
    while pos + 2 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(
                f"jpeg_decode: expected marker at byte {pos}, got {blob[pos]:#x}"
            )
        while pos + 1 < len(blob) and blob[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(blob):
            break
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(blob):
            raise ValueError("jpeg_decode: truncated segment header")
        (seglen,) = struct.unpack(">H", blob[pos : pos + 2])
        seg = blob[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError(
                f"jpeg_decode: truncated segment (marker {marker:#x} declares "
                f"{seglen - 2} payload bytes, {len(seg)} present)"
            )
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("jpeg_decode: 16-bit DQT unsupported")
                zz = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                if len(zz) != 64:
                    raise ValueError("jpeg_decode: truncated DQT segment")
                nat = np.empty(64, dtype=np.int64)
                nat[_ZIGZAG] = zz
                qtables[tq] = nat
                p += 65
        elif marker == 0xC4:  # DHT (scans may redefine tables)
            p = 0
            while p + 17 <= len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                huff[(cls, tid)] = _build_lut(bits, vals)
                p += 17 + n
        elif marker == 0xC2:  # SOF2
            if frame is not None:
                raise ValueError("jpeg_decode: duplicate SOF marker")
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(
                    f"jpeg_decode: {prec}-bit precision unsupported"
                )
            if nc not in (1, 3):
                raise ValueError(
                    f"jpeg_decode: {nc}-component frames unsupported"
                )
            if fh == 0 or fw == 0:
                raise ValueError("jpeg_decode: zero-sized frame")
            comps = []
            for i in range(nc):
                cid, hv, qid = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, qid))
            frame = (fh, fw, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if hmax < 1 or vmax < 1:
                raise ValueError("jpeg_decode: zero sampling factor")
            mcus_x = -(-fw // (8 * hmax))
            mcus_y = -(-fh // (8 * vmax))
            for _cid, hs, vs, qid in comps:
                bw_pad, bh_pad = mcus_x * hs, mcus_y * vs
                cw = -(-fw * hs // hmax)   # component pixel dims (ceil)
                ch = -(-fh * vs // vmax)
                bw_nat, bh_nat = -(-cw // 8), -(-ch // 8)
                geom.append((hs, vs, qid, bw_pad, bh_pad, bw_nat, bh_nat))
                coefs.append(np.zeros((bh_pad * bw_pad, 64), dtype=np.int64))
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"jpeg_decode: SOF marker {marker:#x} inside the "
                "progressive path (only one SOF2 frame supported)"
            )
        elif marker == 0xDD:  # DRI (r18: applies to all following scans)
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — decode this scan now
            if frame is None:
                raise ValueError("jpeg_decode: SOS before SOF2")
            fh, fw, comps = frame
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cid, tids = seg[1 + 2 * i : 3 + 2 * i]
                scan_comps.append((cid, tids >> 4, tids & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            segs, rsts, pos = _unstuff_entropy_segments(blob, pos + seglen)
            comp_idx = {c[0]: i for i, c in enumerate(comps)}
            order = []
            for cid, dc_t, ac_t in scan_comps:
                if cid not in comp_idx:
                    raise ValueError(
                        f"jpeg_decode: SOS references unknown component {cid}"
                    )
                order.append((comp_idx[cid], dc_t, ac_t))
            _decode_progressive_scan(
                segs, rsts, order, ss, se, ah, al,
                coefs, geom, huff, mcus_x, mcus_y, restart_interval,
            )
            n_scans += 1
            continue
        pos += seglen
    if frame is None or n_scans == 0:
        raise ValueError("jpeg_decode: missing SOF2 or SOS")

    # --- vectorized reconstruction, once, from the accumulated bands ---
    fh, fw, comps = frame
    planes = []
    for ci, (hs, vs, qid, bw_pad, bh_pad, _bwn, _bhn) in enumerate(geom):
        if qid not in qtables:
            raise ValueError(f"jpeg_decode: missing DQT table {qid}")
        nat = np.empty_like(coefs[ci])
        nat[:, _ZIGZAG] = coefs[ci]
        coeff = (nat * qtables[qid][None, :]).reshape(-1, 8, 8).astype(np.float64)
        pix = _DCT.T @ coeff @ _DCT + 128.0
        plane = pix.reshape(bh_pad, bw_pad, 8, 8).transpose(0, 2, 1, 3).reshape(
            bh_pad * 8, bw_pad * 8
        )
        ch = -(-fh * vs // vmax)
        cw = -(-fw * hs // hmax)
        plane = plane[:ch, :cw]
        if vs != vmax or hs != hmax:
            if vmax % vs or hmax % hs:
                raise ValueError(
                    f"jpeg_decode: non-integer sampling ratio "
                    f"({hs}x{vs} vs max {hmax}x{vmax}) unsupported"
                )
            plane = np.repeat(
                np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
            )
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        y = planes[0]
        rgb = np.stack([y, y, y], axis=-1)
    else:
        y, cb, cr = planes
        rgb = np.stack(
            [
                y + 1.402 * (cr - 128.0),
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                y + 1.772 * (cb - 128.0),
            ],
            axis=-1,
        )
    return np.clip(np.round(rgb), 0, 255).astype(np.int64)


def _decode_progressive_scan(
    segments: list[bytes],
    rsts: list[int],
    order: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    coefs: list[np.ndarray],
    geom: list[tuple],
    huff: dict,
    mcus_x: int,
    mcus_y: int,
    restart_interval: int = 0,
) -> None:
    """One progressive scan's entropy decode into the coefficient bands
    (T.81 Annex G decoding procedures / the libjpeg decode_mcu_DC_first /
    DC_refine / AC_first / AC_refine quartet).  ``segments`` is the
    restart-split entropy stream: every ``restart_interval`` data units
    (MCUs when interleaved, blocks in a single-component scan) the
    decoder moves to the next byte-aligned segment, resets the DC
    predictors and expires the EOB run (E.2.4 applied per scan — the
    RSTn counter restarts at RST0 each scan)."""
    if ss == 0 and len(order) > 1:
        units = mcus_x * mcus_y
    else:
        _h0, _v0, _q0, _bwp0, _bh0, bw_nat0, bh_nat0 = geom[order[0][0]]
        units = bw_nat0 * bh_nat0
    _check_restart_run(segments, rsts, units, restart_interval)
    reader = _BitReader(segments[0])
    if ss == 0:
        # ---- DC scan (first or refinement), interleaved or not ----
        if se != 0:
            raise ValueError(
                "jpeg_decode: progressive DC scan must have Se=0"
            )
        if ah not in (0, al + 1):
            raise ValueError(
                f"jpeg_decode: successive approximation Ah={ah} does not "
                f"refine Al={al}"
            )
        pred = [0] * len(order)
        if ah == 0:
            for _ci, dc_t, _ac_t in order:
                if (0, dc_t) not in huff:
                    raise ValueError(
                        "jpeg_decode: scan references a missing DHT table"
                    )

        def dc_block(si: int, ci: int, bi: int) -> None:
            zz = coefs[ci]
            if ah == 0:
                dsym, dlen = huff[(0, order[si][1])]
                s = _decode_sym(reader, dsym, dlen)
                pred[si] += _extend(reader.receive(s), s)
                zz[bi, 0] = pred[si] << al
            else:
                if reader.receive(1):
                    zz[bi, 0] = int(zz[bi, 0]) | (1 << al)

        if len(order) > 1:  # interleaved: MCU order over the padded grid
            for u in range(units):
                if restart_interval and u and u % restart_interval == 0:
                    reader = _BitReader(segments[u // restart_interval])
                    pred = [0] * len(order)
                my, mx = divmod(u, mcus_x)
                for si, (ci, _dc_t, _ac_t) in enumerate(order):
                    hs, vs, _qid, bw_pad, _bh, _bwn, _bhn = geom[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            dc_block(
                                si, ci,
                                (my * vs + by) * bw_pad + (mx * hs + bx),
                            )
        else:  # single component: raster over its natural block grid
            ci = order[0][0]
            _hs, _vs, _qid, bw_pad, _bh, bw_nat, bh_nat = geom[ci]
            for u in range(units):
                if restart_interval and u and u % restart_interval == 0:
                    reader = _BitReader(segments[u // restart_interval])
                    pred = [0] * len(order)
                by, bx = divmod(u, bw_nat)
                dc_block(0, ci, by * bw_pad + bx)
        return

    # ---- AC scan: single component, natural raster, EOBRUN state ----
    if len(order) != 1:
        raise ValueError(
            "jpeg_decode: progressive AC scans must be single-component"
        )
    if not (1 <= ss <= se <= 63):
        raise ValueError(f"jpeg_decode: bad spectral band [{ss}, {se}]")
    if ah not in (0, al + 1):
        raise ValueError(
            f"jpeg_decode: successive approximation Ah={ah} does not "
            f"refine Al={al}"
        )
    ci, _dc_t, ac_t = order[0]
    if (1, ac_t) not in huff:
        raise ValueError("jpeg_decode: scan references a missing DHT table")
    asym, alen = huff[(1, ac_t)]
    _hs, _vs, _qid, bw_pad, _bh, bw_nat, bh_nat = geom[ci]
    p1 = 1 << al
    eobrun = 0
    for u in range(units):
        if restart_interval and u and u % restart_interval == 0:
            # RSTn boundary: next byte-aligned segment; the EOB run
            # cannot cross a restart (libjpeg resets EOBRUN here too)
            reader = _BitReader(segments[u // restart_interval])
            eobrun = 0
        by, bx = divmod(u, bw_nat)
        zz = coefs[ci][by * bw_pad + bx]
        if ah == 0:
            # ---- AC first pass ----
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _decode_sym(reader, asym, alen)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.receive(r)
                    break
                k += r
                if k > se:
                    raise ValueError(
                        "jpeg_decode: AC run overran the band"
                    )
                zz[k] = _extend(reader.receive(s), s) << al
                k += 1
        else:
            # ---- AC refinement pass ----
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _decode_sym(reader, asym, alen)
                    r, s = rs >> 4, rs & 0x0F
                    newval = 0
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.receive(r)
                            break
                        # ZRL: skip 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError(
                                "jpeg_decode: refinement amplitude "
                                "must be 1"
                            )
                        newval = p1 if reader.receive(1) else -p1
                    while k <= se:
                        if zz[k] != 0:
                            _refine_coef(zz, k, reader, p1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if s:
                        if k > se:
                            raise ValueError(
                                "jpeg_decode: refinement run overran "
                                "the band"
                            )
                        zz[k] = newval
                    k += 1
            if eobrun > 0:
                while k <= se:
                    if zz[k] != 0:
                        _refine_coef(zz, k, reader, p1)
                    k += 1
                eobrun -= 1
