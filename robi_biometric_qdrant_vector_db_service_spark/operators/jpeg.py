"""Baseline JPEG codec — pure stdlib + NumPy, no codec libraries.

Closes the r14 VERDICT "What's missing #2" remainder: after r15's PNG
decoder, JPEG was the one compressed-image family the pluggable dHash
decoder (`operators.multimodal.dhash_bands`) could not hash.  This module
implements the ITU-T T.81 BASELINE process end-to-end:

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
  upsample, JFIF YCbCr -> RGB.  Anything outside the baseline subset
  (progressive SOF2, 12-bit precision, arithmetic coding, restart
  intervals) fails loud with the offending marker — corrupt or exotic
  streams must never hash.

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


def jpeg_encode_rgb(
    px: np.ndarray, quality: int = 90, sampling: str = "4:4:4"
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline JFIF JPEG."""
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"jpeg_encode_rgb: expected (h, w, 3), got {px.shape}")
    if sampling not in _SAMPLINGS:
        raise ValueError(
            f"jpeg_encode_rgb: unknown sampling {sampling!r}; "
            f"supported: {sorted(_SAMPLINGS)}"
        )
    hmax, vmax = _SAMPLINGS[sampling]
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("jpeg_encode_rgb: empty image")

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

    # entropy-code in MCU interleave order
    dc_codes = [_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
                _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_codes = [_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
                _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]
    samp = [(hmax, vmax), (1, 1), (1, 1)]
    mcus_x, mcus_y = wp // mcu_w, hp // mcu_h
    writer = _BitWriter()
    prev_dc = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
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
    scan = writer.flush()

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
    sos = bytes([3])
    for ci in range(3):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += _segment(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
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


def jpeg_decode(blob: bytes) -> np.ndarray:
    """Decode one baseline JFIF JPEG byte string to (h, w, 3) int64 RGB."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("jpeg_decode: not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    frame = None
    scan_comps = None
    scan_start = None
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
        elif marker == 0xDD:  # DRI
            (interval,) = struct.unpack(">H", seg[:2])
            if interval:
                raise ValueError("jpeg_decode: restart intervals unsupported")
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

    # unstuff the entropy stream up to the next real marker
    data = bytearray()
    p = scan_start
    while p < len(blob):
        b = blob[p]
        if b == 0xFF:
            nxt = blob[p + 1] if p + 1 < len(blob) else 0xD9
            if nxt == 0x00:
                data.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                raise ValueError("jpeg_decode: restart markers unsupported")
            break
        data.append(b)
        p += 1
    reader = _BitReader(bytes(data))

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

    # --- the one serial step: Huffman-decode all blocks in MCU order ---
    blocks: list[list[np.ndarray]] = [[] for _ in order]
    prev_dc = [0] * len(order)
    for _ in range(mcus_x * mcus_y):
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
