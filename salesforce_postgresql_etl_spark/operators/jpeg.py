"""Baseline JPEG (ITU-T T.81) codec in pure Python — fixture-grade.

The last image-decode stub in ``operators/multimodal.py`` was the
lossy-DCT family; this module removes it for real: a baseline
sequential Huffman JPEG encoder and decoder built from the PUBLIC
spec alone (ITU-T T.81 / ISO 10918-1 — the marker grammar, the DCT
and quantization equations of Annex A, the entropy coding of Annex F,
and the example quantization/Huffman tables of Annex K, which are the
de-facto standard tables every camera and library ships).

Scope (honest, raised-not-guessed at the edges):
- decode: baseline DCT (SOF0, 8-bit), grayscale or YCbCr, arbitrary
  per-component sampling factors in {1, 2} (so 4:4:4, 4:2:2 and the
  ubiquitous 4:2:0 all decode), multiple DQT/DHT segments, stuffed
  bytes. Progressive (SOF2), arithmetic coding, 12-bit precision,
  and restart intervals raise ``ValueError``.
- encode: SOF0, quality-scaled Annex K tables (the IJG 5000/q //
  200-2q convention), 4:4:4 or 4:2:0 chroma, optional grayscale —
  enough to round-trip every decoder path including MCU interleave.

Like the PNG/BMP/PPM/WAV codecs this is correctness-grade Python:
at 100 TB the engine's job is the Arrow-batched BinaryType carriage
around the decode (operators/multimodal.py), not this inner loop.
Self-checks guard against transcription slips: the DCT basis is
pytest-verified against the Annex A double-sum formula, the zigzag
order is GENERATED from the diagonal rule rather than typed in, and
the Huffman tables assert sum(bits) == len(values) at import.
"""

from __future__ import annotations

import math
import struct

from .codecs_common import parser_boundary


def _build_zigzag() -> list[int]:
    """Flat 8×8 indices in JPEG zigzag order, generated from the
    diagonal rule (even diagonals run bottom-left→top-right) instead
    of a hand-typed table."""
    order = []
    for d in range(15):
        rng = range(d, -1, -1) if d % 2 == 0 else range(d + 1)
        for r in rng:
            c = d - r
            if r < 8 and c < 8:
                order.append(r * 8 + c)
    return order


ZIGZAG = _build_zigzag()
assert len(ZIGZAG) == 64 and ZIGZAG[:6] == [0, 1, 8, 16, 9, 2]

# Annex K.1 example quantization tables (row-major).
STD_QT_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
STD_QT_CHROM = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 example Huffman tables: (bits[1..16], values).
STD_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
STD_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)
for _bits, _vals in (STD_DC_LUM, STD_DC_CHROM, STD_AC_LUM, STD_AC_CHROM):
    assert sum(_bits) == len(_vals)  # transcription tripwire

# Orthonormal 8-point DCT-II basis: M[u][x] = α(u)/2 · cos((2x+1)uπ/16)
# with α(0)=1/√2 — M·Mᵀ = I, so the inverse transform is the transpose
# (pytest-verified against the Annex A double-sum formula).
_DCT_M = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0)
        * 0.5
        * math.cos((2 * x + 1) * u * math.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
]


def _dct2d(block: list[list[float]]) -> list[list[float]]:
    """F = M · B · Mᵀ (forward 2-D DCT of one level-shifted 8×8 block)."""
    tmp = [
        [sum(_DCT_M[u][x] * block[x][c] for x in range(8)) for c in range(8)]
        for u in range(8)
    ]
    return [
        [sum(tmp[u][x] * _DCT_M[v][x] for x in range(8)) for v in range(8)]
        for u in range(8)
    ]


def _idct2d(coef: list[list[float]]) -> list[list[float]]:
    """B = Mᵀ · F · M (inverse 2-D DCT)."""
    tmp = [
        [sum(_DCT_M[u][x] * coef[u][c] for u in range(8)) for c in range(8)]
        for x in range(8)
    ]
    return [
        [sum(tmp[x][v] * _DCT_M[v][y] for v in range(8)) for y in range(8)]
        for x in range(8)
    ]


def _quality_tables(quality: int) -> tuple[list[int], list[int]]:
    """Annex K tables scaled by the IJG quality convention."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return tuple(
        [max(1, min(255, (q * scale + 50) // 100)) for q in std]
        for std in (STD_QT_LUM, STD_QT_CHROM)
    )


def _huff_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol → (code, length), per Annex C."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    """MSB-first bit stream with JPEG byte stuffing (FF → FF 00)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> bytes:
        if self._n:
            self.put(0x7F, 8 - self._n)  # pad with 1-bits, per spec
        return bytes(self.out)


class _BitReader:
    """MSB-first bit stream over entropy-coded data; un-stuffs FF 00
    and refuses embedded markers (restart support is out of scope)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def get(self, nbits: int) -> int:
        while self._n < nbits:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded segment")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    what = (
                        "truncated scan (bare 0xFF at end of data)"
                        if nxt is None
                        else f"unexpected marker 0xFF{nxt:02X} inside scan "
                        "(restart markers are not supported)"
                    )
                    raise ValueError(what)
            self._acc = (self._acc << 8) | byte
            self._n += 8
        val = (self._acc >> (self._n - nbits)) & ((1 << nbits) - 1)
        self._n -= nbits
        self._acc &= (1 << self._n) - 1
        return val

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.get(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


def _category(v: int) -> int:
    return abs(v).bit_length()


def _extend(v: int, cat: int) -> int:
    """Annex F.2.2.1 EXTEND: map cat-bit magnitude to signed value."""
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[float, float, float]:
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _clamp(v: float) -> int:
    return 0 if v < 0 else 255 if v > 255 else int(v)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _plane_blocks(
    plane: list[list[float]], by: int, bx: int
) -> list[list[float]]:
    """8×8 block at block coords (by, bx), edge-replicated past bounds."""
    h, w = len(plane), len(plane[0])
    return [
        [
            plane[min(by * 8 + y, h - 1)][min(bx * 8 + x, w - 1)]
            for x in range(8)
        ]
        for y in range(8)
    ]


def _encode_block(
    block: list[list[float]],
    qt: list[int],
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
    bw: _BitWriter,
) -> int:
    """FDCT + quantize + zigzag + Huffman one block; returns new DC pred."""
    coef = _dct2d([[v - 128.0 for v in row] for row in block])
    # qt is row-major; coef and qt share the same flat index i.
    zz = [int(round(coef[i // 8][i % 8] / qt[i])) for i in ZIGZAG]
    dc = zz[0]
    diff = dc - pred
    cat = _category(diff)
    code, length = dc_codes[cat]
    bw.put(code, length)
    if cat:
        bw.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.put(c, ln)
            run -= 16
        cat = _category(v)
        c, ln = ac_codes[(run << 4) | cat]
        bw.put(c, ln)
        bw.put(v if v >= 0 else v + (1 << cat) - 1, cat)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]  # EOB
        bw.put(c, ln)
    return dc


def encode_jpeg(
    pixels: list[list[tuple[int, int, int]]],
    quality: int = 90,
    subsample: bool = False,
    gray: bool = False,
) -> bytes:
    """Write a baseline (SOF0) JFIF JPEG. ``pixels`` is rows of
    (r, g, b), top row first. ``subsample=True`` emits 4:2:0 chroma
    (2×2-averaged, exercising the decoder's MCU interleave);
    ``gray=True`` emits a single-component image from the luma plane.
    Fixture-grade counterpart of ``decode_jpeg``."""
    height = len(pixels)
    width = len(pixels[0]) if height else 0
    if width == 0 or height == 0:
        raise ValueError("empty image")
    qt_l, qt_c = _quality_tables(quality)
    ycc = [[_rgb_to_ycbcr(*px) for px in row] for row in pixels]
    yp = [[p[0] for p in row] for row in ycc]

    out = bytearray()
    out += struct.pack(">H", 0xFFD8)  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0x00]) + bytes(qt_l[i] for i in ZIGZAG))
    dc_l = _huff_codes(*STD_DC_LUM)
    ac_l = _huff_codes(*STD_AC_LUM)

    if gray:
        out += _seg(
            0xFFC0,
            struct.pack(">BHHB", 8, height, width, 1)
            + bytes([1, 0x11, 0]),
        )
        out += _seg(0xFFC4, bytes([0x00]) + bytes(STD_DC_LUM[0]) + bytes(STD_DC_LUM[1]))
        out += _seg(0xFFC4, bytes([0x10]) + bytes(STD_AC_LUM[0]) + bytes(STD_AC_LUM[1]))
        out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        bw = _BitWriter()
        pred = 0
        for by in range(-(-height // 8)):
            for bx in range(-(-width // 8)):
                pred = _encode_block(
                    _plane_blocks(yp, by, bx), qt_l, dc_l, ac_l, pred, bw
                )
        out += bw.flush()
        out += struct.pack(">H", 0xFFD9)
        return bytes(out)

    cbp = [[p[1] for p in row] for row in ycc]
    crp = [[p[2] for p in row] for row in ycc]
    if subsample:
        # 4:2:0 — chroma is the mean of each 2×2 neighborhood.
        ch, cw = -(-height // 2), -(-width // 2)

        def down(plane):
            return [
                [
                    (
                        plane[min(2 * y, height - 1)][min(2 * x, width - 1)]
                        + plane[min(2 * y + 1, height - 1)][min(2 * x, width - 1)]
                        + plane[min(2 * y, height - 1)][min(2 * x + 1, width - 1)]
                        + plane[min(2 * y + 1, height - 1)][min(2 * x + 1, width - 1)]
                    )
                    / 4.0
                    for x in range(cw)
                ]
                for y in range(ch)
            ]

        cbp, crp = down(cbp), down(crp)
        y_hv, c_hv = 0x22, 0x11
    else:
        y_hv = c_hv = 0x11

    out += _seg(0xFFDB, bytes([0x01]) + bytes(qt_c[i] for i in ZIGZAG))
    out += _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, y_hv, 0, 2, c_hv, 1, 3, c_hv, 1]),
    )
    for cls_id, (bits, vals) in (
        (0x00, STD_DC_LUM), (0x10, STD_AC_LUM),
        (0x01, STD_DC_CHROM), (0x11, STD_AC_CHROM),
    ):
        out += _seg(0xFFC4, bytes([cls_id]) + bytes(bits) + bytes(vals))
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    dc_c = _huff_codes(*STD_DC_CHROM)
    ac_c = _huff_codes(*STD_AC_CHROM)
    bw = _BitWriter()
    preds = [0, 0, 0]
    if subsample:
        mcux, mcuy = -(-width // 16), -(-height // 16)
        for my in range(mcuy):
            for mx in range(mcux):
                for v in range(2):
                    for h in range(2):
                        preds[0] = _encode_block(
                            _plane_blocks(yp, my * 2 + v, mx * 2 + h),
                            qt_l, dc_l, ac_l, preds[0], bw,
                        )
                preds[1] = _encode_block(
                    _plane_blocks(cbp, my, mx), qt_c, dc_c, ac_c, preds[1], bw
                )
                preds[2] = _encode_block(
                    _plane_blocks(crp, my, mx), qt_c, dc_c, ac_c, preds[2], bw
                )
    else:
        for by in range(-(-height // 8)):
            for bx in range(-(-width // 8)):
                preds[0] = _encode_block(
                    _plane_blocks(yp, by, bx), qt_l, dc_l, ac_l, preds[0], bw
                )
                preds[1] = _encode_block(
                    _plane_blocks(cbp, by, bx), qt_c, dc_c, ac_c, preds[1], bw
                )
                preds[2] = _encode_block(
                    _plane_blocks(crp, by, bx), qt_c, dc_c, ac_c, preds[2], bw
                )
    out += bw.flush()
    out += struct.pack(">H", 0xFFD9)
    return bytes(out)


def _decode_block(
    br: _BitReader,
    dc_tbl: dict,
    ac_tbl: dict,
    qt: list[int],
    pred: int,
) -> tuple[list[list[float]], int]:
    """Huffman-decode one block → spatial 8×8 samples; new DC pred."""
    zz = [0] * 64
    cat = br.read_symbol(dc_tbl)
    diff = _extend(br.get(cat), cat) if cat else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = br.read_symbol(ac_tbl)
        run, cat = rs >> 4, rs & 0x0F
        if cat == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC coefficient index overran the block")
        zz[k] = _extend(br.get(cat), cat)
        k += 1
    coef = [[0.0] * 8 for _ in range(8)]
    for i, flat in enumerate(ZIGZAG):
        coef[flat // 8][flat % 8] = zz[i] * qt[flat]
    spatial = _idct2d(coef)
    return [[v + 128.0 for v in row] for row in spatial], pred


@parser_boundary
def decode_jpeg(data: bytes) -> dict:
    """Decode a baseline JPEG with pure Python. Returns the
    ``{"width", "height", "pixels"}`` shape shared by decode_bmp /
    decode_ppm / decode_png (rows of (r, g, b), top first; grayscale
    expands to (v, v, v)) plus ``"channels"`` (1 or 3). See module
    docstring for the supported/raising envelope."""
    if len(data) < 4 or data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI marker)")
    pos = 2
    qts: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    n = len(data)
    while True:
        if pos + 4 > n:
            raise ValueError("truncated JPEG: no SOS marker found")
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        # T.81 B.1.1.2: any marker may be preceded by any number of
        # 0xFF fill bytes — skip to the last one (r7 review: real
        # camera/library output uses fill padding).
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > n:
            raise ValueError("truncated JPEG: fill bytes run to end of data")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("EOI before SOS — no image data")
        if marker in (0x01, *range(0xD0, 0xD8)):
            continue  # standalone markers carry no length
        if pos + 2 > n:
            raise ValueError("truncated marker segment header")
        (seglen,) = struct.unpack_from(">H", data, pos)
        if seglen < 2 or pos + seglen > n:
            raise ValueError("truncated marker segment")
        payload = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT — may hold several tables
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables not supported")
                if p + 65 > len(payload):
                    raise ValueError("truncated DQT segment")
                zz = payload[p + 1 : p + 65]
                qt = [0] * 64
                for i, flat in enumerate(ZIGZAG):
                    qt[flat] = zz[i]
                qts[tq] = qt
                p += 65
        elif marker == 0xC4:  # DHT — may hold several tables
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                if len(bits) < 16 or len(vals) < nv:
                    raise ValueError("truncated DHT segment")
                codes = _huff_codes(bits, vals)
                huff[(tc, th)] = {
                    (length, code): sym for sym, (code, length) in codes.items()
                }
                p += 17 + nv
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            precision, height, width, ncomp = struct.unpack_from(">BHHB", payload)
            if precision != 8:
                raise ValueError(f"{precision}-bit precision not supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                h, v = hv >> 4, hv & 0x0F
                if h not in (1, 2) or v not in (1, 2):
                    raise ValueError(f"sampling factor {h}x{v} not supported")
                comps.append({"id": cid, "h": h, "v": v, "tq": tq})
            sof = (width, height, comps)
        elif marker == 0xC2:
            raise ValueError("progressive JPEG (SOF2) not supported")
        elif marker in (0xC3, *range(0xC5, 0xC8), *range(0xC9, 0xCC), *range(0xCD, 0xD0)):
            raise ValueError(f"SOF marker 0xFF{marker:02X} not supported")
        elif marker == 0xDD:  # DRI
            (interval,) = struct.unpack_from(">H", payload)
            if interval:
                raise ValueError("restart intervals not supported")
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("SOS before SOF0")
            ns = payload[0]
            scan = []
            for i in range(ns):
                cs, tbls = payload[1 + 2 * i], payload[2 + 2 * i]
                scan.append((cs, tbls >> 4, tbls & 0x0F))
            break
        # APPn / COM / anything else with a length: skipped

    width, height, comps = sof
    if len(scan) != len(comps):
        raise ValueError("multi-scan images not supported")
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        c = by_id.get(cs)
        if c is None:
            raise ValueError(f"scan references unknown component {cs}")
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("scan references undefined Huffman table")
        if c["tq"] not in qts:
            raise ValueError("component references undefined quant table")
        order.append((c, huff[(0, td)], huff[(1, ta)], qts[c["tq"]]))

    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcux = -(-width // (8 * max_h))
    mcuy = -(-height // (8 * max_v))
    planes = {
        c["id"]: [
            [0.0] * (mcux * c["h"] * 8) for _ in range(mcuy * c["v"] * 8)
        ]
        for c in comps
    }
    br = _BitReader(data, pos)
    preds = {c["id"]: 0 for c in comps}
    for my in range(mcuy):
        for mx in range(mcux):
            for c, dc_tbl, ac_tbl, qt in order:
                for v in range(c["v"]):
                    for h in range(c["h"]):
                        block, preds[c["id"]] = _decode_block(
                            br, dc_tbl, ac_tbl, qt, preds[c["id"]]
                        )
                        plane = planes[c["id"]]
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + h) * 8
                        for yy in range(8):
                            row = plane[y0 + yy]
                            row[x0 : x0 + 8] = block[yy]

    if len(comps) == 1:
        plane = planes[comps[0]["id"]]
        pixels = [
            [(_clamp(plane[y][x] + 0.5),) * 3 for x in range(width)]
            for y in range(height)
        ]
        return {"width": width, "height": height, "pixels": pixels,
                "channels": 1}
    if len(comps) != 3:
        raise ValueError(f"{len(comps)}-component images not supported")
    # SOF component order is Y, Cb, Cr under the JFIF convention the
    # encoder also follows (ids 1, 2, 3).
    cy, cb, cr = comps
    yp, cbp, crp = (planes[c["id"]] for c in (cy, cb, cr))
    pixels = []
    for y in range(height):
        row = []
        for x in range(width):
            yv = yp[y * cy["v"] // max_v][x * cy["h"] // max_h]
            cbv = cbp[y * cb["v"] // max_v][x * cb["h"] // max_h] - 128.0
            crv = crp[y * cr["v"] // max_v][x * cr["h"] // max_h] - 128.0
            row.append(
                (
                    _clamp(yv + 1.402 * crv + 0.5),
                    _clamp(yv - 0.344136 * cbv - 0.714136 * crv + 0.5),
                    _clamp(yv + 1.772 * cbv + 0.5),
                )
            )
        pixels.append(row)
    return {"width": width, "height": height, "pixels": pixels, "channels": 3}
