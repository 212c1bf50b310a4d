"""Animated GIF (GIF87a/89a) codec in pure Python — fixture-grade.

The one remaining multimodal stub after r7's image/audio codecs was
the VIDEO slot (``sample_frames``). Animated GIF is a genuine
multi-frame moving-image format whose spec is fully public (the
CompuServe GIF89a specification, including its LZW variant), and it
needs no libraries — so frame sampling can run on REAL bytes.

Scope (honest, raised-not-guessed at the edges):
- decode: GIF87a + GIF89a, global/local color tables, multiple image
  frames with sub-rectangle placement, interlaced rasters, graphic
  control extensions (transparency index composes over the previous
  canvas; disposal methods 0/1 "leave" and 2 "restore background"),
  full LZW with code-size growth and CLEAR-code resets. Disposal 3
  (restore previous) and missing color tables raise ``ValueError``.
- encode: full-size frames over a shared global color table built
  from the input (raises beyond 256 distinct colors — this encoder
  fixtures tests, it doesn't quantize), optional interlace, optional
  transparency color, real LZW compression with a table reset at
  4096 entries.

Like the other codecs this is correctness-grade Python — the 100 TB
story is the Arrow-batched BinaryType carriage in
``operators/multimodal.py``, not this inner loop.
"""

from __future__ import annotations

import struct

from .codecs_common import parser_boundary


def _lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    """GIF-variant LZW: LSB-first codes, CLEAR/END controls, code size
    grows when the next free slot reaches 2^size (cap 12 bits)."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    acc = n = 0
    out = bytearray()
    prev: bytes | None = None
    for byte in data:
        acc |= byte << n
        n += 8
        while n >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            n -= code_size
            if code == clear:
                table = list(base)
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return list(out)
            if code < len(table) and code not in (clear, end):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"corrupt LZW stream (code {code})")
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
    raise ValueError("LZW stream ended without an END code")


class _LzwBits:
    """LSB-first bit packer for LZW codes."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, size: int) -> None:
        self._acc |= code << self._n
        self._n += size
        while self._n >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def flush(self) -> bytes:
        if self._n:
            self.out.append(self._acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    """Mirror of ``_lzw_decode``. The bit-width schedule SIMULATES the
    decoder's table growth rather than tracking the encoder's own
    dictionary: the decoder learns each new entry one code later than
    the encoder creates it (it appends while processing data code m≥2,
    the encoder right after emitting code m), and in particular it
    performs one final append for the LAST data code that the encoder
    never mirrors — so sizing codes off the encoder's dictionary can
    emit the END code one bit narrower than the decoder reads it."""
    clear = 1 << min_code_size
    end = clear + 1
    base_len = clear + 2
    bits = _LzwBits()

    code_size = min_code_size + 1
    sim_len = base_len  # decoder's table length at its NEXT read
    n_data = 0

    def emit_data(code: int) -> None:
        nonlocal code_size, sim_len, n_data
        bits.put(code, code_size)
        n_data += 1
        # The decoder appends an entry while processing every data code
        # from the second on, then checks for a size bump.
        if n_data >= 2 and sim_len < 4096:
            sim_len += 1
            if sim_len == (1 << code_size) and code_size < 12:
                code_size += 1

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    bits.put(clear, code_size)
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit_data(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
        else:  # dictionary full: CLEAR resets both sides in lockstep
            bits.put(clear, code_size)
            code_size = min_code_size + 1
            sim_len = base_len
            n_data = 0
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
        w = bytes([k])
    if w:
        emit_data(table[w])
    bits.put(end, code_size)
    return bits.flush()


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_rows(height: int) -> list[int]:
    return [y for start, step in _INTERLACE_PASSES for y in range(start, height, step)]


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: list[list[list[tuple[int, int, int]]]],
    interlace: bool = False,
    transparent_color: tuple[int, int, int] | None = None,
    delay_cs: int = 10,
) -> bytes:
    """Write a multi-frame GIF89a. ``frames`` is a list of full-size
    pixel grids (rows of (r, g, b), top first — same shape as the
    other codecs). Pixels equal to ``transparent_color`` in frames
    after the first are encoded via the GCE transparency index (the
    decoder then shows the previous canvas through them). Raises
    beyond 256 distinct colors — fixture encoder, not a quantizer."""
    if not frames or not frames[0]:
        raise ValueError("need at least one non-empty frame")
    height = len(frames[0])
    width = len(frames[0][0])
    for f in frames:
        if len(f) != height or any(len(row) != width for row in f):
            raise ValueError("all frames must share the canvas size")
    colors = sorted({px for f in frames for row in f for px in row})
    transparent_idx = None
    if transparent_color is not None and transparent_color not in colors:
        colors.append(transparent_color)
    if len(colors) > 256:
        raise ValueError(
            f"{len(colors)} distinct colors exceed GIF's 256-entry table "
            "(this fixture encoder does not quantize)"
        )
    cmap = {c: i for i, c in enumerate(colors)}
    if transparent_color is not None:
        transparent_idx = cmap[transparent_color]
    ct_bits = max(1, (len(colors) - 1).bit_length())
    ct_size = 1 << ct_bits
    mcs = max(2, ct_bits)  # LZW minimum code size must be >= 2

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out.append(0x80 | (ct_bits - 1))  # GCT present, 2^ct_bits entries
    out += bytes([0, 0])  # bg color index, aspect
    for c in colors:
        out += bytes(c)
    out += b"\x00" * (3 * (ct_size - len(colors)))

    for fi, f in enumerate(frames):
        flags = 0
        tidx = 0
        if transparent_idx is not None and fi > 0:
            flags = 0x01  # transparency on, disposal 0
            tidx = transparent_idx
        out += bytes([0x21, 0xF9, 4, flags]) + struct.pack("<H", delay_cs)
        out += bytes([tidx, 0])
        out += b"\x2C" + struct.pack("<HHHH", 0, 0, width, height)
        out.append(0x40 if interlace else 0x00)  # no LCT
        rows = _interlace_rows(height) if interlace else range(height)
        indices = [cmap[px] for y in rows for px in f[y]]
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(mcs, indices))
    out += b"\x3B"  # trailer
    return bytes(out)


@parser_boundary
def decode_gif(data: bytes) -> dict:
    """Decode an animated GIF. Returns ``{"width", "height",
    "n_frames", "frames"}`` where each frame is a full-canvas pixel
    grid (rows of (r, g, b), top first) AFTER composition — sub-rect
    placement, transparency, and disposal applied — so frame k is
    exactly what a viewer shows at step k."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF87a/89a magic)")
    width, height = struct.unpack_from("<HH", data, 6)
    flags, bg_idx = data[10], data[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
        pos += 3 * n
    if width == 0 or height == 0:
        raise ValueError("zero-size canvas")

    bg = gct[bg_idx] if gct and bg_idx < len(gct) else (0, 0, 0)
    canvas = [[bg] * width for _ in range(height)]
    frames: list[list[list[tuple[int, int, int]]]] = []
    transparent_idx: int | None = None
    disposal = 0
    n = len(data)

    def _skip_blocks(p: int) -> int:
        while True:
            if p >= n:
                raise ValueError("truncated sub-block chain")
            size = data[p]
            p += 1
            if size == 0:
                return p
            p += size

    while True:
        if pos >= n:
            raise ValueError("truncated GIF: no trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= n:
                raise ValueError("truncated extension")
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = data[pos]
                if size != 4 or pos + 5 > n:
                    raise ValueError("malformed graphic control extension")
                gflags = data[pos + 1]
                disposal = (gflags >> 2) & 0x07
                if disposal == 3:
                    raise ValueError(
                        "disposal method 3 (restore previous) not supported"
                    )
                transparent_idx = data[pos + 4] if gflags & 0x01 else None
                pos = _skip_blocks(pos)
            else:  # application / comment / plain text: skip
                pos = _skip_blocks(pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block introducer 0x{block:02X}")
        # Image descriptor
        if pos + 9 > n:
            raise ValueError("truncated image descriptor")
        left, top, fw, fh = struct.unpack_from("<HHHH", data, pos)
        iflags = data[pos + 8]
        pos += 9
        ct = gct
        if iflags & 0x80:  # local color table
            nct = 2 << (iflags & 0x07)
            ct = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(nct)]
            pos += 3 * nct
        if ct is None:
            raise ValueError("frame has neither local nor global color table")
        if left + fw > width or top + fh > height:
            raise ValueError("frame rectangle escapes the canvas")
        if pos >= n:
            raise ValueError("truncated image data")
        mcs = data[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError(f"bad LZW minimum code size {mcs}")
        chunks = bytearray()
        while True:
            if pos >= n:
                raise ValueError("truncated image sub-blocks")
            size = data[pos]
            pos += 1
            if size == 0:
                break
            chunks += data[pos : pos + size]
            pos += size
        indices = _lzw_decode(mcs, bytes(chunks))
        if len(indices) < fw * fh:
            raise ValueError(
                f"LZW stream yielded {len(indices)} pixels for a "
                f"{fw}x{fh} frame"
            )
        rows = _interlace_rows(fh) if iflags & 0x40 else range(fh)
        for ri, y in enumerate(rows):
            for x in range(fw):
                idx = indices[ri * fw + x]
                if transparent_idx is not None and idx == transparent_idx:
                    continue  # previous canvas shows through
                if idx >= len(ct):
                    raise ValueError(f"pixel index {idx} outside color table")
                canvas[top + y][left + x] = ct[idx]
        frames.append([row[:] for row in canvas])
        if disposal == 2:  # restore background for the NEXT frame
            for y in range(top, top + fh):
                for x in range(left, left + fw):
                    canvas[y][x] = bg
        transparent_idx = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image frames")
    return {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "frames": frames,
    }
