"""AVI (RIFF) video container codec in pure Python — fixture-grade.

After r7's GIF work, the one multimodal slot still stubbed was
non-GIF video CONTAINERS. AVI is the canonical RIFF video container
(public spec: Microsoft's AVI RIFF form, the same chunk grammar
``decode_wav`` already walks), and with uncompressed DIB frames
(``BI_RGB`` — the layout ``decode_bmp`` parses) it needs no codec
library at all: container demux AND frame decode run on real bytes.

Scope (honest, raised-not-guessed at the edges):
- decode: RIFF/'AVI ' form; ``hdrl`` list with ``avih`` + one video
  (``vids``) ``strl``; ``movi`` list with ``##db``/``##dc`` frame
  chunks for that stream, directly or inside ``rec `` sub-lists;
  unknown chunks (``JUNK``, ``idx1``, audio streams) are skipped by
  the chunk grammar. Two frame codings decode for real:
  ``biCompression == 0`` (24-bit BI_RGB DIB — the layout
  ``decode_bmp`` parses) and ``biCompression == 'MJPG'`` (Motion
  JPEG: every frame chunk is a self-contained baseline JPEG, handed
  to ``operators/jpeg.decode_jpeg`` — the first genuinely COMPRESSED
  video decoding for real here). Other compressions, non-24-bit DIB
  frames, MJPEG frames whose SOF geometry disagrees with the
  container's ``strf``, and frames whose byte size disagrees with
  the declared geometry raise ``ValueError`` — honest scope, not
  silent garbage. (MJPEG frames must carry their own DQT/DHT tables,
  as our encoder always writes; the legacy table-less MJPEG variant
  raises from the JPEG layer.)
- encode: minimal single-stream AVI; ``codec="dib"`` writes
  full-size bottom-up BGR ``00db`` frames (4-byte row padding,
  word-aligned chunks); ``codec="mjpeg"`` writes one baseline JPEG
  per ``00dc`` chunk (quality-scaled, lossy — round-trips bound
  error, not equality). Exists so tests can round-trip real
  container bytes.

Like the other codecs this is correctness-grade Python — the 100 TB
story is the Arrow-batched BinaryType carriage in
``operators/multimodal.py``, not this inner loop.
"""

from __future__ import annotations

import struct

from .codecs_common import parser_boundary

_AVIH_FMT = "<IIIIIIIIIIIIII"  # 14 DWORDs = 56 bytes
_STRH_FMT = "<4s4sIHHIIIIIIII4h"  # 56 bytes
_BMIH_FMT = "<IiiHHIIiiII"  # BITMAPINFOHEADER, 40 bytes
_MJPG = struct.unpack("<I", b"MJPG")[0]  # biCompression fourcc


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    # RIFF chunks are word-aligned: odd payloads get one pad byte that
    # is NOT counted in the stored size.
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def _dib_frame(frame: list[list[tuple[int, int, int]]]) -> bytes:
    """Bottom-up BGR rows padded to 4 bytes — the BI_RGB DIB layout,
    identical to a BMP's pixel array (multimodal.encode_bmp)."""
    height = len(frame)
    width = len(frame[0])
    row_size = (width * 3 + 3) & ~3
    body = bytearray()
    for row in reversed(frame):
        for r, g, b in row:
            body += bytes((b, g, r))
        body += b"\x00" * (row_size - width * 3)
    return bytes(body)


def encode_avi(
    frames: list[list[list[tuple[int, int, int]]]],
    fps: int = 10,
    codec: str = "dib",
    quality: int = 90,
) -> bytes:
    """Write a single-stream AVI. ``frames`` is a list of full-size
    pixel grids (rows of (r, g, b), top first — the shared codec
    shape). ``codec="dib"`` stores 24-bit BI_RGB ``00db`` frames
    (lossless); ``codec="mjpeg"`` stores one baseline JPEG per
    ``00dc`` chunk at the given ``quality`` (lossy). Fixture encoder:
    one ``vids`` stream, no index (the decoder never needs ``idx1``)."""
    if codec not in ("dib", "mjpeg"):
        raise ValueError(f"unsupported codec {codec!r}")
    if not frames or not frames[0]:
        raise ValueError("need at least one non-empty frame")
    height = len(frames[0])
    width = len(frames[0][0])
    for f in frames:
        if len(f) != height or any(len(row) != width for row in f):
            raise ValueError("all frames must share the canvas size")
    if codec == "mjpeg":
        from .jpeg import encode_jpeg

        payloads = [encode_jpeg(f, quality=quality) for f in frames]
        handler, compression, chunk_id = b"MJPG", _MJPG, b"00dc"
    else:
        payloads = [_dib_frame(f) for f in frames]
        handler, compression, chunk_id = b"DIB ", 0, b"00db"
    row_size = (width * 3 + 3) & ~3
    frame_bytes = max(
        len(p) for p in payloads
    ) if codec == "mjpeg" else row_size * height
    avih = struct.pack(
        _AVIH_FMT,
        1_000_000 // max(fps, 1),  # MicroSecPerFrame
        frame_bytes * fps,  # MaxBytesPerSec
        0,  # PaddingGranularity
        0x10,  # Flags: AVIF_HASINDEX off, AVIF_WASCAPTUREFILE off; 0x10 = AVIF_ISINTERLEAVED
        len(frames),
        0,  # InitialFrames
        1,  # Streams
        frame_bytes,  # SuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # Reserved
    )
    strh = struct.pack(
        _STRH_FMT,
        b"vids",
        handler,
        0, 0, 0, 0,  # Flags, Priority, Language, InitialFrames
        1, max(fps, 1),  # Scale, Rate → fps frames/sec
        0, len(frames),  # Start, Length
        frame_bytes, 0xFFFFFFFF, 0,  # SuggestedBufferSize, Quality(-1), SampleSize
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        _BMIH_FMT, 40, width, height, 1, 24, compression,
        frame_bytes, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(
        b"movi", b"".join(_chunk(chunk_id, p) for p in payloads)
    )
    body = b"AVI " + hdrl + movi
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) over a chunk run,
    honoring word alignment. Truncated headers/payloads raise."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated chunk header")
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if pos + 8 + size > end:
            raise ValueError(f"truncated {fourcc!r} chunk")
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def _parse_strl(data: bytes, start: int, size: int):
    """One stream-definition list → (fcc_type, bmih-dict or None)."""
    fcc_type = None
    fmt = None
    for fourcc, p, sz in _walk(data, start, start + size):
        if fourcc == b"strh":
            if sz < 8:
                raise ValueError("strh too short")
            fcc_type = data[p : p + 4]
        elif fourcc == b"strf" and fcc_type == b"vids":
            if sz < 40:
                raise ValueError("video strf shorter than BITMAPINFOHEADER")
            (bmih_size, w, h, planes, bpp, compression) = struct.unpack_from(
                "<IiiHHI", data, p
            )
            if bmih_size < 40:
                raise ValueError(f"bad BITMAPINFOHEADER size {bmih_size}")
            fmt = {"width": w, "height": h, "planes": planes, "bpp": bpp,
                   "compression": compression}
    return fcc_type, fmt


def _decode_dib(data: bytes, p: int, sz: int, width: int, height: int):
    """One BI_RGB frame chunk → rows of (r, g, b), top first."""
    top_down = height < 0
    h = -height if top_down else height
    row_size = (width * 3 + 3) & ~3
    if sz != row_size * h:
        raise ValueError(
            f"frame chunk is {sz} bytes, geometry says {row_size * h}"
        )
    rows = []
    for y in range(h):
        base = p + y * row_size
        rows.append(
            [
                (data[base + 3 * x + 2], data[base + 3 * x + 1], data[base + 3 * x])
                for x in range(width)
            ]
        )
    if not top_down:
        rows.reverse()  # DIB storage is bottom-up; present top row first
    return rows


@parser_boundary
def decode_avi(data: bytes) -> dict:
    """Decode an uncompressed-DIB AVI. Returns the shared video-codec
    shape ``{"width", "height", "n_frames", "frames"}`` (frames are
    full-size rows of (r, g, b), top first) so ``sample_frames``
    treats AVI and GIF identically."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = 8 + riff_size
    if end > len(data):
        raise ValueError("truncated RIFF body")
    fmt = None
    vids_seen = 0
    vids_stream = None  # ordinal of the vids strl — IS its stream number
    strl_ordinal = 0
    all_chunks: list[tuple[bytes, int, int]] = []

    def collect_movi(start: int, size: int) -> None:
        # Frame ids are '##db'/'##dc' with ## = the stream's two-digit
        # number (= its strl's position in hdrl order — not always 00:
        # an AVI may list audio first, putting video frames in '01dc',
        # r8 advice); 'rec ' sub-lists group chunks for interleaved
        # playback and just recurse. Collect every stream's chunks
        # here and filter by the vids stream id after the hdrl walk
        # has identified it.
        for fourcc, p, sz in _walk(data, start, start + size):
            if fourcc == b"LIST" and data[p : p + 4] == b"rec ":
                collect_movi(p + 4, sz - 4)
            elif fourcc[2:4] in (b"db", b"dc"):
                all_chunks.append((fourcc[:2], p, sz))

    for fourcc, p, sz in _walk(data, 12, end):
        if fourcc != b"LIST":
            continue  # idx1 / JUNK / odd top-level chunks
        list_type = data[p : p + 4]
        if list_type == b"hdrl":
            for f2, p2, sz2 in _walk(data, p + 4, p + sz):
                if f2 == b"LIST" and data[p2 : p2 + 4] == b"strl":
                    fcc, strl_fmt = _parse_strl(data, p2 + 4, sz2 - 4)
                    if fcc == b"vids":
                        vids_seen += 1
                        vids_stream = strl_ordinal
                        fmt = strl_fmt
                    strl_ordinal += 1
        elif list_type == b"movi":
            collect_movi(p + 4, sz - 4)

    if fmt is None:
        raise ValueError("AVI has no video (vids) stream")
    if vids_seen > 1:
        raise ValueError(f"{vids_seen} video streams; single-stream scope")
    if vids_stream > 99:
        raise ValueError(f"video is stream {vids_stream}; two-digit scope")
    stream_id = b"%02d" % vids_stream
    frame_chunks = [(p, sz) for pre, p, sz in all_chunks if pre == stream_id]
    mjpeg = fmt["compression"] == _MJPG
    if not mjpeg and (
        fmt["planes"] != 1 or fmt["bpp"] != 24 or fmt["compression"] != 0
    ):
        raise ValueError(
            "only 24-bit BI_RGB and MJPG frames supported (planes="
            f"{fmt['planes']}, bpp={fmt['bpp']}, "
            f"compression={fmt['compression']}) — other compressed video "
            "needs codec libraries this environment lacks"
        )
    width, height = fmt["width"], fmt["height"]
    if width <= 0 or height == 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    if not frame_chunks:
        raise ValueError(
            f"AVI contains no frames for video stream {stream_id.decode()}"
        )
    if mjpeg:
        from .jpeg import decode_jpeg

        frames = []
        for i, (p, sz) in enumerate(frame_chunks):
            img = decode_jpeg(data[p : p + sz])
            if (img["width"], img["height"]) != (width, abs(height)):
                raise ValueError(
                    f"MJPEG frame {i} is {img['width']}x{img['height']}, "
                    f"container strf says {width}x{abs(height)}"
                )
            frames.append(img["pixels"])
    else:
        frames = [
            _decode_dib(data, p, sz, width, height) for p, sz in frame_chunks
        ]
    return {
        "width": width,
        "height": abs(height),
        "n_frames": len(frames),
        "frames": frames,
    }
