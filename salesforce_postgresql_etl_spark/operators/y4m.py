"""YUV4MPEG2 (Y4M) video codec in pure Python — fixture-grade.

Y4M is the uncompressed interchange stream ffmpeg and the mjpegtools
suite pipe between stages (public format: the mjpegtools YUV4MPEG2
man page / ffmpeg's yuv4mpegpipe muxer): one plain-text stream header
line, then each frame as a ``FRAME`` marker line followed by raw
planar YCbCr bytes. It is the third video container here to decode
for real (after animated GIF and RIFF/AVI) and the first PLANAR,
chroma-subsampled one — the frame layout exercises a genuinely
different decode path than AVI's packed bottom-up BGR.

Scope (honest, raised-not-guessed at the edges):
- decode: ``YUV4MPEG2 `` magic; tagged stream params ``W`` ``H``
  (required) ``C`` ``F`` ``I`` ``A`` ``X`` (unknown ``X`` metadata is
  skipped per the format's own extension rule; any OTHER unknown tag
  raises). Colorspaces ``C444`` (full-resolution planes),
  ``C420jpeg``/``C420``/``C420mpeg2``/``C420paldv`` (2×2-subsampled
  chroma — the siting variants share one byte layout; we decode them
  identically, which is exact for the ``jpeg`` siting and a
  half-pixel spatial approximation for the others), and ``Cmono``
  (luma plane only). ``C422``/``C411``/10-bit tags raise ValueError.
  Frame marker lines may carry their own parameters (skipped).
  Truncated planes, missing dimensions, and odd dimensions under 4:2:0
  raise — honest scope, not silent garbage.
- encode: ``C444``, ``C420jpeg`` (even dims required; chroma = plain
  2×2 mean, the jpeg/center siting), ``Cmono``. Conversion is the
  full-range BT.601 (JPEG/JFIF) matrix, and the encoder stamps
  ``XCOLORRANGE=FULL`` — ffmpeg's own extension tag for exactly this
  choice — so the bytes say what they mean. Full-range keeps the
  round-trip error bound tight (≤2 per channel for C444, proven in
  the hypothesis property) where studio swing would add a scaling
  loss.

Returns the shared video-codec shape ``{"width", "height",
"n_frames", "frames"}`` (full-size rows of (r, g, b), top first) so
``sample_frames`` / ``video_phash`` treat Y4M, AVI and GIF
identically.

Like the other codecs this is correctness-grade Python — the 100 TB
story is the Arrow-batched BinaryType carriage in
``operators/multimodal.py``, not this inner loop.
"""

from __future__ import annotations

from .codecs_common import parser_boundary

MAGIC = b"YUV4MPEG2 "

# Full-range BT.601 (JPEG/JFIF) — the matrix operators/jpeg.py uses.


def _rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[int, int, int]:
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    clamp = lambda v: min(255, max(0, int(round(v))))  # noqa: E731
    return clamp(y), clamp(cb), clamp(cr)


def _ycbcr_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    clamp = lambda v: min(255, max(0, int(round(v))))  # noqa: E731
    return clamp(r), clamp(g), clamp(b)


_C420_TAGS = ("420jpeg", "420", "420mpeg2", "420paldv")
_KNOWN_TAGS = _C420_TAGS + ("444", "mono")


def encode_y4m(
    frames: list[list[list[tuple[int, int, int]]]],
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "444",
) -> bytes:
    """Write a YUV4MPEG2 stream. ``frames`` is a list of full-size
    frames, each rows of (r, g, b) top first (the ``encode_avi``
    shape). ``colorspace`` ∈ {"444", "420jpeg", "mono"}."""
    if not frames or not frames[0] or not frames[0][0]:
        raise ValueError("need at least one non-empty frame")
    height = len(frames[0])
    width = len(frames[0][0])
    for f in frames:
        if len(f) != height or any(len(row) != width for row in f):
            raise ValueError("all frames must share the canvas size")
    if colorspace not in ("444", "420jpeg", "mono"):
        raise ValueError(f"unsupported encode colorspace C{colorspace}")
    if colorspace == "420jpeg" and (width % 2 or height % 2):
        raise ValueError("4:2:0 needs even dimensions")
    header = (
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 "
        f"C{colorspace} XCOLORRANGE=FULL\n"
    ).encode("ascii")
    out = [header]
    for f in frames:
        out.append(b"FRAME\n")
        # Per-pixel float YCbCr first; quantize Y now, chroma after
        # any subsampling mean so 4:2:0 averages full-precision values.
        yp = bytearray()
        cbf: list[list[float]] = []
        crf: list[list[float]] = []
        for row in f:
            cb_row, cr_row = [], []
            for r, g, b in row:
                yv = 0.299 * r + 0.587 * g + 0.114 * b
                yp.append(min(255, max(0, int(round(yv)))))
                cb_row.append(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b)
                cr_row.append(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b)
            cbf.append(cb_row)
            crf.append(cr_row)
        out.append(bytes(yp))
        if colorspace == "mono":
            continue
        q = lambda v: min(255, max(0, int(round(v))))  # noqa: E731
        if colorspace == "444":
            out.append(bytes(q(v) for row in cbf for v in row))
            out.append(bytes(q(v) for row in crf for v in row))
        else:  # 420jpeg — 2×2 mean, center siting
            for plane in (cbf, crf):
                sub = bytearray()
                for y in range(0, height, 2):
                    for x in range(0, width, 2):
                        sub.append(
                            q(
                                (
                                    plane[y][x]
                                    + plane[y][x + 1]
                                    + plane[y + 1][x]
                                    + plane[y + 1][x + 1]
                                )
                                / 4.0
                            )
                        )
                out.append(bytes(sub))
    return b"".join(out)


def _parse_header(data: bytes, pos: int, end: int) -> tuple[dict, int]:
    """Stream-header line → ({"width", "height", "colorspace"}, pos
    past the newline). Unknown X params skip; unknown tags raise."""
    nl = data.find(b"\n", pos, end)
    if nl < 0:
        raise ValueError("unterminated stream header")
    params = {"colorspace": "420jpeg"}  # the format's default
    for tok in data[pos:nl].split(b" "):
        if not tok:
            continue  # tolerate runs of spaces
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            params["width"] = int(val)
        elif tag == b"H":
            params["height"] = int(val)
        elif tag == b"C":
            cs = val.decode("ascii", "replace")
            if cs not in _KNOWN_TAGS:
                raise ValueError(f"unsupported colorspace C{cs}")
            params["colorspace"] = cs
        elif tag in (b"F", b"I", b"A", b"X"):
            pass  # rate / interlace / aspect / metadata — not needed
        else:
            raise ValueError(f"unknown stream parameter {tok!r}")
    if "width" not in params or "height" not in params:
        raise ValueError("stream header missing W or H")
    if params["width"] <= 0 or params["height"] <= 0:
        raise ValueError("bad dimensions in stream header")
    return params, nl + 1


@parser_boundary
def decode_y4m(data: bytes) -> dict:
    """Decode a YUV4MPEG2 stream. Returns the shared video-codec
    shape ``{"width", "height", "n_frames", "frames"}``."""
    if data[: len(MAGIC)] != MAGIC:
        raise ValueError("not a YUV4MPEG2 payload")
    end = len(data)
    params, pos = _parse_header(data, len(MAGIC), end)
    w, h, cs = params["width"], params["height"], params["colorspace"]
    mono = cs == "mono"
    sub420 = cs in _C420_TAGS
    if sub420 and (w % 2 or h % 2):
        raise ValueError("4:2:0 needs even dimensions")
    if mono:
        frame_bytes = w * h
    elif sub420:
        frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    else:
        frame_bytes = 3 * w * h
    frames = []
    while pos < end:
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {pos}")
        nl = data.find(b"\n", pos + 5, end)
        if nl < 0:
            raise ValueError("unterminated FRAME header")
        # frame-level params (between FRAME and \n) carry no layout
        # info in the supported colorspaces — skipped like X tags
        pos = nl + 1
        if pos + frame_bytes > end:
            raise ValueError("truncated frame planes")
        yp = data[pos : pos + w * h]
        if mono:
            rows = [
                [(v, v, v) for v in yp[y * w : (y + 1) * w]]
                for y in range(h)
            ]
        elif sub420:
            cw, chn = w // 2, (w // 2) * (h // 2)
            cb = data[pos + w * h : pos + w * h + chn]
            cr = data[pos + w * h + chn : pos + frame_bytes]
            rows = [
                [
                    _ycbcr_to_rgb(
                        yp[y * w + x],
                        cb[(y // 2) * cw + x // 2],
                        cr[(y // 2) * cw + x // 2],
                    )
                    for x in range(w)
                ]
                for y in range(h)
            ]
        else:
            cb = data[pos + w * h : pos + 2 * w * h]
            cr = data[pos + 2 * w * h : pos + frame_bytes]
            rows = [
                [
                    _ycbcr_to_rgb(yp[y * w + x], cb[y * w + x], cr[y * w + x])
                    for x in range(w)
                ]
                for y in range(h)
            ]
        frames.append(rows)
        pos += frame_bytes
    if not frames:
        raise ValueError("stream carries no frames")
    return {"width": w, "height": h, "n_frames": len(frames), "frames": frames}
