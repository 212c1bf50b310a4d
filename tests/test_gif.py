"""Animated GIF codec (operators/gif.py): LZW pair correctness across
code-size growth and table resets, frame composition (sub-rects,
transparency, disposal, interlace), honest-scope rejections, and the
REAL sample_frames path through Spark."""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from salesforce_postgresql_etl_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _checker(w, h, a, b):
    return [[a if (x + y) % 2 == 0 else b for x in range(w)] for y in range(h)]


def test_lzw_pair_growth_and_reset():
    """decode(encode(idx)) == idx for alphabet sizes from 4 to 256 and
    streams long enough to cross the 512/1024/2048 code-size boundaries
    AND the 4096-entry table reset."""
    rng = random.Random(7)
    for mcs, length in [(2, 50), (3, 500), (4, 2000), (8, 30000), (8, 120000)]:
        idx = [rng.randrange(1 << mcs) for _ in range(length)]
        assert _lzw_decode(mcs, _lzw_encode(mcs, idx)) == idx, (mcs, length)
    # Degenerate single-symbol stream (maximum run-length compression).
    assert _lzw_decode(2, _lzw_encode(2, [1] * 5000)) == [1] * 5000


def test_gif_roundtrip_single_and_multi_frame():
    f1 = [
        [(x * 20 % 256, y * 30 % 256, 40) for x in range(13)] for y in range(9)
    ]
    d = decode_gif(encode_gif([f1]))
    assert (d["width"], d["height"], d["n_frames"]) == (13, 9, 1)
    assert d["frames"][0] == f1
    f2 = [[(255 - r, g, b) for (r, g, b) in row] for row in f1]
    d = decode_gif(encode_gif([f1, f2, f1]))
    assert d["n_frames"] == 3
    assert d["frames"] == [f1, f2, f1]  # lossless: palette codec


def test_gif_interlace():
    # The 4-pass row shuffle must invert exactly (pass order 0/8, 4/8,
    # 2/4, 1/2 per the spec).
    f = _checker(11, 10, (10, 20, 30), (200, 100, 50))
    d = decode_gif(encode_gif([f], interlace=True))
    assert d["frames"][0] == f


def test_gif_transparency_composes_over_previous_frame():
    T = (1, 2, 3)
    base = [[(50, 60, 70)] * 13 for _ in range(9)]
    hole = [
        [T if (3 <= x <= 6 and 2 <= y <= 4) else (9, 9, 9) for x in range(13)]
        for y in range(9)
    ]
    d = decode_gif(encode_gif([base, hole], transparent_color=T))
    assert d["frames"][1][3][4] == (50, 60, 70)  # previous shows through
    assert d["frames"][1][0][0] == (9, 9, 9)
    assert d["frames"][0] == base  # first frame unaffected


def test_gif_honest_scope_rejections():
    f = _checker(8, 6, (0, 0, 0), (255, 255, 255))
    good = encode_gif([f])
    with pytest.raises(ValueError, match="magic"):
        decode_gif(b"NOPE" + good)
    with pytest.raises(ValueError, match="trailer"):
        decode_gif(good[:-1])  # cut exactly the 0x3B trailer
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(good[:-2])  # ... and the sub-block terminator too
    with pytest.raises(ValueError):
        decode_gif(good[:20])
    # >256 distinct colors: the fixture encoder refuses to quantize.
    big = [
        [(x % 256, y % 256, (x + y) % 256) for x in range(40)]
        for y in range(30)
    ]
    with pytest.raises(ValueError, match="256"):
        encode_gif([big])
    # Disposal 3 (restore previous) is out of scope: patch the GCE.
    i = good.find(b"\x21\xf9")
    bad = bytearray(good)
    bad[i + 3] |= 0x0C  # disposal bits ← 3
    with pytest.raises(ValueError, match="disposal"):
        decode_gif(bytes(bad))
    # Frame rect escaping the canvas.
    j = good.find(b"\x2c")
    esc = bytearray(good)
    struct.pack_into("<H", esc, j + 1, 5)  # left=5 on an 8-wide canvas
    with pytest.raises(ValueError, match="escapes"):
        decode_gif(bytes(esc))


_few_colors = st.sampled_from(
    [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255),
     (128, 128, 0), (0, 128, 128)]
)


@given(
    w=st.integers(1, 12),
    h=st.integers(1, 9),
    n=st.integers(1, 4),
    interlace=st.booleans(),
    data=st.data(),
)
@settings(max_examples=20, deadline=None)
def test_gif_codec_roundtrip_property(w, h, n, interlace, data):
    # GIF is LOSSLESS for palettized content: decode(encode(frames))
    # must be exact for any dims, any frame count, interlaced or not.
    frames = [
        [[data.draw(_few_colors) for _ in range(w)] for _ in range(h)]
        for _ in range(n)
    ]
    out = decode_gif(encode_gif(frames, interlace=interlace))
    assert (out["width"], out["height"], out["n_frames"]) == (w, h, n)
    assert out["frames"] == frames


def test_gif_dispatch_in_decode_payload():
    """_decode_payload treats a GIF as decodable on BOTH image and
    video rows (n_pixels = canvas size), with the usual fake/strict
    garbage contract."""
    from salesforce_postgresql_etl_spark.operators.multimodal import (
        _decode_payload,
    )

    good = encode_gif([_checker(7, 5, (0, 0, 0), (255, 0, 0))] * 2)
    for kind in ("image", "video"):
        for fake in (True, False):
            assert _decode_payload(good, kind, fake)["n_pixels"] == 35
    garbage = b"GIF89a" + bytes(range(32))
    assert "n_pixels" not in _decode_payload(garbage, "video", fake=True)
    with pytest.raises(ValueError):
        _decode_payload(garbage, "video", fake=False)


def test_gif_sample_frames_real_end_to_end(spark, tmp_path):
    """(r7) The video slot runs on REAL bytes: an animated GIF through
    parquet → mapInPandas with fake=False yields evenly-spaced frames
    re-encoded as PNGs whose pixels equal the composed animation; a
    non-GIF video in strict mode still raises."""
    from salesforce_postgresql_etl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_png,
        sample_frames,
    )

    clips = [
        [[(i * 40, 0, 0)] * 10 for _ in range(6)] for i in range(6)
    ]  # 6 frames, constant color per frame
    gif = encode_gif(clips)
    rows = [(0, "video", gif, (10, 6, None, "gif"))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    p = str(tmp_path / "gif.parquet")
    media.write.parquet(p)
    out = sorted(
        sample_frames(spark.read.parquet(p), n_frames=3, fake=False).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in out] == [0, 1, 2]
    # Evenly spaced over 6 frames: indices 0, 2, 4.
    for r, src_idx in zip(out, [0, 2, 4]):
        png = decode_png(bytes(r.frame))
        assert (png["width"], png["height"]) == (10, 6)
        assert png["pixels"][0][0] == (src_idx * 40, 0, 0)
    # Strict mode still raises for a non-GIF container in the batch.
    bad = spark.createDataFrame(
        [(1, "video", bytes(64), (None, None, None, "mp4"))], MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="NotImplementedError|frame"):
        sample_frames(bad, fake=False).collect()
