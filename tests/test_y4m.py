"""YUV4MPEG2 codec (operators/y4m.py): header grammar (tagged
params, X-metadata skip, defaults), C444/C420jpeg/Cmono round-trips
with proven error bounds, honest-scope rejections, dispatch in
_decode_payload, the REAL sample_frames path through Spark, and
cross-container near-dup (the same clip as GIF vs Y4M shares zero
payload bytes)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from salesforce_postgresql_etl_spark.operators.y4m import (
    decode_y4m,
    encode_y4m,
)


def _gradient(w, h, seed=0):
    return [
        [((x * 9 + seed) % 256, (y * 17 + seed) % 256, (x + y + seed) % 256)
         for x in range(w)]
        for y in range(h)
    ]


def _max_err(a, b):
    return max(
        abs(ca - cb)
        for ra, rb in zip(a, b)
        for pa, pb in zip(ra, rb)
        for ca, cb in zip(pa, pb)
    )


def test_y4m_c444_roundtrip_bounded():
    """Full-range BT.601 with full-resolution chroma: quantizing
    (Y, Cb, Cr) to bytes moves each by ≤0.5, so the reconstructed
    channels move by ≤ 0.5·(1 + 1.772) < 1.4 before the final
    rounding — error ≤ 2 per channel, every pixel."""
    frames = [_gradient(9, 7), _gradient(9, 7, seed=131)]
    out = decode_y4m(encode_y4m(frames, colorspace="444"))
    assert (out["width"], out["height"], out["n_frames"]) == (9, 7, 2)
    for got, src in zip(out["frames"], frames):
        assert _max_err(got, src) <= 2


def test_y4m_mono_gray_exact():
    """Gray input (r=g=b=v) has Y = v exactly (the BT.601 weights sum
    to 1), so Cmono round-trips bit-identically."""
    frames = [[[(v, v, v) for v in range(16)] for _ in range(5)]]
    out = decode_y4m(encode_y4m(frames, colorspace="mono"))
    assert out["frames"] == frames


def test_y4m_420jpeg_constant_blocks_bounded():
    """When every 2×2 block is one color the subsampling mean is the
    per-pixel value, so 4:2:0 inherits the C444 ≤2 bound."""
    base = _gradient(5, 4, seed=9)
    frames = [
        [
            [base[y // 2][x // 2] for x in range(10)]
            for y in range(8)
        ]
    ]
    out = decode_y4m(encode_y4m(frames, colorspace="420jpeg"))
    assert (out["width"], out["height"]) == (10, 8)
    assert _max_err(out["frames"][0], frames[0]) <= 2


@given(
    w=st.integers(1, 10),
    h=st.integers(1, 8),
    n=st.integers(1, 3),
    data=st.data(),
)
@settings(max_examples=20, deadline=None)
def test_y4m_c444_roundtrip_property(w, h, n, data):
    px = st.tuples(
        st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
    )
    frames = [
        [[data.draw(px) for _ in range(w)] for _ in range(h)]
        for _ in range(n)
    ]
    out = decode_y4m(encode_y4m(frames))
    assert (out["width"], out["height"], out["n_frames"]) == (w, h, n)
    for got, src in zip(out["frames"], frames):
        assert _max_err(got, src) <= 2


def test_y4m_header_grammar_tolerance():
    """Unknown X metadata and F/I/A params skip; runs of spaces are
    tolerated; C defaults to 420jpeg when absent."""
    gray = bytes(range(16)) * 2  # 8x4 luma plane
    cb = bytes([128] * 8)
    cr = bytes([128] * 8)
    raw = (
        b"YUV4MPEG2 W8 H4 F30000:1001 It A128:117  Xsome=meta "
        b"XCOLORRANGE=FULL\nFRAME Xtag\n" + gray[:32] + cb + cr
    )
    out = decode_y4m(raw)
    assert (out["width"], out["height"], out["n_frames"]) == (8, 4, 1)
    # neutral chroma → gray pixels survive the 601 round trip exactly
    assert out["frames"][0][0][0] == (0, 0, 0)


def test_y4m_honest_scope_rejections():
    frames = [_gradient(6, 4)]
    good = encode_y4m(frames)
    with pytest.raises(ValueError):
        decode_y4m(b"JUNK" + good)  # bad magic
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 H4 C444\nFRAME\n" + b"\x00" * 48)  # no W
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W6 H4 C422\n")  # unsupported colorspace
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W6 H4 Q7\n")  # unknown tag raises
    with pytest.raises(ValueError):
        decode_y4m(good[:-5])  # truncated final plane
    with pytest.raises(ValueError):
        decode_y4m(good.replace(b"FRAME", b"FRAMX", 1))  # bad marker
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W5 H4 C420jpeg\n")  # odd width under 420
    with pytest.raises(ValueError):
        encode_y4m(frames, colorspace="422")  # encoder scope
    with pytest.raises(ValueError):
        encode_y4m([_gradient(5, 4)], colorspace="420jpeg")  # odd dims
    with pytest.raises(ValueError):
        encode_y4m([_gradient(6, 4), _gradient(6, 5)])  # size mismatch
    with pytest.raises(ValueError):
        encode_y4m([])  # no frames


def test_y4m_dispatch_in_decode_payload():
    from salesforce_postgresql_etl_spark.operators.multimodal import (
        _decode_payload,
    )

    good = encode_y4m([_gradient(7, 5)] * 2)
    for fake in (True, False):
        assert _decode_payload(good, "video", fake)["n_pixels"] == 35
    garbage = b"YUV4MPEG2 W7 H5 C444\nFRAME\n" + b"\x01" * 10  # truncated
    assert "n_pixels" not in _decode_payload(garbage, "video", fake=True)
    with pytest.raises(ValueError):
        _decode_payload(garbage, "video", fake=False)
    # an image row never routes to the video codec
    assert "n_pixels" not in _decode_payload(good, "image", fake=True)


def test_y4m_sample_frames_real_end_to_end(spark, tmp_path):
    """The planar stream format samples for REAL: a C444 clip through
    parquet → mapInPandas with fake=False yields evenly-spaced PNG
    frames within the conversion bound of the source frames."""
    from salesforce_postgresql_etl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_png,
        sample_frames,
    )

    clips = [[[(i * 40, 10, 0)] * 10 for _ in range(6)] for i in range(6)]
    y4m = encode_y4m(clips, colorspace="444")
    rows = [(0, "video", y4m, (10, 6, None, "y4m"))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    p = str(tmp_path / "y4m.parquet")
    media.write.parquet(p)
    out = sorted(
        sample_frames(spark.read.parquet(p), n_frames=3, fake=False).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in out] == [0, 1, 2]
    for r, src_idx in zip(out, [0, 2, 4]):
        png = decode_png(bytes(r.frame))
        assert _max_err(png["pixels"], clips[src_idx]) <= 2


def test_y4m_cross_container_video_neardup(spark):
    """The same clip as animated GIF vs YUV4MPEG2 shares zero payload
    bytes; per-frame perceptual hashes still pair them, and the
    planar colorspace round-trip moves the pHash only within the
    near-dup radius (lossless GIF vs full-range-601 Y4M)."""
    from salesforce_postgresql_etl_spark.operators.gif import encode_gif
    from salesforce_postgresql_etl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
    )
    from salesforce_postgresql_etl_spark.operators.phash import video_neardup

    # per-seed block GEOMETRY (not just palette) — the r7
    # perceptual-fixture lesson: measured here, the 601 round trip
    # moves within-clip hashes ≤2 bits while cross-clip stays ≥38
    def _vframe(seed, t, w=48, h=32):
        bx, by = 4 + 2 * (seed % 3), 3 + (seed % 4)
        pal = [((37 * seed + 61 * k) % 256, (91 * seed + 43 * k) % 256,
                (29 * seed + 83 * k) % 256) for k in range(8)]
        if seed % 2:
            return [[pal[((x // bx) * (y // by) + t) % 8] for x in range(w)]
                    for y in range(h)]
        return [[pal[((x // bx) + (y // by) + t) % 8] for x in range(w)]
                for y in range(h)]

    rows = []
    for seed in (1, 2):
        frames = [_vframe(seed, t) for t in range(4)]
        rows.append((seed * 10, "video", encode_gif(frames),
                     (None, None, None, "gif")))
        rows.append((seed * 10 + 1, "video", encode_y4m(frames),
                     (None, None, None, "y4m")))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {
        (r.media_a, r.media_b)
        for r in video_neardup(media, n_frames=3, fake=False).collect()
    }
    assert pairs == {(10, 11), (20, 21)}  # containers pair, clips don't
