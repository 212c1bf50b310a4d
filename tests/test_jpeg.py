"""Baseline JPEG codec (operators/jpeg.py): DCT parity with the T.81
Annex A formula, round-trips across every decoder path (4:4:4, 4:2:0,
grayscale), honest-scope rejections, and the multimodal dispatch."""

from __future__ import annotations

import math
import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from salesforce_postgresql_etl_spark.operators.jpeg import (
    ZIGZAG,
    _dct2d,
    _idct2d,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(w: int, h: int) -> list[list[tuple[int, int, int]]]:
    return [
        [(min(255, x * 10), min(255, y * 15), (x * 5 + y * 7) % 256) for x in range(w)]
        for y in range(h)
    ]


def _max_err(a, b) -> int:
    return max(
        abs(ca - cb)
        for ra, rb in zip(a, b)
        for pa, pb in zip(ra, rb)
        for ca, cb in zip(pa, pb)
    )


def test_dct_matches_annex_a_formula():
    """The separable matrix DCT must equal the spec's double sum
    F(u,v) = α(u)α(v)/4 ΣΣ f(x,y)cos·cos — guards the basis-matrix
    derivation — and invert exactly."""
    rng = random.Random(42)
    blk = [[rng.uniform(-128, 127) for _ in range(8)] for _ in range(8)]

    def naive(b):
        out = [[0.0] * 8 for _ in range(8)]
        for u in range(8):
            for v in range(8):
                au = math.sqrt(0.5) if u == 0 else 1.0
                av = math.sqrt(0.5) if v == 0 else 1.0
                out[u][v] = 0.25 * au * av * sum(
                    b[x][y]
                    * math.cos((2 * x + 1) * u * math.pi / 16)
                    * math.cos((2 * y + 1) * v * math.pi / 16)
                    for x in range(8)
                    for y in range(8)
                )
        return out

    f = _dct2d(blk)
    g = naive(blk)
    assert max(abs(f[u][v] - g[u][v]) for u in range(8) for v in range(8)) < 1e-9
    r = _idct2d(f)
    assert max(abs(r[x][y] - blk[x][y]) for x in range(8) for y in range(8)) < 1e-9


def test_zigzag_matches_published_order():
    # The generated diagonal walk must reproduce the spec's sequence.
    assert ZIGZAG[:16] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert sorted(ZIGZAG) == list(range(64))
    assert ZIGZAG[-6:] == [61, 54, 47, 55, 62, 63]


def test_jpeg_roundtrip_444_and_sizes():
    px = _gradient(20, 14)  # non-multiple-of-8 dims exercise edge pad
    data = encode_jpeg(px, quality=95)
    d = decode_jpeg(data)
    assert (d["width"], d["height"], d["channels"]) == (20, 14, 3)
    assert _max_err(d["pixels"], px) <= 4
    # q100 (all-ones quant tables): error is DCT+colorspace rounding only.
    d100 = decode_jpeg(encode_jpeg(px, quality=100))
    assert _max_err(d100["pixels"], px) <= 2


def test_jpeg_roundtrip_420_mcu_interleave():
    # 4:2:0 drives the 2x2-sampling MCU path on BOTH sides; chroma
    # subsampling is lossy so the bound is looser but still tight for
    # a smooth gradient.
    px = _gradient(20, 14)
    d = decode_jpeg(encode_jpeg(px, quality=95, subsample=True))
    assert (d["width"], d["height"]) == (20, 14)
    assert _max_err(d["pixels"], px) <= 24
    # Constant-color image survives subsampling almost exactly.
    flat = [[(120, 60, 200)] * 18 for _ in range(11)]
    df = decode_jpeg(encode_jpeg(flat, quality=95, subsample=True))
    assert _max_err(df["pixels"], flat) <= 2


def test_jpeg_grayscale_single_component():
    px = _gradient(9, 9)
    d = decode_jpeg(encode_jpeg(px, quality=95, gray=True))
    assert d["channels"] == 1 and (d["width"], d["height"]) == (9, 9)
    for row in d["pixels"]:
        for r, g, b in row:
            assert r == g == b
    # Luma of the decoded gray must track the source's luma.
    y_src = 0.299 * px[4][4][0] + 0.587 * px[4][4][1] + 0.114 * px[4][4][2]
    assert abs(d["pixels"][4][4][0] - y_src) <= 4


def test_jpeg_honest_scope_rejections():
    px = _gradient(10, 8)
    good = encode_jpeg(px, quality=90)

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG" + good)
    # Progressive: flip the SOF0 marker to SOF2.
    i = good.find(b"\xff\xc0")
    prog = good[:i] + b"\xff\xc2" + good[i + 2 :]
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(prog)
    # 16-bit quant tables: set the DQT precision nibble.
    j = good.find(b"\xff\xdb")
    bad_q = bytearray(good)
    bad_q[j + 4] |= 0x10
    with pytest.raises(ValueError, match="16-bit"):
        decode_jpeg(bytes(bad_q))
    # Nonzero restart interval: inject a DRI segment before SOS.
    k = good.find(b"\xff\xda")
    dri = struct.pack(">HHH", 0xFFDD, 4, 8)
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(good[:k] + dri + good[k:])
    # Truncation inside the entropy-coded scan.
    with pytest.raises(ValueError):
        decode_jpeg(good[: k + 20])
    # 12-bit precision.
    isof = good.find(b"\xff\xc0")
    bad_p = bytearray(good)
    bad_p[isof + 4] = 12
    with pytest.raises(ValueError, match="12-bit"):
        decode_jpeg(bytes(bad_p))


_px = st.tuples(
    st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
)


@given(
    w=st.integers(1, 17),
    h=st.integers(1, 10),
    data=st.data(),
)
@settings(max_examples=15, deadline=None)
def test_jpeg_codec_roundtrip_property(w, h, data):
    # At q=100 every quant step is 1, so decode(encode(px)) differs
    # from px only by DCT float rounding + YCbCr int rounding — a
    # tight bound that holds for ARBITRARY noise, any dims (edge
    # padding included). Lossier qualities trade that bound away;
    # q=100 is the property-friendly setting.
    px = [[data.draw(_px) for _ in range(w)] for _ in range(h)]
    out = decode_jpeg(encode_jpeg(px, quality=100))
    assert (out["width"], out["height"], out["channels"]) == (w, h, 3)
    assert _max_err(out["pixels"], px) <= 4


def test_jpeg_dispatch_in_decode_payload():
    """_decode_payload auto-dispatches on FFD8 with the same contract
    as the other image codecs."""
    from salesforce_postgresql_etl_spark.operators.multimodal import (
        _decode_payload,
    )

    good = encode_jpeg(_gradient(6, 5), quality=90)
    for fake in (True, False):
        assert _decode_payload(good, "image", fake)["n_pixels"] == 30
    garbage = b"\xff\xd8" + bytes(range(64))
    feats = _decode_payload(garbage, "image", fake=True)
    assert "n_pixels" not in feats
    with pytest.raises(ValueError):
        _decode_payload(garbage, "image", fake=False)


def test_jpeg_real_decode_end_to_end(spark, tmp_path):
    """A JPEG payload decodes for REAL through the full Spark path
    (parquet round-trip → mapInPandas, fake=False): n_pixels from the
    entropy-decoded pixel array, lying metadata ignored — including a
    4:2:0 payload (the MCU path) in the same batch."""
    from salesforce_postgresql_etl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    rows = [
        (0, "image", encode_jpeg(_gradient(6, 4), quality=90),
         (99, 99, None, "jpeg")),
        (1, "image", encode_jpeg(_gradient(18, 10), quality=85, subsample=True),
         (None, None, None, "jpeg")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    p = str(tmp_path / "jpeg.parquet")
    media.write.parquet(p)
    feats = {
        r.media_id: r
        for r in extract_features(spark.read.parquet(p), fake=False).collect()
    }
    assert feats[0].n_pixels == 24  # real 6*4, NOT the lying 99*99 meta
    assert feats[1].n_pixels == 180
