"""AVI container codec (operators/avi.py): RIFF chunk grammar
(word alignment, JUNK/idx1 skipping, rec-list recursion), DIB frame
round-trips, honest-scope rejections, dispatch in _decode_payload,
and the REAL sample_frames path through Spark."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from salesforce_postgresql_etl_spark.operators.avi import (
    _chunk,
    _list,
    decode_avi,
    encode_avi,
)


def _gradient(w, h, seed=0):
    return [
        [((x * 9 + seed) % 256, (y * 17 + seed) % 256, (x + y + seed) % 256)
         for x in range(w)]
        for y in range(h)
    ]


def test_avi_roundtrip_single_and_multi_frame():
    f1 = _gradient(13, 9)
    d = decode_avi(encode_avi([f1]))
    assert (d["width"], d["height"], d["n_frames"]) == (13, 9, 1)
    assert d["frames"][0] == f1
    f2 = _gradient(13, 9, seed=77)
    d = decode_avi(encode_avi([f1, f2, f1], fps=25))
    assert d["n_frames"] == 3
    assert d["frames"] == [f1, f2, f1]  # BI_RGB is lossless


def test_avi_row_padding_widths():
    # width*3 mod 4 cycles through all residues: 1..5 covers each
    # padding amount (1→3 pad bytes, 2→2, 3→1, 4→0, 5→3).
    for w in range(1, 6):
        f = _gradient(w, 3)
        assert decode_avi(encode_avi([f]))["frames"] == [f]


@given(
    w=st.integers(1, 12),
    h=st.integers(1, 9),
    n=st.integers(1, 4),
    data=st.data(),
)
@settings(max_examples=20, deadline=None)
def test_avi_codec_roundtrip_property(w, h, n, data):
    px = st.tuples(
        st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
    )
    frames = [
        [[data.draw(px) for _ in range(w)] for _ in range(h)]
        for _ in range(n)
    ]
    out = decode_avi(encode_avi(frames))
    assert (out["width"], out["height"], out["n_frames"]) == (w, h, n)
    assert out["frames"] == frames


def test_avi_skips_junk_idx1_and_recurses_rec_lists():
    """The chunk grammar must skip unknown chunks (JUNK before hdrl,
    idx1 after movi — both word-aligned across an ODD payload size)
    and find frames inside 'rec ' sub-lists."""
    f1, f2 = _gradient(4, 3), _gradient(4, 3, seed=5)
    base = encode_avi([f1, f2])
    # Rebuild: RIFF [JUNK(odd)] hdrl movi' idx1 — with movi' wrapping
    # each frame chunk in its own rec list.
    body = base[12:]
    fourcc, p, sz = body[:4], 8, struct.unpack_from("<I", body, 4)[0]
    assert fourcc == b"LIST" and body[p : p + 4] == b"hdrl"
    hdrl = body[: 8 + sz + (sz & 1)]
    movi_raw = body[len(hdrl) :]
    (msz,) = struct.unpack_from("<I", movi_raw, 4)
    inner = movi_raw[12 : 8 + msz]  # frame chunk run
    rec_frames = b""
    pos = 0
    while pos < len(inner):
        (csz,) = struct.unpack_from("<I", inner, pos + 4)
        one = inner[pos : pos + 8 + csz + (csz & 1)]
        rec_frames += _list(b"rec ", one)
        pos += 8 + csz + (csz & 1)
    rebuilt_body = (
        b"AVI "
        + _chunk(b"JUNK", b"\x01\x02\x03")  # odd size → pad byte
        + hdrl
        + _list(b"movi", rec_frames)
        + _chunk(b"idx1", b"\x00" * 16)
    )
    rebuilt = struct.pack("<4sI", b"RIFF", len(rebuilt_body)) + rebuilt_body
    d = decode_avi(rebuilt)
    assert d["frames"] == [f1, f2]


def test_avi_video_not_first_stream():
    """A spec-valid AVI may list its audio stream first — the video
    frames then live in '01db' chunks (the stream number is the strl's
    position in hdrl order). The decoder must match frames by the vids
    stream's actual id, not a hard-coded '00' (r8 advice), and skip
    the other stream's '00wb' audio chunks."""
    f1, f2 = _gradient(5, 4), _gradient(5, 4, seed=3)
    base = encode_avi([f1, f2])
    body = base[12:]
    (hsz,) = struct.unpack_from("<I", body, 4)
    hdrl_payload = body[12 : 8 + hsz]
    (asz,) = struct.unpack_from("<I", hdrl_payload, 4)
    avih = bytearray(hdrl_payload[: 8 + asz + (asz & 1)])
    struct.pack_into("<I", avih, 8 + 24, 2)  # Streams = 2
    vids_strl = hdrl_payload[len(avih) :]
    auds_strl = _list(
        b"strl",
        _chunk(b"strh", struct.pack("<4s4s", b"auds", b"PCM "))
        + _chunk(b"strf", b"\x00" * 16),
    )
    hdrl = _list(b"hdrl", bytes(avih) + auds_strl + vids_strl)
    # movi: frames renamed 00db→01db, audio 00wb chunks interleaved
    movi_raw = body[8 + hsz + (hsz & 1) :]
    (msz,) = struct.unpack_from("<I", movi_raw, 4)
    inner = movi_raw[12 : 8 + msz]
    frames = []
    pos = 0
    while pos < len(inner):
        (csz,) = struct.unpack_from("<I", inner, pos + 4)
        assert inner[pos : pos + 2] == b"00"
        frames.append(b"01" + inner[pos + 2 : pos + 8 + csz + (csz & 1)])
        pos += 8 + csz + (csz & 1)
    movi_inner = _chunk(b"00wb", b"\xaa" * 11)
    for fr in frames:
        movi_inner += fr + _chunk(b"00wb", b"\x55" * 8)
    rebuilt_body = b"AVI " + hdrl + _list(b"movi", movi_inner)
    rebuilt = struct.pack("<4sI", b"RIFF", len(rebuilt_body)) + rebuilt_body
    d = decode_avi(rebuilt)
    assert (d["width"], d["height"], d["n_frames"]) == (5, 4, 2)
    assert d["frames"] == [f1, f2]

    # and when the frames DON'T carry the vids stream's id, the error
    # names the stream it was looking for instead of a bare "no frames"
    wrong_body = b"AVI " + hdrl + _list(b"movi", inner)  # frames at 00db
    wrong = struct.pack("<4sI", b"RIFF", len(wrong_body)) + wrong_body
    with pytest.raises(ValueError, match="stream 01"):
        decode_avi(wrong)


def test_avi_honest_scope_rejections():
    f = _gradient(6, 4)
    good = encode_avi([f])
    # Not RIFF / not AVI form.
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi(b"RIFF" + good[4:8] + b"WAVE" + good[12:])
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi(b"\x00" * 30)
    # Compressed video (biCompression != 0) is out of scope, loudly.
    comp = bytearray(good)
    i = comp.find(b"strf")
    struct.pack_into("<I", comp, i + 8 + 16, 0x44495643)  # 'CVID'
    with pytest.raises(ValueError, match="BI_RGB"):
        decode_avi(bytes(comp))
    # Frame byte size disagreeing with the geometry.
    short = bytearray(good)
    j = short.find(b"00db")
    struct.pack_into("<I", short, j + 4, 5)  # lie about the size
    with pytest.raises(ValueError):
        decode_avi(bytes(short))
    # Headers but no movi frames: strip everything after hdrl (the
    # first top-level chunk — its stored size gives the cut point;
    # find() would land on the nested strl LIST instead).
    (hsz,) = struct.unpack_from("<I", good, 16)
    hdr_end = 12 + 8 + hsz + (hsz & 1)
    headers_only = bytearray(good[:hdr_end])
    struct.pack_into("<I", headers_only, 4, len(headers_only) - 8)
    with pytest.raises(ValueError, match="no frames"):
        decode_avi(bytes(headers_only))
    # No video stream at all.
    with pytest.raises(ValueError, match="vids"):
        decode_avi(struct.pack("<4sI", b"RIFF", 4) + b"AVI ")
    # Truncations raise ValueError (parser_boundary), never IndexError.
    for k in range(0, len(good), max(1, len(good) // 40)):
        try:
            decode_avi(good[:k])
        except ValueError:
            pass


def test_avi_dispatch_in_decode_payload():
    """_decode_payload decodes AVI on video rows (n_pixels = canvas
    size); audio RIFF still routes to WAV; garbage keeps the
    fake/strict contract."""
    from salesforce_postgresql_etl_spark.operators.multimodal import (
        _decode_payload,
        encode_wav,
    )

    good = encode_avi([_gradient(7, 5)] * 2)
    for fake in (True, False):
        assert _decode_payload(good, "video", fake)["n_pixels"] == 35
    # An audio row with a RIFF/WAVE payload still decodes as WAV.
    wav = encode_wav([0, 100, -100])
    assert _decode_payload(wav, "audio", False)["n_samples"] == 3
    garbage = b"RIFF" + struct.pack("<I", 26) + b"AVI " + bytes(range(18))
    assert "n_pixels" not in _decode_payload(garbage, "video", fake=True)
    with pytest.raises(ValueError):
        _decode_payload(garbage, "video", fake=False)


def test_avi_sample_frames_real_end_to_end(spark, tmp_path):
    """(r7) The non-GIF video container slot runs on REAL bytes: an
    uncompressed AVI through parquet → mapInPandas with fake=False
    yields evenly-spaced frames re-encoded as PNGs whose pixels equal
    the source frames."""
    from salesforce_postgresql_etl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_png,
        sample_frames,
    )

    clips = [[[(i * 40, 10, 0)] * 10 for _ in range(6)] for i in range(6)]
    avi = encode_avi(clips)
    rows = [(0, "video", avi, (10, 6, None, "avi"))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    p = str(tmp_path / "avi.parquet")
    media.write.parquet(p)
    out = sorted(
        sample_frames(spark.read.parquet(p), n_frames=3, fake=False).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in out] == [0, 1, 2]
    for r, src_idx in zip(out, [0, 2, 4]):
        png = decode_png(bytes(r.frame))
        assert png["pixels"] == clips[src_idx]


def _max_err(a, b):
    return max(
        abs(ca - cb)
        for ra, rb in zip(a, b)
        for pa, pb in zip(ra, rb)
        for ca, cb in zip(pa, pb)
    )


def test_avi_mjpeg_roundtrip_bounded_error():
    """(r7) MJPG compression: each frame chunk is a baseline JPEG
    decoded by operators/jpeg.py — JPEG is lossy so the round-trip
    bound is the codec's own q100 bound, not equality."""
    frames = [_gradient(20, 14, seed=s) for s in (0, 50, 120)]
    data = encode_avi(frames, codec="mjpeg", quality=100)
    d = decode_avi(data)
    assert (d["width"], d["height"], d["n_frames"]) == (20, 14, 3)
    for got, src in zip(d["frames"], frames):
        assert _max_err(got, src) <= 2
    # The container really says MJPG (strf biCompression fourcc).
    i = data.find(b"strf")
    assert data[i + 8 + 16 : i + 8 + 20] == b"MJPG"
    # And frame chunks are self-contained JPEGs ('00dc', SOI-prefixed).
    j = data.find(b"00dc")
    assert data[j + 8 : j + 10] == b"\xFF\xD8"


def test_avi_mjpeg_geometry_mismatch_raises():
    data = bytearray(encode_avi([_gradient(8, 6)], codec="mjpeg"))
    i = data.find(b"strf")
    struct.pack_into("<i", data, i + 8 + 4, 9)  # lie: width 8 -> 9
    with pytest.raises(ValueError, match="container strf"):
        decode_avi(bytes(data))


def test_avi_mjpeg_truncation_sweep():
    good = encode_avi([_gradient(9, 7)], codec="mjpeg")
    for k in range(0, len(good), max(1, len(good) // 50)):
        try:
            decode_avi(good[:k])
        except ValueError:
            pass  # never IndexError/struct.error (parser_boundary)


def test_avi_unknown_codec_param_raises():
    with pytest.raises(ValueError, match="codec"):
        encode_avi([_gradient(4, 3)], codec="h264")


def test_avi_mjpeg_sample_frames_real_end_to_end(spark, tmp_path):
    """Compressed video through the REAL path: MJPEG AVI → parquet →
    sample_frames(fake=False) → PNG frames within the JPEG bound."""
    from salesforce_postgresql_etl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_png,
        sample_frames,
    )

    clips = [[[(i * 40, 10, 200)] * 10 for _ in range(6)] for i in range(5)]
    avi = encode_avi(clips, codec="mjpeg", quality=100)
    media = spark.createDataFrame(
        [(0, "video", avi, (10, 6, None, "avi"))], MEDIA_SCHEMA
    )
    p = str(tmp_path / "mjpeg.parquet")
    media.write.parquet(p)
    out = sorted(
        sample_frames(spark.read.parquet(p), n_frames=2, fake=False).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in out] == [0, 1]
    for r, src_idx in zip(out, [0, 2]):
        png = decode_png(bytes(r.frame))
        assert _max_err(png["pixels"], clips[src_idx]) <= 2
