"""Cross-codec exception-contract tests (r7 review hardening).

Every dispatch site in operators/multimodal.py implements the
fake-mode "never raises" stub contract by catching exactly ValueError
— so every decoder must map ANY malformed input (truncations, byte
flips) to ValueError, never IndexError/struct.error/TypeError. The
``parser_boundary`` decorator guarantees it at the function boundary;
these sweeps enforce it empirically for all six codecs."""

from __future__ import annotations

import random

import pytest

from salesforce_postgresql_etl_spark.operators.avi import encode_avi
from salesforce_postgresql_etl_spark.operators.gif import encode_gif
from salesforce_postgresql_etl_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from salesforce_postgresql_etl_spark.operators.multimodal import (
    _decode_payload,
    _resize_payload,
    encode_bmp,
    encode_png,
    encode_ppm,
    encode_wav,
)
from salesforce_postgresql_etl_spark.operators.y4m import encode_y4m


def _gradient(w, h):
    return [
        [(x * 9 % 256, y * 17 % 256, (x + y) % 256) for x in range(w)]
        for y in range(h)
    ]


def _fixtures():
    px = _gradient(9, 7)
    return [
        ("image", encode_bmp(px), "bmp"),
        ("image", encode_ppm(px), "ppm"),
        ("image", encode_png(px, filter_type="mixed"), "png"),
        ("image", encode_jpeg(px, quality=90), "jpeg"),
        ("image", encode_jpeg(px, quality=85, subsample=True), "jpeg420"),
        ("audio", encode_wav(list(range(-40, 40))), "wav"),
        ("audio", encode_wav([0, 500, -500], codec="ulaw"), "ulaw"),
        ("audio", encode_wav([0, 500, -500], codec="alaw"), "alaw"),
        (
            "audio",
            encode_wav(list(range(0, 600, 10)), codec="adpcm", block_align=16),
            "adpcm",
        ),
        ("video", encode_gif([px, _gradient(9, 7)]), "gif"),
        ("image", encode_gif([px]), "gif_img"),
        ("video", encode_avi([px, _gradient(9, 7)]), "avi"),
        ("video", encode_avi([px, _gradient(9, 7)], codec="mjpeg"), "mjpeg"),
        ("video", encode_y4m([px, _gradient(9, 7)]), "y4m"),
        (
            "video",
            encode_y4m([_gradient(8, 6), _gradient(8, 6)], colorspace="420jpeg"),
            "y4m420",
        ),
    ]


@pytest.mark.parametrize("kind,payload,name", _fixtures())
def test_truncation_sweep_maps_to_stub_or_valueerror(kind, payload, name):
    """EVERY prefix of every fixture must (a) never raise in fake mode
    and (b) raise only ValueError / NotImplementedError in strict mode
    — an IndexError/struct.error/TypeError escaping here would crash a
    whole Arrow batch on one bad payload (r7 review findings: JPEG
    bare-0xFF TypeError, short-SOF struct.error, GIF GCE IndexError)."""
    full = _decode_payload(payload, kind, fake=False)
    assert "n_pixels" in full or "n_samples" in full
    step = max(1, len(payload) // 60)
    for k in list(range(0, len(payload), step)) + [len(payload) - 1]:
        cut = payload[:k]
        feats = _decode_payload(cut, kind, fake=True)  # must not raise
        assert feats["n_bytes"] == k
        # Strict mode may still SUCCEED on a prefix that only lost
        # trailing padding / EOI (all pixel/frame data present) — the
        # contract is that nothing but these two classes ever escapes.
        try:
            _decode_payload(cut, kind, fake=False)
        except (ValueError, NotImplementedError):
            pass


@pytest.mark.parametrize("kind,payload,name", _fixtures())
def test_byteflip_sweep_never_escapes_fake_mode(kind, payload, name):
    """Random single-byte corruptions: fake mode must always return a
    dict; strict mode may succeed (flip in pixel data) or raise, but
    only ValueError / NotImplementedError."""
    rng = random.Random(hash(name) & 0xFFFF)
    for _ in range(40):
        i = rng.randrange(len(payload))
        bad = bytearray(payload)
        bad[i] ^= rng.randrange(1, 256)
        bad = bytes(bad)
        feats = _decode_payload(bad, kind, fake=True)  # must not raise
        assert feats["n_bytes"] == len(payload)
        try:
            _decode_payload(bad, kind, fake=False)
        except (ValueError, NotImplementedError):
            pass  # the only acceptable escape classes


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: markers may be preceded by 0xFF fill bytes — real
    encoder output uses them, so strict decode must accept them (r7
    review finding)."""
    px = _gradient(8, 6)
    good = encode_jpeg(px, quality=92)
    base = decode_jpeg(good)["pixels"]
    # Pad every marker we can find in the header region.
    for marker in (b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        i = good.find(marker)
        padded = good[:i] + b"\xff\xff\xff" + good[i:]
        assert decode_jpeg(padded)["pixels"] == base, marker


def test_jpeg_bare_ff_at_scan_end_is_valueerror():
    """The truncated-scan path that used to TypeError on a bare 0xFF
    (f-string over None) must raise the documented ValueError."""
    px = _gradient(8, 6)
    good = encode_jpeg(px, quality=92)
    scan_start = good.find(b"\xff\xda")
    cut = good[: scan_start + 20] + b"\xff"
    with pytest.raises(ValueError):
        decode_jpeg(cut)


def test_gif_resize_first_frame():
    """(r7 review) _resize_payload handles GIFs like the other
    decodable formats: first composed frame, nearest-neighbor,
    re-encoded as a single-frame GIF."""
    from salesforce_postgresql_etl_spark.operators.gif import decode_gif

    f1 = [[(10, 20, 30)] * 8 for _ in range(6)]
    f2 = [[(200, 0, 0)] * 8 for _ in range(6)]
    out = _resize_payload(encode_gif([f1, f2]), 4, 3, fake=False)
    d = decode_gif(out)
    assert (d["width"], d["height"], d["n_frames"]) == (4, 3, 1)
    assert d["frames"][0][0][0] == (10, 20, 30)  # FIRST frame resized
