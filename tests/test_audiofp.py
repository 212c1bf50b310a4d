"""Perceptual audio fingerprint (operators/audiofp.py): invariances,
cross-codec robustness vs discrimination margins (the measured basis
for the module's frame design), the Spark projection, and the shared
Hamming banding on audio signatures."""

from __future__ import annotations

import math

import pytest

from salesforce_postgresql_etl_spark.operators.audiofp import (
    _afp_payload,
    audio_fingerprint,
    audio_fingerprint64,
    audio_neardup,
)
from salesforce_postgresql_etl_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_wav,
    encode_wav,
)


def _clip(seed: int, n: int = 3000) -> list[int]:
    """Deterministic multi-tone clip — spectral structure a band-energy
    fingerprint can hold onto (white noise would be unstable under
    companding by construction, not by bug)."""
    f1, f2 = 3 + seed % 5, 11 + seed % 7
    return [
        int(
            8000 * math.sin(2 * math.pi * f1 * i / 200.0 + seed)
            + 5000 * math.sin(2 * math.pi * f2 * i / 333.0 + 2 * seed)
            + 2000 * math.sin(2 * math.pi * (seed + 1) * i / 47.0)
        )
        for i in range(n)
    ]


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_afp_deterministic_uint64():
    c = _clip(0)
    h = audio_fingerprint64(c)
    assert h == audio_fingerprint64(c)
    assert 0 <= h < 1 << 64


def test_afp_exact_invariances():
    # Double-delta signs are invariant under uniform positive scaling
    # (energies scale by c² across the board), under 2× nearest
    # upsampling (the resample grid re-selects the same samples), and
    # under mono→equal-stereo (channel mean is the identity) — all
    # EXACT equalities, not tolerances.
    for seed in range(3):
        c = _clip(seed)
        h = audio_fingerprint64(c)
        assert audio_fingerprint64([x * 2 for x in c]) == h
        assert audio_fingerprint64([x // 2 for x in c]) == h
        assert audio_fingerprint64([c[j // 2] for j in range(2 * len(c))]) == h
        stereo = [v for x in c for v in (x, x)]
        assert audio_fingerprint64(stereo, n_channels=2) == h


def test_afp_codec_robust_vs_discriminative():
    # The margin that makes radius-15 search meaningful: every pair
    # within a clip's 4-coding group stays ≤ 15 bits apart while every
    # cross-clip pair stays ≥ 16 (measured 12 vs 23 at design time —
    # see the module docstring's rect/Hann A/B).
    groups = []
    for seed in range(5):
        c = _clip(seed)
        g = [audio_fingerprint64(c)]
        for codec in ("ulaw", "alaw", "adpcm"):
            d = decode_wav(encode_wav(c, codec=codec))
            g.append(audio_fingerprint64(d["samples"], d["n_channels"]))
        groups.append(g)
    for g in groups:
        for i in range(4):
            for j in range(i + 1, 4):
                assert _ham(g[i], g[j]) <= 15
    for a in range(5):
        for b in range(a + 1, 5):
            for i in range(4):
                for j in range(4):
                    assert _ham(groups[a][i], groups[b][j]) >= 16


def test_afp_edge_cases():
    assert audio_fingerprint64([]) == 0
    assert 0 <= audio_fingerprint64([5]) < 1 << 64  # shorter than the grid
    with pytest.raises(ValueError, match="interleave"):
        audio_fingerprint64([1, 2, 3], n_channels=2)


def test_afp_payload_contract():
    junk = b"not-audio-at-all" * 4
    assert _afp_payload(junk, fake=True) == _afp_payload(junk, fake=True)
    with pytest.raises(NotImplementedError):
        _afp_payload(junk, fake=False)
    corrupt = encode_wav(_clip(0, 200))[:30]  # RIFF magic, truncated body
    assert isinstance(_afp_payload(corrupt, fake=True), int)
    with pytest.raises(ValueError):
        _afp_payload(corrupt, fake=False)


def test_audio_fingerprint_spark_projection(spark):
    c = _clip(1, 1200)
    rows = [
        (0, "audio", encode_wav(c), (None, None, 16000, "pcm")),
        (1, "audio", encode_wav(c, codec="ulaw"), (None, None, 16000, "ulaw")),
        (2, "image", b"BMnot-an-image", (None, None, None, "bmp")),
        (3, "audio", b"unknown-container", (None, None, 8000, "raw")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r.afp for r in audio_fingerprint(media, fake=True).collect()}
    assert set(out) == {0, 1, 3}  # image row dropped
    assert _ham(out[0] & ((1 << 64) - 1), out[1] & ((1 << 64) - 1)) <= 15
    with pytest.raises(Exception, match="NotImplementedError|audio library"):
        audio_fingerprint(media, fake=False).collect()


def test_audio_neardup_banded_equals_brute(spark):
    rows = []
    mid = 0
    for seed in range(4):
        c = _clip(seed)
        for codec in ("pcm16", "ulaw", "adpcm"):
            rows.append(
                (mid, "audio", encode_wav(c, codec=codec), (None, None, 16000, codec))
            )
            mid += 1
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    # max_hamming=15 → sixteen 4-bit bands (the fixture radius; a
    # production corpus would band per-frame sub-fingerprints instead
    # of pushing the whole-clip radius this wide).
    banded = {
        (r.media_a, r.media_b, r.hamming)
        for r in audio_neardup(media, max_hamming=15, fake=False).collect()
    }
    brute = {
        (r.media_a, r.media_b, r.hamming)
        for r in audio_neardup(
            media, max_hamming=15, fake=False, strategy="brute"
        ).collect()
    }
    assert banded == brute
    clip_of = {m: m // 3 for m in range(12)}
    for a, b, _ in banded:
        assert clip_of[a] == clip_of[b]
    per_clip = {}
    for a, b, _ in banded:
        per_clip.setdefault(clip_of[a], set()).add((a, b))
    assert all(len(v) == 3 for v in per_clip.values())
