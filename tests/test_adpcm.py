"""IMA ADPCM (operators/adpcm.py) + G.711 A-law: the r7 compressed-
audio codecs. ADPCM is adaptive-differential (4 bits/sample) so the
properties are tracking bounds, block-structure invariants, and
honest-scope rejections rather than byte equality; A-law mirrors the
existing μ-law contract (exhaustively, 256 codes / full int16 sweep).
"""

from __future__ import annotations

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from salesforce_postgresql_etl_spark.operators.adpcm import (
    STEP_TABLE,
    decode_blocks,
    encode_blocks,
    samples_per_block,
)
from salesforce_postgresql_etl_spark.operators.multimodal import (
    alaw_to_linear,
    decode_wav,
    encode_wav,
    linear_to_alaw,
)


def _sine(n, amp=8000, period=20.0, phase=0.0):
    return [int(amp * math.sin(i / period + phase)) for i in range(n)]


# ---------- raw block codec ----------


def test_adpcm_step_table_is_the_public_ima_table():
    # spot-pin the published endpoints and monotonic ~1.1x growth
    assert STEP_TABLE[0] == 7 and STEP_TABLE[88] == 32767
    assert len(STEP_TABLE) == 89
    assert all(b > a for a, b in zip(STEP_TABLE, STEP_TABLE[1:]))


def test_adpcm_sine_tracks_within_half_step():
    sig = _sine(1200)
    dec = decode_blocks(encode_blocks(sig, 256, 1), 256, 1)
    assert max(abs(a - b) for a, b in zip(sig, dec)) <= 300


def test_adpcm_zeros_and_constants_exact():
    assert all(
        v == 0 for v in decode_blocks(encode_blocks([0] * 505, 256, 1), 256, 1)
    )
    # constant signals: header stores the value, nibbles add step>>3
    # wobble at the smallest step — stays within ±1 of the constant
    dec = decode_blocks(encode_blocks([1000] * 505, 256, 1), 256, 1)
    assert all(abs(v - 1000) <= 1 for v in dec)


def test_adpcm_stereo_equals_independent_mono():
    """WAV stereo ADPCM keeps per-channel state machines; decoding the
    interleaved stream must equal two independent mono decodes."""
    left = _sine(600, amp=6000, period=11.0)
    right = _sine(600, amp=3000, period=7.0, phase=1.0)
    inter = [v for pair in zip(left, right) for v in pair]
    assert samples_per_block(512, 2) == samples_per_block(256, 1)
    stereo = decode_blocks(encode_blocks(inter, 512, 2), 512, 2)
    mono_l = decode_blocks(encode_blocks(left, 256, 1), 256, 1)
    mono_r = decode_blocks(encode_blocks(right, 256, 1), 256, 1)
    n = len(left)
    assert stereo[0::2][:n] == mono_l[:n]
    assert stereo[1::2][:n] == mono_r[:n]


def test_adpcm_block_headers_store_exact_first_samples():
    sig = _sine(1100, amp=20000, period=35.0)
    spb = samples_per_block(64, 1)
    dec = decode_blocks(encode_blocks(sig, 64, 1), 64, 1)
    for k in range(0, len(sig), spb):
        assert dec[k] == sig[k]  # header predictor IS the sample


def test_adpcm_rejections():
    with pytest.raises(ValueError, match="block_align"):
        samples_per_block(30, 1)  # not a multiple of 4
    with pytest.raises(ValueError, match="block_align"):
        samples_per_block(4, 2)  # < 4*channels... multiple check
    with pytest.raises(ValueError, match="whole number"):
        decode_blocks(b"\x00" * 100, 64, 1)  # torn final block
    bad = bytearray(encode_blocks([0] * 10, 64, 1))
    bad[2] = 120  # step index byte > 88
    with pytest.raises(ValueError, match="step index"):
        decode_blocks(bytes(bad), 64, 1)
    with pytest.raises(ValueError, match="interleave"):
        encode_blocks([1, 2, 3], 64, 2)
    with pytest.raises(ValueError, match="at least one"):
        encode_blocks([], 64, 1)


@given(
    n_channels=st.integers(1, 2),
    n_frames=st.integers(1, 120),
    data=st.data(),
)
@settings(max_examples=25, deadline=None)
def test_adpcm_structure_property(n_channels, n_frames, data):
    """For ARBITRARY int16 input: decoded length is the whole-block
    padded frame count, every decoded value is a valid int16, each
    block's first frame round-trips exactly, and decode is
    deterministic."""
    samples = [
        data.draw(st.integers(-32768, 32767))
        for _ in range(n_frames * n_channels)
    ]
    block_align = 16 * n_channels
    spb = samples_per_block(block_align, n_channels)
    enc = encode_blocks(samples, block_align, n_channels)
    dec = decode_blocks(enc, block_align, n_channels)
    padded = -(-n_frames // spb) * spb
    assert len(dec) == padded * n_channels
    assert all(-32768 <= v <= 32767 for v in dec)
    for k in range(0, n_frames, spb):
        for ch in range(n_channels):
            assert dec[k * n_channels + ch] == samples[k * n_channels + ch]
    assert decode_blocks(enc, block_align, n_channels) == dec


# ---------- WAV container integration ----------


def test_wav_adpcm_roundtrip_and_fact_trim():
    sig = _sine(777)  # deliberately not a multiple of samples/block
    raw = encode_wav(sig, 8000, 1, codec="adpcm", block_align=256)
    out = decode_wav(raw)
    assert out["codec"] == "adpcm"
    assert out["n_samples"] == 777  # fact chunk trimmed the padding
    assert len(out["samples"]) == 777
    assert max(abs(a - b) for a, b in zip(sig, out["samples"])) <= 300
    # the container genuinely says format 0x11 with a fact chunk
    i = raw.find(b"fmt ")
    assert struct.unpack_from("<H", raw, i + 8)[0] == 0x11
    assert b"fact" in raw
    # ~4:1 vs PCM16 (block headers + fact chunk cost a bit extra)
    assert len(raw) < 0.4 * len(encode_wav(sig, 8000, 1))


def test_wav_adpcm_spb_mismatch_raises():
    raw = bytearray(encode_wav(_sine(505), codec="adpcm", block_align=256))
    i = raw.find(b"fmt ")
    struct.pack_into("<H", raw, i + 8 + 18, 99)  # lie in wSamplesPerBlock
    with pytest.raises(ValueError, match="samples/block"):
        decode_wav(bytes(raw))


def test_wav_adpcm_stereo_through_container():
    left = _sine(300, amp=7000)
    right = _sine(300, amp=2000, period=9.0)
    inter = [v for pair in zip(left, right) for v in pair]
    out = decode_wav(encode_wav(inter, 44100, 2, codec="adpcm", block_align=512))
    assert (out["n_channels"], out["n_samples"]) == (2, 300)
    assert max(abs(a - b) for a, b in zip(inter, out["samples"])) <= 300


# ---------- G.711 A-law ----------


def test_alaw_all_256_codes_idempotent():
    for a in range(256):
        assert linear_to_alaw(alaw_to_linear(a)) == a


def test_alaw_error_bound_exhaustive():
    """Unlike μ-law (whose clip point leaves a saturation case), A-law
    covers the full int16 domain within half the top-segment step:
    |decode(encode(v)) - v| <= 512 for EVERY 16-bit value."""
    worst = max(
        abs(alaw_to_linear(linear_to_alaw(v)) - v)
        for v in range(-32768, 32768)
    )
    assert worst <= 512
    # decode magnitudes are the G.711 13-bit lattice scaled by 16
    assert max(alaw_to_linear(a) for a in range(256)) == 32256
    assert min(alaw_to_linear(a) for a in range(256)) == -32256


@given(
    n_channels=st.integers(1, 3),
    n_frames=st.integers(0, 30),
    data=st.data(),
)
@settings(max_examples=20, deadline=None)
def test_wav_alaw_quantization_property(n_channels, n_frames, data):
    samples = [
        data.draw(st.integers(-32768, 32767))
        for _ in range(n_frames * n_channels)
    ]
    out = decode_wav(encode_wav(samples, 8000, n_channels, codec="alaw"))
    assert out["codec"] == "alaw" and out["n_samples"] == n_frames
    for d, s in zip(out["samples"], samples):
        assert abs(d - s) <= 512
    assert [alaw_to_linear(linear_to_alaw(d)) for d in out["samples"]] == (
        out["samples"]
    )
