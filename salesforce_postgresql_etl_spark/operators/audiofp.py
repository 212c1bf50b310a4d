"""Perceptual AUDIO fingerprinting — the sound-domain twin of
``operators/phash.py``.

Exact content_id dedup misses the same clip stored as PCM16 and as a
G.711/ADPCM re-encode (zero shared payload bytes). The public
Haitsma–Kalker construction ("A Highly Robust Audio Fingerprint
System", 2002) answers with sign bits of time×frequency energy
DELTAS: band energies scale uniformly under volume change and move
little under companding noise, so the sign of
``(E[f+1][b] − E[f+1][b+1]) − (E[f][b] − E[f][b+1])`` is a stable
bit. This module emits a 64-bit whole-clip signature (9 frames × 9
bands → 8×8 delta grid), sharing EVERYTHING downstream with the
image path: the Spark projection is one Arrow crossing emitting 8
bytes per clip, and the pair search is the same exact pigeonhole
``dedup.hamming_pairs`` banding.

Pure-Python DFT on a 1152-sample mono resample — milliseconds per
payload, deterministic (fixed summation order), zero libraries; a
100 TB deployment would swap the inner loop for a vectorized FFT
without touching the signature definition.

Frame design is MEASURED, not assumed (the repo's evidence-gated
rule): on a 5-clip × 4-coding grid, 256-sample rectangular frames at
hop 112 separate cleanly (within-group max 12 bits, cross-group min
23), the original 128-sample non-overlapping frames overlapped the
two distributions (18 vs 16), and Hann windowing — the "obvious"
improvement — was strictly WORSE both with and without overlap
(within-group max 34/31). Rect + overlap is what shipped.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

_FRAMES = 9  # 9 frames → 8 time deltas
_BANDS = 9  # 9 bands → 8 frequency deltas
_FRAME_LEN = 256  # samples per frame (rectangular window — measured)
_HOP = 112  # ~56% overlap between consecutive frames (measured)
_N = (_FRAMES - 1) * _HOP + _FRAME_LEN  # 1152-sample mono grid

# DFT bins 1..27 (skip DC) grouped into 9 bands of 3 bins.
_BINS_PER_BAND = 3

_TRIG = [
    (math.cos(2 * math.pi * k / _FRAME_LEN), math.sin(2 * math.pi * k / _FRAME_LEN))
    for k in range(_FRAME_LEN)
]


def _band_energies(frame: list[float]) -> list[float]:
    """9 band energies of one ``_FRAME_LEN``-sample frame (direct DFT
    on bins 1..27 — the only bins the bands read, so only those are
    computed)."""
    energies = []
    for band in range(_BANDS):
        e = 0.0
        for j in range(_BINS_PER_BAND):
            k = 1 + band * _BINS_PER_BAND + j
            re = im = 0.0
            for x, s in enumerate(frame):
                c, sn = _TRIG[(k * x) % _FRAME_LEN]
                re += s * c
                im -= s * sn
            e += re * re + im * im
        energies.append(e)
    return energies


def audio_fingerprint64(samples: list[int], n_channels: int = 1) -> int:
    """64-bit perceptual fingerprint of interleaved linear PCM.
    Channels are averaged to mono, the clip is nearest-neighbor
    resampled to the fixed 1152-sample grid (duration invariance),
    and bit (f·8+b) is the Haitsma–Kalker double-delta sign. The
    construction is invariant under positive volume scaling (energies
    scale uniformly) and empirically moves few bits under G.711 /
    ADPCM re-encodes. Returned unsigned in [0, 2^64)."""
    if n_channels < 1 or len(samples) % n_channels:
        raise ValueError("samples must interleave n_channels evenly")
    n_frames_in = len(samples) // n_channels
    if n_frames_in == 0:
        return 0
    mono = [
        sum(samples[i * n_channels + c] for c in range(n_channels)) / n_channels
        for i in range(n_frames_in)
    ]
    grid = [mono[i * n_frames_in // _N] for i in range(_N)]
    energy = [
        _band_energies(grid[f * _HOP : f * _HOP + _FRAME_LEN])
        for f in range(_FRAMES)
    ]
    bits = 0
    for f in range(_FRAMES - 1):
        for b in range(_BANDS - 1):
            d1 = energy[f + 1][b] - energy[f + 1][b + 1]
            d0 = energy[f][b] - energy[f][b + 1]
            if d1 - d0 > 0:
                bits |= 1 << (f * (_BANDS - 1) + b)
    return bits


def _afp_payload(payload: bytes, fake: bool) -> int:
    """One payload → signed-64 fingerprint under the codec stub
    contract (mirror of ``phash._phash_payload``): RIFF/WAVE decodes
    for real through any of the four supported codings; corrupt RIFF
    falls back in fake mode and raises strict; unknown containers get
    the deterministic sha256 pseudo-signature in fake mode only."""
    from .multimodal import decode_wav
    from .phash import _to_signed64

    payload = bytes(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        try:
            d = decode_wav(payload)
        except ValueError:
            if not fake:
                raise
        else:
            return _to_signed64(
                audio_fingerprint64(d["samples"], d["n_channels"])
            )
    if not fake:
        raise NotImplementedError(
            "audio fingerprinting beyond RIFF/WAVE (PCM16, G.711, IMA "
            "ADPCM) requires an audio library not present in this "
            "environment; pass fake=True for the deterministic stub"
        )
    return _to_signed64(
        int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    )


_AFP_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("afp", LongType(), False),
    ]
)


def audio_fingerprint(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, afp) for every AUDIO row of a MEDIA_SCHEMA frame —
    one Arrow crossing, 8 bytes out per clip, payloads never move
    again. Non-audio rows produce no output (kind gates dispatch)."""
    from ..session import configure_runtime

    configure_runtime(media.sparkSession)

    def batches(it: Iterator):
        import pandas as pd

        for pdf in it:
            ids, fps = [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "audio":
                    continue
                ids.append(mid)
                fps.append(_afp_payload(payload, fake))
            yield pd.DataFrame({"media_id": ids, "afp": fps})

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, _AFP_SCHEMA
    )


def audio_neardup(
    media: DataFrame,
    max_hamming: int = 3,
    fake: bool = True,
    strategy: str = "banded",
    persist: bool = True,
) -> DataFrame:
    """All audio pairs (media_a < media_b) within ``max_hamming``
    fingerprint bits — the cross-codec duplicate set (a clip and its
    μ-law/A-law/ADPCM re-encodes land Hamming-near). Same shared
    ``dedup.hamming_pairs`` search as image ``phash_neardup``,
    including its ``persist`` decode-once rule (default True: the
    fingerprint table checkpoints at 16 bytes/row instead of the
    self-join decoding every clip twice)."""
    from .dedup import hamming_pairs

    sigs = audio_fingerprint(media, fake=fake).select(
        F.col("media_id").alias("doc_id"), F.col("afp").alias("sig")
    )
    pairs = hamming_pairs(sigs, 64, max_hamming, strategy, persist=persist)
    return pairs.select(
        F.col("doc_a").alias("media_a"),
        F.col("doc_b").alias("media_b"),
        "hamming",
    )
