"""End-to-end media corpus dedup: one MIXED media table (images,
audio, video — every duplicate group spans codecs/containers with
zero shared payload bytes), three perceptual near-dup passes that
each gate on `kind`, one union of pair sets, one `dedup_clusters`
pass, canonical survivors out.

This is the media mirror of the text corpus-build pipeline test: it
proves the perceptual family COMPOSES with the clustering layer —
pair emitters produce edges in one id space, connected components
collapses transitive chains, min-id survivorship is deterministic —
with no per-modality special cases downstream of the pair union.

Fixture radii are the measured ones the per-modality tests pin
(image/video 3, audio 15); the generators are the proven low-
frequency ones (sinusoid scenes, multi-tone clips, 8-color block
frames).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.operators.audiofp import audio_neardup
from salesforce_postgresql_etl_spark.operators.clustering import dedup_clusters
from salesforce_postgresql_etl_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    encode_bmp,
    encode_png,
    encode_wav,
)
from salesforce_postgresql_etl_spark.operators.phash import (
    phash_neardup,
    video_neardup,
)


def _scene(seed: int, w: int = 48, h: int = 48):
    fx, fy = 1 + seed % 3, 2 + seed % 4
    return [
        [
            (
                int(127 + 120 * math.sin((fx * x + fy * y) / 9.0 + seed)),
                int(127 + 120 * math.sin((x - fy * y) / 7.0 + 2 * seed)),
                int(127 + 120 * math.cos((fx * x * y) / 151.0 + 3 * seed)),
            )
            for x in range(w)
        ]
        for y in range(h)
    ]


def _clip(seed: int, n: int = 3000) -> list[int]:
    f1, f2 = 3 + seed % 5, 11 + seed % 7
    return [
        int(
            8000 * math.sin(2 * math.pi * f1 * i / 200.0 + seed)
            + 5000 * math.sin(2 * math.pi * f2 * i / 333.0 + 2 * seed)
            + 2000 * math.sin(2 * math.pi * (seed + 1) * i / 47.0)
        )
        for i in range(n)
    ]


def _vframe(seed: int, t: int, w: int = 48, h: int = 32):
    bx, by = 4 + 2 * (seed % 3), 3 + (seed % 4)
    pal = [
        (
            (37 * seed + 61 * k) % 256,
            (91 * seed + 43 * k) % 256,
            (29 * seed + 83 * k) % 256,
        )
        for k in range(8)
    ]
    if seed % 2:
        return [
            [pal[((x // bx) * (y // by) + t) % 8] for x in range(w)]
            for y in range(h)
        ]
    return [
        [pal[((x // bx) + (y // by) + t) % 8] for x in range(w)] for y in range(h)
    ]


def _mixed_corpus(spark):
    """One media table, three modalities, disjoint id ranges:
    images 0..11 (4 scenes × BMP/PNG/JPEG), audio 100..111 (4 clips ×
    PCM16/μ-law/ADPCM), video 200..208 (3 clips × GIF/DIB-AVI/Y4M)."""
    from salesforce_postgresql_etl_spark.operators.avi import encode_avi
    from salesforce_postgresql_etl_spark.operators.gif import encode_gif
    from salesforce_postgresql_etl_spark.operators.y4m import encode_y4m
    from salesforce_postgresql_etl_spark.operators.jpeg import encode_jpeg

    rows = []
    groups: dict[int, set[int]] = {}
    mid = 0
    for seed in range(4):
        px = _scene(seed)
        members = set()
        for payload in (
            encode_bmp(px),
            encode_png(px),
            encode_jpeg(px, quality=90),
        ):
            rows.append((mid, "image", payload, (None, None, None, "img")))
            members.add(mid)
            mid += 1
        groups[min(members)] = members
    mid = 100
    for seed in range(4):
        c = _clip(seed)
        members = set()
        for codec in ("pcm16", "ulaw", "adpcm"):
            rows.append(
                (mid, "audio", encode_wav(c, codec=codec), (None, None, 16000, codec))
            )
            members.add(mid)
            mid += 1
        groups[min(members)] = members
    mid = 200
    for seed in range(3):
        frames = [_vframe(seed, t) for t in range(4)]
        members = set()
        for payload in (
            encode_gif(frames),
            encode_avi(frames, codec="dib"),
            encode_y4m(frames),
        ):
            rows.append((mid, "video", payload, (None, None, None, "vid")))
            members.add(mid)
            mid += 1
        groups[min(members)] = members
    return spark.createDataFrame(rows, MEDIA_SCHEMA), groups


def test_mixed_media_dedup_pipeline(spark):
    media, groups = _mixed_corpus(spark)
    # Each pass gates on `kind` internally — all three run over the
    # SAME mixed table, no pre-splitting.
    pair_frames = [
        phash_neardup(media, max_hamming=3, fake=False),
        audio_neardup(media, max_hamming=15, fake=False),
        video_neardup(media, max_hamming=3, n_frames=3, fake=False),
    ]
    pairs = pair_frames[0].select("media_a", "media_b")
    for pf in pair_frames[1:]:
        pairs = pairs.union(pf.select("media_a", "media_b"))

    clusters = dedup_clusters(
        pairs, a="media_a", b="media_b", max_cluster_size=10
    )
    got = {
        (r.doc_id, r.cluster_id, r.is_canonical) for r in clusters.collect()
    }

    # Exactly the 11 content groups — each fully collapsed to one
    # cluster labeled by its min id, no cross-group (and in particular
    # no cross-MODALITY) merge, min member canonical.
    expect = {
        (m, cid, int(m == cid)) for cid, ms in groups.items() for m in ms
    }
    assert got == expect

    # Survivor stage: canonical rows join back to payloads — one
    # survivor per group, modality mix preserved.
    survivors = (
        clusters.where(F.col("is_canonical") == 1)
        .join(media, F.col("doc_id") == F.col("media_id"))
        .select("doc_id", "kind")
        .collect()
    )
    assert len(survivors) == 11
    by_kind = {}
    for r in survivors:
        by_kind[r.kind] = by_kind.get(r.kind, 0) + 1
    assert by_kind == {"image": 4, "audio": 4, "video": 3}
