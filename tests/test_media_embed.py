"""Image DCT embeddings → the existing ANN stack (media similarity).

The claim under test: `media_embed.image_embeddings` output drops
straight into `simsearch.topk_cosine`, and cosine over the 63-AC-DCT
descriptor separates "same picture re-encoded" (≈1.0, any codec mix)
from "different scene" — so media similarity search needs NO new
search operator, only this projection.
"""

from __future__ import annotations

import math

import pytest

from salesforce_postgresql_etl_spark.operators.media_embed import (
    EMBED_DIM,
    _embed_payload,
    dct_features,
    image_embeddings,
)
from salesforce_postgresql_etl_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    encode_bmp,
    encode_png,
)


def _scene(seed: int, w: int = 64, h: int = 64):
    """Smooth sinusoid scenes (the perceptual-fixture rule: low-
    frequency content, not noise)."""
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


def _cos(a: list[float], b: list[float]) -> float:
    num = sum(x * y for x, y in zip(a, b))
    return num / math.sqrt(sum(x * x for x in a) * sum(y * y for y in b))


def test_dct_features_shape_and_determinism():
    v1 = dct_features(_scene(1))
    v2 = dct_features(_scene(1))
    assert len(v1) == EMBED_DIM == 63
    assert v1 == v2  # bit-exact: fixed summation order, no randomness


def test_reencode_cosine_near_one_cross_scene_lower():
    # Same scene through two codecs (zero shared payload bytes) must
    # sit near cosine 1.0; different scenes must sit clearly lower.
    from salesforce_postgresql_etl_spark.operators.jpeg import encode_jpeg

    within, cross = [], []
    vecs = {}
    for seed in range(4):
        px = _scene(seed)
        enc = [
            _embed_payload(encode_bmp(px), fake=False),
            _embed_payload(encode_png(px), fake=False),
            _embed_payload(encode_jpeg(px, quality=90), fake=False),
        ]
        vecs[seed] = enc[0]
        within += [_cos(enc[0], enc[1]), _cos(enc[0], enc[2])]
    for a in range(4):
        for b in range(a + 1, 4):
            cross.append(_cos(vecs[a], vecs[b]))
    assert min(within) > 0.99  # lossless exact; JPEG-q90 barely moves
    assert max(cross) < 0.9
    assert min(within) > max(cross) + 0.05  # real margin, not a tie


def test_brightness_shift_invariance_direction():
    # DC is dropped, so a global brightness shift (clipping-free)
    # leaves the descriptor unchanged up to float residue: the AC
    # basis rows sum to zero only in exact arithmetic (~1e-13 in
    # floats — the r7 flat-image pHash lesson: pin direction, never
    # exact values where residue lives).
    px = _scene(2)
    shifted = [
        [(r + 30, g + 30, b + 30) for (r, g, b) in row] for row in px
    ]
    assert _cos(dct_features(px), dct_features(shifted)) > 1 - 1e-9


def test_fake_mode_contract():
    # No codec magic → deterministic content-addressed pseudo-vector
    # in fake mode (exact dups at cosine 1.0), strict mode raises.
    junk = b"\x00\x01garbage-payload"
    v1 = _embed_payload(junk, fake=True)
    v2 = _embed_payload(junk, fake=True)
    assert v1 == v2 and len(v1) == EMBED_DIM
    with pytest.raises(NotImplementedError):
        _embed_payload(junk, fake=False)
    # magic-but-corrupt: fake falls back, strict raises ValueError
    corrupt = encode_bmp(_scene(0))[:30]
    assert len(_embed_payload(corrupt, fake=True)) == EMBED_DIM
    with pytest.raises(ValueError):
        _embed_payload(corrupt, fake=False)


def test_audio_band_energy_features_margins():
    # The measured basis for the audio descriptor: same-clip re-encodes
    # across all four codings stay near 1.0, different clips separate,
    # and a uniform volume scale is removed exactly by the
    # log+mean-center construction (up to float residue).
    from salesforce_postgresql_etl_spark.operators.media_embed import (
        AUDIO_EMBED_DIM,
        band_energy_features,
    )
    from salesforce_postgresql_etl_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

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

    vecs = {}
    for seed in range(4):
        c = _clip(seed)
        for codec in ("pcm16", "ulaw", "alaw", "adpcm"):
            d = decode_wav(encode_wav(c, codec=codec))
            vecs[(seed, codec)] = band_energy_features(
                d["samples"], d["n_channels"]
            )
    assert all(len(v) == AUDIO_EMBED_DIM == 81 for v in vecs.values())
    within = [
        _cos(vecs[(s, "pcm16")], vecs[(s, c)])
        for s in range(4)
        for c in ("ulaw", "alaw", "adpcm")
    ]
    cross = [
        _cos(vecs[(a, "pcm16")], vecs[(b, "pcm16")])
        for a in range(4)
        for b in range(a + 1, 4)
    ]
    assert min(within) > 0.97
    assert max(cross) < 0.9
    base = _clip(1)
    loud = [x * 3 for x in base]
    assert (
        _cos(band_energy_features(base), band_energy_features(loud))
        > 1 - 1e-9
    )


def test_embed_lsh_pairs_over_media_embeddings(spark):
    """The pair-style bridge: image + audio embeddings feed
    simsearch.neardup_embed_pairs, sign-plane LSH ≡ brute, every
    cross-codec duplicate group recovered with no cross-group pair.
    Embeddings are checkpointed first (the decode-once rule — the pair
    search references its input on both sides)."""
    from pyspark.sql import functions as F  # noqa: F401

    from salesforce_postgresql_etl_spark.operators.jpeg import encode_jpeg
    from salesforce_postgresql_etl_spark.operators.media_embed import (
        audio_embeddings,
    )
    from salesforce_postgresql_etl_spark.operators.multimodal import encode_wav
    from salesforce_postgresql_etl_spark.operators.simsearch import (
        neardup_embed_pairs,
    )

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

    rows = []
    for seed in range(3):
        px = _scene(seed)
        for j, payload in enumerate(
            (encode_bmp(px), encode_png(px), encode_jpeg(px, quality=90))
        ):
            rows.append(
                (seed * 3 + j, "image", payload, (None, None, None, "img"))
            )
    for seed in range(3):
        c = _clip(seed)
        for j, codec in enumerate(("pcm16", "ulaw", "adpcm")):
            rows.append(
                (
                    100 + seed * 3 + j,
                    "audio",
                    encode_wav(c, codec=codec),
                    (None, None, 16000, codec),
                )
            )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    for emb_fn, base in ((image_embeddings, 0), (audio_embeddings, 100)):
        emb = emb_fn(media, fake=False).localCheckpoint(eager=True)
        brute = {
            (r.vec_a, r.vec_b)
            for r in neardup_embed_pairs(
                emb, threshold=0.95, strategy="brute"
            ).collect()
        }
        lsh = {
            (r.vec_a, r.vec_b)
            for r in neardup_embed_pairs(
                emb, threshold=0.95, strategy="lsh"
            ).collect()
        }
        assert lsh == brute
        expect = {
            (base + s * 3 + i, base + s * 3 + j)
            for s in range(3)
            for i in range(3)
            for j in range(i + 1, 3)
        }
        assert brute == expect


def test_video_embeddings_cross_container(spark):
    """Clip-level pooled descriptor: the same clip as GIF and DIB-AVI
    pools identical frame descriptors (cosine ≈ 1, here exact frame
    decode so ≥ 1-1e-9); different clips separate. Pooling uses the
    order-independent mean, so the embedding is partition-stable."""
    from salesforce_postgresql_etl_spark.operators.avi import encode_avi
    from salesforce_postgresql_etl_spark.operators.gif import encode_gif
    from salesforce_postgresql_etl_spark.operators.media_embed import (
        video_embeddings,
    )

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
            [pal[((x // bx) + (y // by) + t) % 8] for x in range(w)]
            for y in range(h)
        ]

    rows = []
    for seed in range(3):
        frames = [_vframe(seed, t) for t in range(4)]
        rows.append(
            (seed * 2, "video", encode_gif(frames), (None, None, None, "gif"))
        )
        rows.append(
            (
                seed * 2 + 1,
                "video",
                encode_avi(frames, codec="dib"),
                (None, None, None, "avi"),
            )
        )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r.vec_id: list(r.embedding)
        for r in video_embeddings(media, n_frames=3, fake=False).collect()
    }
    assert set(out) == set(range(6))
    for seed in range(3):
        assert _cos(out[2 * seed], out[2 * seed + 1]) > 1 - 1e-9
    for a in range(3):
        for b in range(a + 1, 3):
            assert _cos(out[2 * a], out[2 * b]) < 0.9


def test_video_embedding_partition_stability(spark):
    """The pooling claim made checkable: because the per-dimension
    mean is ``mean_q40`` (order-independent quantized mean), the clip
    embedding is BIT-IDENTICAL under any input partitioning — the
    cluster-resize guarantee applied to media."""
    from salesforce_postgresql_etl_spark.operators.avi import encode_avi
    from salesforce_postgresql_etl_spark.operators.gif import encode_gif
    from salesforce_postgresql_etl_spark.operators.media_embed import (
        video_embeddings,
    )

    def _vframe(seed: int, t: int, w: int = 32, h: int = 24):
        bx, by = 4 + 2 * (seed % 3), 3 + (seed % 4)
        pal = [
            (
                (37 * seed + 61 * k) % 256,
                (91 * seed + 43 * k) % 256,
                (29 * seed + 83 * k) % 256,
            )
            for k in range(8)
        ]
        return [
            [pal[((x // bx) + (y // by) + t) % 8] for x in range(w)]
            for y in range(h)
        ]

    rows = []
    for seed in range(4):
        frames = [_vframe(seed, t) for t in range(4)]
        rows.append(
            (seed, "video", encode_gif(frames), (None, None, None, "gif"))
        )
        rows.append(
            (
                10 + seed,
                "video",
                encode_avi(frames, codec="dib"),
                (None, None, None, "avi"),
            )
        )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    outs = []
    for nparts in (1, 13):
        out = {
            r.vec_id: list(r.embedding)
            for r in video_embeddings(
                media.repartition(nparts), n_frames=3, fake=False
            ).collect()
        }
        outs.append(out)
    assert outs[0] == outs[1]  # bit-identical, not merely close


def test_trained_index_paths_over_image_embeddings(spark):
    """The TRAINED-index halves of the 'ANN applies unchanged' claim:
    k-means → IVF probe, and PQ encode → ADC shortlist → exact rerank,
    both over image embeddings, both returning each query's own
    re-encodes as nearest neighbors."""
    from pyspark.sql import functions as F

    from salesforce_postgresql_etl_spark.operators.jpeg import encode_jpeg
    from salesforce_postgresql_etl_spark.operators.pq import (
        pq_encode,
        pq_topk,
        pq_train,
    )
    from salesforce_postgresql_etl_spark.operators.simsearch import (
        kmeans_centroids,
        topk_cosine,
        with_kmeans_labels,
    )

    rows = []
    for seed in range(4):
        px = _scene(seed)
        for j, payload in enumerate(
            (encode_bmp(px), encode_png(px), encode_jpeg(px, quality=90))
        ):
            rows.append(
                (seed * 3 + j, "image", payload, (None, None, None, "img"))
            )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    emb = image_embeddings(media, fake=False).localCheckpoint(eager=True)
    queries = emb.where(F.col("vec_id") % 3 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )

    # IVF: train k=4 (one list per scene on this corpus — farthest-
    # first seeding separates the four well-separated scene clusters),
    # probe only the nearest list.
    cents = kmeans_centroids(emb, k=4, iters=3)
    labeled = with_kmeans_labels(emb, cents)
    ivf = topk_cosine(
        labeled, queries, k=2, strategy="ivf", nprobe=1, centroids=cents
    ).collect()
    assert len(ivf) == 8
    for r in ivf:
        assert r.qid // 3 == r.vec_id // 3
        assert r.cosine > 0.99

    # PQ: 63 dims → m=7 subspaces of 9 dims, ADC shortlist, exact
    # rerank — the compressed-corpus path.
    cb = pq_train(emb, m=7, k=8, iters=2, init="md5")
    codes = pq_encode(emb, cb)
    pq = pq_topk(
        codes, cb, queries, k=2, rerank_with=emb, shortlist=6
    ).collect()
    assert len(pq) == 8
    for r in pq:
        assert r.qid // 3 == r.vec_id // 3


def test_topk_cosine_over_image_embeddings(spark):
    """End-to-end bridge: 4 scenes × 3 encodings → embeddings →
    simsearch.topk_cosine(brute). Each query's 2 nearest neighbors
    must be its own re-encodes."""
    from pyspark.sql import functions as F

    from salesforce_postgresql_etl_spark.operators.jpeg import encode_jpeg
    from salesforce_postgresql_etl_spark.operators.simsearch import topk_cosine

    rows = []
    for seed in range(4):
        px = _scene(seed)
        for j, payload in enumerate(
            (encode_bmp(px), encode_png(px), encode_jpeg(px, quality=90))
        ):
            rows.append(
                (seed * 3 + j, "image", payload, (None, None, None, "img"))
            )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    emb = image_embeddings(media, fake=False).withColumn("label", F.lit(0))
    emb = emb.localCheckpoint(eager=True)  # decode once (phash rule)
    queries = emb.where(F.col("vec_id") % 3 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    out = topk_cosine(emb, queries, k=2, strategy="brute").collect()
    assert len(out) == 8  # 4 queries × k=2
    for r in out:
        assert r.qid // 3 == r.vec_id // 3, (
            f"query {r.qid}: neighbor {r.vec_id} is a different scene"
        )
        assert r.cosine > 0.99
