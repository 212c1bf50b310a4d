"""Registered queries for the r7 media/streaming surface (VERDICT r7
#2): perceptual near-dup over images/audio/video, the media-embedding
bridge into ANN, and the streaming near-dup ingest + compaction jobs.

Oracle strategy — the ``q_multimodal_features`` template: each query
runs the REAL operator over a deterministic fixture (the proven
low-frequency generators from the r7 perceptual test suite: sinusoid
scenes, multi-tone clips, 8-color block frames — noise fixtures are
perceptually unstable by construction) and the DuckDB oracle pins the
expected output as an inline VALUES table. Outputs are integer-only
(ids, ranks, counts — never raw hashes or float scores), so the pin is
robust to last-ulp float drift: the fixtures' measured margins are
wide (within-group image Hamming ≤6 at radius 7, audio ≤12 at radius
15, cross-group ≥16) and a one-bit flip cannot change the pair set.

The stream/compaction queries drive the actual ``neardup_stream_sink``
foreachBatch path (stored-signature cross-batch checks) against a
throwaway corpus dir, then pin the analytically-known survivor set —
duplicate groups are CLIQUES, for which online ingest provably equals
the batch canonical-survivor set regardless of chunking (the semantics
contract pinned in tests/test_neardup_stream.py). The result is
materialized with localCheckpoint before the temp dir is removed.

100 TB story: these registrations add no new plan shapes — they are
the driver-graded entry points for machinery whose scale plans are
already audited (shared pigeonhole Hamming banding, one Arrow decode
crossing, stored band signatures so history is never re-hashed;
SCALE.md r7n/r7p2/r7s).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register

_BANDING = {"n_hashes": 64, "bands": 16}  # r=4/b=16 — boundary-safe at θ=0.8
_THETA = 0.8


# ---------------------------------------------------------------------------
# Deterministic fixtures (the proven r7 generators — see
# tests/test_media_pipeline.py; duplicated here because queries must not
# import from tests/)
# ---------------------------------------------------------------------------
def _scene(seed: int, w: int = 48, h: int = 48):
    """Smooth sinusoid image: perceptual hashing is a low-frequency
    statement, so fixtures need low-frequency content."""
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
    """Multi-tone audio clip — spectral structure a band-energy
    fingerprint can hold onto."""
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
    """8-color block frame (encode_gif raises above 256 colors; the
    per-seed block geometry keeps cross-clip Hamming wide)."""
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


def _image_media(spark: SparkSession) -> DataFrame:
    """4 scenes × (BMP, PNG, JPEG-q90): each duplicate group spans
    codecs with zero shared payload bytes. ids 3s..3s+2 per scene."""
    from ..operators.jpeg import encode_jpeg
    from ..operators.multimodal import MEDIA_SCHEMA, encode_bmp, encode_png

    rows = []
    mid = 0
    for seed in range(4):
        px = _scene(seed)
        for payload in (
            encode_bmp(px),
            encode_png(px),
            encode_jpeg(px, quality=90),
        ):
            rows.append((mid, "image", payload, (None, None, None, "img")))
            mid += 1
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _audio_media(spark: SparkSession) -> DataFrame:
    """4 clips × (PCM16, μ-law, IMA-ADPCM) WAV: cross-codec duplicate
    groups. ids 3s..3s+2 per clip."""
    from ..operators.multimodal import MEDIA_SCHEMA, encode_wav

    rows = []
    mid = 0
    for seed in range(4):
        c = _clip(seed)
        for codec in ("pcm16", "ulaw", "adpcm"):
            rows.append(
                (mid, "audio", encode_wav(c, codec=codec), (None, None, 16000, codec))
            )
            mid += 1
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _video_media(spark: SparkSession) -> DataFrame:
    """3 clips × (animated GIF, DIB AVI, YUV4MPEG2): cross-CONTAINER
    duplicate groups. ids 3s..3s+2 per clip."""
    from ..operators.avi import encode_avi
    from ..operators.gif import encode_gif
    from ..operators.multimodal import MEDIA_SCHEMA
    from ..operators.y4m import encode_y4m

    rows = []
    mid = 0
    for seed in range(3):
        frames = [_vframe(seed, t) for t in range(4)]
        for payload in (
            encode_gif(frames),
            encode_avi(frames, codec="dib"),
            encode_y4m(frames),
        ):
            rows.append((mid, "video", payload, (None, None, None, "vid")))
            mid += 1
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Oracle generators: every fixture is n duplicate groups × 3 encodings
# (ids 3g..3g+2), so the expected outputs are pure functions of the
# group count — generated once here instead of five hand-maintained
# VALUES tables that would have to change in lockstep with the
# fixture geometry (r8 review).
# ---------------------------------------------------------------------------
def _triangle_pairs_oracle(n_groups: int, cols: str) -> str:
    """Unordered within-group pairs (a < b): each group's triangle."""
    vals = ", ".join(
        f"({3 * g + a}, {3 * g + b})"
        for g in range(n_groups)
        for a, b in ((0, 1), (0, 2), (1, 2))
    )
    return f"SELECT * FROM (VALUES {vals}) AS t({cols})"


def _topk_set_oracle(n_groups: int) -> str:
    """Directed top-2 neighbor sets: each member's two group mates."""
    vals = ", ".join(
        f"({3 * g + a}, {3 * g + b})"
        for g in range(n_groups)
        for a in range(3)
        for b in range(3)
        if a != b
    )
    return f"SELECT * FROM (VALUES {vals}) AS t(qid, vec_id)"


# ---------------------------------------------------------------------------
# Perceptual near-dup — the cross-codec/cross-container duplicate sets
# exact content_id dedup cannot see
# ---------------------------------------------------------------------------
# Each scene's BMP/PNG/JPEG triangle — verified stable 3/3 by the local
# differential before registration (the r8 discipline).
_PHASH_ORACLE = _triangle_pairs_oracle(4, "media_a, media_b")


@register("q_phash_neardup", oracle=_PHASH_ORACLE)
def q_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image perceptual near-dup: DCT pHash per image (one Arrow
    crossing), shared pigeonhole Hamming banding for the pair search
    (exact guarantee, no O(n²)). Expected pairs = each scene's
    BMP/PNG/JPEG triangle (within-group Hamming ≤6 measured at 48×48,
    cross-scene ≥16 — radius 7 sits in the gap)."""
    from ..operators.phash import phash_neardup

    media = _image_media(spark).repartition(4)
    return phash_neardup(media, max_hamming=7, fake=True).select(
        "media_a", "media_b"
    )


_AUDIOFP_ORACLE = _triangle_pairs_oracle(4, "media_a, media_b")


@register("q_audiofp_neardup", oracle=_AUDIOFP_ORACLE)
def q_audiofp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio perceptual near-dup: spectral band-energy fingerprint per
    clip, same shared Hamming banding. Expected pairs = each clip's
    PCM/μ-law/ADPCM triangle (within-group ≤12 measured, cross-clip
    ≥16 — radius 15 is the module's design radius)."""
    from ..operators.audiofp import audio_neardup

    media = _audio_media(spark).repartition(4)
    return audio_neardup(media, max_hamming=15, fake=True).select(
        "media_a", "media_b"
    )


_VIDEO_ORACLE = _triangle_pairs_oracle(3, "media_a, media_b")


@register("q_video_neardup", oracle=_VIDEO_ORACLE)
def q_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-container video near-dup: demux → per-frame pHash →
    aligned-frame conjunction over the banded pair search. Expected
    pairs = each clip's GIF/AVI/Y4M triangle (lossless DIB/LZW frames
    hash identically; Y4M's YCbCr roundtrip moves ≤3 bits)."""
    from ..operators.phash import video_neardup

    media = _video_media(spark).repartition(3)
    return video_neardup(media, max_hamming=3, n_frames=3, fake=True).select(
        "media_a", "media_b"
    )


# Per image: rank 1–2 are its scene's other codecs (BMP/PNG identical
# pixels tie at cosine 1.0, broken by vec_id; JPEG follows at ~0.999).
_MEDIA_EMBED_ORACLE = """
SELECT * FROM (VALUES
    (0, 1, 1), (0, 2, 2), (1, 0, 1), (1, 2, 2), (2, 0, 1), (2, 1, 2),
    (3, 4, 1), (3, 5, 2), (4, 3, 1), (4, 5, 2), (5, 3, 1), (5, 4, 2),
    (6, 7, 1), (6, 8, 2), (7, 6, 1), (7, 8, 2), (8, 6, 1), (8, 7, 2),
    (9, 10, 1), (9, 11, 2), (10, 9, 1), (10, 11, 2), (11, 9, 1), (11, 10, 2))
     AS t(qid, vec_id, rnk)
"""


@register("q_media_embed", oracle=_MEDIA_EMBED_ORACLE)
def q_media_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-embedding bridge into the ANN stack: image DCT descriptors
    (unit-L2, one Arrow crossing) → ``topk_cosine``. k=2 pins the
    duplicate-group structure — each image's two nearest neighbors are
    its own scene's other codecs (identical-pixel BMP/PNG tie at
    cosine 1.0, broken by vec_id; the JPEG mate follows at ~0.999;
    cross-scene cosines are far below). Integer-only output."""
    from ..operators.media_embed import image_embeddings
    from ..operators.simsearch import topk_cosine

    media = _image_media(spark).repartition(4)
    emb = image_embeddings(media, fake=True).withColumn("label", F.lit(0))
    # decode once: both topk sides reference the embedding lineage
    emb = emb.localCheckpoint(eager=True)
    queries = emb.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    # checkpointed RDDs carry no size stats, so without the hint the
    # brute crossJoin would plan a CartesianProduct (banned by the plan
    # audit); the corpus side is the broadcastable one by construction
    return topk_cosine(F.broadcast(emb), queries, k=2, strategy="brute").select(
        "qid", "vec_id", "rnk"
    )


# IVF with REAL pruning (nprobe=1 of 4 inverted lists), graded: the
# scene id is the label, so each query's best centroid is its own
# scene (within-scene cosine ≥ 0.99 vs decorrelated cross-scene) and
# the pruned list still contains the true top-2 — the same pair set
# q_media_embed pins by brute. rnk dropped for the same set-statement
# robustness as the audio/video twins below.
_SIMSEARCH_IVF_ORACLE = _topk_set_oracle(4)


@register("q_simsearch_ivf", oracle=_SIMSEARCH_IVF_ORACLE)
def q_simsearch_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with genuine inverted-list pruning, driver-graded:
    centroid ranking keeps nprobe=1 of 4 labels per query, the scan
    touches only that label's list, and the result still equals the
    brute pair structure (tests/test_llm_ops.py proves the partial-
    probe ≡ brute contract; this registers it against a driver
    oracle). Index = label_centroids over scene labels — mean_q40
    per dimension, bit-identical under any partitioning."""
    from ..operators.media_embed import image_embeddings
    from ..operators.simsearch import label_centroids, topk_cosine

    media = _image_media(spark).repartition(4)
    emb = (
        image_embeddings(media, fake=True)
        .withColumn("label", (F.col("vec_id") / 3).cast("int"))
        .localCheckpoint(eager=True)  # decode once
    )
    cents = label_centroids(emb)
    queries = emb.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    return topk_cosine(
        F.broadcast(emb),
        queries,
        k=2,
        strategy="ivf",
        nprobe=1,
        centroids=F.broadcast(cents),
    ).select("qid", "vec_id")


# PQ two-stage search with genuine shortlist pruning (6 of 11
# candidates per query): ADC over 7×9-dim codebooks ranks by
# compressed codes alone, the exact re-rank touches only the
# shortlist, and the top-2 still equals the brute pair structure
# (tests/test_media_embed.py pins the trained-index contract; this
# grades it). Training is md5-init deterministic k-means per
# subspace — bit-identical across runs and partitionings.
_SIMSEARCH_PQ_ORACLE = _topk_set_oracle(4)


@register("q_simsearch_pq", oracle=_SIMSEARCH_PQ_ORACLE)
def q_simsearch_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ADC shortlist + exact re-rank, driver-graded: the corpus is
    scanned only through 7-byte codes, exact vectors are fetched for a
    6-candidate shortlist per query, and the re-ranked top-2 recovers
    each image's duplicate group."""
    from ..operators.media_embed import image_embeddings
    from ..operators.pq import pq_encode, pq_topk, pq_train

    media = _image_media(spark).repartition(4)
    emb = image_embeddings(media, fake=True).localCheckpoint(eager=True)
    cb = pq_train(emb, m=7, k=8, iters=2, init="md5")
    codes = pq_encode(emb, cb)
    queries = emb.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    return pq_topk(
        codes, cb, queries, k=2, rerank_with=emb, shortlist=6
    ).select("qid", "vec_id")


# Per clip: the top-2 SET is its two codec mates (within-clip cosine
# ≥ 0.983, cross-clip ≤ 0.838 — band_energy_features' measured margins).
# Unlike q_media_embed's identical-pixel tie, the two mates' cosines
# here differ by real (lossy-codec) margins, but the registered output
# drops ``rnk`` anyway so the pin is a pure SET statement — robust even
# to an intra-group rank flip.
_AUDIO_EMBED_ORACLE = _topk_set_oracle(4)


@register("q_audio_embed", oracle=_AUDIO_EMBED_ORACLE)
def q_audio_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-embedding bridge into the ANN stack: 81-float log-band-
    energy descriptors (unit-L2, volume-invariant, one Arrow crossing)
    → ``topk_cosine``. k=2 pins the duplicate-group structure — each
    clip's two nearest neighbors are its own clip's other codecs
    (PCM16/μ-law/ADPCM). Integer-only pair output."""
    from ..operators.media_embed import audio_embeddings
    from ..operators.simsearch import topk_cosine

    media = _audio_media(spark).repartition(4)
    emb = audio_embeddings(media, fake=True).withColumn("label", F.lit(0))
    emb = emb.localCheckpoint(eager=True)  # decode once (see q_media_embed)
    queries = emb.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    # broadcast hint for the same no-stats reason as q_media_embed
    return topk_cosine(F.broadcast(emb), queries, k=2, strategy="brute").select(
        "qid", "vec_id"
    )


_VIDEO_EMBED_ORACLE = _topk_set_oracle(3)


@register("q_video_embed", oracle=_VIDEO_EMBED_ORACLE)
def q_video_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-embedding bridge: real demux → per-frame DCT descriptors →
    order-independent unit-mean pooling (``mean_q40``) → ``topk_cosine``.
    k=2 pins each clip's two container re-encodes (GIF/DIB-AVI/Y4M pool
    the same frames → cosine ≈ 1; cross-clip decorrelates). Pair-set
    output, rank-flip-robust like q_audio_embed."""
    from ..operators.media_embed import video_embeddings
    from ..operators.simsearch import topk_cosine

    media = _video_media(spark).repartition(3)
    emb = video_embeddings(media, n_frames=3, fake=True).withColumn(
        "label", F.lit(0)
    )
    emb = emb.localCheckpoint(eager=True)  # decode once
    queries = emb.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    return topk_cosine(F.broadcast(emb), queries, k=2, strategy="brute").select(
        "qid", "vec_id"
    )


# ---------------------------------------------------------------------------
# Streaming ingest + corpus maintenance — the foreachBatch near-dup
# sink driven batch-by-batch (the T1–T5 batch≡stream pattern)
# ---------------------------------------------------------------------------
def _clique_rows():
    """4 duplicate groups, each a CLIQUE at θ=0.8 (20 shared tokens +
    1 unique per member → pairwise J = 20/22 ≈ 0.909), plus two
    singletons; group token spaces are disjoint. For cliques the
    online survivor set provably equals batch mode regardless of
    chunking: canonical = min doc_id per group + the singletons."""
    rows = []
    for g in range(4):
        shared = [f"g{g}w{i}" for i in range(20)]
        for m in range(3):
            rows.append((g * 10 + m, " ".join(shared + [f"g{g}u{m}"])))
    rows.append((100, " ".join(f"s1w{i}" for i in range(15))))
    rows.append((101, " ".join(f"s2w{i}" for i in range(15))))
    return rows


def _drain_cliques(spark: SparkSession, corpus_dir: str) -> None:
    """Push the clique fixture through the sink in 3 interleaved
    micro-batches, so every duplicate group spans at least two batches
    and the cross-batch stored-signature path does real work."""
    from ..streaming.jobs import neardup_stream_sink

    sink = neardup_stream_sink(corpus_dir, threshold=_THETA, **_BANDING)
    rows = _clique_rows()
    for bid, chunk in enumerate((rows[0::3], rows[1::3], rows[2::3])):
        sink(
            spark.createDataFrame(chunk, "doc_id long, text string"), bid
        )


_STREAM_EQ_ORACLE = """
SELECT * FROM (VALUES (0, 21), (10, 21), (20, 21), (30, 21),
                      (100, 15), (101, 15))
     AS t(doc_id, n_tokens)
"""


@register("q_neardup_stream_equiv", oracle=_STREAM_EQ_ORACLE)
def q_neardup_stream_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ≡ stream for near-dup ingest on clique groups: chunked
    drain through the stored-signature sink keeps exactly the batch
    canonical-survivor set {min id per group} ∪ singletons. History is
    never re-hashed — cross-batch checks join new band rows against
    the stored ``band_signatures``."""
    import shutil
    import tempfile

    corpus_dir = tempfile.mkdtemp(prefix="q_neardup_stream_equiv_")
    try:
        _drain_cliques(spark, corpus_dir)
        kept = (
            spark.read.parquet(corpus_dir + "/docs")
            .select(
                "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
            )
            .localCheckpoint(eager=True)  # materialize before rmtree
        )
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
    return kept


# Chain A(1)–B(2)–C(3): J(A,B)=J(B,C)=18/22 ≥ θ, J(A,C)=16/24 < θ.
# Online ingest keeps {A, C} (B drops in batch 0, C never sees it);
# batch mode keeps {A}. In the "resurrect" case the middle holds the
# MINIMUM id, so batch mode keeps the doc the sink dropped. Re-closure
# converges both to batch mode — kept = {1}, 20 tokens either way.
_RECLOSE_ORACLE = """
SELECT * FROM (VALUES ('chain', 1, 20), ('resurrect', 1, 20))
     AS t(example, doc_id, n_tokens)
"""


@register("q_reclose_chain", oracle=_RECLOSE_ORACLE)
def q_reclose_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch re-closure of the streaming corpus: the pinned
    online-vs-batch chain divergence (and its min-id-middle
    resurrection twin) converge to the batch-canonical survivor set —
    re-clustered entirely from stored signatures and tombstones, no
    history re-hashing."""
    import shutil
    import tempfile

    from ..streaming.jobs import neardup_stream_sink, reclose_corpus

    base = [f"w{i}" for i in range(1, 21)]
    a_doc = " ".join(base[:18] + ["x1", "x2"])
    b_doc = " ".join(base)
    c_doc = " ".join(base[2:] + ["y1", "y2"])
    cases = {
        "chain": [(1, a_doc), (2, b_doc), (3, c_doc)],
        "resurrect": [(2, a_doc), (1, b_doc), (3, c_doc)],
    }
    outs = []
    for example, docs in cases.items():
        corpus_dir = tempfile.mkdtemp(prefix=f"q_reclose_{example}_")
        try:
            sink = neardup_stream_sink(
                corpus_dir, threshold=_THETA, **_BANDING
            )
            for bid, row in enumerate(docs):
                sink(
                    spark.createDataFrame(
                        [row], "doc_id long, text string"
                    ),
                    bid,
                )
            reclose_corpus(spark, corpus_dir)
            outs.append(
                spark.read.parquet(corpus_dir + "/docs")
                .select(
                    F.lit(example).alias("example"),
                    "doc_id",
                    F.size(F.split("text", " ")).alias("n_tokens"),
                )
                .localCheckpoint(eager=True)  # materialize before rmtree
            )
        finally:
            shutil.rmtree(corpus_dir, ignore_errors=True)
    return outs[0].unionByName(outs[1])


_COMPACT_ORACLE = """
SELECT * FROM (VALUES (0, 21, 16, 1, 1), (10, 21, 16, 1, 1),
                      (20, 21, 16, 1, 1), (30, 21, 16, 1, 1),
                      (100, 15, 16, 1, 1), (101, 15, 16, 1, 1))
     AS t(doc_id, n_tokens, n_band_rows, docs_compacted, bands_compacted)
"""


@register("q_compact_corpus", oracle=_COMPACT_ORACLE)
def q_compact_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus compaction is rows-preserving: after merging the sealed
    ``bid=`` partitions (docs AND band signatures), the survivor set,
    token counts, and per-doc band-row counts (= bands parameter, 16)
    are unchanged, and both state dirs report a real merge happened."""
    import shutil
    import tempfile

    from ..streaming.jobs import compact_corpus

    corpus_dir = tempfile.mkdtemp(prefix="q_compact_corpus_")
    try:
        _drain_cliques(spark, corpus_dir)
        stats = compact_corpus(spark, corpus_dir)
        docs = spark.read.parquet(corpus_dir + "/docs").select(
            "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
        )
        bands_n = (
            spark.read.parquet(corpus_dir + "/bands")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_band_rows"))
        )
        out = (
            docs.join(bands_n, "doc_id")
            .withColumn(
                "docs_compacted",
                F.lit(int(stats["docs"]["compacted"])),
            )
            .withColumn(
                "bands_compacted",
                F.lit(int(stats["bands"]["compacted"])),
            )
            .localCheckpoint(eager=True)  # materialize before rmtree
        )
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
    return out
