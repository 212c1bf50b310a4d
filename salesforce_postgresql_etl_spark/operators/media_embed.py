"""Media feature embeddings (image DCT, audio band-energy) — the
bridge from the multimodal decode layer to the ANN similarity stack.

Perceptual HASHING (``operators/phash.py``) answers "is this the same
picture re-encoded?" — a Hamming-radius question. A corpus pipeline
also needs the GRADED question "which pictures look most alike?", and
the engine already has the machinery for that: ``operators/simsearch``
(brute / IVF / PQ cosine top-k over an ``array<float>`` column). This
module produces that column for images, so media similarity rides the
EXISTING, equivalence-tested ANN operators instead of growing a
parallel search implementation.

Feature definition (public, the classic DCT descriptor that pHash
thresholds away): luma → 32×32 nearest-neighbor resample → 2D DCT-II →
keep the 8×8 low-frequency block → DROP the DC term (global
brightness; cosine would otherwise be dominated by exposure) → the 63
AC coefficients as float. Cosine over these is correlation of
low-frequency structure: re-encodes land ≈1.0, unrelated scenes
decorrelate. The same ``_COS``/resample tables as ``phash.phash64``
are reused, so hash and embedding stay consistent by construction
(phash = this vector thresholded at its median).

100 TB story — identical shape to the hash path: payloads cross into
Python ONCE (Arrow-batched mapInPandas), 63×8 B of embedding leaves
per image, payload bytes never shuffle; downstream top-k inherits
simsearch's audited shuffle profile (IVF probe audited at 0.03 MB).
There is no self-join over the decode lineage here (top-k joins
embeddings against a QUERY table), so the ``hamming_pairs`` decode-
twice trap does not apply; pair-style uses (``neardup_embed_pairs``)
should persist the embedding output first, same rule as
``phash_neardup``.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from .phash import _COS, _LOW, _SIZE

EMBED_DIM = _LOW * _LOW - 1  # 63 AC coefficients, DC dropped


def dct_features(pixels: list[list[tuple[int, int, int]]]) -> list[float]:
    """63-float unit-L2 DCT descriptor of rows-of-(r,g,b) pixels.
    Deterministic: integer luma, fixed summation order (mirrors
    ``phash.phash64`` exactly through the 8×8 block — same grid, same
    basis tables). Unit-normalized because cosine is scale-invariant
    and the raw coefficients (∼1e6) overflow ``simsearch``'s
    decimal-exact dot product, which is sized for the embeddings
    fixture's unit-range components."""
    h, w = len(pixels), len(pixels[0])
    gray = [
        [
            (
                299 * pixels[y * h // _SIZE][x * w // _SIZE][0]
                + 587 * pixels[y * h // _SIZE][x * w // _SIZE][1]
                + 114 * pixels[y * h // _SIZE][x * w // _SIZE][2]
            )
            / 1000.0
            for x in range(_SIZE)
        ]
        for y in range(_SIZE)
    ]
    row_t = [
        [sum(row[x] * _COS[u][x] for x in range(_SIZE)) for u in range(_LOW)]
        for row in gray
    ]
    block = [
        [sum(row_t[y][u] * _COS[v][y] for y in range(_SIZE)) for u in range(_LOW)]
        for v in range(_LOW)
    ]
    flat = [float(block[v][u]) for v in range(_LOW) for u in range(_LOW)][
        1:
    ]  # drop DC
    norm = math.sqrt(sum(c * c for c in flat))
    if norm == 0.0:  # constant image: all AC terms vanish
        return flat
    return [c / norm for c in flat]


def _embed_payload(payload: bytes, fake: bool) -> list[float]:
    """One payload → 63-float descriptor under the codec stub contract
    (mirror of ``phash._phash_payload``): decodable → real features;
    magic-but-corrupt → fake falls back to the pseudo-vector, strict
    re-raises; no codec → fake pseudo-vector, strict raises. The
    pseudo-vector is sha256-derived and content-addressed, so exact
    duplicates still land at cosine 1.0 in fake mode."""
    from .multimodal import _pixel_codec

    payload = bytes(payload)
    codec = _pixel_codec(payload)
    if codec is not None:
        try:
            return dct_features(codec[0](payload)["pixels"])
        except ValueError:
            if not fake:
                raise
    if not fake:
        raise NotImplementedError(
            "image embeddings beyond the BMP/PPM/PNG/baseline-JPEG/GIF "
            "codecs require an imaging library not present in this "
            "environment; pass fake=True for the deterministic stub"
        )
    digest = hashlib.sha256(payload).digest()
    ext = (digest * ((EMBED_DIM * 2) // len(digest) + 1))[: EMBED_DIM * 2]
    # unit-range components, same decimal-precision budget as the
    # real descriptor (the exact fractions are content-addressed)
    return [
        (int.from_bytes(ext[2 * i : 2 * i + 2], "big") - 32768) / 32768.0
        for i in range(EMBED_DIM)
    ]


_EMBED_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        # element nullability TRUE to match the embeddings fixture —
        # Arrow's pandas→list converter rejects non-null element types
        # on the sign-plane pandas-UDF path (measured: the LSH pair
        # search failed with NumPyConverter on `double not null`).
        StructField("embedding", ArrayType(DoubleType(), True), False),
    ]
)


def image_embeddings(media: DataFrame, fake: bool = True) -> DataFrame:
    """(vec_id, embedding) for every IMAGE row of a MEDIA_SCHEMA frame
    — column names chosen to drop straight into ``simsearch``
    (``topk_cosine``, ``with_kmeans_labels``, ``neardup_embed_pairs``).
    Non-image rows produce no output; one Arrow crossing total."""
    from ..session import configure_runtime

    configure_runtime(media.sparkSession)

    def batches(it: Iterator):
        import pandas as pd

        for pdf in it:
            ids, vecs = [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image":
                    continue
                ids.append(mid)
                vecs.append(_embed_payload(payload, fake))
            if not ids:
                # An all-filtered batch must yield nothing: an EMPTY
                # "embedding" column defaults to float64 in pandas and
                # Arrow refuses ndarray→list conversion (measured:
                # NumPyConverter error on mixed-kind media frames).
                continue
            yield pd.DataFrame(
                {
                    "vec_id": pd.Series(ids, dtype="int64"),
                    "embedding": pd.Series(vecs, dtype="object"),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, _EMBED_SCHEMA
    )


def video_embeddings(
    media: DataFrame, n_frames: int = 3, fake: bool = True
) -> DataFrame:
    """(vec_id, embedding) for every VIDEO row: the unit-mean of the
    per-sampled-frame DCT descriptors (mean of unit vectors,
    re-normalized — the standard order-free pooling; the per-dimension
    mean uses ``mean_q40`` so it is order-INDEPENDENT under any
    partitioning, the repo's determinism doctrine for float
    aggregation). A clip and its re-encode in
    another container pool the same frame descriptors → cosine ≈ 1;
    cross-clip frames decorrelate. Composes ``multimodal.sample_frames``
    (real GIF/AVI demux) with ``dct_features`` — payloads cross into
    Python once (the demux), frames once more (63 floats per FRAME out
    of that crossing; pooling to the one 63-float clip vector is JVM
    aggregation), same decode-once discipline as ``video_phash``."""
    from ..session import configure_runtime
    from .multimodal import sample_frames

    configure_runtime(media.sparkSession)
    frames = sample_frames(media, n_frames=n_frames, fake=fake)

    def batches(it: Iterator):
        import pandas as pd

        for pdf in it:
            ids, vecs = [], []
            for mid, frame in zip(pdf["media_id"], pdf["frame"]):
                ids.append(mid)
                vecs.append(_embed_payload(frame, fake))
            if not ids:
                continue  # same empty-batch Arrow rule as above
            yield pd.DataFrame(
                {
                    "vec_id": pd.Series(ids, dtype="int64"),
                    "embedding": pd.Series(vecs, dtype="object"),
                }
            )

    per_frame = frames.select("media_id", "frame").mapInPandas(
        batches, _EMBED_SCHEMA
    )
    # Pool map-side-combinable: per-dimension mean over the clip's
    # frames (posexplode → avg), then re-normalize. All JVM exprs past
    # the frame hash — only 63-float rows ever aggregate.
    from .simsearch import mean_q40

    exploded = per_frame.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    )
    pooled = (
        exploded.groupBy("vec_id", "pos")
        .agg(mean_q40(F.col("val")).alias("val"))
        .groupBy("vec_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "val"))
            ).alias("pv")
        )
        .select(
            "vec_id",
            F.transform(F.col("pv"), lambda s: s["val"]).alias("m"),
        )
    )
    norm = F.sqrt(
        F.aggregate(
            F.col("m"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    return pooled.select(
        "vec_id",
        F.when(
            norm > 0.0,
            F.transform(F.col("m"), lambda x: x / norm),
        )
        .otherwise(F.col("m"))
        .alias("embedding"),
    )


# ---------------------------------------------------------------- audio

from .audiofp import _BANDS as _AFP_BANDS  # noqa: E402
from .audiofp import _FRAMES as _AFP_FRAMES  # noqa: E402

# 9 frames × 9 bands = 81, DERIVED from the audiofp grid so the
# pseudo-vector dimension can never silently desync from the real one
# if the measured frame design ever changes.
AUDIO_EMBED_DIM = _AFP_FRAMES * _AFP_BANDS


def band_energy_features(
    samples: list[int], n_channels: int = 1
) -> list[float]:
    """81-float unit-L2 audio descriptor: the same mono-mean →
    1152-sample grid → 9 frames × 9 band energies as
    ``audiofp.audio_fingerprint64``, but kept as VALUES instead of
    being thresholded to double-delta sign bits — log-compressed then
    mean-centered (a uniform volume scale c adds the constant 2·log c
    to every log-energy, which centering removes — volume invariance
    measured at cosine 1.0 to 1e-12) then unit-normalized for the
    decimal-exact dot product. Measured margins on the multi-tone
    fixture grid (4 clips × PCM16/μ-law/A-law/ADPCM): within-clip
    cosine ≥ 0.983, cross-clip ≤ 0.838."""
    from .audiofp import _band_energies, _FRAME_LEN, _FRAMES, _HOP, _N

    if n_channels < 1 or len(samples) % n_channels:
        raise ValueError("samples must interleave n_channels evenly")
    n_frames_in = len(samples) // n_channels
    if n_frames_in == 0:
        return [0.0] * AUDIO_EMBED_DIM
    mono = [
        sum(samples[i * n_channels + c] for c in range(n_channels))
        / n_channels
        for i in range(n_frames_in)
    ]
    grid = [mono[i * n_frames_in // _N] for i in range(_N)]
    logs = []
    for f in range(_FRAMES):
        for e in _band_energies(grid[f * _HOP : f * _HOP + _FRAME_LEN]):
            logs.append(math.log(e + 1.0))
    mu = sum(logs) / len(logs)
    cen = [v - mu for v in logs]
    norm = math.sqrt(sum(v * v for v in cen))
    if norm == 0.0:
        return cen
    return [v / norm for v in cen]


def _audio_embed_payload(payload: bytes, fake: bool) -> list[float]:
    """Codec stub contract, mirror of ``audiofp._afp_payload``."""
    from .multimodal import decode_wav

    payload = bytes(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        try:
            d = decode_wav(payload)
        except ValueError:
            if not fake:
                raise
        else:
            return band_energy_features(d["samples"], d["n_channels"])
    if not fake:
        raise NotImplementedError(
            "audio embeddings beyond RIFF/WAVE (PCM16, G.711, IMA ADPCM) "
            "require an audio library not present in this environment; "
            "pass fake=True for the deterministic stub"
        )
    digest = hashlib.sha256(payload).digest()
    ext = (digest * ((AUDIO_EMBED_DIM * 2) // len(digest) + 1))[
        : AUDIO_EMBED_DIM * 2
    ]
    return [
        (int.from_bytes(ext[2 * i : 2 * i + 2], "big") - 32768) / 32768.0
        for i in range(AUDIO_EMBED_DIM)
    ]


def audio_embeddings(media: DataFrame, fake: bool = True) -> DataFrame:
    """(vec_id, embedding) for every AUDIO row — the audio twin of
    ``image_embeddings``, same simsearch-ready shape, one Arrow
    crossing, 81×8 B out per clip."""
    from ..session import configure_runtime

    configure_runtime(media.sparkSession)

    def batches(it: Iterator):
        import pandas as pd

        for pdf in it:
            ids, vecs = [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "audio":
                    continue
                ids.append(mid)
                vecs.append(_audio_embed_payload(payload, fake))
            if not ids:
                continue  # same empty-batch Arrow rule as images
            yield pd.DataFrame(
                {
                    "vec_id": pd.Series(ids, dtype="int64"),
                    "embedding": pd.Series(vecs, dtype="object"),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, _EMBED_SCHEMA
    )
