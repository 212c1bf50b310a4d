"""Image DCT feature embeddings — the bridge from the multimodal
decode layer to the ANN similarity stack.

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
        StructField("embedding", ArrayType(DoubleType(), False), False),
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
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, _EMBED_SCHEMA
    )
