"""Multimodal (binary) column carriage + feature extraction (L7).

Media payloads ride through the engine as opaque ``BinaryType``
columns with a typed ``StructType`` metadata sidecar — the Spark-side
contract a 100 TB training-data pipeline needs:

- scan/shuffle/sink carry bytes untouched (Parquet BINARY, dictionary
  off for large payloads);
- per-row decode/feature-extraction runs in ``mapInPandas`` so bytes
  cross the JVM↔Python boundary once, Arrow-batched, and the operator
  streams batch-by-batch (constant memory per task no matter the
  partition size);
- partitioning guidance: payload-bearing tables should be
  repartitioned by a content-hash bucket before wide ops so one giant
  file can't skew a task.

The actual image/audio decode is STUBBED (``_decode_payload``) because
no media libraries exist in this container — it raises
``NotImplementedError`` unless ``fake=True``, in which case it derives
deterministic pseudo-features (size, sha256-prefix, parsed dims from
metadata). Everything around the stub — schema, Arrow batching, UDF
signature, column pruning — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("sample_rate", IntegerType(), True),
                    StructField("codec", StringType(), True),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_id", StringType(), False),
        StructField("n_pixels", LongType(), True),
    ]
)


def _decode_payload(payload: bytes, kind: str, fake: bool):
    """The library-dependent decode step. STUB: no media libs here."""
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in "
            "this environment; pass fake=True for the deterministic stub"
        )
    return {
        "n_bytes": len(payload),
        "content_id": hashlib.sha256(payload).hexdigest()[:16],
    }


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """BinaryType → features via mapInPandas (Arrow-batched, streaming)."""
    from ..session import configure_runtime

    configure_runtime(media.sparkSession)  # ships package to Python workers

    def batches(it: Iterator):
        import pandas as pd

        for pdf in it:  # one Arrow batch at a time — constant memory
            feats = [
                _decode_payload(p, k, fake)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            npix = []
            for m in pdf["meta"]:
                if m is not None and m.get("width") is not None and m.get("height") is not None:
                    npix.append(m["width"] * m["height"])
                else:
                    npix.append(None)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "content_id": [f["content_id"] for f in feats],
                    "n_pixels": npix,
                }
            )
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake payload table matching MEDIA_SCHEMA."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes((i * 7 + j) % 251 for j in range(32 + (i % 5) * 16))
        meta = (
            (8 + i % 4, 8 + i % 3, None, "png")
            if kind == "image"
            else (None, None, 16000, "pcm")
        )
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
