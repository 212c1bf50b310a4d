"""Shuffle-byte audit for the perceptual near-dup family (image/audio/
video) — not collected by pytest; run directly, like shuffle_audit.py.

SCALE.md's claim for this family is structural: payload bytes cross
into Python once (the Arrow decode+hash projection) and NEVER shuffle —
every exchange in the pair search carries 8-byte signatures plus ids.
This script turns that from a plan-reading into a measurement:

- fixtures are REAL encoded media (BMP/PNG images, PCM16/G.711 WAV
  clips, GIF/DIB-AVI videos — every payload decodes through the repo's
  own pure-Python codecs), built distributed via mapInPandas and
  eagerly localCheckpoint-ed so fixture-encode stages never pollute
  the audited pass;
- each modality's near-dup pass (banded pigeonhole search, fake=False
  so a decode failure fails the audit instead of degrading to stubs)
  runs as ONE action; its stages are attributed by before/after
  stage-set diff (the shuffle_audit.py method — shuffle write/read and
  spill task metrics are exact, inputBytes is a floor);
- the SQL REST endpoint's final-plan node lists (across ALL of the
  pass's executions, checkpoint job included) are recorded:
  ``n_decode_nodes`` counts MapInPandas / ArrowEval occurrences and
  makes the decode-ONCE claim checkable. History: before the
  hamming_pairs ``persist`` option this printed 2 per modality with
  ``n_reused_exchange`` 0 — the banded self-join's two sides each ran
  the decode lineage (AQE chose a broadcast join, so there was no
  exchange for reuse to deduplicate). Expected now: image/audio 1
  (the checkpoint execution), video 2 (the frame-demux crossing plus
  the per-frame hash ArrowEval — both in the one checkpoint job).

Usage:  python tests/perceptual_audit.py [n_img n_aud n_vid]
Prints one JSON line per modality + a summary line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from salesforce_postgresql_etl_spark.operators.multimodal import (  # noqa: E402
    MEDIA_SCHEMA,
)
from salesforce_postgresql_etl_spark.session import get_spark  # noqa: E402

# ---------------------------------------------------------------- fixtures
# Scene/tone/clip generators mirror tests/test_phash.py / test_audiofp.py:
# perceptual signatures need low-frequency structure (smooth sinusoid
# scenes, multi-tone clips, low-color block frames) — noise fixtures are
# unstable by construction. Pairs of ids share a seed (seed = id // 2);
# the even member and the odd member encode the SAME content through
# DIFFERENT codecs, so every expected near-dup pair crosses a codec
# boundary with zero shared payload bytes.


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


def _tone(seed: int, n: int = 2048):
    f1, f2 = 3 + seed % 13, 17 + seed % 29
    return [
        int(
            8000 * math.sin(2 * math.pi * f1 * t / 256.0 + seed)
            + 4000 * math.sin(2 * math.pi * f2 * t / 512.0)
        )
        for t in range(n)
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


def _build_media(spark, kind: str, n: int):
    """Distributed fixture build: ids fan out over the cluster, each
    worker encodes its own payloads through the repo codecs."""

    def batches(it):
        import pandas as pd

        from salesforce_postgresql_etl_spark.operators.avi import encode_avi
        from salesforce_postgresql_etl_spark.operators.gif import encode_gif
        from salesforce_postgresql_etl_spark.operators.multimodal import (
            encode_bmp,
            encode_png,
            encode_wav,
        )

        for pdf in it:
            rows = {"media_id": [], "kind": [], "payload": [], "meta": []}
            for mid in pdf["id"]:
                mid = int(mid)
                seed = mid // 2
                if kind == "image":
                    px = _scene(seed)
                    payload = (
                        encode_bmp(px) if mid % 2 == 0 else encode_png(px)
                    )
                    meta = (48, 48, None, "bmp" if mid % 2 == 0 else "png")
                elif kind == "audio":
                    s = _tone(seed)
                    codec = "pcm16" if mid % 2 == 0 else "ulaw"
                    payload = encode_wav(s, 16000, 1, codec=codec)
                    meta = (None, None, 16000, codec)
                else:
                    frames = [_vframe(seed, t) for t in range(4)]
                    payload = (
                        encode_gif(frames)
                        if mid % 2 == 0
                        else encode_avi(frames, codec="dib")
                    )
                    meta = (None, None, None, "gif" if mid % 2 == 0 else "avi")
                rows["media_id"].append(mid)
                rows["kind"].append(kind)
                rows["payload"].append(payload)
                rows["meta"].append(meta)
            yield pd.DataFrame(rows)

    nparts = max(4, min(32, n // 64))
    return (
        spark.range(n)
        .repartition(nparts)
        .mapInPandas(batches, MEDIA_SCHEMA)
        .localCheckpoint(eager=True)
    )


# ---------------------------------------------------------------- metrics


def _stages(base: str) -> dict[int, dict]:
    with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
        data = json.loads(r.read())
    return {s["stageId"]: s for s in data}


def _executions(base: str) -> dict[int, list[str]]:
    """{execution id: final-plan node names} for every SQL execution.
    Decode-once accounting needs ALL of a pass's executions: with
    persist=True the decode runs inside the eager localCheckpoint's
    own execution and the pair-search execution shows none."""
    with urllib.request.urlopen(f"{base}/sql?length=1000") as r:
        execs = json.loads(r.read())
    return {
        e["id"]: [n["nodeName"] for n in e.get("nodes", [])] for e in execs
    }


def main() -> None:
    n_img = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    n_aud = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    n_vid = int(sys.argv[3]) if len(sys.argv) > 3 else 240

    os.environ["SPARK_GRAFT_UI"] = "true"  # session.py honors this
    spark = get_spark(app_name="perceptual-audit")
    app_id = spark.sparkContext.applicationId
    base = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{app_id}"

    from salesforce_postgresql_etl_spark.operators.audiofp import audio_neardup
    from salesforce_postgresql_etl_spark.operators.phash import (
        phash_neardup,
        video_neardup,
    )

    # Radii are the fixture radii the pytests pin: images/videos at 3
    # (lossless / JPEG re-encodes move ≤2 bits), audio at 15 (G.711 /
    # ADPCM re-encodes measured ≤12 — max_hamming=3 would miss true
    # cross-codec dups by design, not by bug).
    def _embed_lsh(m):
        # The embedding-family mirror of the hash passes: decode →
        # 63-float descriptor (checkpointed, decode-once) → sign-plane
        # LSH pair search. Shuffle = band rows + verified candidate
        # vectors, never payloads.
        from salesforce_postgresql_etl_spark.operators.media_embed import (
            image_embeddings,
        )
        from salesforce_postgresql_etl_spark.operators.simsearch import (
            neardup_embed_pairs,
        )

        emb = image_embeddings(m, fake=False).localCheckpoint(eager=True)
        return neardup_embed_pairs(
            emb, threshold=0.95, strategy="lsh", persist=True
        )

    passes = [
        ("image", "image", n_img, lambda m: phash_neardup(m, 3, fake=False)),
        ("image-embed", "image", n_img, _embed_lsh),
        ("audio", "audio", n_aud, lambda m: audio_neardup(m, 15, fake=False)),
        (
            "video",
            "video",
            n_vid,
            lambda m: video_neardup(m, 3, n_frames=3, fake=False),
        ),
    ]
    out = {}
    seen: set[int] = set()
    seen_execs: set[int] = set()
    for name, kind, n, run in passes:
        media = _build_media(spark, kind, n)
        payload_mb = (
            media.agg(F.sum(F.length("payload")).alias("b")).collect()[0]["b"]
            / 2**20
        )
        seen.update(_stages(base))  # fixture stages are not the pass
        seen_execs.update(_executions(base))
        n_pairs = run(media).count()
        stages = _stages(base)
        mine = [s for sid, s in stages.items() if sid not in seen]
        seen.update(stages)
        execs = _executions(base)
        nodes = [
            nn
            for eid, ns in execs.items()
            if eid not in seen_execs
            for nn in ns
        ]
        seen_execs.update(execs)
        rec = {
            "n_media": n,
            "payload_mb": round(payload_mb, 2),
            "n_pairs": n_pairs,
            "shuffle_write_mb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in mine) / 2**20, 3
            ),
            "shuffle_read_mb": round(
                sum(s.get("shuffleReadBytes", 0) for s in mine) / 2**20, 3
            ),
            "spill_disk_mb": round(
                sum(s.get("diskBytesSpilled", 0) for s in mine) / 2**20, 2
            ),
            "spill_mem_mb": round(
                sum(s.get("memoryBytesSpilled", 0) for s in mine) / 2**20, 2
            ),
            "n_stages": len(mine),
            "n_decode_nodes": sum(
                1
                for nn in nodes
                if "MapInPandas" in nn or "ArrowEval" in nn
            ),
            "n_reused_exchange": sum(
                1 for nn in nodes if "ReusedExchange" in nn
            ),
        }
        out[name] = rec
        print(json.dumps({"modality": name, **rec}), flush=True)
    print(
        json.dumps(
            {
                "summary": "perceptual_audit",
                "total_payload_mb": round(
                    sum(r["payload_mb"] for r in out.values()), 2
                ),
                "total_shuffle_write_mb": round(
                    sum(r["shuffle_write_mb"] for r in out.values()), 3
                ),
                "total_spill_mb": round(
                    sum(
                        r["spill_disk_mb"] + r["spill_mem_mb"]
                        for r in out.values()
                    ),
                    2,
                ),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
