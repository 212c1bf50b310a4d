"""Per-query shuffle-volume audit (not collected by pytest — run directly).

The 100 TB argument in SCALE.md is about SHUFFLE BYTES, not seconds:
a query that runs fast at sf0.1 but shuffles its whole input becomes
the bottleneck at 1000×. This script runs the headline queries one at
a time with the Spark UI's metrics endpoint enabled and records, per
query, the total shuffle write bytes, shuffle read bytes, disk/memory
spill, and input bytes read — so "map-side partial aggregation works"
and "the LSH join only shuffles band keys" are measured statements.

Method: stage metrics come from the local REST endpoint
(/api/v1/applications/<id>/stages). Stages are attributed to a query
by diffing the stage set before/after each run (queries run serially
in one session; bench-style warmup is skipped because bytes, unlike
seconds, are deterministic).

Metric trust levels (measured r6): SHUFFLE write/read and spill bytes
are exact (task ShuffleWriteMetrics). ``inputBytes`` UNDER-REPORTS for
small page-cached local parquet (FileSystem-statistics sampling — the
sf0.1 flagship shows 17 KB for an 11 MB table); treat it as a floor,
never a denominator. The authoritative audit is shuffle bytes.

Usage:  python tests/shuffle_audit.py [sf_dir]
Prints one JSON line per query + a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from salesforce_postgresql_etl_spark.queries import registry  # noqa: E402
from salesforce_postgresql_etl_spark.session import get_spark  # noqa: E402

# Headline set: the flagship, the biggest joins/aggs, and the scale
# paths of the dedup/ANN family (bench's most expensive entries).
AUDIT = [
    "q_agg_group",
    "q_join_star",
    "q_sort",
    "q_win_dedup_latest",
    "q_agg_countdistinct",
    "q_dedup_hash",
    "q_snapshot_diff",
    "q_funnel",
    "q_bm25",
    "q_entity_match",
    "q_pack_sequences",
    "q_decontaminate",
    "q_neardup_minhash",
    "q_neardup_embed_lsh",
    "q_neardup_clusters_lsh",
    "q_simsearch_ivf",
    # r8: duplicate-span detection — the hashed-key shuffle claim
    "q_dup_spans",
    "q_strip_dup_spans",
    # r9: SemDeDup (bucketed pair triangle) and the grouped-prefix-sum
    # token-budget selection — both shuffle claims measured, not argued
    "q_semdedup",
    "q_token_budget",
]


def _stages(base: str) -> dict[int, dict]:
    with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
        data = json.loads(r.read())
    return {s["stageId"]: s for s in data}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    os.environ["SPARK_GRAFT_UI"] = "true"  # session.py honors this
    spark = get_spark(app_name="shuffle-audit")
    app_id = spark.sparkContext.applicationId
    ui = spark.sparkContext.uiWebUrl
    base = f"{ui}/api/v1/applications/{app_id}"

    qs = {n: q.fn for n, q in registry().items()}
    # The bench-only LSH/ANN scale paths: the byte-level proof that
    # banding shuffles band keys, never the n^2 pair space.
    from bench import _extra_benches

    extras = _extra_benches()
    for extra in (
        "q_neardup_minhash",
        "q_neardup_embed_lsh",
        "q_neardup_clusters_lsh",
        "q_simsearch_ivf",
        "q_semdedup",
    ):
        qs[extra] = extras[extra]
    out = {}
    seen: set[int] = set()
    for name in AUDIT:
        df = qs[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        stages = _stages(base)
        mine = [s for sid, s in stages.items() if sid not in seen]
        seen.update(stages)
        rec = {
            "shuffle_write_mb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in mine) / 2**20, 2
            ),
            "shuffle_read_mb": round(
                sum(s.get("shuffleReadBytes", 0) for s in mine) / 2**20, 2
            ),
            "input_mb_floor": round(  # under-reports locally; see docstring
                sum(s.get("inputBytes", 0) for s in mine) / 2**20, 2
            ),
            "spill_disk_mb": round(
                sum(s.get("diskBytesSpilled", 0) for s in mine) / 2**20, 2
            ),
            "spill_mem_mb": round(
                sum(s.get("memoryBytesSpilled", 0) for s in mine) / 2**20, 2
            ),
            "n_stages": len(mine),
        }
        out[name] = rec
        print(json.dumps({"query": name, **rec}))
        spark.catalog.clearCache()
    total_w = round(sum(r["shuffle_write_mb"] for r in out.values()), 2)
    total_spill = round(
        sum(r["spill_disk_mb"] + r["spill_mem_mb"] for r in out.values()), 2
    )
    print(
        json.dumps(
            {
                "summary": "shuffle_audit",
                "sf_dir": sf_dir,
                "queries": len(out),
                "total_shuffle_write_mb": total_w,
                "total_spill_mb": total_spill,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
