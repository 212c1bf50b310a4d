"""r14 fixed-overhead profiler (VERDICT r13 #6, guide §1/§5) — run
directly. For each broadcast-chain/fixed-cost-family entry, split one
timed run into BUILD (python DSL -> analyzed DataFrame) and EXEC (noop
write: optimization + AQE stages + broadcasts + tasks), plus count the
Spark jobs the exec issues. Fixed driver-side overhead is the part the
8c/32c ratio <=1.0 cluster pays regardless of cores; this says where
it lives before anything is changed.

Usage:  python tests/build_exec_split_measure.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

FAMILY = (
    "q_funnel",
    "q_funnel_horizon",
    "q_attribution",
    "q_rollup_cascade",
    "q_bm25",
    "q_token_budget",
    "q_chunk_docs",
    "q_domain_mix",
    "q_pack_sequences",
    "q_decontaminate",
    "q_snapshot_diff",
    "q_entity_match",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from salesforce_postgresql_etl_spark.queries import all_queries
    from salesforce_postgresql_etl_spark.session import get_spark

    spark = get_spark(
        app_name="r14-build-exec", master="local[32]", shuffle_partitions=32
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = all_queries()

    out: dict[str, dict] = {}
    for name in FAMILY:
        # untimed warmup
        df = qs[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        builds, execs, jobs = [], [], []
        for _ in range(reps):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.schema  # force analysis
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            j1 = len(tracker.getJobIdsForGroup(None) or [])
            builds.append(round(t1 - t0, 4))
            execs.append(round(t2 - t1, 4))
            jobs.append(j1 - j0)
            spark.catalog.clearCache()
        out[name] = {
            "build_min_s": min(builds),
            "exec_min_s": min(execs),
            "jobs": jobs[-1],
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
