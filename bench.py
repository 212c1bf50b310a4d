#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

  {"metric": "sweep_wall_s", "value": <total>, "unit": "sec",
   "queries": {name: best_of_2_sec, ...}, "sf": <sf>, ...}

Each query is materialized with the noop sink (full execution, no
driver-side collect), timed twice; per-query number is the warm (best)
run so JVM/JIT/page-cache startup doesn't drown the plan cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# The headline set: flagship agg, the big star join, the signature
# window dedup, distributed global sort, top-k, the text/vector ops,
# streaming batch-equivalents, and the UDF path.
BENCH_QUERIES = [
    "q_agg_group",
    "q_join_star",
    "q_win_dedup_latest",
    "q_sort",
    "q_topk",
    "q_agg_countdistinct",
    "q_dedup_hash",
    "q_tfidf",
    "q_simsearch_topk",
    "q_stream_tumbling",
    "q_sessionize",
    "q_pandas_udf",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from salesforce_postgresql_etl_spark.session import get_spark
    from salesforce_postgresql_etl_spark.queries import all_queries

    spark = get_spark(
        app_name="sfpg-etl-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    qs = all_queries()

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        try:
            cold = run_once(name)
            warm = run_once(name)
            times[name] = round(min(cold, warm), 4)
        except Exception as exc:  # a broken query must not kill the sweep
            times[name] = -1.0
            print(f"# bench error {name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in times.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "sweep_wall_s",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
                "cpus": cpus,
                "n_queries": len(times),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
