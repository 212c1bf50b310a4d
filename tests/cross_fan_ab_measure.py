"""r14 cross-LSH fanout-collapse A/B (VERDICT r13 #5) — run directly.

Arms, interleaved (clearCache between runs, noop sink, min-of-reps):

- per_side: the r13 bench entry — split first, each side's _fan_docs
  adds its own fanout exchange (Exchange x2 from the same scan).
- fan_once: the r14 bench entry — fanout the doc scan ONCE before the
  split; both sides reuse the same exchange and the per-side gates
  no-op (Exchange x1, ReusedExchange on the second side).

Also prints each arm's shuffle-Exchange count and asserts row-set
equality once.

Usage:  python tests/cross_fan_ab_measure.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def _steal() -> int:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    vals = [int(x) for x in parts[1:]]
    return vals[7] if len(vals) > 7 else 0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from salesforce_postgresql_etl_spark.operators.dedup import (
        neardup_pairs_cross,
    )
    from salesforce_postgresql_etl_spark.queries.llm import NEARDUP_THRESHOLD
    from salesforce_postgresql_etl_spark.session import fanout, get_spark
    from salesforce_postgresql_etl_spark.sources import load

    spark = get_spark(
        app_name="r14-cross-ab", master="local[32]", shuffle_partitions=32
    )

    def per_side():
        docs = load(spark, sf_dir, "documents")
        return neardup_pairs_cross(
            docs.where(F.col("doc_id") % 5 == 0),
            docs.where(F.col("doc_id") % 5 != 0),
            threshold=NEARDUP_THRESHOLD,
            strategy="minhash",
            persist=True,
        )

    def fan_once():
        docs = fanout(
            load(spark, sf_dir, "documents").select("doc_id", "text"),
            "doc_id",
        )
        return neardup_pairs_cross(
            docs.where(F.col("doc_id") % 5 == 0),
            docs.where(F.col("doc_id") % 5 != 0),
            threshold=NEARDUP_THRESHOLD,
            strategy="minhash",
            persist=True,
        )

    arms = {"per_side": per_side, "fan_once": fan_once}

    def n_exchanges(df) -> dict:
        plan = df._jdf.queryExecution().executedPlan().toString()
        return {
            "Exchange": plan.count("Exchange hashpartitioning")
            + plan.count("Exchange RoundRobin")
            + plan.count("Exchange SinglePartition"),
            "Reused": plan.count("ReusedExchange"),
        }

    rows = {}
    plans = {}
    for a, fn in arms.items():
        df = fn()
        plans[a] = n_exchanges(df)
        rows[a] = sorted(tuple(r) for r in df.collect())
        spark.catalog.clearCache()
    assert rows["per_side"] == rows["fan_once"], "row sets differ!"

    s0, t0 = _steal(), time.monotonic()
    series = {a: [] for a in arms}
    for _ in range(reps):
        for a, fn in arms.items():
            t1 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            series[a].append(round(time.perf_counter() - t1, 4))
            spark.catalog.clearCache()
    el = time.monotonic() - t0
    print(
        json.dumps(
            {
                "reps": reps,
                "steal_cores_avg": round(
                    (_steal() - s0) / os.sysconf("SC_CLK_TCK") / el, 2
                ),
                "min": {a: min(v) for a, v in series.items()},
                "plan": plans,
                "series": series,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
