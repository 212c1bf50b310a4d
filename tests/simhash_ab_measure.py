"""q_dedup_simhash r9 driver-sweep mover triage (VERDICT r9 "what's
wrong" #2), MEASURED — run directly, not pytest-collected.

The r9 driver sweep shows the entry at 1.19× the r8 driver-normalized
number (8.95 → 10.67×cal) — yet the ONLY code change behind it (bucket
counting via count().over(Window.partitionBy(simhash)) → groupBy +
join-back, the r9 window-audit fix) measured FASTER raw locally
(1.46 → 1.27 s) and is strictly more scale-safe (a hot duplicate
group's signature no longer funnels one task). The repo's measurement
protocol (SCALE.md) says cross-regime normalized ratios carry ~1.5×
error; per the r8 precedent (lsh_ab_measure.py) only an interleaved-
idle A/B between the two PLAN VARIANTS can retire the question.

Protocol: subjects interleaved round-robin for `reps` rounds —

  joinback : the CURRENT q_dedup_simhash (groupBy counts + join-back)
  window   : the r8 plan variant, reconstructed here verbatim —
             identical signature computation, bucket size via
             count().over(Window.partitionBy("simhash"))
  cal      : the spark.range(1e8).sum() calibration plan

one untimed warmup per subject, clearCache between timed runs, both
variants materialized through the same noop sink bench.py uses.
Verdict rule: if median(joinback) ≤ ~1.05× median(window) under
interleaving, the r9 driver number was regime noise — closed (the
join-back plan additionally wins at scale by construction). A genuine
joinback-plan cost would reproduce here.

Result (recorded in SCALE.md §r10): see the JSON line this prints.

Usage:  python tests/simhash_ab_measure.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from salesforce_postgresql_etl_spark.queries import all_queries
    from salesforce_postgresql_etl_spark.queries.llm_ext import N_PLANES
    from salesforce_postgresql_etl_spark.session import get_spark
    from salesforce_postgresql_etl_spark.sources.tables import load

    spark = get_spark(
        app_name="simhash-ab", master="local[32]", shuffle_partitions=32
    )
    qs = all_queries()

    def _sig():
        d = load(spark, sf_dir, "documents")
        tok = d.select(
            "doc_id",
            F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias(
                "tok"
            ),
        )
        h = F.md5(F.col("tok"))
        planes = [
            F.sum(
                F.when(F.substring(h, i + 1, 1) < "8", 1).otherwise(-1)
            ).alias(f"s{i}")
            for i in range(N_PLANES)
        ]
        s = tok.groupBy("doc_id").agg(*planes)
        sig = None
        for i in range(N_PLANES):
            bit = F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(
                F.lit(0)
            )
            sig = bit if sig is None else sig + bit
        return s.select("doc_id", sig.cast("bigint").alias("simhash"))

    def run_joinback() -> None:
        qs["q_dedup_simhash"](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    def run_window() -> None:  # the r8 plan variant, verbatim
        out = _sig().withColumn(
            "n_bucket",
            F.count(F.lit(1)).over(Window.partitionBy("simhash")),
        )
        out.write.mode("overwrite").format("noop").save()

    def run_cal() -> None:
        spark.range(100_000_000).agg({"id": "sum"}).write.mode(
            "overwrite"
        ).format("noop").save()

    subjects = {"joinback": run_joinback, "window": run_window, "cal": run_cal}
    for fn in subjects.values():  # untimed JIT warmup
        fn()
        spark.catalog.clearCache()

    times: dict[str, list[float]] = {n: [] for n in subjects}
    for _ in range(reps):
        for name, fn in subjects.items():
            t0 = time.perf_counter()
            fn()
            times[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()

    med = {n: round(statistics.median(v), 4) for n, v in times.items()}
    print(
        json.dumps(
            {
                "harness": "simhash_ab_measure",
                "sf_dir": sf_dir,
                "reps": reps,
                "medians_s": med,
                "joinback_over_window": round(
                    med["joinback"] / med["window"], 3
                ),
                "joinback_over_cal": round(med["joinback"] / med["cal"], 2),
                "window_over_cal": round(med["window"] / med["cal"], 2),
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
