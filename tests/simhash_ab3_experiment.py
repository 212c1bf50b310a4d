"""Ad-hoc 3-way interleaved A/B for the q_dedup_simhash plan choice
(r10, follow-up to simhash_ab_measure.py): window vs joinback vs
joinback with a lazy localCheckpoint sharing the signature subtree
(the repo's neardup_pairs pattern). Run directly; not collected.

Usage: python tests/simhash_ab3_experiment.py [sf_dir] [reps]
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

    from salesforce_postgresql_etl_spark.queries.llm_ext import N_PLANES
    from salesforce_postgresql_etl_spark.session import get_spark
    from salesforce_postgresql_etl_spark.sources.tables import load

    spark = get_spark(
        app_name="simhash-ab3", master="local[32]", shuffle_partitions=32
    )

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

    def plan_window():
        out = _sig()
        return out.select(
            "doc_id",
            "simhash",
            F.count(F.lit(1))
            .over(Window.partitionBy("simhash"))
            .alias("n_bucket"),
        )

    def plan_joinback():
        out = _sig()
        counts = out.groupBy("simhash").agg(
            F.count(F.lit(1)).alias("n_bucket")
        )
        return out.join(counts, "simhash").select(
            "doc_id", "simhash", "n_bucket"
        )

    def plan_joinback_ckpt():
        out = _sig().localCheckpoint(eager=False)
        counts = out.groupBy("simhash").agg(
            F.count(F.lit(1)).alias("n_bucket")
        )
        return out.join(counts, "simhash").select(
            "doc_id", "simhash", "n_bucket"
        )

    def cal():
        return spark.range(100_000_000).agg(F.sum("id").alias("s"))

    subjects = {
        "window": plan_window,
        "joinback": plan_joinback,
        "joinback_ckpt": plan_joinback_ckpt,
        "cal": cal,
    }

    def run(fn) -> float:
        spark.catalog.clearCache()
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    for fn in subjects.values():  # warmup
        run(fn)
    walls = {k: [] for k in subjects}
    for _ in range(reps):
        for k, fn in subjects.items():
            walls[k].append(run(fn))
    med = {k: round(statistics.median(v), 4) for k, v in walls.items()}
    print(
        json.dumps(
            {
                "harness": "simhash_ab3",
                "sf_dir": sf_dir,
                "reps": reps,
                "medians_s": med,
                "over_window": {
                    k: round(med[k] / med["window"], 3)
                    for k in ("joinback", "joinback_ckpt")
                },
                "over_cal": {
                    k: round(med[k] / med["cal"], 2)
                    for k in ("window", "joinback", "joinback_ckpt")
                },
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
