"""Entity-match block-key skew: salt-split A/B at sf0.1, MEASURED —
run directly, not collected by pytest (VERDICT r7 #5, the oldest open
watch item: "bounded blocks noted, not enforced").

Fixture: the real sf0.1 customer table with a manufactured hot block —
every 10th record's name is prefixed with the same 16 chars, so ~10%
of rows share one block key. The measured stage is the ER candidate
path as q_entity_match runs it: blocked pairs + levenshtein verify +
count. Variants:

  unsalted : blocked_pairs with no guard — the hot block's k(k−1)/2
             pairs emit through ONE reducer (the 100 TB failure mode,
             shrunk to fixture scale)
  salt     : max_block_size=1000, on_oversize="salt", salt_buckets=8 —
             the hot block's pairs emit across the 36-bucket triangle;
             includes the guard's eager block-size aggregate, so the
             timing is the whole honest cost of turning the guard on

Output parity (verified-pair count) is asserted before timing — the
salt split is LOSSLESS by construction (pytest pins the exact pair
set; here the count re-checks it at sf0.1). Protocol: interleaved
round-robin medians (sequential sweeps cannot resolve <2× on this
box), one untimed warmup each, spark.range calibration bracketed.

Usage:  python tests/er_skew_measure.py [sf_dir] [reps]
Prints one JSON line.
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

HOT_PREFIX = "HOTBLOCK-PREFIX#"  # exactly 16 chars — one hot block


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    from pyspark.sql import functions as F

    from salesforce_postgresql_etl_spark.operators.blocking import (
        blocked_pairs,
    )
    from salesforce_postgresql_etl_spark.session import get_spark
    from salesforce_postgresql_etl_spark.sources import load

    spark = get_spark(
        app_name="er-skew-ab", master="local[32]", shuffle_partitions=32
    )
    cust = (
        load(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            F.when(
                F.col("c_custkey") % 10 == 0,
                F.concat(F.lit(HOT_PREFIX), F.col("c_name")),
            )
            .otherwise(F.col("c_name"))
            .alias("c_name"),
        )
        .localCheckpoint(eager=True)  # fixture build outside all timings
    )
    n_rows = cust.count()
    blk = F.substring("c_name", 1, 16)

    def verified_count(pairs) -> int:
        return pairs.where(
            F.levenshtein("c_name_a", "c_name_b") <= 1
        ).count()

    def run_unsalted() -> int:
        return verified_count(
            blocked_pairs(cust, "c_custkey", blk, attrs=["c_name"])
        )

    def run_salt() -> int:
        return verified_count(
            blocked_pairs(
                cust,
                "c_custkey",
                blk,
                attrs=["c_name"],
                max_block_size=1000,
                on_oversize="salt",
                salt_buckets=8,
            )
        )

    def run_cal() -> int:
        spark.range(100_000_000).agg({"id": "sum"}).write.mode(
            "overwrite"
        ).format("noop").save()
        return 0

    # parity before any timing — a fast wrong answer is worthless
    n_unsalted, n_salt = run_unsalted(), run_salt()
    assert n_unsalted == n_salt, (n_unsalted, n_salt)
    # raw candidate volume for the record (hot block ≈ n/10 rows)
    n_candidates = blocked_pairs(cust, "c_custkey", blk).count()

    subjects = {"unsalted": run_unsalted, "salt": run_salt, "cal": run_cal}
    times: dict[str, list[float]] = {k: [] for k in subjects}
    for _ in range(reps):
        for name, fn in subjects.items():
            t0 = time.perf_counter()
            fn()
            times[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()

    med = {k: round(statistics.median(v), 4) for k, v in times.items()}
    print(
        json.dumps(
            {
                "metric": "er_skew_salt_ab",
                "sf_dir": sf_dir,
                "reps": reps,
                "n_rows": n_rows,
                "n_candidate_pairs": n_candidates,
                "n_verified_pairs": n_unsalted,
                "medians_s": med,
                "all_s": {
                    k: [round(x, 4) for x in v] for k, v in times.items()
                },
                "salt_over_unsalted": round(
                    med["salt"] / med["unsalted"], 3
                ),
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
