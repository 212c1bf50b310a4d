"""q_neardup_clusters_lsh r8 driver-sweep regression triage (VERDICT
r8 "what's wrong" #2), MEASURED — run directly, not pytest-collected.

The driver sweeps show the bench entry at 6.51 s raw / 31.5×cal (r7,
cal 0.2066) then 9.07 s raw / 45.4×cal (r8, cal 0.1999) with NO code
change behind it (operators/{dedup,clustering}.py untouched in r8)
and an audited 2.61 MB shuffle plan. The r8 driver sweep started at
loadavg 6.98 (busy box) while the builder's idle-start sweep an hour
earlier measured the same entry at 5.81 s — ambient noise is the
prime suspect, but this box's own protocol (SCALE.md: sequential
sweeps cannot resolve <2×) demands an interleaved measurement before
closing it.

Protocol: subjects interleaved round-robin for `reps` rounds —

  lsh      : bench.py's exact q_neardup_clusters_lsh entry (MinHash-
             LSH pairs -> contraction connected components at sf0.1,
             including the noop-sink materialization)
  flagship : q_agg_group, the most-watched stable entry, as a control
  cal      : the spark.range(1e8).sum() calibration plan

one untimed warmup per subject, clearCache between timed runs.
Verdict rule: if median(lsh)/median(cal) lands at the r7 driver ratio
(6.5085/0.2066 ≈ 31.5) rather than the r8 one (9.0739/0.1999 ≈ 45.4),
the r8 number was ambient load — closed. A genuine plan-cost change
would reproduce under interleaving.

Usage:  python tests/lsh_ab_measure.py [sf_dir] [reps]
Prints one JSON line with per-subject medians and ratios.
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 9

    from bench import _extra_benches
    from salesforce_postgresql_etl_spark.queries import all_queries
    from salesforce_postgresql_etl_spark.session import get_spark

    spark = get_spark(
        app_name="lsh-ab", master="local[32]", shuffle_partitions=32
    )
    qs = all_queries()
    qs.update(_extra_benches())

    def run_lsh() -> None:
        qs["q_neardup_clusters_lsh"](spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    def run_flagship() -> None:
        qs["q_agg_group"](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    def run_cal() -> None:
        spark.range(100_000_000).agg({"id": "sum"}).write.mode(
            "overwrite"
        ).format("noop").save()

    subjects = {"lsh": run_lsh, "flagship": run_flagship, "cal": run_cal}
    for fn in subjects.values():  # untimed warmup
        fn()
    spark.catalog.clearCache()

    times: dict[str, list[float]] = {k: [] for k in subjects}
    for _ in range(reps):
        for name, fn in subjects.items():  # interleaved round-robin
            t0 = time.perf_counter()
            fn()
            times[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()

    med = {k: round(statistics.median(v), 4) for k, v in times.items()}
    print(
        json.dumps(
            {
                "metric": "lsh_ab_interleaved",
                "sf_dir": sf_dir,
                "reps": reps,
                "medians_s": med,
                "all_s": {k: [round(x, 4) for x in v] for k, v in times.items()},
                "lsh_over_cal": round(med["lsh"] / med["cal"], 2),
                "flagship_over_cal": round(med["flagship"] / med["cal"], 2),
                "r7_driver_lsh_over_cal": round(6.5085 / 0.2066, 2),
                "r8_driver_lsh_over_cal": round(9.0739 / 0.1999, 2),
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
