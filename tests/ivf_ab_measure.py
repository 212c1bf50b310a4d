"""q_simsearch_ivf raw-time regression triage (VERDICT r7 "what's
wrong" #1), MEASURED — run directly, not collected by pytest.

The driver sweeps showed the bench ivf entry at 0.96 s (r6) then
1.63 s (r7) with NO code change behind it (`git log` on
operators/simsearch.py between the rounds shows a docstring-adjacent
touch only) and an audited near-zero-shuffle plan (0.03 MB, broadcast
centroids — SCALE.md r6). Both sweeps ran on loaded machines (loadavg
2.86 / 5.03) where calibration drifts >2× WITHIN a sweep, so ambient
noise is the prime suspect — but a >1.5× move against the round trend
earns a measurement, not a shrug.

Protocol (the r7 lesson — sequential sweeps cannot resolve <2×
differences on this box): three timed subjects run INTERLEAVED
round-robin for `reps` rounds —

  ivf      : bench.py's exact q_simsearch_ivf entry (probe-only:
             centroids prebuilt outside timing, exactly the sweep's
             form including the noop-sink materialization)
  flagship : q_agg_group, the most-watched stable entry, as a control
             (its r6→r7 drift bounds what "ambient" looks like)
  cal      : the spark.range(1e8).sum() calibration plan

one untimed warmup per subject, clearCache between timed runs,
medians reported raw and normalized (subject / cal, machine-free
units). Verdict rule: if median(ivf)/median(cal) lands at the r6
ratio (0.96 / 0.1292 ≈ 7.4) rather than the r7 one (1.63 / 0.1492 ≈
10.9), the r7 number was ambient noise — closed. A genuine plan-cost
change would reproduce under interleaving.

Usage:  python tests/ivf_ab_measure.py [sf_dir] [reps]
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
        app_name="ivf-ab", master="local[32]", shuffle_partitions=32
    )
    qs = all_queries()
    qs.update(_extra_benches())

    def run_ivf() -> None:
        qs["q_simsearch_ivf"](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    def run_flagship() -> None:
        qs["q_agg_group"](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    def run_cal() -> None:
        spark.range(100_000_000).agg({"id": "sum"}).write.mode(
            "overwrite"
        ).format("noop").save()

    subjects = {"ivf": run_ivf, "flagship": run_flagship, "cal": run_cal}
    # untimed warmup (JIT + centroid build for ivf)
    for fn in subjects.values():
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
                "metric": "ivf_ab_interleaved",
                "sf_dir": sf_dir,
                "reps": reps,
                "medians_s": med,
                "all_s": {k: [round(x, 4) for x in v] for k, v in times.items()},
                "ivf_over_cal": round(med["ivf"] / med["cal"], 2),
                "flagship_over_cal": round(med["flagship"] / med["cal"], 2),
                "r6_driver_ivf_over_cal": round(0.96 / 0.1292, 2),
                "r7_driver_ivf_over_cal": round(1.63 / 0.1492, 2),
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
