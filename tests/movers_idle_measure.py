"""r11 residual-mover triage, MEASURED — run directly, not
pytest-collected.

The r11 idle sweep (BENCH_LOCAL_r11, contended=false) put three
entries >1.15× their r9 raw numbers with NO code change since r9:
q_strip_dup_spans 1.17×, q_decontaminate 1.17×,
q_applyinpandas_normalize 1.22×. SCALE.md's protocol says a
cross-sweep best-of-3 carries large regime error; for a SAME-CODE
drift suspicion the retirement tool is not an A/B (there is no plan
variant) but an interleaved-idle REP DISTRIBUTION: if the median of
`reps` interleaved runs lands back inside the r9 envelope, the
single-sweep number was noise, closed this round instead of deferred
to r12's watch list.

Protocol: the three movers + flagship (control, known stable) + the
calibration plan, round-robin, one untimed warmup per subject,
clearCache between timed runs, all through bench.py's noop sink.

Usage:  python tests/movers_idle_measure.py [sf_dir] [reps]
Result: one JSON line; recorded in SCALE.md §r11.
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

SUBJECT_NAMES = (
    "q_strip_dup_spans",
    "q_decontaminate",
    "q_applyinpandas_normalize",
    "q_agg_group",  # control: stable across r9–r11
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    from salesforce_postgresql_etl_spark.queries import all_queries
    from salesforce_postgresql_etl_spark.session import get_spark

    spark = get_spark(
        app_name="movers-idle", master="local[32]", shuffle_partitions=32
    )
    qs = all_queries()

    def make_runner(qname):
        def run() -> None:
            qs[qname](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()

        return run

    def run_cal() -> None:
        spark.range(100_000_000).agg({"id": "sum"}).write.mode(
            "overwrite"
        ).format("noop").save()

    subjects = {n: make_runner(n) for n in SUBJECT_NAMES}
    subjects["cal"] = run_cal
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

    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "median_s": {
            n: round(statistics.median(v), 4) for n, v in times.items()
        },
        "min_s": {n: round(min(v), 4) for n, v in times.items()},
        "max_s": {n: round(max(v), 4) for n, v in times.items()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
