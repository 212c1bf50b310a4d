"""r13 minhash-fanout A/B — run directly, not pytest-collected.

Subjects: the bench's q_neardup_minhash / q_neardup_ngram_lsh /
q_neardup_cross_lsh entries with the r13 ``_fan_docs`` spread ACTIVE
(new) vs monkeypatched to identity (old = r12 shape, single-core
signature build), interleaved round-robin with the spark.range
calibration plan as the machine-speed control. Interleaving is the
protocol this repo's SCALE.md mandates for <2x effects on a
steal-noisy box: both arms see the same ambient windows, so the
RATIO is meaningful even when absolute seconds wobble.

Usage: python tests/minhash_fanout_ab.py [sf_dir] [reps]
Prints one JSON line: per-subject min/median over reps.
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from bench import _extra_benches
    from salesforce_postgresql_etl_spark.operators import dedup
    from salesforce_postgresql_etl_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="minhash-fanout-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    extra = _extra_benches()
    entries = ["q_neardup_minhash", "q_neardup_ngram_lsh", "q_neardup_cross_lsh"]

    real_fan = dedup._fan_docs

    def no_fan(docs):
        return docs.select("doc_id", "text")

    def run(name: str, arm: str) -> float:
        dedup._fan_docs = real_fan if arm == "new" else no_fan
        try:
            t0 = time.perf_counter()
            df = extra[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0
        finally:
            dedup._fan_docs = real_fan
            spark.catalog.clearCache()

    def cal() -> float:
        df = spark.range(100_000_000).agg({"id": "sum"})
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    subjects = [(n, a) for n in entries for a in ("old", "new")]
    # one untimed warmup per subject (JIT + code cache)
    for n, a in subjects:
        run(n, a)
    cal()
    times: dict[str, list[float]] = {f"{n}:{a}": [] for n, a in subjects}
    times["cal"] = []
    for _ in range(reps):
        for n, a in subjects:
            times[f"{n}:{a}"].append(run(n, a))
        times["cal"].append(cal())
    out = {
        k: {
            "min": round(min(v), 3),
            "median": round(statistics.median(v), 3),
        }
        for k, v in times.items()
    }
    for n in entries:
        out[f"{n}:ratio_min"] = round(
            out[f"{n}:new"]["min"] / out[f"{n}:old"]["min"], 3
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
