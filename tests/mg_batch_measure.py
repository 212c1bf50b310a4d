"""Misra-Gries partial: per-row loop vs batched value_counts A/B,
MEASURED — run directly, not pytest-collected (VERDICT r8 #3: the
per-row Python loop inside the mapInPandas crossing is the throughput
ceiling at 10⁹ rows/partition; the r9 rewrite pre-reduces each Arrow
batch with a vectorized value_counts and merges it via the mergeable-
summaries reduce step).

Fixture: spark.range(n_rows) with item = id % n_distinct — duplication
factor n_rows/n_distinct per partition-batch, the regime the batch
form exists for. Two capacity regimes:

  exact    : capacity ≥ n_distinct — no reduction ever fires, outputs
             must be IDENTICAL between the two forms (asserted before
             timing)
  eviction : capacity = n_distinct // 10 — reductions fire; summary
             CONTENTS are form-dependent (inherent to MG: the classic
             sweep is a δ=1 reduce, the batch form takes bigger δs),
             so only the bound is checked (both forms' d_p totals
             stay ≤ true counts); both are timed

Subjects interleaved round-robin: old_exact / new_exact / old_evict /
new_evict / cal. The "old" form is the pre-r9 per-row loop, inlined
verbatim.

Usage:  python tests/mg_batch_measure.py [n_rows] [n_distinct] [reps]
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


def _old_frequent_items(df, col, capacity):
    """The pre-r9 per-row MG partial, verbatim (sketch.py @ r8 HEAD),
    through the same merge stage as the shipped form."""
    from collections.abc import Iterator

    from pyspark.sql import functions as F

    def mg_partition(it: Iterator):
        import pandas as pd

        counters: dict = {}
        d_p = 0
        for pdf in it:
            for v in pdf["__item"]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < capacity:
                    counters[v] = 1
                else:
                    d_p += 1
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        items = list(counters.keys()) + [None]
        cnts = [counters[key] for key in counters] + [d_p]
        yield pd.DataFrame(
            {
                "item": pd.Series(items, dtype="object"),
                "cnt": pd.Series(cnts, dtype="int64"),
            }
        )

    partials = df.select(F.col(col).cast("string").alias("__item")).mapInPandas(
        mg_partition, "item string, cnt long"
    )
    slack = partials.where(F.col("item").isNull()).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("d_total")
    )
    return (
        partials.where(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("cnt").alias("count_lower"))
        .crossJoin(F.broadcast(slack))
        .select(
            "item",
            "count_lower",
            (F.col("count_lower") + F.col("d_total")).alias("count_upper"),
        )
    )


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_distinct = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from pyspark.sql import functions as F

    from salesforce_postgresql_etl_spark.operators.sketch import frequent_items
    from salesforce_postgresql_etl_spark.session import get_spark

    spark = get_spark(
        app_name="mg-batch-ab", master="local[32]", shuffle_partitions=32
    )
    df = (
        spark.range(n_rows)
        .select((F.col("id") % n_distinct).alias("item"))
        .repartition(32)
        .localCheckpoint(eager=True)  # fixture build outside timings
    )
    cap_exact = n_distinct + 8
    cap_evict = max(2, n_distinct // 10)

    def rows(frame):
        return sorted(tuple(r) for r in frame.collect())

    # parity in the exact regime before any timing
    assert rows(_old_frequent_items(df, "item", cap_exact)) == rows(
        frequent_items(df, "item", cap_exact)
    )

    subjects = {
        "old_exact": lambda: _old_frequent_items(df, "item", cap_exact).count(),
        "new_exact": lambda: frequent_items(df, "item", cap_exact).count(),
        "old_evict": lambda: _old_frequent_items(df, "item", cap_evict).count(),
        "new_evict": lambda: frequent_items(df, "item", cap_evict).count(),
        "cal": lambda: spark.range(100_000_000)
        .agg({"id": "sum"})
        .write.mode("overwrite")
        .format("noop")
        .save(),
    }
    times: dict[str, list[float]] = {k: [] for k in subjects}
    for fn in subjects.values():  # untimed warmup
        fn()
    for _ in range(reps):
        for name, fn in subjects.items():
            t0 = time.perf_counter()
            fn()
            times[name].append(time.perf_counter() - t0)

    med = {k: round(statistics.median(v), 4) for k, v in times.items()}
    print(
        json.dumps(
            {
                "metric": "mg_batch_ab",
                "n_rows": n_rows,
                "n_distinct": n_distinct,
                "reps": reps,
                "medians_s": med,
                "all_s": {
                    k: [round(x, 4) for x in v] for k, v in times.items()
                },
                "new_over_old_exact": round(
                    med["new_exact"] / med["old_exact"], 3
                ),
                "new_over_old_evict": round(
                    med["new_evict"] / med["old_evict"], 3
                ),
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
