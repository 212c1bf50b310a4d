"""Scale-linearity curve for dup_span_stats (not collected by pytest —
run directly, on an otherwise-idle machine).

Method (the r7r pattern): the sf0.1 documents table unioned with
re-keyed copies gives 1×/2×/4× corpora with identical per-doc shape;
rounds are INTERLEAVED (1×,2×,4×,1×,2×,4×,...) because sequential
sweeps cannot resolve <2× differences on this box (SCALE.md r7
protocol note), and medians are reported. Linear scaling means the
explode → count-by-gram → join-back → window plan has no quadratic
step; copies multiply every gram's count, so the join-back side is
maximal (100% of spans duplicated at 2×+) — the curve measures the
WORST case for the second pass.

Usage: python tests/dupspans_scale_curve.py [rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from salesforce_postgresql_etl_spark.operators.dupspans import (  # noqa: E402
    dup_span_stats,
)
from salesforce_postgresql_etl_spark.session import get_spark  # noqa: E402
from salesforce_postgresql_etl_spark.sources import load  # noqa: E402


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="dupspans-scale")
    base = load(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    corpora = {}
    for mult in (1, 2, 4):
        df = base
        for i in range(1, mult):
            df = df.unionByName(
                base.select(
                    (F.col("doc_id") + 100000 * i).alias("doc_id"), "text"
                )
            )
        corpora[mult] = df.localCheckpoint(eager=True)  # isolate scan cost

    times: dict[int, list[float]] = {1: [], 2: [], 4: []}
    # one untimed warmup each (JIT), then interleaved timed rounds
    for mult, df in corpora.items():
        dup_span_stats(df, k=8, use_hash=True).write.mode(
            "overwrite"
        ).format("noop").save()
    for _ in range(rounds):
        for mult, df in corpora.items():
            t0 = time.perf_counter()
            dup_span_stats(df, k=8, use_hash=True).write.mode(
                "overwrite"
            ).format("noop").save()
            times[mult].append(time.perf_counter() - t0)
    meds = {m: statistics.median(ts) for m, ts in times.items()}
    print({"median_s": {m: round(v, 3) for m, v in meds.items()},
           "ratio_2x": round(meds[2] / meds[1], 2),
           "ratio_4x": round(meds[4] / meds[1], 2),
           "rounds": rounds,
           "loadavg_1m": round(os.getloadavg()[0], 2)})
    spark.stop()


if __name__ == "__main__":
    main()
