"""Hot-gram skew in removal_starts: window vs min-struct A/B, MEASURED —
run directly, not collected by pytest (VERDICT r8 #2: the row_number
window over Window.partitionBy('key') funnels every occurrence of a
hot gram into one task; the fix aggregates the globally-first
occurrence with groupBy(key).agg(min(struct(doc_id, pos)))).

Fixture: the sf0.1 documents table replicated R times (doc_ids
offset). Non-hot texts get a per-replica salt token prefixed, so
background duplication stays what it was in one copy; every 10th doc's
text is replaced by one shared 8-token boilerplate line repeated 50
times. With k=8 that yields 8 distinct hot gram keys (the cyclic
shifts) each occurring ~R*500*393/8 times — the 10^7-boilerplate
failure mode shrunk to fixture scale. Variants:

  window    : the pre-r9 shape — dup_keys aggregate + row_number()
              OVER (PARTITION BY key ORDER BY doc_id, pos), filter
              occ >= 2 (every hot-key occurrence sorts in ONE task)
  minstruct : the shipped shape — one groupBy(key) computing
              (count, min(struct(doc_id, pos))), join back, filter
              struct != first (map-side combine absorbs the hot key)

Output parity (row count of removal starts) is asserted before any
timing — the two shapes are semantics-identical by construction (the
full-set equality is pinned at small scale by tests/test_dupspans.py;
the count re-checks it at measure scale). Protocol: interleaved
round-robin medians (sequential sweeps cannot resolve <2x on this
box), one untimed warmup each, spark.range calibration bracketed.

Usage:  python tests/dupspan_skew_measure.py [sf_dir] [reps] [replicas]
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

K = 8
BOILER = "terms of service apply to all content here"  # exactly 8 tokens


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from salesforce_postgresql_etl_spark.operators.dupspans import (
        _with_key,
        gram_rows,
        removal_starts,
    )
    from salesforce_postgresql_etl_spark.session import get_spark
    from salesforce_postgresql_etl_spark.sources import load

    spark = get_spark(
        app_name="dupspan-skew-ab", master="local[32]", shuffle_partitions=32
    )
    base = load(spark, sf_dir, "documents").select("doc_id", "text")
    n_base = base.count()
    rep = spark.range(replicas).select(F.col("id").alias("rep"))
    hot_text = " ".join([BOILER] * 50)  # 400 tokens -> 393 grams, 8 keys
    docs = (
        base.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(n_base * 10)).alias(
                "doc_id"
            ),
            F.when(F.col("doc_id") % 10 == 0, F.lit(hot_text))
            .otherwise(F.concat(F.concat_ws("", F.lit("r"), "rep"), F.lit(" "), "text"))
            .alias("text"),
        )
        .repartition(32)
        .localCheckpoint(eager=True)  # fixture build outside all timings
    )
    n_docs = docs.count()

    def run_minstruct() -> int:
        return removal_starts(docs, K, use_hash=True).count()

    def run_window() -> int:
        # the pre-r9 shape, verbatim (dupspans.py @ r8 HEAD)
        grams = _with_key(gram_rows(docs, K), use_hash=True)
        dup_keys = (
            grams.groupBy("key")
            .agg(F.count(F.lit(1)).alias("n_occ"))
            .filter(F.col("n_occ") >= 2)
            .select("key")
        )
        w = Window.partitionBy("key").orderBy("doc_id", "pos")
        return (
            grams.join(dup_keys, "key")
            .withColumn("occ", F.row_number().over(w))
            .filter(F.col("occ") >= 2)
            .select("doc_id", "pos")
            .count()
        )

    def run_cal() -> int:
        spark.range(100_000_000).agg({"id": "sum"}).write.mode(
            "overwrite"
        ).format("noop").save()
        return 0

    # parity before any timing — a fast wrong answer is worthless
    n_win, n_min = run_window(), run_minstruct()
    assert n_win == n_min, (n_win, n_min)

    subjects = {"window": run_window, "minstruct": run_minstruct, "cal": run_cal}
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
                "metric": "dupspan_hotgram_ab",
                "sf_dir": sf_dir,
                "reps": reps,
                "replicas": replicas,
                "k": K,
                "n_docs": n_docs,
                "n_removal_starts": n_min,
                "medians_s": med,
                "all_s": {
                    k: [round(x, 4) for x in v] for k, v in times.items()
                },
                "minstruct_over_window": round(
                    med["minstruct"] / med["window"], 3
                ),
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()


