"""AQE skew-join measurement (not collected by pytest — run directly).

SCALE.md has asserted since r1 that `spark.sql.adaptive.skewJoin`
handles fact-side key skew; this script MEASURES it (r6, VERDICT r5
#6) instead of asserting it. It manufactures the canonical pathology —
half the fact table on ONE join key — then times the same
SortMergeJoin+agg with AQE skew splitting off and on, and verifies
the split actually happened by reading "skew=true" out of the final
adaptive plan.

Skew manufacture: lineitem at sf0.1 (600k rows), 50% of rows rewritten
to the minimum orderkey, amplified ×REP via explode so the hot shuffle
partition is tens of MB even at local scale. The fact is materialized
to parquet first so manufacture cost is outside the timed region and
the scan sees realistic file sizes.

Threshold note: the optimizer sees COMPRESSED map-output sizes (a
first measurement here found "number of skewed partitions: left 0"
when the fact was a constant key + a 50-distinct-values double — it
lz4'd to under 2 MB; compressible skew is not real skew). The fact
therefore carries a 32-hex md5 payload through the join, like any
real fact row, and the run lowers skewedPartitionThresholdInBytes /
advisoryPartitionSizeInBytes from the production 256m/64m defaults to
16m to scale-normalize: at 100 TB the hot partition of a 50%-skewed
key is hundreds of GB compressed and the defaults trigger untouched.
The relative test (size > 5.0x median) is left at its default and
passes at ~25x.

Usage:  python tests/skew_measure.py [sf_dir] [reps]
Prints one JSON line: {"skew_off_s": ..., "skew_on_s": ..., ...}
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from salesforce_postgresql_etl_spark.sources.tables import load  # noqa: E402

REP = 20  # row amplification factor


def build_skewed_fact(spark, sf_dir: str, out_dir: str) -> None:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    hot = li.agg(F.min("l_orderkey")).first()[0]
    skewed = (
        li.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(REP))))
        # High-entropy payload BEFORE the key rewrite: a hot partition
        # of constant-key rows lz4s away to nothing in the shuffle, and
        # the optimizer (correctly) sees no skew in compressed bytes.
        # Real fact rows carry incompressible columns; model that.
        .withColumn(
            "payload",
            F.md5(F.concat_ws("-", "l_orderkey", "l_linenumber", "rep")),
        )
        .withColumn(
            "l_orderkey",
            F.when((F.col("l_linenumber") % 2) == 0, F.lit(hot)).otherwise(
                F.col("l_orderkey")
            ),
        )
        .drop("rep")
    )
    skewed.write.mode("overwrite").parquet(out_dir)


def timed_join(spark, fact_dir: str, orders, skew_on: bool) -> tuple[float, str]:
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
    # Scale-normalized thresholds (see module docstring); factor stays
    # at the 5.0 default — the manufactured skew is ~30x median, far
    # past any sane trigger.
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    # Force the shuffle join: a broadcast would hide the skew entirely
    # (and at 100 TB orders is not broadcastable).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # 16m splits → ~40 map tasks over the ~600 MB fact: without this
    # the scan coalesces to 3×128m tasks and the MAP stage's 3-thread
    # serialism dominates wall-clock, masking the reduce-side straggler
    # this script exists to measure.
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")

    fact = spark.read.parquet(fact_dir)
    out = (
        fact.join(orders, fact.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("l_quantity").alias("sum_qty"),
            F.max("payload").alias("max_payload"),  # keeps payload in
            # the join shuffle — column pruning would otherwise strip
            # it at the scan and re-shrink the hot partition
        )
    )
    t0 = time.monotonic()
    rows = sorted(tuple(r) for r in out.collect())
    dt = time.monotonic() - t0
    plan = out._jdf.queryExecution().executedPlan().toString()
    return dt, plan, rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.log.level", "ERROR")
        .appName("skew-measure")
        .getOrCreate()
    )
    work = tempfile.mkdtemp(prefix="skewfact_")
    try:
        fact_dir = os.path.join(work, "fact")
        build_skewed_fact(spark, sf_dir, fact_dir)
        orders = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )

        results = {}
        rows_by_mode = {}
        # warmup (JIT, page cache) — one run each, discarded
        timed_join(spark, fact_dir, orders, False)
        timed_join(spark, fact_dir, orders, True)
        times = {"skew_off": [], "skew_on": []}
        # INTERLEAVED reps: page-cache/JIT drift hits both modes
        # equally instead of gifting whichever mode runs second.
        for _ in range(reps):
            for skew_on in (False, True):
                dt, plan, rows = timed_join(spark, fact_dir, orders, skew_on)
                key = "skew_on" if skew_on else "skew_off"
                times[key].append(dt)
                results[f"{key}_plan_split"] = (
                    "skew=true" in plan or "AQEShuffleRead skewed" in plan
                )
                rows_by_mode[key] = rows
        for key, ts in times.items():
            results[f"{key}_s"] = round(statistics.median(ts), 3)
            results[f"{key}_all"] = [round(t, 3) for t in ts]
        assert rows_by_mode["skew_on"] == rows_by_mode["skew_off"], (
            "skew split changed results"
        )
        results["rows_equal"] = True
        results["speedup"] = round(results["skew_off_s"] / results["skew_on_s"], 2)
        print(json.dumps(results))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
