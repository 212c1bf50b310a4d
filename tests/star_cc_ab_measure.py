"""r14 star-CC A/B (VERDICT r13 #4) — run directly.

Arms, interleaved, over the SAME persisted LSH pair set (the CC input
of the q_neardup_clusters_star bench entry):

- star_r13: the r13 form, verbatim — broadcast-hinted tight-regime
  joins + eager nodes checkpoint (embedded below so the arm runs
  without a checkout).
- star_r14: the module's current form — exchange-free SinglePartition
  joins in the tight regime, lazy node set.
- contract: connected_components_contract, the reference engine.

Each arm counts the Spark jobs it issues (statusTracker delta) and
asserts label-identity against contract on every rep.

Usage:  python tests/star_cc_ab_measure.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _steal() -> int:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    vals = [int(x) for x in parts[1:]]
    return vals[7] if len(vals) > 7 else 0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from salesforce_postgresql_etl_spark.operators import clustering as C
    from salesforce_postgresql_etl_spark.operators.dedup import neardup_pairs
    from salesforce_postgresql_etl_spark.queries.llm import NEARDUP_THRESHOLD
    from salesforce_postgresql_etl_spark.session import get_spark
    from salesforce_postgresql_etl_spark.sources import load

    # ---- r13 star, verbatim (git 5c54023) -------------------------
    def _large_star_r13(edges: DataFrame, node_bound: int) -> DataFrame:
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        if node_bound <= C._CC_BROADCAST_ROWS:
            sym = sym.coalesce(1)
        mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
        m = mins.select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
        return (
            sym.join(C._maybe_broadcast(m, node_bound), "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )

    def _small_star_r13(edges: DataFrame, node_bound: int) -> DataFrame:
        tight = node_bound <= C._CC_BROADCAST_ROWS
        if tight:
            edges = edges.coalesce(1)
        mins = edges.groupBy("u").agg(F.min("v").alias("m"))
        nbr = edges.join(C._maybe_broadcast(mins, node_bound), "u").select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        own = mins.select("u", F.col("m").alias("v"))
        un = nbr.union(own)
        if tight:
            un = un.coalesce(1)
        return C._canon(un)

    def star_r13(pairs: DataFrame) -> DataFrame:
        raw = pairs.select(
            F.col("doc_a").cast("long").alias("u"),
            F.col("doc_b").cast("long").alias("v"),
        ).localCheckpoint(eager=True)
        e_obs = Observation()
        edges = (
            C._canon(raw)
            .observe(e_obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        nodes = (
            raw.select(F.col("u").alias("node"))
            .union(raw.select(F.col("v").alias("node")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_edges = int(e_obs.get["n"])
        for _ in range(1, 41):
            r_obs = Observation()
            node_bound = 2 * n_edges
            new_edges = (
                _small_star_r13(
                    _large_star_r13(edges, node_bound), node_bound
                )
                .observe(r_obs, F.count(F.lit(1)).alias("n"))
                .localCheckpoint(eager=True)
            )
            n_new = int(r_obs.get["n"])
            changed = 1
            if n_new == n_edges:
                changed = new_edges.exceptAll(edges).limit(1).count()
            edges, n_edges = new_edges, n_new
            if changed == 0:
                break
        else:
            raise RuntimeError("no converge")
        parents = edges.select(
            F.col("u").alias("node"), F.col("v").alias("comp")
        )
        return nodes.join(
            C._maybe_broadcast(parents, 2 * n_edges), "node", "left"
        ).select(
            "node", F.coalesce(F.col("comp"), F.col("node")).alias("comp")
        )

    # ----------------------------------------------------------------
    spark = get_spark(
        app_name="r14-star-ab", master="local[32]", shuffle_partitions=32
    )
    tracker = spark.sparkContext.statusTracker()
    docs = load(spark, sf_dir, "documents")
    pairs = neardup_pairs(
        docs, threshold=NEARDUP_THRESHOLD, strategy="minhash", persist=True
    ).select("doc_a", "doc_b")
    pairs = pairs.localCheckpoint(eager=True)  # isolate CC cost

    ref = sorted(
        tuple(r)
        for r in C.connected_components_contract(pairs).collect()
    )

    def jobs() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    arms = {
        "star_r13": lambda: star_r13(pairs),
        "star_r14": lambda: C.connected_components_star(pairs),
        "contract": lambda: C.connected_components_contract(pairs),
    }
    # warmup + identity check
    for name, fn in arms.items():
        got = sorted(tuple(r) for r in fn().collect())
        assert got == ref, f"{name} labels differ from contract!"
    s0, t0 = _steal(), time.monotonic()
    series = {a: [] for a in arms}
    jobcount = {a: [] for a in arms}
    for _ in range(reps):
        for a, fn in arms.items():
            j0 = jobs()
            t1 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            series[a].append(round(time.perf_counter() - t1, 4))
            jobcount[a].append(jobs() - j0)
    el = time.monotonic() - t0
    print(
        json.dumps(
            {
                "reps": reps,
                "steal_cores_avg": round(
                    (_steal() - s0) / os.sysconf("SC_CLK_TCK") / el, 2
                ),
                "min": {a: min(v) for a, v in series.items()},
                "jobs": {a: v[-1] for a, v in jobcount.items()},
                "series": series,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
