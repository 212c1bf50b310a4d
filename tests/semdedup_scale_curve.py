"""SemDeDup scale curve: fixed k vs k∝n (not collected by pytest —
run directly, on an otherwise-idle machine).

The honest scaling question for cluster-bucketed dedup: candidate
volume is Σ_b n_b(n_b−1)/2, so at FIXED k doubling the corpus doubles
every bucket and quadruples the candidate pairs — the curve should
show a super-linear bend. The paper's mitigation is k ∝ n (bucket
sizes held constant), which restores ~linear candidates. This script
measures BOTH, so the SCALE.md claim is a measurement, not an
argument.

Fixture: the sf0.1 embeddings table at 1×/2×/4×, replicas made
DISTINCT directions (reverse / negate / negate∘reverse) rather than
copies — identical copies would inflate the verified-pair OUTPUT
quadratically by construction and conflate output size with candidate
volume. Training runs OUTSIDE the timings (md5-init k-means — the
O(n) large-k seeding), once per (variant, scale); the timed path is
assignment + within-bucket pair join + decimal verify, interleaved
rounds, medians reported.

Usage: python tests/semdedup_scale_curve.py [rounds]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from salesforce_postgresql_etl_spark.operators.simsearch import (  # noqa: E402
    kmeans_centroids,
    semdedup_pairs,
)
from salesforce_postgresql_etl_spark.session import get_spark  # noqa: E402
from salesforce_postgresql_etl_spark.sources import load  # noqa: E402

K_BASE = 25
THETA = 0.9


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="semdedup-scale")
    base = load(spark, "/root/testdata/sf0.1", "embeddings").select(
        "vec_id", "embedding"
    )
    neg = F.transform("embedding", lambda x: -x).alias("embedding")
    rev = F.reverse("embedding").alias("embedding")
    negrev = F.reverse(neg).alias("embedding")
    variants = [
        base,
        base.select((F.col("vec_id") + 100_000).alias("vec_id"), rev),
        base.select((F.col("vec_id") + 200_000).alias("vec_id"), neg),
        base.select((F.col("vec_id") + 300_000).alias("vec_id"), negrev),
    ]
    corpora = {}
    for mult in (1, 2, 4):
        df = variants[0]
        for v in variants[1:mult]:
            df = df.unionByName(v)
        corpora[mult] = df.localCheckpoint(eager=True)  # isolate scan cost

    # offline training, outside all timings: fixed k and k ∝ n
    cents = {}
    for mult, df in corpora.items():
        for label, k in (("fixed", K_BASE), ("scaled", K_BASE * mult)):
            c = kmeans_centroids(df, k=k, iters=2, init="md5")
            cents[(label, mult)] = c.localCheckpoint(eager=True)

    def run(label: str, mult: int) -> None:
        semdedup_pairs(
            corpora[mult], threshold=THETA, centroids=cents[(label, mult)]
        ).write.mode("overwrite").format("noop").save()

    subjects = [(lb, m) for lb in ("fixed", "scaled") for m in (1, 2, 4)]
    for s in subjects:  # untimed warmup
        run(*s)
    times: dict[tuple, list[float]] = {s: [] for s in subjects}
    for _ in range(rounds):
        for s in subjects:  # interleaved
            t0 = time.perf_counter()
            run(*s)
            times[s].append(time.perf_counter() - t0)
            spark.catalog.clearCache()

    med = {f"{lb}_{m}x": round(statistics.median(v), 3) for (lb, m), v in times.items()}
    print(
        json.dumps(
            {
                "metric": "semdedup_scale_curve",
                "k_base": K_BASE,
                "rounds": rounds,
                "medians_s": med,
                "fixed_ratio_2x": round(med["fixed_2x"] / med["fixed_1x"], 2),
                "fixed_ratio_4x": round(med["fixed_4x"] / med["fixed_1x"], 2),
                "scaled_ratio_2x": round(med["scaled_2x"] / med["scaled_1x"], 2),
                "scaled_ratio_4x": round(med["scaled_4x"] / med["scaled_1x"], 2),
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
