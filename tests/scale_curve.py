"""Dedup-pipeline scale-linearity curve (not collected by pytest —
run directly).

SCALE.md argues the MinHash-LSH → connected-components pipeline is
linear in corpus size (the 100 TB claim: no stage touches the n²
pair space). This script MEASURES the growth curve instead of
asserting it: the sf0.1 documents corpus is replicated 1×/2×/4× with
a per-replica TOKEN BIJECTION (every whitespace token gets a replica
suffix, so within-replica Jaccard is preserved EXACTLY while
cross-replica token sets are disjoint — pair structure scales
linearly BY CONSTRUCTION), and the full pipeline
(neardup_pairs(minhash, persist) → dedup_clusters → count) is timed
at each scale.

What linear construction + measured ratios prove: if time ratios
track the 2× corpus ratios (≈2× each step, modulo fixed costs),
no super-linear stage is hiding in the pipeline — candidate
emission, verify join, and the CC loop all scale with their inputs,
not with n².

Protocol (the r7 lesson — this box's calibration drifts within
minutes): scales run INTERLEAVED round-robin, medians compared,
spark.range-sum calibration bracketed before and after. Corpus
materialization to parquet happens outside every timed region.

Usage:  python tests/scale_curve.py [sf_dir] [reps]
Prints one JSON line with per-scale medians, counts, and ratios.
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

from salesforce_postgresql_etl_spark.operators.clustering import (  # noqa: E402
    dedup_clusters,
)
from salesforce_postgresql_etl_spark.operators.dedup import (  # noqa: E402
    neardup_pairs,
)
from salesforce_postgresql_etl_spark.queries.llm import (  # noqa: E402
    NEARDUP_THRESHOLD,
)
from salesforce_postgresql_etl_spark.sources.tables import load  # noqa: E402

SCALES = (1, 2, 4)
_OFFSET = 10_000_000  # replica doc_id shift — keeps ids disjoint


def build_corpora(spark, sf_dir: str, out_root: str) -> dict[int, str]:
    """Materialize the 1×/2×/4× corpora to parquet (outside timing).

    Replica k maps every token t → "t~k": a bijection on the token
    space, so each replica's pair set is ISOMORPHIC to the base
    corpus's (same Jaccard values under renamed tokens) and
    cross-replica Jaccard is exactly 0. Pairs and clusters therefore
    scale exactly ×k by construction — the measurement isolates the
    ENGINE's growth, not the data's."""
    base = load(spark, sf_dir, "documents").select("doc_id", "text")
    dirs = {}
    for s in SCALES:
        replicas = [
            base.select(
                (F.col("doc_id") + F.lit(k * _OFFSET)).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"$1~{k}").alias("text"),
            )
            for k in range(s)
        ]
        corpus = replicas[0]
        for r in replicas[1:]:
            corpus = corpus.unionAll(r)
        d = os.path.join(out_root, f"x{s}")
        corpus.repartition(32).write.parquet(d)
        dirs[s] = d
    return dirs


def timed_pipeline(spark, corpus_dir: str) -> tuple[float, int]:
    docs = spark.read.parquet(corpus_dir)
    t0 = time.monotonic()
    pairs = neardup_pairs(
        docs, threshold=NEARDUP_THRESHOLD, strategy="minhash", persist=True
    ).select("doc_a", "doc_b")
    n_clusters = dedup_clusters(pairs).where(
        F.col("is_canonical") == 1
    ).count()
    wall = time.monotonic() - t0
    spark.catalog.clearCache()
    return wall, n_clusters


def calibrate(spark) -> float:
    t0 = time.monotonic()
    spark.range(0, 50_000_000).agg(F.sum("id")).collect()
    return time.monotonic() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.log.level", "ERROR")
        .getOrCreate()
    )
    out_root = tempfile.mkdtemp(prefix="scale_curve_")
    try:
        dirs = build_corpora(spark, sf_dir, out_root)
        n_docs = {
            s: spark.read.parquet(d).count() for s, d in dirs.items()
        }
        timed_pipeline(spark, dirs[SCALES[0]])  # untimed JIT/codegen warmup
        cal_start = round(min(calibrate(spark) for _ in range(3)), 4)
        runs: dict[int, list[float]] = {s: [] for s in SCALES}
        clusters: dict[int, int] = {}
        for _ in range(reps):  # interleaved round-robin, never sequential
            for s in SCALES:
                wall, n_c = timed_pipeline(spark, dirs[s])
                runs[s].append(round(wall, 3))
                clusters[s] = n_c
        cal_end = round(min(calibrate(spark) for _ in range(3)), 4)
        med = {s: statistics.median(runs[s]) for s in SCALES}
        result = {
            "sf_dir": sf_dir,
            "scales": {
                str(s): {
                    "n_docs": n_docs[s],
                    "n_clusters": clusters[s],
                    "median_s": round(med[s], 3),
                    "runs": runs[s],
                }
                for s in SCALES
            },
            "ratio_2x_over_1x": round(med[2] / med[1], 3),
            "ratio_4x_over_2x": round(med[4] / med[2], 3),
            "calibration_start_s": cal_start,
            "calibration_end_s": cal_end,
        }
        print(json.dumps(result))
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
