"""Stored-signature vs re-hash cross-corpus near-dup, MEASURED (not
collected by pytest — run directly).

`neardup_pairs_cross(corpus_bands=...)` (r7) claims the production
win of materializing `band_signatures` with the kept corpus: the
nightly ingest batch hashes only itself, equi-joins the STORED
buckets, and re-reads corpus text only for the candidate-hit verify
subset. This script prices that claim at sf0.1 instead of asserting
it: same split as the registered `q_neardup_incremental`
(new = doc_id%5==0, corpus = the rest), minhash strategy at the
registered θ, and two variants timed —

  rehash : corpus re-tokenized + re-minhashed every run (the
           pre-r7 path, persist=True — its best batch form)
  stored : corpus band rows read from parquet (written once,
           OUTSIDE timing — the production model), corpus text
           touched only through the candidate-pruned verify semi-join

Output parity between the two variants is asserted pair-for-pair
(including jaccard values) before any timing — a fast wrong answer
would be worthless.

Two ingest shapes, because the saving is hit-sparsity-dependent:

  dense  : the registered q_neardup_incremental split — the sf0.1
           documents fixture is pathologically duplicative (~67
           corpus matches per new doc), so the candidate-verify
           re-tokenizes most of the corpus regardless and the stored
           path saves only the minhash recomputation
  sparse : the same 1000-doc batch under a token bijection (every
           token t → "t~x"), so candidates ≈ 0 — the realistic
           crawl shape where most incoming docs are novel. Here the
           verify subset is empty and the delta IS the archive-sized
           term: corpus tokenize+minhash, the exact work
           materialization deletes.

Protocol (the r7 lesson — this box's calibration drifts within
minutes): variants run INTERLEAVED round-robin, medians compared,
spark.range-sum calibration bracketed before and after, one untimed
warmup, clearCache between timed runs (persist=True caches are part
of each variant's own cost, not carry-over).

What the ratio means at 100 TB: the corpus side is the ~100 TB kept
archive and the ingest batch is GB-scale; `rehash` re-tokenizes the
archive every night (cost grows with the ARCHIVE), `stored` does
work proportional to the BATCH plus signature-join and a verify read
of candidate hits only. Even at sf0.1's 1:4 batch:corpus ratio the
saving should be visible; at 1:10000 it is the difference between a
feasible and an infeasible nightly job.

Usage:  python tests/stored_bands_measure.py [sf_dir] [reps]
Prints one JSON line with per-variant medians, pair count, and the
stored/rehash ratio.
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

from salesforce_postgresql_etl_spark.operators.dedup import (  # noqa: E402
    band_signatures,
    neardup_pairs_cross,
)
from salesforce_postgresql_etl_spark.queries.llm import (  # noqa: E402
    NEARDUP_THRESHOLD,
)
from salesforce_postgresql_etl_spark.sources.tables import load  # noqa: E402


def build_inputs(spark, sf_dir: str, out_root: str) -> dict[str, str]:
    """Materialize new-batch docs, corpus docs, and the corpus's
    band_signatures table to parquet (all outside timing — the bands
    write is the one-time cost the corpus build pays at append time,
    not a per-ingest cost)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    dirs = {
        "new": os.path.join(out_root, "new"),
        "new_sparse": os.path.join(out_root, "new_sparse"),
        "corpus": os.path.join(out_root, "corpus"),
        "bands": os.path.join(out_root, "bands"),
    }
    new_b = d.where(F.col("doc_id") % 5 == 0)
    new_b.repartition(8).write.parquet(dirs["new"])
    # token bijection → disjoint token space → zero true pairs and
    # ~zero LSH candidates: the hit-sparse (novel-crawl) ingest shape
    new_b.select(
        "doc_id", F.regexp_replace("text", r"(\S+)", "$1~x").alias("text")
    ).repartition(8).write.parquet(dirs["new_sparse"])
    d.where(F.col("doc_id") % 5 != 0).repartition(32).write.parquet(
        dirs["corpus"]
    )
    band_signatures(spark.read.parquet(dirs["corpus"])).repartition(
        32
    ).write.parquet(dirs["bands"])
    return dirs


def run_variant(spark, dirs: dict[str, str], stored: bool, new_key: str = "new"):
    new_b = spark.read.parquet(dirs[new_key])
    corp = spark.read.parquet(dirs["corpus"])
    kw = (
        {"corpus_bands": spark.read.parquet(dirs["bands"])}
        if stored
        else {}
    )
    t0 = time.monotonic()
    rows = neardup_pairs_cross(
        new_b,
        corp,
        threshold=NEARDUP_THRESHOLD,
        strategy="minhash",
        persist=True,
        **kw,
    ).collect()
    wall = time.monotonic() - t0
    spark.catalog.clearCache()
    return wall, sorted((r.doc_a, r.doc_b, r.jaccard) for r in rows)


def calibrate(spark) -> float:
    t0 = time.monotonic()
    spark.range(0, 50_000_000).agg(F.sum("id")).collect()
    return time.monotonic() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
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
    out_root = tempfile.mkdtemp(prefix="stored_bands_")
    try:
        dirs = build_inputs(spark, sf_dir, out_root)
        # parity first (also the JIT/codegen warmup for both shapes)
        n_pairs = {}
        for nk in ("new", "new_sparse"):
            _, rows_rehash = run_variant(spark, dirs, stored=False, new_key=nk)
            _, rows_stored = run_variant(spark, dirs, stored=True, new_key=nk)
            assert rows_rehash == rows_stored, (
                f"{nk}: variant outputs differ: rehash {len(rows_rehash)} "
                f"rows vs stored {len(rows_stored)}"
            )
            n_pairs[nk] = len(rows_stored)
        assert n_pairs["new_sparse"] == 0, "bijected batch must have 0 hits"
        cal_start = round(min(calibrate(spark) for _ in range(3)), 4)
        variants = [
            ("dense_rehash", False, "new"),
            ("dense_stored", True, "new"),
            ("sparse_rehash", False, "new_sparse"),
            ("sparse_stored", True, "new_sparse"),
        ]
        runs: dict[str, list[float]] = {name: [] for name, _, _ in variants}
        for _ in range(reps):  # interleaved round-robin, never sequential
            for name, flag, nk in variants:
                wall, _ = run_variant(spark, dirs, stored=flag, new_key=nk)
                runs[name].append(round(wall, 3))
        cal_end = round(min(calibrate(spark) for _ in range(3)), 4)
        med = {k: round(statistics.median(v), 3) for k, v in runs.items()}
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_new": spark.read.parquet(dirs["new"]).count(),
                    "n_corpus": spark.read.parquet(dirs["corpus"]).count(),
                    "n_pairs": n_pairs,
                    "threshold": NEARDUP_THRESHOLD,
                    "reps": reps,
                    "runs_s": runs,
                    "median_s": med,
                    "stored_over_rehash": {
                        "dense": round(
                            med["dense_stored"] / med["dense_rehash"], 3
                        ),
                        "sparse": round(
                            med["sparse_stored"] / med["sparse_rehash"], 3
                        ),
                    },
                    "calibration_start_s": cal_start,
                    "calibration_end_s": cal_end,
                }
            )
        )
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
