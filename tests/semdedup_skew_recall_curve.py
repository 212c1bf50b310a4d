"""SemDeDup recall vs k on a unimodal corpus (not collected by pytest
— run directly).

The r12 adversarial-skew sweep measured SemDeDup missing ~10% of
brute ≥θ pairs at SPARK_GRAFT_DATA_SKEW=0.99 (one natural embedding
cluster, k=8 k-means must split it, split-straddling pairs are
invisible to any within-cluster scan). This script turns that single
point into the CURVE the strategy decision actually needs: recall(k)
for k = 1, 2, 4, 8, 16 on the same 0.99-skew seeded draw, with the
sign-plane LSH twin as the control (its recall is geometry-bound —
per-band collision probability in the angular gap — not
cluster-bound, so it should sit at ~1.0 independent of any k).

Why this matters at 100 TB: auto-k (k ∝ √n) drives k UP with corpus
size, so on adversarially unimodal data SemDeDup recall degrades as
the corpus grows — the curve quantifies how fast, and the LSH control
shows what the strategy-twin design buys when the corpus is suspected
unimodal. k=1 is the degenerate exact case (one cluster = brute
within it, recall 1.0 by construction) and anchors the curve.

Precision is asserted exact (== 1.0) at every point — each emitted
pair must be in the brute set; the curve measures recall only.

Usage:  python tests/semdedup_skew_recall_curve.py [skew] [seed]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SKEW = float(sys.argv[1]) if len(sys.argv) > 1 else 0.99
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 9173
os.environ["SPARK_GRAFT_DATA_SKEW"] = str(SKEW)
os.environ["SPARK_GRAFT_DATA_SEED"] = str(SEED)

import duckdb  # noqa: E402

from salesforce_postgresql_etl_spark.session import get_spark  # noqa: E402

# import AFTER the env vars so the generator module reads them
from tests import test_registry_random_data as gen  # noqa: E402

THETA = 0.9
KS = (1, 2, 4, 8, 16)


def main() -> None:
    spark = get_spark(
        app_name="semdedup-skew-recall", master="local[8]", shuffle_partitions=8
    )
    out = tempfile.mkdtemp(prefix="skew_recall_")
    gen._gen_dataset(random.Random(SEED), out)

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{out}/embeddings.parquet')"
    )
    # brute ≥θ pair set (DuckDB, exact; same union-free single-table
    # corpus for all strategies so the comparison is apples-to-apples)
    brute = con.sql(
        f"""
        WITH ex AS (SELECT vec_id, unnest(embedding) AS v,
                           unnest(range(1, len(embedding) + 1)) AS pos
                    FROM embeddings),
        n2 AS (SELECT vec_id, sum(v * v) AS n2 FROM ex GROUP BY vec_id),
        d AS (SELECT q.vec_id AS vec_a, c.vec_id AS vec_b,
                     sum(q.v * c.v) AS dot
              FROM ex q JOIN ex c ON q.pos = c.pos AND q.vec_id < c.vec_id
              GROUP BY 1, 2)
        SELECT vec_a, vec_b
        FROM d JOIN n2 na ON na.vec_id = vec_a
               JOIN n2 nb ON nb.vec_id = vec_b
        WHERE d.dot / (sqrt(na.n2) * sqrt(nb.n2)) >= {THETA}
        """
    ).fetchall()
    brute_set = {(int(a), int(b)) for a, b in brute}
    print(f"# brute pairs: {len(brute_set)}", file=sys.stderr)

    from salesforce_postgresql_etl_spark.operators.simsearch import (
        neardup_embed_pairs,
        semdedup_pairs,
    )
    from salesforce_postgresql_etl_spark.sources import load

    emb = load(spark, out, "embeddings").select("vec_id", "embedding")

    def pairset(df):
        return {(int(r.vec_a), int(r.vec_b)) for r in df.collect()}

    result: dict = {
        "skew": SKEW,
        "seed": SEED,
        "theta": THETA,
        "brute_pairs": len(brute_set),
        "semdedup_recall_by_k": {},
    }
    for k in KS:
        got = pairset(semdedup_pairs(emb, threshold=THETA, k=k, iters=4))
        fp = got - brute_set
        assert not fp, f"k={k}: {len(fp)} false positives (precision break)"
        recall = len(got) / len(brute_set) if brute_set else 1.0
        result["semdedup_recall_by_k"][str(k)] = round(recall, 4)
        print(f"# semdedup k={k}: recall {recall:.4f}", file=sys.stderr)

    got = pairset(neardup_embed_pairs(emb, threshold=THETA, strategy="lsh"))
    fp = got - brute_set
    assert not fp, f"lsh: {len(fp)} false positives (precision break)"
    result["lsh_recall"] = round(
        len(got) / len(brute_set) if brute_set else 1.0, 4
    )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
