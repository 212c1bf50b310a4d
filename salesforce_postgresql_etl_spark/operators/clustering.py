"""Connected components over a near-dup pair graph → dedup clusters.

The dedup pipeline's last stage: pair emitters (MinHash-LSH, SimHash,
embedding-LSH — operators/dedup.py, simsearch.py) produce EDGES, but
what a corpus build actually needs is one CLUSTER id per document and
one canonical survivor per cluster (near-duplication is transitive in
effect: A≈B and B≈C must collapse to one kept doc even when A,C were
never paired).

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round every node takes the min label over itself and
its neighbors; fixpoint = components labeled by their min member.

Scale shape (100 TB story):
- per round: one shuffle join (edges ⋈ labels on the neighbor id) +
  one groupBy(node) min — both hash-partitioned on node ids, no
  driver-side state. The only driver action is the one-row
  changed-count that decides termination.
- rounds needed = graph diameter. Near-dup clusters are dense
  (quasi-cliques), so diameter is tiny — the fixture corpus converges
  in 2-3 rounds. For adversarial long-chain graphs the known upgrade
  is alternating large-star/small-star (Kiveris et al., "Connected
  Components in MapReduce and Beyond"), which converges in O(log n)
  rounds with the same per-round primitives; not needed for dedup
  workloads and deliberately not implemented.
- lineage: each round's labels are eagerly localCheckpoint-ed —
  without truncation the plan doubles every iteration and Catalyst
  analysis, not the data, becomes the bottleneck. On a cluster with an
  HDFS checkpoint dir, swap for ``checkpoint()`` (documented, not
  env-gated: local mode has no reliable checkpoint dir).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_iters: int = 50,
) -> DataFrame:
    """(a, b) undirected edges → (node, comp); comp = min node id reachable.

    Only nodes that appear in at least one edge are returned (isolated
    docs are their own cluster trivially — callers left-join if they
    want singletons labeled).
    """
    edges = pairs.select(
        F.col(a).cast("long").alias("u"), F.col(b).cast("long").alias("v")
    )
    edges = (
        edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        nbr = edges.join(
            labels.select(
                F.col("node").alias("v"), F.col("comp").alias("nbr_comp")
            ),
            "v",
        ).select(F.col("u").alias("node"), F.col("nbr_comp").alias("comp"))
        new_labels = (
            labels.union(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(graph diameter exceeds max_iters — raise it, or use a "
            "star-contraction variant for long-chain graphs)"
        )
    edges.unpersist()
    return labels


def dedup_clusters(pairs: DataFrame, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """Edges → (doc_id, cluster_id, is_canonical).

    ``cluster_id`` is the min doc_id in the component; the canonical
    survivor is that min doc (deterministic, order-independent — the
    same keep-lowest rule as exact dedup's min(doc_id))."""
    comp = connected_components(pairs, a, b)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("node") == F.col("comp")).cast("int").alias("is_canonical"),
    )
