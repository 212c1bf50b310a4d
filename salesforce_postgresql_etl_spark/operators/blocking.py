"""Blocked candidate-pair generation for entity resolution (r7 — the
100 TB watch item from the r6 verdict: "block-key skew").

Blocking is what keeps entity resolution off the n² cliff: candidate
pairs come from a self-equi-join on a cheap block key, so the only
shuffle keys are blocks and the pair space is Σ k_b² over block sizes
instead of n². That makes BLOCK-KEY SKEW the dominant failure mode at
scale — one hot block of k records emits k(k−1)/2 pairs through a
single reducer. A 16-char name prefix is fine on a fixture; on 10⁹
real-world records a block like "JOHN SMITH      " is a pair bomb.

``blocked_pairs`` therefore carries the same discipline as the
clustering over-merge cap: measure block sizes (one aggregate over the
block keys — tiny next to the join it guards) and respond per
``on_oversize``:

- ``"raise"`` (default): loud failure naming the hot blocks — the
  tripwire that says the block key needs refining.
- ``"drop"``: exclude oversized blocks entirely. Documented recall
  loss; the production shape when hot blocks are known junk (empty
  strings, "UNKNOWN", placeholder names).
- ``"refine"``: re-block ONLY the oversized blocks with the finer
  ``refine`` key (pairs then require both the coarse and fine keys to
  match). Recall loss across fine sub-blocks is inherent to blocking;
  every surviving pair still matched the coarse key.
- ``"salt"`` (r8, VERDICT r7 #5): LOSSLESS skew split — oversized
  blocks keep emitting every within-block pair, but across
  ``salt_buckets``² triangle reducers instead of one. Each hot-block
  record gets a deterministic salt s = hash(key) mod n; the A side
  replicates to buckets (s, j≥s), the B side to (i≤s, s), and the
  equi-join key becomes (block, i, j) — every unordered pair meets in
  EXACTLY one (i, j) bucket (the pigeonhole is exact, not
  probabilistic), each bucket holds ~(k/n)² of a k-row block's pairs,
  and the replication cost is n/2 copies of the hot rows only. This is
  the standard skew-salting treatment specialized to self-join pair
  generation; use it when the hot blocks are REAL entities that must
  still be compared (refine loses recall, drop loses the block).

All paths are hash-partitioned joins on block keys — never all-pairs,
no driver-side state beyond the ≤5-row hot-block sample in the raise
path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _self_pairs(b: DataFrame, key: str, attrs: list[str], on: list[str]) -> DataFrame:
    a_side = b.select(
        *on,
        F.col(key).alias("k_a"),
        *[F.col(c).alias(f"{c}_a") for c in attrs],
    )
    b_side = b.select(
        *on,
        F.col(key).alias("k_b"),
        *[F.col(c).alias(f"{c}_b") for c in attrs],
    )
    return (
        a_side.join(b_side, on)
        .where(F.col("k_a") < F.col("k_b"))
        .select(
            "k_a",
            "k_b",
            *[f"{c}_a" for c in attrs],
            *[f"{c}_b" for c in attrs],
        )
    )


def _salted_pairs(
    hot_recs: DataFrame, key: str, attrs: list[str], n: int
) -> DataFrame:
    """Every within-block pair of ``hot_recs``, emitted across the
    (i ≤ j) triangle of ``n``² salt buckets — see module docstring.
    Output orientation is canonicalized to k_a < k_b afterwards (in an
    i < j bucket the pair arrives in hash order, not key order)."""
    salted = hot_recs.withColumn(
        "__salt__",
        F.pmod(F.xxhash64(F.col(key)), F.lit(n)).cast("int"),
    )
    a_side = salted.select(
        "__blk__",
        F.col("__salt__").alias("__si__"),
        F.col(key).alias("k_a"),
        *[F.col(c).alias(f"{c}_a") for c in attrs],
    ).withColumn("__sj__", F.explode(F.expr(f"sequence(__si__, {n - 1})")))
    b_side = salted.select(
        "__blk__",
        F.col("__salt__").alias("__sj__"),
        F.col(key).alias("k_b"),
        *[F.col(c).alias(f"{c}_b") for c in attrs],
    ).withColumn("__si__", F.explode(F.expr("sequence(0, __sj__)")))
    # Parallelism must come from the BUCKET COUNT, not shuffle bytes:
    # a hot block's pair volume (and the caller's verify cost on it)
    # is QUADRATIC in its rows while its shuffle input is linear, so
    # AQE's byte-based partition coalescing merges the salt buckets
    # back into few tasks and resurrects the single-reducer bottleneck
    # the salt exists to kill (measured at sf0.1: coalesced salt
    # 10.7 s ≈ unsalted 11.7 s; explicitly repartitioned 1.7 s — see
    # SCALE.md r8). An explicit numPartitions pins the layout; AQE
    # leaves user-specified counts alone.
    nparts = n * (n + 1) // 2
    joined = a_side.repartition(nparts, "__blk__", "__si__", "__sj__").join(
        b_side.repartition(nparts, "__blk__", "__si__", "__sj__"),
        ["__blk__", "__si__", "__sj__"],
    )
    # same-bucket (i == j) pairs arrive in BOTH orientations — keep
    # one; cross-bucket pairs arrive exactly once, either orientation
    pairs = joined.where(
        (F.col("__si__") != F.col("__sj__")) | (F.col("k_a") < F.col("k_b"))
    )
    flip = F.col("k_a") > F.col("k_b")
    return pairs.select(
        F.least("k_a", "k_b").alias("k_a"),
        F.greatest("k_a", "k_b").alias("k_b"),
        *[
            F.when(flip, F.col(f"{c}_b")).otherwise(F.col(f"{c}_a")).alias(f"{c}_a")
            for c in attrs
        ],
        *[
            F.when(flip, F.col(f"{c}_a")).otherwise(F.col(f"{c}_b")).alias(f"{c}_b")
            for c in attrs
        ],
    )


def blocked_pairs(
    records: DataFrame,
    key: str,
    block: Column,
    attrs: list[str] | None = None,
    max_block_size: int | None = None,
    on_oversize: str = "raise",
    refine: Column | None = None,
    salt_buckets: int = 8,
) -> DataFrame:
    """Candidate pairs (k_a < k_b) from equi-blocking on ``block``.

    ``attrs`` columns ride through the self-join as ``<col>_a`` /
    ``<col>_b`` so the caller's verify predicate (edit distance etc.)
    needs no join back to the source. With ``max_block_size`` set, one
    block-size aggregate gates the join per ``on_oversize`` (see
    module docstring); ``refine`` is required for ``"refine"``. The
    gated path runs that aggregate EAGERLY at construction (the
    tripwire must fire before the pair bomb, same contract as
    ``dedup_clusters``'s cap) over a one-shot checkpoint of the narrow
    (block, key, attrs) projection, so the source is scanned once.
    """
    if on_oversize not in ("raise", "drop", "refine", "salt"):
        raise ValueError(f"unknown on_oversize: {on_oversize!r}")
    if on_oversize == "refine" and max_block_size is not None and refine is None:
        raise ValueError("on_oversize='refine' needs a refine block Column")
    if on_oversize == "salt" and salt_buckets < 2:
        raise ValueError("on_oversize='salt' needs salt_buckets >= 2")
    attrs = list(attrs or [])
    # Internal block-key names that can't collide with the caller's
    # schema (r7 review: joining `block == F.col("blk")` back against
    # `records` mis-bound when records carried its own blk column).
    # BOTH keys are computed in one projection straight off the source,
    # so the refine path never re-joins records at all.
    cols = [block.alias("__blk__"), F.col(key).alias(key)]
    if refine is not None:
        cols.append(refine.alias("__fine__"))
    cols += [F.col(c) for c in attrs]
    b = records.select(*cols)
    if max_block_size is None:
        return _self_pairs(b, key, attrs, ["__blk__"])

    # The gate needs the block sizes BEFORE the pairs plan executes, so
    # the guarded path eagerly materializes the narrow projection once
    # (construction-time job, documented) and both the size check and
    # the pair join read it back — the source is scanned exactly once.
    b = b.localCheckpoint(eager=True)
    sizes = b.groupBy("__blk__").agg(F.count(F.lit(1)).alias("_n"))
    hot = sizes.where(F.col("_n") > max_block_size)
    if on_oversize == "raise":
        bad = hot.limit(5).collect()
        if bad:
            ids = [(r["__blk__"], r["_n"]) for r in bad]
            raise ValueError(
                f"hot blocks exceed max_block_size={max_block_size}: "
                f"(block, size) = {ids} — a skewed block key turns the "
                "blocked join into a pair bomb; refine the key "
                "(on_oversize='refine') or drop known-junk blocks"
            )
        return _self_pairs(b, key, attrs, ["__blk__"])

    cold = b.join(F.broadcast(hot.select("__blk__")), "__blk__", "left_anti")
    cold_pairs = _self_pairs(cold, key, attrs, ["__blk__"])
    if on_oversize == "drop":
        return cold_pairs

    hot_recs = b.join(F.broadcast(hot.select("__blk__")), "__blk__")
    if on_oversize == "salt":
        hot_pairs = _salted_pairs(hot_recs, key, attrs, salt_buckets)
    else:
        hot_pairs = _self_pairs(hot_recs, key, attrs, ["__blk__", "__fine__"])
    return cold_pairs.unionByName(hot_pairs)
