"""Similarity search over embedding columns (SURVEY.md §2.11 L3, L8).

Cosine top-k with two strategies behind one function:

- ``strategy="brute"``: query × corpus cross join, exact cosine, top-k
  per query via a partitioned window. The baseline and oracle form.
- ``strategy="ivf"``: IVF-style coarse quantization. Partition
  centroids come from the ``label`` column (the fixture's natural
  cluster id — a production build would k-means them); each query
  probes only its ``nprobe`` nearest centroids' inverted lists. With
  ``nprobe = n_labels`` the search space degenerates to the full
  corpus and the result EQUALS brute force (the pytest asserts this);
  smaller nprobe trades recall for a 1/nprobe scan-cost cut, which is
  the 100 TB path (the inverted lists are just partition pruning on a
  label-partitioned parquet layout — only probed partitions are read).

Determinism doctrine: dot products and norms are summed in DECIMAL
(float32 → exact double → decimal(12,7) per element; products at
scale 14) so the fold order never matters; the final
``dot / (sqrt(n_a)·sqrt(n_b))`` is a fixed sequence of correctly-
rounded IEEE double ops — bit-identical in Spark and DuckDB.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..session import persist_once

from ..functions import dec_to_double

# Element/accumulator decimal shapes: values in [-1, 1], products at
# scale 14 — |sum| ≤ 64 ⇒ scaled bigint ≤ 6.4e15 < 2^63.
_ELEM = "decimal(12,7)"
_ACC = "decimal(26,14)"


def _dot_dec(a: Column, b: Column) -> Column:
    """Exact decimal dot product of two float arrays, as double.

    float32 → DOUBLE first (exact widening in every engine), THEN
    decimal: a direct float→decimal cast scales in float precision in
    DuckDB (±1 ulp at the target scale on ~half the values) while
    Spark rounds the shortest float repr — the double hop makes both
    engines round the same exact value.
    """
    prods = F.zip_with(
        a, b, lambda x, y: x.cast("double").cast(_ELEM) * y.cast("double").cast(_ELEM)
    )
    s = F.aggregate(
        prods,
        F.lit(0).cast(_ACC),
        lambda acc, x: (acc + x).cast(_ACC),
    )
    # prec=18: |dot| ≤ 64 needs only 2 int digits; keeps the ×10¹⁴
    # intermediate under both engines' 38-digit decimal cap.
    return dec_to_double(s, 14, prec=18)


def _sq_norm_dec(a: Column) -> Column:
    return _dot_dec(a, a)


def with_sq_norm(emb: DataFrame, vec: str = "embedding") -> DataFrame:
    return emb.withColumn("sq_norm", _sq_norm_dec(F.col(vec)))


# Power-of-two quantizer for float sums: v·2⁴⁰ is EXACT in double
# (power-of-two multiply), floor is unambiguous everywhere (no decimal
# half-boundary cases), and the resulting bigints sum exactly in any
# order. Mean = (Σ/2⁴⁰)/n — two correctly-rounded double ops.
POW2_Q = 2**40


def mean_q40(val: Column) -> Column:
    """Order-independent mean of a float column at 2^-40 quantization."""
    scaled = F.floor(val.cast("double") * F.lit(float(POW2_Q)))
    return (F.sum(scaled).cast("double") / F.lit(float(POW2_Q))) / F.count(F.lit(1))


def sql_mean_q40(val_sql: str) -> str:
    return (
        f"(CAST(SUM(CAST(floor(CAST({val_sql} AS DOUBLE) * {POW2_Q}) AS BIGINT))"
        f" AS DOUBLE) / {POW2_Q}.0) / COUNT(*)"
    )


def label_centroids(emb: DataFrame, vec: str = "embedding") -> DataFrame:
    """Per-label centroid as an ordered array (order-independent mean).

    This is also the L8 operator: posexplode → exact scaled-integer sum
    per (label, pos) → mean in double → re-assembled ordered array.
    """
    pos = emb.select(
        "label", F.posexplode(vec).alias("pos", "val")
    )
    per_dim = pos.groupBy("label", "pos").agg(
        mean_q40(F.col("val")).alias("c_val")
    )
    return per_dim.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c_val"))),
            lambda s: s.getField("c_val"),
        ).alias("centroid")
    )


# ---------------------------------------------------------------------------
# Embedding near-dup: all pairs with cosine ≥ threshold (SURVEY §2.11 L2c)
# ---------------------------------------------------------------------------
# Sign-plane defaults: 256 Rademacher hyperplanes in 32 bands of r=8.
# P(bit match | cosine s) = 1 − arccos(s)/π, so with r=8/b=32 the miss
# probability per TRUE pair is (1 − p⁸)³² ≈ 2e-5 at s=0.9 and 2e-8 at
# s=0.95, while an orthogonal pair (p=0.5) becomes a candidate with
# probability 1 − (1 − 0.5⁸)³² ≈ 0.118 — an ~8× pair-space cut that
# deepens as corpus similarity mass thins out (real corpora are far
# sparser in the ≥0.9 shell than the adversarial fixtures).
DEFAULT_N_PLANES = 256
DEFAULT_PLANE_BANDS = 32


def _rademacher_planes(dim: int, n_planes: int) -> list[tuple[int, list[float]]]:
    """Deterministic ±1 hyperplanes: component j of plane i is the low
    bit of md5("i:j"). No RNG state — identical planes across sessions,
    retries, and partitionings by construction (the repo's determinism
    doctrine forbids seed-from-clock randomness)."""
    out = []
    for i in range(n_planes):
        signs = [
            1.0
            if int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8], 16) & 1
            else -1.0
            for j in range(dim)
        ]
        out.append((i, signs))
    return out


def _dot_dbl(a: Column, b: Column) -> Column:
    """Plain double dot product — cheap, sequential fold (deterministic
    per row but NOT the output value; only ever used as a pre-filter)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# Pre-filter margin (r5, advisor: the old fixed 1e-3 assumed ~64-dim
# unit-scale vectors; a small-norm embedding could see a decimal-vs-
# double discrepancy past a fixed margin and be silently dropped from
# the graded brute path). Derived per ROW instead: DECIMAL(12,7)
# rounds each component within half an ulp, ε = 5e-8, so
#   |dot_dec − dot_dbl| ≤ ε·(Σ|aᵢ| + Σ|bᵢ|) + d·ε²
# and with Σ|aᵢ| ≤ √d·‖a‖ (Cauchy–Schwarz), dividing by the SHARED
# denominator ‖a‖‖b‖ (identical in both folds, so it cancels in the
# difference):
#   |cos_dec − cos_dbl| ≤ ε·√d·(1/‖a‖ + 1/‖b‖) + d·ε²/denom
# The double fold's own rounding adds ≤ d·2⁻⁵²·‖a‖‖b‖/denom ≈ 1.4e-14
# at d=64. A 4× safety factor plus a 1e-12 absolute floor covers both
# tail terms with orders of magnitude to spare. The filter only ever
# DISCARDS pairs the decimal threshold would also discard.
_DEC_EPS = 5e-8


def _prefilter_margin() -> Column:
    d = F.size("e_a").cast("double")
    inv_norms = F.lit(1.0) / F.sqrt("n_a") + F.lit(1.0) / F.sqrt("n_b")
    return F.lit(4.0 * _DEC_EPS) * F.sqrt(d) * inv_norms + F.lit(1e-12)


def _exact_cosine(pairs: DataFrame, threshold: float) -> DataFrame:
    """Exact decimal cosine on (vec_a, vec_b, e_a, e_b, n_a, n_b) rows.
    Shared by both strategies so LSH only ever PRUNES — any pair it
    reports carries the identical value the brute form would emit.

    Two-phase verify: a cheap double cosine with a row-adaptive
    conservative margin discards the low-similarity mass first (the
    decimal fold is ~5× the cost of the double one — measured 18 s →
    4 s on the sf0.1 LSH path), then the decimal-exact value is
    computed only for survivors and applies the REAL threshold. Output
    is identical to a decimal-only pass by the margin argument above."""
    denom = F.sqrt("n_a") * F.sqrt("n_b")
    rough = _dot_dbl(F.col("e_a"), F.col("e_b")) / denom
    cos = _dot_dec(F.col("e_a"), F.col("e_b")) / denom
    return (
        pairs.where(rough >= F.lit(threshold) - _prefilter_margin())
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def neardup_embed_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    strategy: str = "brute",
    n_planes: int = DEFAULT_N_PLANES,
    bands: int = DEFAULT_PLANE_BANDS,
    vec: str = "embedding",
    id_col: str = "vec_id",
    persist: bool = False,
) -> DataFrame:
    """All vector pairs (vec_a < vec_b) with cosine ≥ threshold.

    - ``strategy="brute"``: all-pairs non-equi self-join — O(n²), the
      oracle-checkable form behind the registered ``q_neardup_embed``.
    - ``strategy="lsh"``: sign-plane (random-hyperplane) LSH. Each
      vector is projected onto ``n_planes`` fixed ±1 hyperplanes; the
      sign bits are banded exactly like the MinHash path in
      operators/dedup.py, candidates come from a (band, band_hash)
      equi-join — the only shuffle keys are narrow band buckets, never
      the n² pair space — and every candidate is exact-verified, so the
      output is a subset-guarantee away from brute (quantified above).

    Scale honesty (measured on the sf0.01 fixture, 2026-08): the LSH
    path targets the NEAR-DUP regime, threshold ≳ 0.9. At the
    registered query's fixture-tuned θ=0.4, no sublinear scheme can be
    exact on this data: the 59 qualifying pairs sit at cosine
    0.40–0.51 where the per-plane match probability is only ~0.63 (vs
    0.5 for orthogonal pairs), and label-IVF blocking is worse — the
    fixture's label clusters have angular radii of 92–107° and 54/59
    qualifying pairs CROSS labels, so triangle-inequality pruning
    keeps 100% of the pair space. Low-threshold pairwise similarity at
    100 TB is served by the bounded-k ANN path (``topk_cosine``), not
    an all-pairs join; the LSH strategy here is the 100 TB path for
    deduplication thresholds.

    ``persist``: cache the band-row table referenced on both sides of
    the candidate self-join (halves signature work). Default False —
    zero cache residue for library callers; the bench opts in.

    The plane matrix needs the embedding dimensionality, read from one
    row (a 1-row driver action, same class as the watermark max).
    """
    base = with_sq_norm(emb, vec).select(
        F.col(id_col).alias("vid"), F.col(vec).alias("e"), "sq_norm"
    )
    a = base.select(
        F.col("vid").alias("vec_a"), F.col("e").alias("e_a"), F.col("sq_norm").alias("n_a")
    )
    b = base.select(
        F.col("vid").alias("vec_b"), F.col("e").alias("e_b"), F.col("sq_norm").alias("n_b")
    )

    if strategy == "brute":
        return _exact_cosine(a.join(b, F.col("vec_a") < F.col("vec_b")), threshold)

    if strategy != "lsh":
        raise ValueError(f"unknown strategy: {strategy!r}")

    r = n_planes // bands
    if r * bands != n_planes:
        raise ValueError("n_planes must be divisible by bands")
    if r > 63:
        raise ValueError("rows-per-band must fit a bigint bitmask")

    spark = emb.sparkSession
    first = emb.select(vec).first()
    dim = len(first[0]) if first is not None else 0
    planes = spark.createDataFrame(
        _rademacher_planes(dim, n_planes), "plane_id int, sign array<double>"
    )

    # Projection sign bits: one row per (vector, plane) via a broadcast
    # cross join with the tiny plane matrix (n_planes rows), folded
    # JVM-side. The per-row fold order inside F.aggregate is fixed
    # sequential, so the sign is retry-deterministic.
    dot = F.aggregate(
        F.zip_with(F.col("e"), F.col("sign"), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    band_rows = (
        base.select("vid", "e")
        .crossJoin(F.broadcast(planes))
        .withColumn("dot", dot)
        .select(
            "vid",
            F.expr(f"plane_id div {r}").alias("band"),
            F.expr(f"shiftleft(CAST(dot >= 0.0d AS BIGINT), plane_id % {r})").alias("bv"),
        )
        .groupBy("vid", "band")
        .agg(F.sum("bv").alias("bh"))
    )
    if persist:
        band_rows = persist_once(band_rows)

    ca = band_rows.select(F.col("vid").alias("vec_a"), "band", "bh")
    cb = band_rows.select(F.col("vid").alias("vec_b"), "band", "bh")
    candidates = (
        ca.join(cb, ["band", "bh"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    pairs = candidates.join(a, "vec_a").join(b, "vec_b")
    return _exact_cosine(pairs, threshold)


# ---------------------------------------------------------------------------
# K-means training for the IVF index (closes label_centroids' caveat:
# "a production build would k-means them")
# ---------------------------------------------------------------------------
def with_kmeans_labels(
    emb: DataFrame,
    centroids: DataFrame,
    vec: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Attach each vector's nearest-centroid label (max cosine).

    Cosine is scale-invariant in the centroid, so ranking by
    ``dot(v, c) / |c|`` needs no |v| term; ties break to the lowest
    label, making assignment fully deterministic. One broadcast of the
    k-row centroid table; the n×k scored rows reduce through a
    partial+final max — no shuffle wider than the input.
    """
    if label_col in emb.columns:
        raise ValueError(f"{label_col!r} already exists on the input")
    cents = centroids.select(
        F.col("label").alias("__cl"),
        F.col("centroid").alias("__c"),
        F.sqrt(_dot_dbl(F.col("centroid"), F.col("centroid"))).alias("__cnorm"),
    )
    scored = emb.crossJoin(F.broadcast(cents)).withColumn(
        "__sim", _dot_dbl(F.col(vec).cast("array<double>"), F.col("__c")) / F.col("__cnorm")
    )
    # argmax via max(struct(sim, -label)): greatest sim, then least label.
    best = (
        scored.groupBy(*emb.columns)
        .agg(F.max(F.struct(F.col("__sim"), (-F.col("__cl")).alias("__nl"))).alias("__b"))
        .withColumn(label_col, (-F.col("__b.__nl")).cast("int"))
        .drop("__b")
    )
    return best


def kmeans_centroids(
    emb: DataFrame,
    k: int = 10,
    iters: int = 8,
    vec: str = "embedding",
    id_col: str = "vec_id",
    init: str = "farthest",
) -> DataFrame:
    """Deterministic Lloyd's k-means over an embedding column.

    Returns (label int, centroid array<double>) — a drop-in for
    ``label_centroids`` output, so ``topk_cosine(strategy="ivf")``
    probes a TRAINED index instead of trusting a label column.

    Determinism doctrine applied to training:
    - init: farthest-first traversal (Gonzalez) — the min-md5(id)
      vector seeds the set, then each next seed is the vector whose
      best cosine to any chosen seed is LOWEST (ties → lowest id). A
      pure random draw of k seeds almost never covers k well-separated
      clusters (coupon-collector: ~0.04% for k=10), and Lloyd's cannot
      split a collapsed pair; farthest-first provably picks one seed
      per cluster when clusters are separated. k driver round-trips of
      one row each, O(k·n·dim) total — standard offline-training init.
      ``init="md5"`` (the pq_train option, r9): seed with the k
      lowest-md5(id) vectors in ONE job — O(n) instead of O(k·n·dim),
      for large-k builds where seed quality is amortized away by the
      Lloyd iterations or irrelevant to what's being measured
      (scale-curve timings, ADC probes). Equally deterministic;
    - assignment: per-row double fold (sequential, fixed order) with
      label-ascending tie-breaks;
    - update: mean_q40 per (cluster, dimension) — order-independent
      quantized means, so the trained centroids are bit-identical
      under ANY partitioning (asserted in tests);
    - fixed ``iters`` (no data-dependent convergence test), empty
      clusters keep their previous centroid.

    The driver holds only the k×dim centroid matrix between iterations
    (index metadata, not data-scale); each iteration is one broadcast
    cross-score + one partial+final aggregate over the corpus —
    O(n·k·dim) work, the canonical offline-training cost.
    """
    if init not in ("farthest", "md5"):
        raise ValueError(f"unknown init: {init!r}")
    spark = emb.sparkSession
    base = emb.select(
        F.col(id_col).cast("string").alias("sid"),
        F.col(vec).cast("array<double>").alias("v"),
    )
    if init == "md5":
        seeds = (
            base.withColumn("h", F.md5("sid")).orderBy("h", "sid").limit(k).collect()
        )
        chosen = [[float(x) for x in r.v] for r in seeds]
    else:
        first = (
            base.withColumn("h", F.md5("sid")).orderBy("h", "sid").limit(1).collect()[0]
        )
        chosen = [[float(x) for x in first.v]]
        for _ in range(k - 1):
            cdf = spark.createDataFrame(
                [(i, c) for i, c in enumerate(chosen)],
                "label int, centroid array<double>",
            ).select(
                "centroid",
                F.sqrt(_dot_dbl(F.col("centroid"), F.col("centroid"))).alias("cn"),
            )
            sim = _dot_dbl(F.col("v"), F.col("centroid")) / (
                F.sqrt(_dot_dbl(F.col("v"), F.col("v"))) * F.col("cn")
            )
            far = (
                base.crossJoin(F.broadcast(cdf))
                .groupBy("sid", "v")
                .agg(F.max(sim).alias("best"))
                .orderBy(F.col("best").asc(), F.col("sid").asc())
                .limit(1)
                .collect()[0]
            )
            chosen.append([float(x) for x in far.v])
    cents = list(enumerate(chosen))
    for _ in range(iters):
        cdf = spark.createDataFrame(cents, "label int, centroid array<double>")
        assigned = with_kmeans_labels(
            emb.select(id_col, vec), cdf, vec=vec, label_col="__km"
        ).select(F.col("__km").alias("label"), F.col(vec))
        got = {
            r.label: [float(x) for x in r.centroid]
            for r in label_centroids(assigned, vec=vec).collect()
        }
        cents = [(i, got.get(i, c)) for i, c in cents]
    return spark.createDataFrame(cents, "label int, centroid array<double>")


def semdedup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    k: int | None = None,
    iters: int = 4,
    vec: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    max_cluster_size: int | None = None,
    on_oversize: str = "raise",
    salt_buckets: int = 8,
) -> DataFrame:
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", arXiv:2303.09540):
    k-means buckets the embedding space, pairwise exact cosine runs
    ONLY within each cluster. The third near-dup strategy beside brute
    and sign-plane LSH (``neardup_embed_pairs``), with a different
    recall contract: LSH recall decays smoothly with the angular gap
    per band; SemDeDup misses exactly the pairs that straddle a
    cluster boundary (the paper's stated tradeoff) and examines
    Σ_b n_b(n_b−1)/2 candidates — sublinear in n² whenever the
    clustering spreads mass across buckets.

    EXACT duplicates are found with probability 1 regardless of
    clustering quality: identical vectors score identically against
    every centroid, and ``with_kmeans_labels``' deterministic argmax
    (max(struct(sim, −label))) assigns them the same cluster —
    asserted in tests.

    Pair generation reuses ``blocked_pairs`` with the cluster label as
    the block key, so the ER skew discipline applies verbatim: a giant
    cluster (one template embedding crawled 10⁷ times) trips the
    ``max_cluster_size`` tripwire, and ``on_oversize="salt"`` splits
    its pair triangle LOSSLESSLY across salt_buckets² reducers
    (measured 0.20× on a manufactured hot block — SCALE.md r8).
    Verified pairs carry the same decimal-quantized cosine as the
    brute/LSH forms (shared ``_exact_cosine``), so every pair SemDeDup
    reports hash-matches what brute would emit for it.

    Training (``kmeans_centroids``) is the documented offline step —
    k + iters driver round-trips over index metadata, never data-scale
    rows; pass precomputed ``centroids`` to skip it (the production
    shape: train once, dedup many batches).

    ``k=None`` (the default) derives k from the corpus: ``max(8,
    isqrt(n))`` — the paper's k ≈ √n-or-larger regime. The r9 scale
    curve (SCALE.md, tests/semdedup_scale_curve.py) measured what the
    geometry predicts: at FIXED k the within-bucket candidate volume
    Σ n_b(n_b−1)/2 grows superlinearly (2× data cost 2.33×, 4× cost
    3.81×), while k ∝ n holds bucket sizes and restores near-linear
    (1.77×/2.28×) — so a fixed default is exactly the mistake the
    ``max_cluster_size`` tripwire refuses loudly, and the operator no
    longer ships one. Pass an explicit ``k`` for reproducibility (the
    registered ``q_semdedup`` pins k=8 against a frozen oracle). The
    extra ``emb.count()`` is one cheap job against a frame the
    training step is about to scan k·iters times anyway.
    """
    import math

    from .blocking import blocked_pairs

    if centroids is None:
        if k is None:
            n = emb.count()
            k = max(8, math.isqrt(max(int(n), 1)))
        centroids = kmeans_centroids(
            emb, k=k, iters=iters, vec=vec, id_col=id_col
        )
    labeled = with_kmeans_labels(
        emb.select(id_col, vec), centroids, vec=vec, label_col="__sd"
    )
    base = with_sq_norm(labeled, vec).select(
        F.col(id_col).alias("vid"), F.col(vec).alias("e"), "sq_norm", "__sd"
    )
    pairs = blocked_pairs(
        base,
        "vid",
        F.col("__sd"),
        attrs=["e", "sq_norm"],
        max_block_size=max_cluster_size,
        on_oversize=on_oversize,
        salt_buckets=salt_buckets,
    ).select(
        F.col("k_a").alias("vec_a"),
        F.col("k_b").alias("vec_b"),
        "e_a",
        "e_b",
        F.col("sq_norm_a").alias("n_a"),
        F.col("sq_norm_b").alias("n_b"),
    )
    return _exact_cosine(pairs, threshold)


def topk_cosine(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    strategy: str = "brute",
    nprobe: int = 3,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Top-k nearest corpus vectors per query vector, by cosine.

    ``emb``: (vec_id, embedding, label); ``queries``: (qid, q_emb).
    Returns (qid, vec_id, cosine, rnk) with rnk 1..k, self-matches
    excluded, ties broken by vec_id.

    ``centroids``: optional prebuilt (label, centroid) table for the
    IVF path. In production the index is trained offline and probes are
    online — passing a persisted centroid table here skips the
    per-query-batch training scan (the bench measures probe-only cost
    this way). ``None`` trains from ``emb`` inline.
    """
    corpus = with_sq_norm(emb).select(
        "vec_id", "label", F.col("embedding").alias("c_emb"), F.col("sq_norm").alias("c_n2")
    )
    q = queries.select(
        "qid", "q_emb", _sq_norm_dec(F.col("q_emb")).alias("q_n2")
    )

    if strategy == "ivf":
        cents = centroids if centroids is not None else label_centroids(emb)
        # Rank centroids per query by cosine (same exact math), keep
        # the nprobe closest labels, then search only those lists.
        qc = q.crossJoin(F.broadcast(cents)).withColumn(
            "c_sim",
            _dot_dec(F.col("q_emb"), F.col("centroid").cast("array<double>"))
            / (F.sqrt("q_n2") * F.sqrt(_sq_norm_dec(F.col("centroid").cast("array<double>")))),
        )
        wq = Window.partitionBy("qid").orderBy(F.desc("c_sim"), "label")
        probes = (
            qc.withColumn("crnk", F.row_number().over(wq))
            .where(F.col("crnk") <= nprobe)
            .select("qid", "q_emb", "q_n2", "label")
        )
        joined = probes.join(corpus, "label")
    elif strategy == "brute":
        joined = q.crossJoin(corpus)
    else:
        raise ValueError(f"unknown strategy: {strategy!r}")

    scored = joined.where(F.col("qid") != F.col("vec_id")).withColumn(
        "cosine",
        _dot_dec(F.col("q_emb"), F.col("c_emb"))
        / (F.sqrt("q_n2") * F.sqrt("c_n2")),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("qid", "vec_id", "cosine", "rnk")
    )
