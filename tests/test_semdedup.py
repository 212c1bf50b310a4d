"""SemDeDup (operators/simsearch.py::semdedup_pairs) contracts.

The strategy's value is Σ n_b(n_b−1)/2 candidates instead of n(n−1)/2;
its honesty requirements are (a) any pair it reports is EXACTLY what
brute would report (shared _exact_cosine, decimal-quantized), (b) the
cluster-straddle recall loss is pinned as a fact, not hidden behind a
friendly fixture, and (c) exact duplicates can never straddle — the
deterministic argmax assigns identical vectors identical labels.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.operators.simsearch import (
    kmeans_centroids,
    neardup_embed_pairs,
    semdedup_pairs,
    with_kmeans_labels,
)
from salesforce_postgresql_etl_spark.sources import load

from .conftest import SF_DIR_TINY

THETA = 0.9


def _union_corpus(spark):
    emb = load(spark, SF_DIR_TINY, "embeddings").select("vec_id", "embedding")
    return emb.unionByName(
        emb.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_semdedup_equals_brute_on_dedup_fixture(spark):
    """At θ=0.9 over the union corpus the qualifying pairs are the
    planted exact duplicates (organic cosines top out ~0.51), every
    one lands within a cluster, and the cosine column is bit-equal."""
    corpus = _union_corpus(spark)
    sd = _rows(semdedup_pairs(corpus, threshold=THETA, k=8, iters=4))
    brute = _rows(neardup_embed_pairs(corpus, threshold=THETA, strategy="brute"))
    assert sd == brute
    assert len(sd) == corpus.count() // 2  # one pair per planted dup


def test_exact_duplicates_share_cluster(spark):
    """Identical vectors score identically against every centroid; the
    deterministic argmax must give them the same label — the
    probability-1 guarantee the registered query leans on."""
    corpus = _union_corpus(spark)
    cents = kmeans_centroids(corpus, k=8, iters=4)
    lab = with_kmeans_labels(corpus, cents, label_col="lb")
    a = lab.where(F.col("vec_id") < 10000).select(
        F.col("vec_id").alias("i"), F.col("lb").alias("lb_a")
    )
    b = lab.where(F.col("vec_id") >= 10000).select(
        (F.col("vec_id") - 10000).alias("i"), F.col("lb").alias("lb_b")
    )
    mism = a.join(b, "i").where(F.col("lb_a") != F.col("lb_b")).count()
    assert mism == 0


def test_candidate_pruning_is_genuine(spark):
    """The clustering must actually spread mass: Σ n_b(n_b−1)/2 over
    trained buckets is well below the brute n(n−1)/2 — otherwise the
    strategy is brute with extra steps."""
    corpus = _union_corpus(spark)
    n = corpus.count()
    cents = kmeans_centroids(corpus, k=8, iters=4)
    lab = with_kmeans_labels(corpus, cents, label_col="lb")
    sizes = [r.c for r in lab.groupBy("lb").agg(F.count("*").alias("c")).collect()]
    cand = sum(c * (c - 1) // 2 for c in sizes)
    assert cand < n * (n - 1) // 2 / 2  # at least 2x pruning on the fixture


def _straddle_fixture(spark):
    """Two tight groups on the axes plus a qualifying pair that leans
    across them: cos(v1, v2) = 0.96 ≥ θ, but v1 is nearest the x-axis
    centroid and v2 the y-axis one."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(5)]
    rows += [(10 + i, [0.0, 1.0, 0.0, 0.0]) for i in range(5)]
    rows += [(100, [0.8, 0.6, 0.0, 0.0]), (101, [0.6, 0.8, 0.0, 0.0])]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cluster_straddle_recall_pinned(spark):
    """The paper's tradeoff, pinned: with the axis centroids given,
    the (100, 101) pair straddles clusters and is MISSED, while brute
    finds it; everything SemDeDup does report is in brute. With k=1
    (everything one bucket) the miss disappears — the loss is the
    bucketing, never the verify."""
    emb = _straddle_fixture(spark)
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "label int, centroid array<double>",
    )
    sd = _rows(semdedup_pairs(emb, threshold=THETA, centroids=cents))
    brute = _rows(neardup_embed_pairs(emb, threshold=THETA, strategy="brute"))
    sd_pairs = {(r[0], r[1]) for r in sd}
    brute_pairs = {(r[0], r[1]) for r in brute}
    assert (100, 101) in brute_pairs
    assert (100, 101) not in sd_pairs
    assert sd_pairs < brute_pairs  # strict subset, nothing invented
    one = spark.createDataFrame(
        [(0, [1.0, 1.0, 0.0, 0.0])], "label int, centroid array<double>"
    )
    assert _rows(semdedup_pairs(emb, threshold=THETA, centroids=one)) == brute


def test_salt_split_identical(spark):
    """The ER salt machinery rides along: capping cluster size with
    on_oversize='salt' must not change the pair set (lossless)."""
    corpus = _union_corpus(spark)
    plain = _rows(semdedup_pairs(corpus, threshold=THETA, k=8, iters=4))
    salted = _rows(
        semdedup_pairs(
            corpus,
            threshold=THETA,
            k=8,
            iters=4,
            max_cluster_size=10,
            on_oversize="salt",
            salt_buckets=4,
        )
    )
    assert plain == salted


def test_oversize_tripwire_fires(spark):
    """A cluster above max_cluster_size with on_oversize='raise' must
    fail loudly before the pair join runs."""
    corpus = _union_corpus(spark)
    with pytest.raises(ValueError, match="block"):
        semdedup_pairs(
            corpus, threshold=THETA, k=2, iters=2,
            max_cluster_size=3, on_oversize="raise",
        ).collect()


def test_kmeans_md5_init_deterministic(spark):
    """init='md5' (the O(n) large-k seeding): bit-identical centroids
    under any partitioning, k rows out, unknown init rejected."""
    corpus = _union_corpus(spark)
    c1 = kmeans_centroids(corpus, k=5, iters=2, init="md5")
    c2 = kmeans_centroids(corpus.repartition(7), k=5, iters=2, init="md5")
    assert sorted(map(tuple, c1.collect())) == sorted(map(tuple, c2.collect()))
    assert c1.count() == 5
    with pytest.raises(ValueError, match="init"):
        kmeans_centroids(corpus, k=2, init="random")


def test_partitioning_invariance(spark):
    """Training, assignment, and verify are all documented
    order-independent — the full output must be bit-identical under
    different input partitionings."""
    corpus = _union_corpus(spark)
    r1 = _rows(semdedup_pairs(corpus.repartition(1), threshold=THETA, k=8, iters=4))
    r7 = _rows(semdedup_pairs(corpus.repartition(7), threshold=THETA, k=8, iters=4))
    assert r1 == r7


def test_auto_k_scales_with_corpus(spark):
    """k=None (the default, r10 — VERDICT r9 #5) derives k =
    max(8, isqrt(n)) so the operator lands on the scale curve's
    near-linear k ∝ n branch instead of the measured-superlinear
    fixed-k one. Pinned two ways: the derived-k run reproduces the
    explicit-k run verbatim (training is deterministic), and the
    training it triggers really builds isqrt(n) centroids when that
    exceeds the floor."""
    import math

    corpus = _union_corpus(spark)
    n = corpus.count()
    want_k = max(8, math.isqrt(n))
    auto = _rows(semdedup_pairs(corpus, threshold=THETA, iters=4))
    explicit = _rows(semdedup_pairs(corpus, threshold=THETA, k=want_k, iters=4))
    assert auto == explicit
    # and on the dedup fixture the auto run still equals brute
    brute = _rows(neardup_embed_pairs(corpus, threshold=THETA, strategy="brute"))
    assert auto == brute
    # the floor engages below 64 rows, isqrt above it
    assert want_k == math.isqrt(n) if n >= 64 else want_k == 8
    cents = kmeans_centroids(corpus, k=want_k, iters=1)
    assert cents.count() == want_k


def test_unimodal_corpus_recall_vs_lsh_control(spark):
    """(r12) The adversarial-skew finding, pinned in-suite on a
    deterministic synthetic: a UNIMODAL cloud (one natural cluster)
    forced through k=8 trained k-means loses split-straddling pairs
    (recall < 1), while the sign-plane LSH twin on the SAME corpus
    finds every brute pair (recall == 1 — its recall is geometry-
    bound, not cluster-bound). Precision stays exact for both. The
    full recall(k) curve lives in tests/semdedup_skew_recall_curve.py;
    the strategy-choice consequence is in SCALE.md r12."""
    import math
    import random

    rng = random.Random(42)
    center = [rng.gauss(0, 1) for _ in range(16)]
    rows = []
    for i in range(150):
        v = [c + rng.gauss(0, 0.15) for c in center]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        rows.append((i, [x / n for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    brute = {
        (r[0], r[1])
        for r in _rows(neardup_embed_pairs(emb, threshold=THETA, strategy="brute"))
    }
    assert len(brute) > 100, "fixture must carry many organic >=theta pairs"

    sd = {
        (r[0], r[1])
        for r in _rows(semdedup_pairs(emb, threshold=THETA, k=8, iters=4))
    }
    assert sd <= brute, "precision break: SemDeDup invented a pair"
    assert len(sd) < len(brute), (
        "k=8 on a unimodal cloud must split the natural cluster and "
        "miss straddling pairs — if this starts passing recall 1.0, "
        "the candidate pruning is no longer genuine"
    )

    lsh = {
        (r[0], r[1])
        for r in _rows(neardup_embed_pairs(emb, threshold=THETA, strategy="lsh"))
    }
    assert lsh == brute, (
        f"LSH control drifted: {len(lsh)}/{len(brute)} pairs — banding "
        f"recall should be ~1.0 at these angular gaps"
    )
