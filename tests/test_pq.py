"""Product quantization: codebook/code contracts, determinism, and
two-stage (ADC shortlist + exact re-rank) recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.operators.pq import pq_encode, pq_topk, pq_train
from salesforce_postgresql_etl_spark.operators.simsearch import topk_cosine
from salesforce_postgresql_etl_spark.sources import load

from .conftest import SF_DIR_TINY

M, K = 8, 16


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, SF_DIR_TINY, "embeddings")


@pytest.fixture(scope="module")
def codebooks(spark, emb):
    # One training run shared across the module (the expensive step —
    # farthest-first init is m·(k-1) one-row driver jobs by design).
    return pq_train(emb, m=M, k=K, iters=2).cache()


@pytest.fixture(scope="module")
def codes(emb, codebooks):
    return pq_encode(emb, codebooks).cache()


def test_codebook_shape(codebooks):
    rows = codebooks.collect()
    assert len(rows) == M * K
    assert {(r.sub, r.code) for r in rows} == {
        (s, c) for s in range(M) for c in range(K)
    }
    assert all(len(r.centroid) == 64 // M for r in rows)


def test_codes_shape_and_norms(emb, codes):
    rows = codes.collect()
    assert len(rows) == emb.count()
    for r in rows[:100]:
        assert len(r.codes) == M
        assert all(0 <= c < K for c in r.codes)
        assert r.norm > 0


def test_encode_partition_independent(emb, codebooks, codes):
    # Same doctrine as kmeans_centroids: codes must be bit-stable
    # under ANY partitioning of the input.
    again = pq_encode(emb.repartition(13), codebooks)
    a = {r.vec_id: (tuple(r.codes), r.norm) for r in codes.collect()}
    b = {r.vec_id: (tuple(r.codes), r.norm) for r in again.collect()}
    assert a == b


def _queries(emb):
    return emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )


def test_rerank_recall(emb, codebooks, codes):
    # Two-stage search: ADC shortlist (20% of this corpus) + exact
    # re-rank. The fixture embeddings are near-isotropic (same-label
    # cosine ~0.1 — the hard case for ANY quantizer), so the bar is
    # recall, not exactness; everything is deterministic, observed
    # 0.97 at this config.
    q = _queries(emb)
    brute = {(r.qid, r.vec_id) for r in topk_cosine(emb, q, k=3).collect()}
    got = {
        (r.qid, r.vec_id)
        for r in pq_topk(
            codes, codebooks, q, k=3, rerank_with=emb, shortlist=100
        ).collect()
    }
    assert len(got & brute) / len(brute) >= 0.9


def test_rerank_scores_are_exact_cosine(emb, codebooks, codes):
    # Re-ranked scores must be the TRUE cosine for the pairs kept —
    # spot-check against topk_cosine where the pair overlaps. The
    # reference scores come from the decimal-exact fold, the re-rank
    # from double folds: agreement is bounded by the decimal
    # quantization step (~1e-7 observed), not bit equality.
    q = _queries(emb)
    brute = {
        (r.qid, r.vec_id): float(r.cosine)
        for r in topk_cosine(emb, q, k=3).collect()
    }
    for r in pq_topk(
        codes, codebooks, q, k=3, rerank_with=emb, shortlist=100
    ).collect():
        if (r.qid, r.vec_id) in brute:
            assert abs(float(r.score) - brute[(r.qid, r.vec_id)]) < 1e-6


def test_adc_only_beats_chance(emb, codebooks, codes):
    # Raw ADC (no re-rank) on isotropic data keeps SOME signal;
    # random top-3 of 500 would hit ~0.6%.
    q = _queries(emb)
    brute = {(r.qid, r.vec_id) for r in topk_cosine(emb, q, k=3).collect()}
    got = {
        (r.qid, r.vec_id)
        for r in pq_topk(codes, codebooks, q, k=3).collect()
    }
    assert len(got) == len(brute) == 30
    assert len(got & brute) / len(brute) > 0.03


def test_dim_not_divisible_raises(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m=7, k=4, iters=1)


def test_md5_init_same_contracts(spark, emb):
    # The fast init used by timing builds obeys the same shape and
    # determinism contracts as farthest-first.
    cb = pq_train(emb, m=4, k=8, iters=1, init="md5")
    assert cb.count() == 32
    codes1 = pq_encode(emb, cb)
    codes2 = pq_encode(emb.repartition(7), cb)
    assert sorted(map(repr, codes1.collect())) == sorted(
        map(repr, codes2.collect())
    )


def test_unknown_init_raises(spark, emb):
    with pytest.raises(ValueError, match="unknown init"):
        pq_train(emb, m=4, k=8, iters=1, init="random")
