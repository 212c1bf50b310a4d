"""Operator-level tests for repetition filtering, chunking, and
mixture resampling (the registered queries' differential is in
test_differential.py; these pin edge cases and contracts)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.operators.chunking import chunk_documents
from salesforce_postgresql_etl_spark.operators.repetition import repetition_profile
from salesforce_postgresql_etl_spark.operators.sampling import mixture_resample


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestRepetitionProfile:
    def test_counts_by_hand(self, spark):
        # "a b a b a": words a×3 b×2; bigrams "a b"×2 "b a"×2;
        # trigrams "a b a"×2, "b a b"×1 → dup trigram instances = 2.
        row = repetition_profile(_docs(spark, ["a b a b a"])).collect()[0]
        assert (row.n_tok, row.n_bigram, row.n_trigram) == (5, 4, 3)
        assert row.max_word_n == 3
        assert row.top_bigram_n == 2
        assert row.dup_trigram_n == 2
        assert row.keep == 0  # max word 3/5 = 60% > 20%

    def test_diverse_doc_kept(self, spark):
        text = " ".join(f"w{i}" for i in range(30))
        row = repetition_profile(_docs(spark, [text])).collect()[0]
        assert (row.max_word_n, row.top_bigram_n, row.dup_trigram_n) == (1, 1, 0)
        assert row.keep == 1

    def test_single_token_doc(self, spark):
        # n_bigram = n_trigram = 0; greatest(...,1) guards the
        # threshold arithmetic; max word = 100% → dropped.
        row = repetition_profile(_docs(spark, ["only"])).collect()[0]
        assert (row.n_tok, row.n_bigram, row.n_trigram) == (1, 0, 0)
        assert (row.top_bigram_n, row.dup_trigram_n) == (0, 0)
        assert row.keep == 0

    def test_two_token_doc_no_trigrams(self, spark):
        row = repetition_profile(_docs(spark, ["x y"])).collect()[0]
        assert (row.n_bigram, row.n_trigram) == (1, 0)
        assert row.top_bigram_n == 1

    def test_boilerplate_trigram_dropped(self, spark):
        # 4× the same sentence: dup-trigram fraction near 100%.
        text = " ".join(["click here to subscribe now"] * 4)
        row = repetition_profile(_docs(spark, [text])).collect()[0]
        assert row.dup_trigram_n > row.n_trigram // 2
        assert row.keep == 0


class TestChunkDocuments:
    def test_bounds_and_content(self, spark):
        toks = [f"t{i}" for i in range(10)]
        out = chunk_documents(
            _docs(spark, [" ".join(toks)]), window=4, stride=3
        ).orderBy("chunk_id")
        rows = out.collect()
        # starts 0,3,6,9 → lens 4,4,4,1
        assert [(r.chunk_id, r.start_tok, r.n_tok_chunk) for r in rows] == [
            (0, 0, 4), (1, 3, 4), (2, 6, 4), (3, 9, 1),
        ]
        import hashlib
        want = hashlib.md5(" ".join(toks[3:7]).encode()).hexdigest()
        assert rows[1].fp == want

    def test_chunk_count_is_ceil_n_over_stride(self, spark):
        texts = [" ".join(f"w{i}" for i in range(n)) for n in (1, 11, 12, 13, 24)]
        counts = dict(
            chunk_documents(_docs(spark, texts), window=16, stride=12)
            .groupBy("doc_id").count().collect()
        )
        for doc_id, n in enumerate((1, 11, 12, 13, 24)):
            assert counts[doc_id] == math.ceil(n / 12)

    def test_every_token_covered(self, spark):
        # Union of [start, start+len) intervals covers [0, n).
        n = 29
        rows = chunk_documents(
            _docs(spark, [" ".join(f"w{i}" for i in range(n))]),
            window=7, stride=5,
        ).collect()
        covered = set()
        for r in rows:
            covered |= set(range(r.start_tok, r.start_tok + r.n_tok_chunk))
        assert covered == set(range(n))

    def test_bad_stride_raises(self, spark):
        d = _docs(spark, ["a b"])
        with pytest.raises(ValueError):
            chunk_documents(d, window=4, stride=5)
        with pytest.raises(ValueError):
            chunk_documents(d, window=4, stride=0)


class TestMixtureResample:
    def _df(self, spark, n=512, domains=("a", "b", "c")):
        return spark.createDataFrame(
            [(i, domains[i % len(domains)]) for i in range(n)],
            "id long, dom string",
        )

    def test_integer_weight_exact_copies(self, spark):
        out = mixture_resample(
            self._df(spark), "dom", {"a": 2.0, "b": 1.0}, "id"
        )
        per = dict(out.groupBy("dom").count().collect())
        # weight 2 → exactly 2 copies/row; default 0 drops domain c.
        assert per == {"a": 2 * 171, "b": 171}
        assert out.where(F.col("dom") == "a").groupBy("id").count().select(
            F.min("count"), F.max("count")
        ).collect()[0][:] == (2, 2)

    def test_fractional_weight_rate(self, spark):
        out = mixture_resample(
            self._df(spark, n=3000, domains=("a",)), "dom", {"a": 0.5}, "id"
        )
        n = out.count()
        # 128/256 buckets selected; binomial(3000, .5) stays in ±5σ.
        assert abs(n - 1500) < 5 * (3000 * 0.25) ** 0.5

    def test_copy_ids_are_1_to_n(self, spark):
        out = mixture_resample(
            self._df(spark), "dom", {"a": 2.5}, "id"
        )
        agg = out.groupBy("id").agg(
            F.min("copy").alias("lo"), F.max("copy").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        assert agg.where(
            (F.col("lo") != 1) | (F.col("hi") != F.col("n"))
        ).count() == 0
        assert set(r.n for r in agg.collect()) == {2, 3}

    def test_deterministic_across_runs(self, spark):
        d = self._df(spark)
        w = {"a": 1.5, "b": 0.25}
        r1 = sorted(map(tuple, mixture_resample(d, "dom", w, "id").collect()))
        r2 = sorted(map(tuple, mixture_resample(d, "dom", w, "id").collect()))
        assert r1 == r2

    def test_default_weight_applies_to_unlisted(self, spark):
        out = mixture_resample(
            self._df(spark), "dom", {"a": 1.0}, "id", default_weight=1.0
        )
        assert out.count() == 512  # everyone kept exactly once

    def test_negative_weight_raises(self, spark):
        with pytest.raises(ValueError):
            mixture_resample(self._df(spark), "dom", {"a": -0.5}, "id")
