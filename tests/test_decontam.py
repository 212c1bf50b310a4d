"""Decontamination strategy switch: broadcast ≡ shuffle, auto resolves by size."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.operators.decontam import (
    contamination_overlap,
    resolve_strategy,
)


@pytest.fixture(scope="module")
def tri(spark, sf_dir):
    from salesforce_postgresql_etl_spark.queries.corpus_q import _trigrams
    from salesforce_postgresql_etl_spark.sources import load

    d = load(spark, sf_dir, "documents")
    t = (
        d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
        .select("doc_id", F.explode(_trigrams()).alias("g"))
    )
    bench = t.where(F.col("doc_id") % 50 == 0).select("g")
    train = t.where(F.col("doc_id") % 50 != 0)
    return train, bench


def _rows(df):
    return sorted((r.doc_id, r.n_overlap) for r in df.collect())


def test_broadcast_equals_shuffle(tri):
    train, bench = tri
    b = _rows(contamination_overlap(train, bench, strategy="broadcast"))
    s = _rows(contamination_overlap(train, bench, strategy="shuffle"))
    assert b == s
    assert len(b) > 0


def test_physical_operator_choice(tri):
    train, bench = tri
    b_plan = (
        contamination_overlap(train, bench, strategy="broadcast")
        ._jdf.queryExecution().executedPlan().toString()
    )
    s_plan = (
        contamination_overlap(train, bench, strategy="shuffle")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in b_plan
    assert "BroadcastHashJoin" not in s_plan
    assert "ShuffledHashJoin" in s_plan


def test_auto_resolves_by_bench_size(spark, tri):
    train, bench = tri
    assert resolve_strategy(bench.select("g").distinct()) == "broadcast"
    # a tiny threshold forces the bounded count past the cap → shuffle
    assert resolve_strategy(bench.select("g").distinct(), broadcast_max_rows=5) == "shuffle"
    a = _rows(contamination_overlap(train, bench, strategy="auto", broadcast_max_rows=5))
    b = _rows(contamination_overlap(train, bench, strategy="broadcast"))
    assert a == b


def test_rejects_unknown_strategy(tri):
    train, bench = tri
    with pytest.raises(ValueError):
        contamination_overlap(train, bench, strategy="sort")
