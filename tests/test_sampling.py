"""Dataset-split / sampling operator laws (operators/sampling.py).
The differential already proves Spark ≡ DuckDB row-for-row; these pin
the operator-level properties that make hash-splits production-safe."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.operators.sampling import (
    hash_split,
    hash_split_sql,
    stratified_sample,
)
from salesforce_postgresql_etl_spark.sources import load

from .conftest import SF_DIR

FR = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_disjoint_exhaustive(spark):
    d = load(spark, SF_DIR, "documents").select("doc_id")
    s = hash_split(d, "doc_id", FR)
    # one label per row, no NULLs, nothing outside the label set
    assert s.where(F.col("split").isNull()).count() == 0
    assert s.count() == d.count()
    labels = {r.split for r in s.select("split").distinct().collect()}
    assert labels <= set(FR)


def test_split_fractions_close(spark):
    d = load(spark, SF_DIR, "documents").select("doc_id")
    n = d.count()
    got = {
        r.split: r.c
        for r in hash_split(d, "doc_id", FR).groupBy("split").agg(
            F.count(F.lit(1)).alias("c")
        ).collect()
    }
    for label, frac in FR.items():
        # quantization error ≤ 1/512 + sampling noise (~2% at n=500)
        assert abs(got.get(label, 0) / n - frac) < 0.06, (label, got)


def test_split_stable_under_append(spark):
    # A row's split depends only on its own key: computing the split
    # on HALF the corpus must agree with the full-corpus assignment on
    # every shared key (no reshuffling when data grows).
    d = load(spark, SF_DIR, "documents").select("doc_id")
    full = {r.doc_id: r.split for r in hash_split(d, "doc_id", FR).collect()}
    half = d.where(F.col("doc_id") % 2 == 0)
    for r in hash_split(half, "doc_id", FR).collect():
        assert full[r.doc_id] == r.split


def test_split_seed_changes_assignment(spark):
    d = load(spark, SF_DIR, "documents").select("doc_id")
    a = {r.doc_id: r.split for r in hash_split(d, "doc_id", FR, seed="a").collect()}
    b = {r.doc_id: r.split for r in hash_split(d, "doc_id", FR, seed="b").collect()}
    assert a != b  # different seeds really re-deal the buckets


def test_split_rejects_bad_fractions(spark):
    d = load(spark, SF_DIR, "documents").select("doc_id")
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(d, "doc_id", {"a": 0.5, "b": 0.4})


def test_split_null_keys_get_exactly_one_label(spark):
    """r5 (advisor): md5(NULL) is NULL and every CASE arm evaluates
    NULL, so without the '<null>' coalesce a null-keyed row got
    split = NULL — breaking the disjoint+exhaustive contract. Null
    keys must land in exactly one bucket, identically in both engines."""
    import duckdb

    df = spark.createDataFrame([(None,), ("a",), ("b",), (None,)], "k string")
    s = hash_split(df, "k", FR)
    assert s.count() == 4
    assert s.where(F.col("split").isNull()).count() == 0
    # all NULL keys share one deterministic assignment
    null_splits = {r.split for r in s.where(F.col("k").isNull()).collect()}
    assert len(null_splits) == 1
    # Spark ≡ DuckDB on the null-key arm too (the oracle SQL builder
    # carries the same coalesce)
    sql = hash_split_sql("k", FR)
    expect = sorted(
        duckdb.sql(
            f"SELECT k, {sql} AS split FROM (VALUES (NULL), ('a'), ('b'), (NULL)) t(k)"
        ).fetchall()
    , key=str)
    got = sorted(((r.k, r.split) for r in s.collect()), key=str)
    assert got == expect


def test_stratified_allowlist_and_determinism(spark):
    d = load(spark, SF_DIR, "documents").select("doc_id", "lang")
    fr = {"en": 0.5, "de": 0.25}
    s1 = stratified_sample(d, "lang", fr, "doc_id")
    kept_langs = {r.lang for r in s1.select("lang").distinct().collect()}
    assert kept_langs <= {"en", "de"}  # strata not listed are dropped
    ids1 = sorted(r.doc_id for r in s1.collect())
    ids2 = sorted(r.doc_id for r in stratified_sample(d, "lang", fr, "doc_id").collect())
    assert ids1 == ids2 and len(ids1) > 0
    # kept set is a sub-sample of the stratum, not a prefix of it
    n_en = d.where(F.col("lang") == "en").count()
    n_kept_en = s1.where(F.col("lang") == "en").count()
    assert 0 < n_kept_en < n_en
