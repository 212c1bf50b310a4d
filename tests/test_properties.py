"""Property-based spot checks (SURVEY.md §5.2.4) — hypothesis drives
small generated inputs through the real operators on Spark.

Kept deliberately small (max_examples) since each example pays a Spark
job; the properties target algebraic laws the differential can't see.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.operators.dedup import neardup_pairs

_settings = settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_word = st.sampled_from("alpha beta gamma delta epsilon zeta".split())
_doc = st.lists(_word, min_size=1, max_size=12).map(" ".join)


@given(docs=st.lists(_doc, min_size=2, max_size=6))
@_settings
def test_dedup_hash_idempotent(spark, docs):
    # dedup(dedup(x)) == dedup(x): grouping by content hash once removes
    # every duplicate — a second pass must be the identity.
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    once = (
        df.withColumn("h", F.md5(F.lower(F.trim("text"))))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    twice = once.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(docs=st.lists(_doc, min_size=2, max_size=5))
@_settings
def test_jaccard_bounds_and_self_similarity(spark, docs):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    pairs = neardup_pairs(df, threshold=0.0, strategy="brute").collect()
    for r in pairs:
        assert 0.0 <= r.jaccard <= 1.0
        assert r.doc_a < r.doc_b
    # identical docs ⇒ jaccard exactly 1
    dup = spark.createDataFrame(
        [(0, docs[0]), (1, docs[0])], "doc_id long, text string"
    )
    [r] = neardup_pairs(dup, threshold=0.0, strategy="brute").collect()
    assert r.jaccard == 1.0


@given(
    xs=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=20),
    ys=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=20),
)
@_settings
def test_union_all_count_additivity(spark, xs, ys):
    a = spark.createDataFrame([(x,) for x in xs], "v int")
    b = spark.createDataFrame([(y,) for y in ys], "v int")
    assert a.unionByName(b).count() == len(xs) + len(ys)
