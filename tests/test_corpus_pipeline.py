"""End-to-end corpus build: stage composition, determinism, contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.corpus import build_corpus
from salesforce_postgresql_etl_spark.operators.clustering import dedup_clusters
from salesforce_postgresql_etl_spark.operators.dedup import neardup_pairs
from salesforce_postgresql_etl_spark.operators.repetition import repetition_profile
from salesforce_postgresql_etl_spark.sources import load

from .conftest import SF_DIR_TINY


def _docs(spark):
    return load(spark, SF_DIR_TINY, "documents")


def test_stage_counts_monotone(spark):
    d = _docs(spark)
    bench = d.where(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    train = d.where(F.col("doc_id") % 50 != 0)
    r = build_corpus(train, benchmark=bench)
    s = r.stats
    assert (
        s["input"]
        >= s["after_quality"]
        >= s["after_dedup"]
        >= s["after_decontam"]
        == s["output"]
        > 0
    )


def test_output_docs_pass_every_gate(spark):
    d = _docs(spark)
    r = build_corpus(d)
    out_ids = {x.doc_id for x in r.docs.select("doc_id").collect()}
    # quality: every surviving doc has keep=1
    prof = {
        x.doc_id: x.keep for x in repetition_profile(d).collect()
    }
    assert all(prof[i] == 1 for i in out_ids)
    # dedup: no surviving doc is a non-canonical cluster member of the
    # pair graph over the quality-gated set
    gated = d.join(
        spark.createDataFrame(
            [(i,) for i, k in prof.items() if k == 1], "doc_id long"
        ),
        "doc_id",
    )
    losers = {
        x.doc_id
        for x in dedup_clusters(
            neardup_pairs(gated, threshold=0.5).select("doc_a", "doc_b")
        )
        .where(F.col("is_canonical") == 0)
        .collect()
    }
    assert not (out_ids & losers)


def test_split_is_total_and_deterministic(spark):
    d = _docs(spark)
    r1 = build_corpus(d)
    r2 = build_corpus(d)
    rows1 = sorted((x.doc_id, x.split) for x in r1.docs.collect())
    rows2 = sorted((x.doc_id, x.split) for x in r2.docs.collect())
    assert rows1 == rows2
    assert {s for _, s in rows1} <= {"train", "val", "test"}
    assert all(s is not None for _, s in rows1)


def test_no_benchmark_skips_decontam(spark):
    r = build_corpus(_docs(spark))
    assert "after_decontam" not in r.stats
    assert r.stats["output"] == r.stats["after_dedup"]
