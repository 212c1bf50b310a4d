"""Merkle-bucket reconciliation: in-sync empties, drift classification."""

from __future__ import annotations

from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.operators.reconcile import (
    reconcile_keys,
    table_digest,
)
from salesforce_postgresql_etl_spark.sources import load

from .conftest import SF_DIR_TINY


def test_in_sync_is_empty(spark):
    o = load(spark, SF_DIR_TINY, "orders")
    assert reconcile_keys(o, o, "o_orderkey").count() == 0


def test_digest_is_bucket_sized(spark):
    o = load(spark, SF_DIR_TINY, "orders")
    d = table_digest(o, "o_orderkey", n_buckets=64)
    assert d.count() <= 64
    assert d.agg(F.sum("n")).collect()[0][0] == o.count()


def test_drift_classification(spark):
    o = load(spark, SF_DIR_TINY, "orders")
    # b: drop keys %101==0, change price %97==0, add a synthetic key
    b = (
        o.where(F.col("o_orderkey") % 101 != 0)
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 97 == 0, F.col("o_totalprice") + 1.0)
            .otherwise(F.col("o_totalprice")),
        )
        .unionByName(o.limit(1).withColumn("o_orderkey", F.lit(999_999_999)))
    )
    got = {r.o_orderkey: r.status for r in reconcile_keys(o, b, "o_orderkey").collect()}
    keys = [r.o_orderkey for r in o.select("o_orderkey").collect()]
    want = {k: "missing_in_b" for k in keys if k % 101 == 0}
    want |= {k: "changed" for k in keys if k % 101 != 0 and k % 97 == 0}
    want[999_999_999] = "missing_in_a"
    assert got == want
    assert len(want) > 0


def test_column_order_does_not_matter(spark):
    # _row_hash sorts column names, so a physically reordered sink
    # still reconciles clean.
    o = load(spark, SF_DIR_TINY, "orders")
    reordered = o.select(*sorted(o.columns, reverse=True))
    assert reconcile_keys(o, reordered, "o_orderkey").count() == 0
