"""Salting operators must be result-identical to the unsalted forms
on a deliberately skewed dataset (one key holds 90% of rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 is the hot key: 9000 of 10000 rows.
    hot = spark.range(9000).select(
        F.lit(0).alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    rest = spark.range(1000).select(
        (F.col("id") % 50 + 1).alias("k"), (F.col("id") % 89).cast("double").alias("v")
    )
    return hot.unionByName(rest)


def test_salted_agg_equals_plain(spark, skewed):
    plain = {
        (r.k): (r.n, r.sum_val)
        for r in skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).cast("decimal(20,2)").alias("sum_val"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.n, r.sum_val) for r in salted_agg(skewed, ["k"], "v").collect()
    }
    assert salted == plain
    assert plain[0][0] == 9000  # the hot key really is hot


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.range(51).select(
        F.col("id").alias("dk"), F.concat(F.lit("d"), F.col("id")).alias("dname")
    )
    plain = sorted(
        (r.k, r.v, r.dname)
        for r in skewed.join(dim, skewed.k == dim.dk).select("k", "v", "dname").collect()
    )
    salted = sorted(
        (r.k, r.v, r.dname)
        for r in salted_join(skewed, dim, "k", "dk").select("k", "v", "dname").collect()
    )
    assert salted == plain
    assert len(plain) == 10000  # every row matched exactly once
