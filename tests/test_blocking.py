"""Blocked pair generation: parity with the inline join, hot-block
tripwire, drop/refine responses (r7 — the block-key-skew watch item)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.operators.blocking import blocked_pairs
from salesforce_postgresql_etl_spark.sources import load

from .conftest import SF_DIR_TINY


def _pair_set(df):
    return {(r.k_a, r.k_b) for r in df.collect()}


def test_parity_with_inline_block_join(spark):
    # The operator must produce exactly the pairs the (pre-r7) inline
    # self-join produced on the real customer fixture.
    cust = load(spark, SF_DIR_TINY, "customer").select("c_custkey", "c_name")
    got = blocked_pairs(
        cust, "c_custkey", F.substring("c_name", 1, 16), attrs=["c_name"]
    )
    blocked = cust.withColumn("blk", F.substring("c_name", 1, 16))
    a = blocked.select("blk", F.col("c_custkey").alias("k_a"), F.col("c_name").alias("n_a"))
    b = blocked.select("blk", F.col("c_custkey").alias("k_b"), F.col("c_name").alias("n_b"))
    exp = a.join(b, "blk").where(F.col("k_a") < F.col("k_b"))
    assert _pair_set(got) == _pair_set(exp)
    assert len(_pair_set(got)) > 0
    # attrs ride through correctly: spot-check one pair's names.
    names = {r.c_custkey: r.c_name for r in cust.collect()}
    row = got.limit(1).collect()[0]
    assert (row.c_name_a, row.c_name_b) == (names[row.k_a], names[row.k_b])


def _skewed(spark):
    # One hot block ("HOT") of 12 records + two cold blocks of 2.
    rows = [(i, "HOT", f"v{i}") for i in range(12)]
    rows += [(100, "c1", "x"), (101, "c1", "y"), (200, "c2", "p"), (201, "c2", "q")]
    return spark.createDataFrame(rows, "k long, blk_src string, attr string")


def test_hot_block_tripwire_raises(spark):
    recs = _skewed(spark)
    with pytest.raises(ValueError, match="hot blocks exceed"):
        blocked_pairs(
            recs, "k", F.col("blk_src"), max_block_size=10, on_oversize="raise"
        ).collect()
    # At or under the cap: passes, full pair count C(12,2) + 2.
    ok = blocked_pairs(recs, "k", F.col("blk_src"), max_block_size=12)
    assert len(_pair_set(ok)) == 66 + 1 + 1


def test_hot_block_drop_excludes_only_hot(spark):
    recs = _skewed(spark)
    got = _pair_set(
        blocked_pairs(
            recs, "k", F.col("blk_src"), max_block_size=10, on_oversize="drop"
        )
    )
    assert got == {(100, 101), (200, 201)}


def test_hot_block_refine_subblocks(spark):
    recs = _skewed(spark)
    # Refine the hot block by k % 2: pairs only within each parity
    # sub-block — C(6,2)*2 = 30 hot pairs — cold blocks untouched.
    got = _pair_set(
        blocked_pairs(
            recs,
            "k",
            F.col("blk_src"),
            max_block_size=10,
            on_oversize="refine",
            refine=F.col("k") % 2,
        )
    )
    hot_exp = {
        (a, b)
        for a in range(12)
        for b in range(12)
        if a < b and a % 2 == b % 2
    }
    assert got == hot_exp | {(100, 101), (200, 201)}
    # Refined pairs are a subset of the uncapped pair set.
    full = _pair_set(blocked_pairs(recs, "k", F.col("blk_src")))
    assert got <= full


def test_hot_block_salt_is_lossless(spark):
    """r8 (VERDICT r7 #5): the salt split emits EXACTLY the unguarded
    pair set — including attrs in canonical (k_a < k_b) orientation —
    just across triangle buckets instead of one reducer. Checked for
    several bucket counts, including n larger than the block."""
    recs = _skewed(spark)
    unguarded = blocked_pairs(recs, "k", F.col("blk_src"), attrs=["attr"])
    exp_pairs = _pair_set(unguarded)
    exp_full = {
        (r.k_a, r.k_b, r.attr_a, r.attr_b) for r in unguarded.collect()
    }
    for n in (2, 3, 8, 32):
        got = blocked_pairs(
            recs,
            "k",
            F.col("blk_src"),
            attrs=["attr"],
            max_block_size=10,
            on_oversize="salt",
            salt_buckets=n,
        )
        rows = got.collect()
        assert {(r.k_a, r.k_b) for r in rows} == exp_pairs, f"n={n}"
        # no duplicate emission across buckets, canonical orientation,
        # attrs swapped consistently with their keys
        assert len(rows) == len(exp_pairs), f"n={n}"
        assert {(r.k_a, r.k_b, r.attr_a, r.attr_b) for r in rows} == exp_full


def test_usage_errors(spark):
    recs = _skewed(spark)
    with pytest.raises(ValueError, match="unknown on_oversize"):
        blocked_pairs(recs, "k", F.col("blk_src"), on_oversize="bogus")
    with pytest.raises(ValueError, match="needs a refine"):
        blocked_pairs(
            recs, "k", F.col("blk_src"), max_block_size=10, on_oversize="refine"
        )
