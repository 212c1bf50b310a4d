"""Operator tests for incremental aggregate maintenance
(operators/incremental_agg.py): the monoid laws that make the
registered q_incremental_agg hash match a from-scratch aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.operators.incremental_agg import (
    agg_state,
    finalize_agg_state,
    merge_agg_state,
)
from salesforce_postgresql_etl_spark.sources import load

from .conftest import SF_DIR

_G = ["event_type"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _final(state):
    return _rows(finalize_agg_state(state, _G))


def test_merge_tree_invariance(spark):
    """Any split of the data into disjoint batches, folded in any
    tree shape, finalizes identically to the from-scratch state."""
    e = load(spark, SF_DIR, "events").select("ts", "event_type", "value")
    full = _final(agg_state(e, _G, "value"))

    # three disjoint batches by hash of event_id-ish (ts second parity)
    b = [
        e.where(F.pmod(F.col("ts").cast("timestamp").cast("long"), F.lit(3)) == i)
        for i in range(3)
    ]
    s = [agg_state(x, _G, "value") for x in b]

    left_fold = merge_agg_state(merge_agg_state(s[0], s[1], _G), s[2], _G)
    right_fold = merge_agg_state(s[0], merge_agg_state(s[1], s[2], _G), _G)
    assert _final(left_fold) == full
    assert _final(right_fold) == full


def test_new_group_in_delta_appears(spark):
    hist = spark.createDataFrame([("a", 1.0), ("a", 3.0)], "k string, v double")
    delta = spark.createDataFrame([("b", 5.0)], "k string, v double")
    merged = merge_agg_state(
        agg_state(hist, ["k"], "v"), agg_state(delta, ["k"], "v"), ["k"]
    )
    out = {r["k"]: r for r in finalize_agg_state(merged, ["k"]).collect()}
    assert out["a"]["n"] == 2 and out["a"]["sum_val"] == 4.0
    assert out["b"]["n"] == 1 and out["b"]["avg_val"] == 5.0
    assert out["a"]["min_val"] == 1.0 and out["a"]["max_val"] == 3.0


def test_empty_delta_is_identity(spark):
    hist = spark.createDataFrame([("a", 2.0)], "k string, v double")
    empty = spark.createDataFrame([], "k string, v double")
    s = agg_state(hist, ["k"], "v")
    merged = merge_agg_state(s, agg_state(empty, ["k"], "v"), ["k"])
    assert _rows(finalize_agg_state(merged, ["k"])) == _rows(
        finalize_agg_state(s, ["k"])
    )
