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


def test_salted_agg_empty_input(spark):
    df = spark.createDataFrame([], "k long, v double")
    assert salted_agg(df, ["k"], "v").collect() == []


def test_salted_agg_all_one_key_and_more_salts_than_rows(spark):
    df = spark.createDataFrame([(7, 1.5), (7, 2.5), (7, 3.0)], "k long, v double")
    rows = salted_agg(df, ["k"], "v", n_salts=64).collect()
    assert len(rows) == 1
    assert rows[0].k == 7 and rows[0].n == 3 and float(rows[0].sum_val) == 7.0


def test_salted_agg_rejects_bad_salts(spark):
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    with pytest.raises(ValueError, match="n_salts"):
        salted_agg(df, ["k"], "v", n_salts=0)


def test_salted_join_empty_sides(spark):
    big = spark.createDataFrame([], "k long, v double")
    dim = spark.createDataFrame([(1, "d1")], "dk long, dname string")
    assert salted_join(big, dim, "k", "dk").collect() == []
    big2 = spark.createDataFrame([(1, 1.0)], "k long, v double")
    empty_dim = spark.createDataFrame([], "dk long, dname string")
    assert salted_join(big2, empty_dim, "k", "dk").collect() == []


def test_salted_join_left_preserves_unmatched_big(spark):
    big = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    dim = spark.createDataFrame([(1, "d1")], "dk long, dname string")
    rows = sorted(
        (r.k, r.dname)
        for r in salted_join(big, dim, "k", "dk", n_salts=8, how="left")
        .select("k", "dname")
        .collect()
    )
    assert rows == [(1, "d1"), (2, None)]


def test_salted_join_refuses_small_side_preserving_types(spark):
    big = spark.createDataFrame([(1, 1.0)], "k long, v double")
    dim = spark.createDataFrame([(1, "d1")], "dk long, dname string")
    for how in ("right", "full", "left_semi", "left_anti", "cross"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, dim, "k", "dk", how=how)


def test_salted_agg_tolerates_map_columns(spark):
    """r5 (advisor): xxhash64 rejects MapType at analysis time, so the
    full-row salt must skip map columns (e.g. events.props) instead of
    failing the whole salted plan."""
    df = spark.createDataFrame(
        [(1, 1.0, {"a": "x"}), (1, 2.0, {"b": "y"}), (2, 3.0, None)],
        "k long, v double, props map<string,string>",
    )
    rows = {r.k: (r.n, float(r.sum_val)) for r in salted_agg(df, ["k"], "v").collect()}
    assert rows == {1: (2, 3.0), 2: (1, 3.0)}


def test_row_salt_refuses_all_map_rows(spark):
    from salesforce_postgresql_etl_spark.operators.skew import _row_salt

    df = spark.createDataFrame(
        [({"a": "x"},)], "props map<string,string>"
    )
    with pytest.raises(ValueError, match="hashable"):
        _row_salt(df, 8)


def _plain_agg(pairs):
    out = {}
    for k, v in pairs:
        n, s = out.get(k, (0, 0))
        out[k] = (n + 1, s + round(v * 100))  # cents, exact
    return out


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_PAIRS = st.lists(
    st.tuples(
        st.integers(min_value=-3, max_value=3),
        st.decimals(
            min_value=-100, max_value=100, places=2, allow_nan=False
        ).map(float),
    ),
    min_size=0,
    max_size=30,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=_PAIRS)
def test_salted_agg_property_random_multisets(spark, pairs):
    """salted_agg is result-identical to a plain per-key count/sum for
    arbitrary multisets — including empty input, negative values,
    single-key pileups, and n_salts (41) > n_rows."""
    df = spark.createDataFrame(pairs or [], "k long, v double")
    got = {
        r.k: (r.n, int(round(float(r.sum_val) * 100)))
        for r in salted_agg(df, ["k"], "v", n_salts=41).collect()
    }
    assert got == _plain_agg(pairs)


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
