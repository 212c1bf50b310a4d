"""Co-located (bucketed) fact–fact join — the 100 TB claim in SCALE.md
made executable: two tables bucketed+sorted on the join key join with
ZERO Exchange in the plan (no shuffle at read time)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.sources import load

from .conftest import SF_DIR_TINY


@pytest.fixture
def no_broadcast(spark):
    # Force the sort-merge path so the test proves bucketing (a
    # broadcast join would trivially avoid the exchange).
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    l = load(spark, SF_DIR_TINY, "lineitem")
    o = load(spark, SF_DIR_TINY, "orders")
    try:
        (
            l.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", str(tmp_path / "lb"))
            .mode("overwrite")
            .saveAsTable("lb_bucketed")
        )
        (
            o.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", str(tmp_path / "ob"))
            .mode("overwrite")
            .saveAsTable("ob_bucketed")
        )
        j = spark.table("lb_bucketed").join(
            spark.table("ob_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:800]}"
        assert "SortMergeJoin" in plan
        # FK integrity: every lineitem matches exactly one order.
        assert j.count() == l.count()

        # Contrast: the same join over the raw (unbucketed) parquet DOES
        # shuffle both sides.
        raw = l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        raw_plan = raw._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in raw_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS lb_bucketed")
        spark.sql("DROP TABLE IF EXISTS ob_bucketed")


def test_write_bucketed_helper_join_has_no_exchange(spark, tmp_path, no_broadcast):
    from salesforce_postgresql_etl_spark.sources.bucketed import (
        read_bucketed,
        write_bucketed,
    )

    l = load(spark, SF_DIR_TINY, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load(spark, SF_DIR_TINY, "orders").select("o_orderkey", "o_orderpriority")
    try:
        write_bucketed(
            l, "lb_helper", path=str(tmp_path / "lh"), buckets=8, key="l_orderkey"
        )
        write_bucketed(
            o, "ob_helper", path=str(tmp_path / "oh"), buckets=8, key="o_orderkey"
        )
        j = read_bucketed(spark, "lb_helper").join(
            read_bucketed(spark, "ob_helper"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"helper-bucketed join shuffles:\n{plan[:800]}"
        assert "SortMergeJoin" in plan
        assert j.count() == l.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS lb_helper")
        spark.sql("DROP TABLE IF EXISTS ob_helper")
