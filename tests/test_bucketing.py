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


def test_bucketed_snapshot_diff_has_no_exchange(spark, tmp_path, no_broadcast):
    """(r6) operators/cdc.py's scale claim made executable: with both
    snapshots bucketed on the key, snapshot_diff's full-outer join runs
    bucket-local — ZERO Exchange — because the (key, fingerprint)
    projection preserves the bucketed scan's hash partitioning. Also
    re-proves the diff itself on the bucketed path."""
    from salesforce_postgresql_etl_spark.operators.cdc import snapshot_diff
    from salesforce_postgresql_etl_spark.sources.bucketed import (
        read_bucketed,
        write_bucketed,
    )

    o = load(spark, SF_DIR_TINY, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    # new snapshot: one update, one delete, one insert
    new = (
        o.where(F.col("o_orderkey") % 97 != 0)  # deletes
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 101 == 0, F.lit("Z")).otherwise(
                F.col("o_orderstatus")
            ),  # updates
        )
        .unionByName(
            o.limit(0).unionByName(
                spark.createDataFrame(
                    [(999_999_001, "N", 1.0)],
                    "o_orderkey bigint, o_orderstatus string, o_totalprice double",
                )
            )
        )  # insert
    )
    try:
        write_bucketed(
            o, "snap_old", path=str(tmp_path / "so"), buckets=8, key="o_orderkey"
        )
        write_bucketed(
            new, "snap_new", path=str(tmp_path / "sn"), buckets=8, key="o_orderkey"
        )
        diff = snapshot_diff(
            read_bucketed(spark, "snap_old"),
            read_bucketed(spark, "snap_new"),
            ["o_orderkey"],
        )
        plan = diff._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed diff still shuffles:\n{plan[:800]}"
        got = {
            r["change_type"]: n
            for r, n in (
                (row, row["n"])
                for row in diff.groupBy("change_type")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
        }
        n_del = o.where(F.col("o_orderkey") % 97 == 0).count()
        n_upd = new.join(o.select("o_orderkey"), "o_orderkey").where(
            F.col("o_orderstatus") == "Z"
        ).count()
        assert got.get("delete") == n_del
        assert got.get("insert") == 1
        assert got.get("update") == n_upd
    finally:
        spark.sql("DROP TABLE IF EXISTS snap_old")
        spark.sql("DROP TABLE IF EXISTS snap_new")
