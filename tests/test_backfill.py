"""Dynamic-partition-overwrite backfill (sources/backfill.py) and join
strategy hints — the optimizer/writer surfaces an operator engine must
expose even though no registered query can exercise them (writes and
physical-plan choice don't hash against a SQL oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.sources import load
from salesforce_postgresql_etl_spark.sources.backfill import (
    backfill_partitions,
    read_partitioned,
    write_partitioned,
)

from .conftest import SF_DIR


def _daily(spark):
    e = load(spark, SF_DIR, "events")
    return e.select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_id",
        "event_type",
        "value",
    )


def _rows(df):
    # canonical projection: partitioned reads type-infer `day` to DATE
    # and move it to the schema tail — pin order and type for compares
    canon = df.select(
        F.col("day").cast("string").alias("day"),
        "event_id",
        "event_type",
        "value",
    )
    return sorted(tuple(r) for r in canon.collect())


class TestBackfill:
    def test_backfill_replaces_only_target_partition(self, spark, tmp_path):
        path = str(tmp_path / "t")
        daily = _daily(spark)
        days = [r["day"] for r in daily.select("day").distinct().collect()]
        target = sorted(days)[1]

        write_partitioned(daily, path, ["day"])
        before = _rows(read_partitioned(spark, path).where(F.col("day") != target))

        # corrected slice for one day: values doubled
        fixed = daily.where(F.col("day") == target).withColumn(
            "value", F.col("value") * 2
        )
        backfill_partitions(fixed, path, ["day"])

        after_all = read_partitioned(spark, path)
        # untouched partitions identical
        assert _rows(after_all.where(F.col("day") != target)) == before
        # target partition replaced with the corrected slice
        assert _rows(after_all.where(F.col("day") == target)) == _rows(fixed)

    def test_backfill_is_idempotent(self, spark, tmp_path):
        path = str(tmp_path / "t")
        daily = _daily(spark)
        write_partitioned(daily, path, ["day"])
        target = daily.select("day").agg(F.min("day").alias("d")).collect()[0]["d"]
        slice_df = daily.where(F.col("day") == target)
        backfill_partitions(slice_df, path, ["day"])
        once = _rows(read_partitioned(spark, path))
        backfill_partitions(slice_df, path, ["day"])
        assert _rows(read_partitioned(spark, path)) == once

    def test_static_overwrite_would_truncate(self, spark, tmp_path):
        # The failure mode the helper exists to prevent, demonstrated:
        # static mode drops every other partition.
        path = str(tmp_path / "t")
        daily = _daily(spark)
        write_partitioned(daily, path, ["day"])
        target = daily.select("day").agg(F.min("day").alias("d")).collect()[0]["d"]
        daily.where(F.col("day") == target).write.partitionBy("day").mode(
            "overwrite"
        ).parquet(path)
        left = (
            read_partitioned(spark, path)
            .select(F.col("day").cast("string").alias("day"))
            .distinct()
            .collect()
        )
        assert [r["day"] for r in left] == [target]


class TestJoinHints:
    """Join strategy hints: the user-facing control over physical join
    selection (broadcast / merge / shuffle_hash), pinned by plan."""

    def _plan(self, df):
        df.collect()
        return df._jdf.queryExecution().executedPlan().toString()

    def test_broadcast_hint(self, spark):
        li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
        o = load(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
        j = li.join(o.hint("broadcast"), li.l_orderkey == o.o_orderkey)
        assert "BroadcastHashJoin" in self._plan(j)

    def test_merge_hint_overrides_broadcast(self, spark):
        li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
        o = load(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
        # orders is far below the auto-broadcast threshold; the merge
        # hint must still force a sort-merge join.
        j = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        assert "SortMergeJoin" in self._plan(j)

    def test_shuffle_hash_hint(self, spark):
        li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
        o = load(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
        j = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        assert "ShuffledHashJoin" in self._plan(j)

    def test_hints_do_not_change_results(self, spark):
        li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
        o = load(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
        base = None
        for hint in ("broadcast", "merge", "shuffle_hash"):
            j = (
                li.join(o.hint(hint), li.l_orderkey == o.o_orderkey)
                .groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            rows = sorted(tuple(r) for r in j.collect())
            if base is None:
                base = rows
            else:
                assert rows == base, hint
