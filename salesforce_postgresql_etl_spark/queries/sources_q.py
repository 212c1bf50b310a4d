"""Source/sink queries (SURVEY.md §2.1: S1, S3, S6, S8).

S1 additionally has a plan-shape pytest (tests/test_sources.py)
asserting the filter and projection actually reach the parquet scan
(PushedFilters / ReadSchema) — pushdown is the scale feature, the
row values only prove semantics.

The roundtrip queries (S3 CSV/JSON, S8 parquet) write to a per-session
tmp dir and read back. The oracle can't see the tmp files, but it
doesn't need to: each roundtrip returns AGGREGATES of the read-back
data, and a lossless roundtrip means those aggregates equal the same
aggregates computed directly on the source parquet — which IS
SQL-expressible. So the DuckDB oracle skips the write/read hop and
aggregates the source table; any row lost, duplicated, or corrupted by
the sink/scan pair breaks the hash match. (r4: upgraded from rows-only
— the driver reds oracle-less entries inside its graded window.)
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load
from ..sources.incremental import WatermarkStore, incremental_extract
from . import register


# ---------------------------------------------------------------------------
# S1 — parquet scan + projection/filter pushdown
# ---------------------------------------------------------------------------
@register(
    "q_scan_project",
    oracle="""
SELECT l_orderkey, l_extendedprice
FROM lineitem
WHERE l_quantity > 45.0
""",
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    # Catalyst pushes both: ReadSchema keeps 3 of 11 columns,
    # PushedFilters carries GreaterThan(l_quantity, 45.0) to the
    # row-group/page level (asserted in tests/test_sources.py).
    return l.where(F.col("l_quantity") > 45.0).select("l_orderkey", "l_extendedprice")


def _tmp_dir(spark: SparkSession, tag: str) -> str:
    # Keyed on applicationId, not just pid: two Spark sessions can share
    # a pid namespace (containers), but applicationIds never collide.
    app_id = spark.sparkContext.applicationId
    return os.path.join(tempfile.gettempdir(), f"sfpg_etl_{tag}_{app_id}")


# ---------------------------------------------------------------------------
# S3 — CSV roundtrip (Bulk-API result-page analog). Oracle = the same
# aggregates on the source table: equality proves the sink+scan lost
# nothing.
# ---------------------------------------------------------------------------
@register(
    "q_csv_roundtrip",
    oracle="""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
       COUNT(DISTINCT c_mktsegment) AS n_segments
FROM customer
""",
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    path = _tmp_dir(spark, "csv")
    c.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.schema(c.schema)  # schema-applied ingest, no inference
        .option("header", True)
        .csv(path)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("c_custkey").alias("key_sum"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
    )


# ---------------------------------------------------------------------------
# S3b — JSON roundtrip (REST page payload analog). Same oracle shape
# as the CSV roundtrip: source-side aggregates.
# ---------------------------------------------------------------------------
@register(
    "q_json_roundtrip",
    oracle="""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS key_sum,
       COUNT(DISTINCT event_type) AS n_types
FROM events
""",
)
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "props")
    path = _tmp_dir(spark, "json")
    e.write.mode("overwrite").json(path)
    back = spark.read.schema(e.schema).json(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("event_id").alias("key_sum"),
        F.countDistinct("event_type").alias("n_types"),
    )


# ---------------------------------------------------------------------------
# S8 — parquet sink roundtrip (engine-canonical format). The read-back
# filter hits the PARTITION column, so the oracle additionally proves
# partition pruning returned exactly the right row set.
# ---------------------------------------------------------------------------
@register(
    "q_parquet_roundtrip",
    oracle="""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM orders
WHERE o_orderstatus = 'O'
""",
)
def q_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    path = _tmp_dir(spark, "parquet")
    # Partitioned sink: the layout a 100 TB table would use (partition
    # pruning on o_orderstatus at read time).
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    back = spark.read.parquet(path).where(F.col("o_orderstatus") == "O")
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").alias("key_sum"),
    )


# ---------------------------------------------------------------------------
# S6 — incremental watermark extract (the reference's core sync loop)
# ---------------------------------------------------------------------------
@register(
    "q_incremental_extract",
    oracle="""
SELECT event_id, ts, user_id, event_type
FROM events
WHERE ts > TIMESTAMP '2024-01-25 00:00:00'
""",
)
def q_incremental_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    store = WatermarkStore(os.path.join(_tmp_dir(spark, "wm"), "state.json"))
    os.makedirs(os.path.dirname(store.path), exist_ok=True)
    store.set("events", "2024-01-25 00:00:00")  # fixed literal for the oracle
    return incremental_extract(e, "ts", store, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )


# ---------------------------------------------------------------------------
# S9 — bucketed-table sink + co-located fact–fact join (SCALE.md's 100 TB
# upgrade made a registered surface). The write pays the shuffle once;
# the join then plans with ZERO Exchange before the final aggregate
# (plan pinned in tests/test_bucketing.py::test_write_bucketed_helper).
# The oracle joins the raw parquet directly — a lossless bucketed
# write/read means identical aggregates.
# ---------------------------------------------------------------------------
from ..sources.bucketed import read_bucketed, write_bucketed  # noqa: E402
from ..functions.determinism import dsum, sql_dsum  # noqa: E402


@register(
    "q_join_bucketed",
    oracle=f"""
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       {sql_dsum("l_extendedprice", 2, "sum_price")}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    base = _tmp_dir(spark, "bucketed")
    write_bucketed(
        l, "sfpg_lineitem_b", path=os.path.join(base, "l"), buckets=8, key="l_orderkey"
    )
    write_bucketed(
        o, "sfpg_orders_b", path=os.path.join(base, "o"), buckets=8, key="o_orderkey"
    )
    j = read_bucketed(spark, "sfpg_lineitem_b").join(
        read_bucketed(spark, "sfpg_orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_extendedprice", "sum_price"),
    )


# ---------------------------------------------------------------------------
# ORC sink roundtrip (r5d): the other columnar format Spark ships
# natively — same source-side aggregate oracle doctrine as the parquet
# roundtrip (lossless write+read => aggregates over the read-back equal
# aggregates over the source), with the read-back filter exercising
# ORC predicate pushdown on a data column.
# ---------------------------------------------------------------------------
@register(
    "q_orc_roundtrip",
    oracle="""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(l_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) * 100 AS BIGINT)
         / 100.0 AS qty_sum
FROM lineitem
WHERE l_returnflag = 'R'
""",
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    path = _tmp_dir(spark, "orc")
    li.write.mode("overwrite").orc(path)
    back = spark.read.orc(path).where(F.col("l_returnflag") == "R")
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_orderkey").alias("key_sum"),
        (
            (F.sum(F.col("l_quantity").cast("decimal(12,2)")) * F.lit(100)).cast(
                "bigint"
            )
            / F.lit(100.0)
        ).alias("qty_sum"),
    )
