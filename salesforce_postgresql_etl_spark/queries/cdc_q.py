"""Snapshot-diff CDC, driver-graded. Round-5d addition, tail-registered.

Two deterministic "extract snapshots" are derived from `orders` in both
engines (same modular-arithmetic membership + update rules), then
diffed. The Spark side runs the fingerprint path of
``operators.cdc.snapshot_diff`` — keys + xxhash64 row digests through
the full-outer join, never payloads — while the oracle compares the
snapshots column-by-column. A hash match therefore proves the
8-byte-fingerprint rewrite emits exactly the column-exact change set.

Snapshot rules (chosen so all three change types occur):
- old  = orders with o_orderkey % 10 != 0
- new  = orders with o_orderkey %  7 != 0, and for o_orderkey % 3 == 0
         the priority is rewritten to '9-RESYNCED' (an update)
- => deletes: %10 != 0 AND %7 == 0; inserts: %10 == 0 AND %7 != 0;
     updates: in both AND %3 == 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import snapshot_diff
from ..sources import load
from . import register

_COLS = ("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


def _snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = load(spark, sf_dir, "orders").select("o_orderkey", *_COLS)
    old = o.where(F.col("o_orderkey") % 10 != 0)
    new = o.where(F.col("o_orderkey") % 7 != 0).withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("9-RESYNCED")).otherwise(
            F.col("o_orderpriority")
        ),
    )
    return old, new


@register(
    "q_snapshot_diff",
    oracle="""
WITH old AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 10 != 0),
new AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         CASE WHEN o_orderkey % 3 = 0 THEN '9-RESYNCED'
              ELSE o_orderpriority END AS o_orderpriority
  FROM orders WHERE o_orderkey % 7 != 0)
SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
       CASE WHEN old.o_orderkey IS NULL THEN 'insert'
            WHEN new.o_orderkey IS NULL THEN 'delete'
            ELSE 'update' END AS change_type
FROM old FULL OUTER JOIN new USING (o_orderkey)
WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
   OR old.o_custkey IS DISTINCT FROM new.o_custkey
   OR old.o_orderstatus IS DISTINCT FROM new.o_orderstatus
   OR old.o_totalprice IS DISTINCT FROM new.o_totalprice
   OR old.o_orderpriority IS DISTINCT FROM new.o_orderpriority
""",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    old, new = _snapshots(spark, sf_dir)
    return snapshot_diff(old, new, ["o_orderkey"], list(_COLS))
