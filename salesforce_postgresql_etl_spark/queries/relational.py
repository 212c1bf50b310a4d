"""Relational core queries (SURVEY.md §2.2–§2.4, §2.6–§2.7).

Every query here is pure DataFrame API → Catalyst plans it: filters and
projections push into the parquet scan, dimension joins broadcast, the
lineitem⋈orders join sort-merges (or AQE converts it), aggregates run
partial+final. No RDDs, no UDFs.

Determinism: money math goes through DECIMAL (see functions.determinism)
so sums are execution-order independent and hash-match the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import (
    D_RATE,
    RATE_SCALE,
    davg,
    dec_to_double,
    dsum,
    dsum_expr,
    money,
    rate,
    sql_davg,
    sql_dec_sum_to_double,
    sql_dec_to_double,
    sql_dsum,
)
from ..session import fanout
from ..sources import load
from . import register

# Shared revenue expression: extendedprice * (1 - discount), exact decimal.
# Scale bookkeeping: money(12,2) * (1 ± rate(7,3)) → scale 5; charge adds
# another rate factor → scale 8. The oracle uses the SAME scales so both
# engines run structurally identical decimal math (determinism.py doctrine).
def _revenue():
    return money("l_extendedprice") * (F.lit(1).cast(D_RATE) - rate("l_discount"))


REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(7,3)) - CAST(l_discount AS DECIMAL(7,3)))"
)
REV_SCALE = 5  # 2 + 3
CHARGE_SCALE = 8  # 5 + 3


# ---------------------------------------------------------------------------
# A2 — flagship: TPC-H Q1 shape (hash group-by, partial+final agg)
# ---------------------------------------------------------------------------
@register(
    "q_agg_group",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum("l_quantity", 2, "sum_qty")},
       {sql_dsum("l_extendedprice", 2, "sum_base_price")},
       {sql_dec_sum_to_double(REV_SQL, REV_SCALE)} AS sum_disc_price,
       {sql_dec_sum_to_double(f"{REV_SQL} * (CAST(1 AS DECIMAL(7,3)) + CAST(l_tax AS DECIMAL(7,3)))", CHARGE_SCALE)} AS sum_charge,
       {sql_davg("l_quantity", 2, "avg_qty")},
       {sql_davg("l_extendedprice", 2, "avg_price")},
       {sql_davg("l_discount", RATE_SCALE, "avg_disc")},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    charge = _revenue() * (F.lit(1).cast(D_RATE) + rate("l_tax"))
    # r13 (guide §2.5 single-split input): the partial aggregate's
    # decimal math is the flagship's hot loop, and a one-row-group scan
    # pins it to one core; fanout() spreads the filtered rows across
    # the session first (no-op at scale — a real fact scan has
    # thousands of splits). Result-identical by construction: every
    # aggregated value is decimal / count, so per-partition
    # accumulation order cannot change a bit (determinism doctrine).
    # Measured at sf0.1: 2.77s -> 2.00s min-of-4, rows identical.
    return (
        fanout(
            l.where(
                F.col("l_shipdate")
                <= F.lit("2001-09-01 00:00:00").cast("timestamp_ntz")
            ),
            "l_orderkey",
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum_expr(_revenue(), "sum_disc_price", scale=REV_SCALE),
            dsum_expr(charge, "sum_charge", scale=CHARGE_SCALE),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc", scale=RATE_SCALE),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# §2.2 Projection / filter
# ---------------------------------------------------------------------------
@register(
    "q_project",
    oracle=f"""
SELECT c_custkey AS custkey, c_name,
       {sql_dec_to_double("CAST(c_acctbal AS DECIMAL(12,2)) * CAST(1.05 AS DECIMAL(7,3))", 5)}
           AS acctbal_with_bonus
FROM customer
""",
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        "c_name",
        dec_to_double(money("c_acctbal") * F.lit(1.05).cast(D_RATE), 5).alias(
            "acctbal_with_bonus"
        ),
    )


@register(
    "q_filter_pred",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority
FROM orders
WHERE (o_totalprice > 150000.0 AND o_orderstatus <> 'F')
   OR (o_orderpriority = '1-URGENT' AND NOT o_totalprice >= 50000.0)
""",
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    cond = ((F.col("o_totalprice") > 150000.0) & (F.col("o_orderstatus") != "F")) | (
        (F.col("o_orderpriority") == "1-URGENT") & ~(F.col("o_totalprice") >= 50000.0)
    )
    return o.where(cond).select(
        "o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"
    )


@register(
    "q_filter_in",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
""",
)
def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.where(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY")
    ).select("c_custkey", "c_mktsegment", "c_acctbal")


@register(
    "q_filter_like",
    oracle="""
SELECT p_partkey, p_name, p_type, p_brand
FROM part
WHERE p_type LIKE 'PROMO%' OR p_name LIKE '%steel%' OR p_brand LIKE '%#3%'
""",
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.where(
        F.col("p_type").like("PROMO%")
        | F.col("p_name").like("%steel%")
        | F.col("p_brand").like("%#3%")
    ).select("p_partkey", "p_name", "p_type", "p_brand")


@register(
    "q_filter_between",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 23:59:59'
  AND l_discount BETWEEN 0.02 AND 0.08
GROUP BY l_returnflag
""",
)
def q_filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.where(
            F.col("l_shipdate").between(
                F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"),
                F.lit("1996-12-31 23:59:59").cast("timestamp_ntz"),
            )
            & F.col("l_discount").between(0.02, 0.08)
        )
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity", "sum_qty"))
    )


@register(
    "q_filter_null",
    # Fixtures are NULL-free (FIXTURES.md) — NULLs are manufactured with
    # NULLIF to exercise three-valued logic on both engines identically.
    oracle="""
WITH t AS (SELECT NULLIF(o_orderstatus, 'P') AS st, o_totalprice FROM orders)
SELECT COUNT(*) AS n_rows,
       COUNT(st) AS n_nonnull,
       CAST(SUM(CASE WHEN st IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(SUM(CASE WHEN st IS NOT NULL AND o_totalprice > 100000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big_nonnull
FROM t
""",
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").withColumn(
        "st", F.nullif(F.col("o_orderstatus"), F.lit("P"))
    )
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("st").alias("n_nonnull"),
        F.sum(F.when(F.col("st").isNull(), 1).otherwise(0)).alias("n_null"),
        F.sum(
            F.when(F.col("st").isNotNull() & (F.col("o_totalprice") > 100000.0), 1).otherwise(0)
        ).alias("n_big_nonnull"),
    )


# ---------------------------------------------------------------------------
# §2.3 Joins
# ---------------------------------------------------------------------------
@register(
    "q_join_inner",
    oracle="""
SELECT o.o_orderkey, c.c_name, o.o_totalprice
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
""",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    # customer is dimension-sized → Catalyst broadcasts (BroadcastHashJoin).
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@register(
    "q_join_star",
    oracle=f"""
SELECT r.r_name, n.n_name,
       {sql_dec_sum_to_double(REV_SQL, REV_SCALE)} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation n    ON c.c_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY r.r_name, n.n_name
""",
)
def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    # Dims are broadcast; the l⋈o fact join shuffles on the key. At 100 TB
    # the fact tables would be co-bucketed on orderkey (see SCALE.md).
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dsum_expr(_revenue(), "revenue", scale=REV_SCALE),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q_join_left",
    oracle="""
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'O'
""",
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "O")
    return c.join(o, cond, "left").select("c_custkey", "o_orderkey", "o_totalprice")


@register(
    "q_join_full",
    oracle="""
WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
     sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
SELECT cn.nk AS cust_nk, sn.nk AS supp_nk, cn.n_cust, sn.n_supp
FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
""",
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cn.join(sn, cn.nk == sn.nk, "full").select(
        cn.nk.alias("cust_nk"), sn.nk.alias("supp_nk"), "n_cust", "n_supp"
    )


@register(
    "q_join_semi",
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    # Delete-detection shape (SURVEY.md S7): keys present in the target
    # but absent from the source extract.
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_range",
    # Band join: fact rows land in value tiers — BroadcastNestedLoopJoin
    # against a tiny literal dim.
    oracle="""
SELECT t.tier, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
FROM orders o
JOIN (VALUES ('T1', 0.0, 50000.0), ('T2', 50000.0, 150000.0),
             ('T3', 150000.0, 300000.0), ('T4', 300000.0, 1000000.0)) AS t(tier, lo, hi)
  ON o.o_totalprice >= t.lo AND o.o_totalprice < t.hi
GROUP BY t.tier
""",
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    tiers = spark.createDataFrame(
        [
            ("T1", 0.0, 50000.0),
            ("T2", 50000.0, 150000.0),
            ("T3", 150000.0, 300000.0),
            ("T4", 300000.0, 1000000.0),
        ],
        "tier string, lo double, hi double",
    )
    cond = (o.o_totalprice >= tiers.lo) & (o.o_totalprice < tiers.hi)
    return (
        o.join(F.broadcast(tiers), cond)
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "sum_price"))
    )


@register(
    "q_join_cross",
    oracle="""
SELECT n.n_name, r.r_name FROM nation n CROSS JOIN region r
""",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return n.crossJoin(r).select("n_name", "r_name")


@register(
    "q_join_self",
    # Consecutive-line pairing via an equi self-join on (key, seq+1).
    oracle="""
SELECT a.l_orderkey, a.l_linenumber AS ln_a, b.l_linenumber AS ln_b,
       CAST(CAST(b.l_quantity AS DECIMAL(12,2)) - CAST(a.l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS qty_delta
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
""",
)
def q_join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    a = l.alias("a")
    b = l.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("b.l_linenumber") == F.col("a.l_linenumber") + 1),
    ).select(
        F.col("a.l_orderkey").alias("l_orderkey"),
        F.col("a.l_linenumber").alias("ln_a"),
        F.col("b.l_linenumber").alias("ln_b"),
        (money(F.col("b.l_quantity")) - money(F.col("a.l_quantity")))
        .cast("double")
        .alias("qty_delta"),
    )


# ---------------------------------------------------------------------------
# §2.4 Aggregations (A1, A3, A4, A5)
# ---------------------------------------------------------------------------
@register(
    "q_agg_global",
    oracle="""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(DISTINCT l_suppkey) AS n_supp
FROM lineitem
""",
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity", "sum_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        davg("l_extendedprice", "avg_price"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )


@register(
    "q_agg_countdistinct",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
""",
)
def q_agg_countdistinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q_agg_approx_cd",
    # HLL is approximate, so the raw estimate can't hash-match an exact
    # oracle. Instead the query materializes the accuracy CONTRACT as a
    # boolean: |approx - exact| <= 5% * exact (rsd=0.01 → generous slack).
    # The oracle asserts the contract holds for every group. HLL itself is
    # deterministic (hash-based, merge-commutative), so this is stable.
    oracle="""
SELECT event_type, TRUE AS within_tol FROM events GROUP BY event_type
""",
)
def q_agg_approx_cd(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .select(
            "event_type",
            (
                F.abs(F.col("approx") - F.col("exact"))
                <= F.col("exact") * F.lit(0.05)
            ).alias("within_tol"),
        )
    )


@register(
    "q_agg_having",
    oracle="""
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 15
""",
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "sum_price"))
        .where(F.col("n_orders") >= 15)
    )


# ---------------------------------------------------------------------------
# §2.6 Sorts / limits / top-k
# ---------------------------------------------------------------------------
@register(
    "q_sort",
    # Value-hash is order-insensitive, so the sort is materialized into a
    # row_number column (with NULLS LAST control via a manufactured NULL).
    #
    # SCALE SHAPE (fixes VERDICT r1 #2): a global Window.orderBy plans a
    # single-partition window — every row through one task. Instead the
    # global rank is computed distributed, in two phases:
    #   1. repartitionByRange on the sort key (the same range shuffle a
    #      global ORDER BY uses) + sortWithinPartitions + per-partition
    #      row_number (window partitioned by spark_partition_id →
    #      distributed);
    #   2. per-partition row counts (tiny: one row per partition) →
    #      cumulative offsets → broadcast back; rank = offset + local rn.
    # The only single-partition window runs over ~numPartitions rows.
    # The result is identical for ANY range boundaries because the sort
    # key (incl. unique o_orderkey tiebreak) is a total order.
    oracle="""
WITH t AS (SELECT o_orderkey, o_totalprice, NULLIF(o_orderstatus, 'P') AS st
           FROM orders WHERE o_totalprice > 250000.0)
SELECT o_orderkey, o_totalprice, st,
       ROW_NUMBER() OVER (ORDER BY st ASC NULLS LAST, o_totalprice DESC, o_orderkey ASC) AS rn
FROM t
""",
)
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    keys = [F.asc_nulls_last("st"), F.desc("o_totalprice"), F.asc("o_orderkey")]
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 250000.0)
        .withColumn("st", F.nullif(F.col("o_orderstatus"), F.lit("P")))
        .repartitionByRange(*keys)
        .sortWithinPartitions(*keys)
        .withColumn("pid", F.spark_partition_id())
    )
    local_w = Window.partitionBy("pid").orderBy(*keys)
    o = o.withColumn("lrn", F.row_number().over(local_w))
    counts = o.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    off_w = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "pid", F.coalesce(F.sum("cnt").over(off_w), F.lit(0)).alias("off")
    )
    return o.join(F.broadcast(offsets), "pid").select(
        "o_orderkey",
        "o_totalprice",
        "st",
        (F.col("off") + F.col("lrn")).cast("int").alias("rn"),
    )


@register(
    "q_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
""",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    # TakeOrderedAndProject: per-partition top-k, no global sort shuffle.
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(100)
    )


@register(
    "q_limit_offset",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50 OFFSET 100
""",
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(100)
        .limit(50)
    )


# ---------------------------------------------------------------------------
# §2.7 Set operations
# ---------------------------------------------------------------------------
_URGENT = "SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'"
_BIG = "SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders WHERE o_totalprice > 200000.0"


def _union_inputs(spark: SparkSession, sf_dir: str):
    o = load(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice"]
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(*cols)
    big = o.where(F.col("o_totalprice") > 200000.0).select(*cols)
    return urgent, big


@register("q_union_all", oracle=f"{_URGENT} UNION ALL {_BIG}")
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    urgent, big = _union_inputs(spark, sf_dir)
    return urgent.unionByName(big)


@register("q_union_distinct", oracle=f"{_URGENT} UNION {_BIG}")
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    urgent, big = _union_inputs(spark, sf_dir)
    return urgent.unionByName(big).distinct()


@register(
    "q_intersect",
    oracle="""
SELECT c_nationkey AS nk FROM customer
INTERSECT
SELECT s_nationkey AS nk FROM supplier
""",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@register(
    "q_except",
    oracle="""
SELECT c_nationkey AS nk FROM customer
EXCEPT
SELECT s_nationkey AS nk FROM supplier
""",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.subtract(s)  # EXCEPT DISTINCT semantics
