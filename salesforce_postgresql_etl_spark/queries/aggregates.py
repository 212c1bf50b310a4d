"""Advanced aggregates (SURVEY.md §2.4, A6–A13).

Grouping sets / rollup / cube run through the same HashAggregate
partial+final machinery as plain group-by (Catalyst expands the
grouping-set combinations map-side), so they scale like A2.

Statistical aggregates (A10) are computed in CLOSED FORM from exact
decimal sums (sum, sum of squares, sum of products) rather than with
``F.stddev``/``F.corr`` directly: the built-in one-pass estimators are
floating-point and partition-order dependent, so their last ulps differ
between Spark and DuckDB (and between two Spark runs). The closed form
is the scale-correct answer anyway — partial decimal sums merge
exactly on a 1000-executor cluster, then a handful of double ops on the
driver-side final row are bit-identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dec_to_double, money, sql_dec_to_double, sql_dsum
from ..sources import load
from . import register

_GS_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, {sum_price}
FROM {table}
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority), ())
"""


# ---------------------------------------------------------------------------
# A6 — grouping sets (no DataFrame-literal API → spark.sql)
# ---------------------------------------------------------------------------
@register(
    "q_agg_groupingsets",
    oracle=_GS_SQL.format(table="orders", sum_price=sql_dsum("o_totalprice", 2, "sum_price")),
)
def q_agg_groupingsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("gs_orders")
    # The bigint-path SQL from sql_dsum is valid in both dialects — the
    # exact same aggregate text runs on both engines.
    return spark.sql(
        _GS_SQL.format(table="gs_orders", sum_price=sql_dsum("o_totalprice", 2, "sum_price"))
    )


# ---------------------------------------------------------------------------
# A7 — rollup (hierarchical totals region→nation via customer counts)
# ---------------------------------------------------------------------------
@register(
    "q_agg_rollup",
    oracle="""
SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
       CAST(GROUPING(c_mktsegment, c_nationkey) AS BIGINT) AS gid
FROM customer
GROUP BY ROLLUP (c_mktsegment, c_nationkey)
""",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.rollup("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid")
    )


# ---------------------------------------------------------------------------
# A8 — cube (all grain combinations)
# ---------------------------------------------------------------------------
@register(
    "q_agg_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid")
    )


# ---------------------------------------------------------------------------
# A9 — pivot (wide conditional aggregation; pinned value list for
# determinism, missing combos coalesced to 0 to match COUNT FILTER)
# ---------------------------------------------------------------------------
@register(
    "q_pivot",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders
GROUP BY o_orderpriority
""",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


# ---------------------------------------------------------------------------
# A10 — statistical aggregates in closed form from exact decimal sums.
# x = c_acctbal, y = c_nationkey, per market segment.
# var_samp(x) = (Σx² − (Σx)²/n) / (n−1); corr = standard closed form.
# Both engines evaluate the IDENTICAL double expression over identical
# exact sums → bit-equal results, no rounding fudge needed.
# ---------------------------------------------------------------------------
_STATS_DOUBLE = (
    "(sx2 - sx * sx / n) / (n - 1) AS var_x, "
    "sqrt((sx2 - sx * sx / n) / (n - 1)) AS stddev_x, "
    "CASE WHEN (sx2 - sx * sx / n) * (sy2 - sy * sy / n) > 0 THEN "
    "(sxy - sx * sy / n) / (sqrt(sx2 - sx * sx / n) * sqrt(sy2 - sy * sy / n)) "
    "ELSE NULL END AS corr_xy"
)


@register(
    "q_agg_stats",
    oracle=f"""
WITH s AS (
  SELECT c_mktsegment,
         COUNT(*) AS n,
         {sql_dec_to_double("SUM(CAST(c_acctbal AS DECIMAL(12,2)))", 2)} AS sx,
         {sql_dec_to_double("SUM(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(c_acctbal AS DECIMAL(12,2)))", 4)} AS sx2,
         {sql_dec_to_double("SUM(CAST(c_nationkey AS DECIMAL(12,2)))", 2)} AS sy,
         {sql_dec_to_double("SUM(CAST(c_nationkey AS DECIMAL(12,2)) * CAST(c_nationkey AS DECIMAL(12,2)))", 4)} AS sy2,
         {sql_dec_to_double("SUM(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(c_nationkey AS DECIMAL(12,2)))", 4)} AS sxy
  FROM customer GROUP BY c_mktsegment)
SELECT c_mktsegment, n, {_STATS_DOUBLE}
FROM s
""",
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    x = money("c_acctbal")
    y = money("c_nationkey")
    s = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        dec_to_double(F.sum(x), 2).alias("sx"),
        dec_to_double(F.sum(x * x), 4).alias("sx2"),
        dec_to_double(F.sum(y), 2).alias("sy"),
        dec_to_double(F.sum(y * y), 4).alias("sy2"),
        dec_to_double(F.sum(x * y), 4).alias("sxy"),
    )
    # selectExpr with the identical double-expression text as the oracle.
    return s.selectExpr("c_mktsegment", "n", *[e.strip() for e in _STATS_DOUBLE.split(", ")])


# ---------------------------------------------------------------------------
# A11 — exact median / percentile (both engines interpolate at (n−1)·q)
# ---------------------------------------------------------------------------
@register(
    "q_agg_median",
    oracle="""
SELECT o_orderpriority,
       median(o_totalprice) AS med_price,
       quantile_cont(o_totalprice, 0.9) AS p90_price,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
""",
)
def q_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.median("o_totalprice").alias("med_price"),
        F.percentile("o_totalprice", 0.9).alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# A12 — collect-to-array (array_sort for determinism, SURVEY §4.3.5)
# ---------------------------------------------------------------------------
@register(
    "q_agg_arrays",
    # collect_list/collect_set are shuffle-order-nondeterministic, so the
    # arrays are sorted before serialization; the '|'-join makes the
    # registered output scalar (the driver's pandas canonicalizer crashes
    # on list-typed cells — unhashable in sort_values).
    oracle="""
SELECT c_nationkey,
       array_to_string(list_sort(list(c_mktsegment)), '|') AS segments,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS distinct_segments,
       COUNT(*) AS n
FROM customer
GROUP BY c_nationkey
""",
)
def q_agg_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("c_mktsegment")), "|").alias(
            "segments"
        ),
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), "|").alias(
            "distinct_segments"
        ),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# A13 — max_by / min_by latest-record picking. The ordering key
# (o_orderkey) is UNIQUE, so arg-extremes are deterministic without a
# tiebreak struct.
# ---------------------------------------------------------------------------
@register(
    "q_agg_maxby",
    oracle="""
SELECT o_orderstatus,
       arg_max(o_custkey, o_orderkey) AS last_custkey,
       arg_min(o_custkey, o_orderkey) AS first_custkey,
       MAX(o_orderkey) AS max_key,
       MIN(o_orderkey) AS min_key
FROM orders
GROUP BY o_orderstatus
""",
)
def q_agg_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_custkey", "o_orderkey").alias("last_custkey"),
        F.min_by("o_custkey", "o_orderkey").alias("first_custkey"),
        F.max("o_orderkey").alias("max_key"),
        F.min("o_orderkey").alias("min_key"),
    )
