"""Round-5 extension queries: dedup clustering and skew-salted agg.

Tail-registered (new module, LAST in ``_MODULES``) so the r5 graded
window 1–50 keeps exactly the rotation recorded in COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.determinism import dec_to_double, sql_dec_to_double
from ..operators.clustering import dedup_clusters
from ..operators.dedup import neardup_pairs
from ..operators.skew import salted_agg
from ..sources import load
from . import register
from .llm import NEARDUP_THRESHOLD

# ---------------------------------------------------------------------------
# Near-dup CLUSTERS: pairs → connected components → canonical survivor.
# The Spark side iterates min-label propagation (operators/clustering);
# the oracle computes the same fixpoint as a recursive transitive
# closure — tractable at sf0.01 (1,887 pairs), and provably the same
# answer: both label every node with the min reachable doc_id.
# ---------------------------------------------------------------------------


@register(
    "q_neardup_clusters",
    oracle=f"""
WITH RECURSIVE tok AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS t FROM documents),
p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM tok a JOIN tok b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_filter(a.t, x -> list_contains(b.t, x))) AS DOUBLE)
            / CAST(len(a.t) + len(b.t)
                   - len(list_filter(a.t, x -> list_contains(b.t, x))) AS DOUBLE)
            >= {NEARDUP_THRESHOLD}),
edges AS (SELECT doc_a AS u, doc_b AS v FROM p
          UNION SELECT doc_b, doc_a FROM p),
reach AS (
  SELECT u AS node, u AS r FROM edges
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.node)
SELECT node AS doc_id,
       MIN(r) AS cluster_id,
       CAST(node = MIN(r) AS INT) AS is_canonical
FROM reach
GROUP BY node
""",
)
def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    pairs = neardup_pairs(d, threshold=NEARDUP_THRESHOLD, strategy="brute").select(
        "doc_a", "doc_b"
    )
    return dedup_clusters(pairs)


# ---------------------------------------------------------------------------
# Skew-salted two-phase aggregation, driver-graded. The oracle is the
# PLAIN group-by — salting is a physical rewrite, so identical output
# IS the correctness claim (any salt assignment must vanish in the
# merge). events.event_type is the natural hot-key shape: 5 values
# over the whole table, each key ≫ one reducer's share at 100 TB.
# ---------------------------------------------------------------------------


@register(
    "q_salted_agg",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n,
       {sql_dec_to_double("SUM(CAST(value AS DECIMAL(18,2)))", 2)} AS sum_val
FROM events
GROUP BY event_type
""",
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = salted_agg(e, ["event_type"], "value", n_salts=16)
    # decimal internally, DOUBLE at the surface (determinism doctrine —
    # DuckDB's pandas bridge floats decimals, so the oracle must too)
    return out.select(
        "event_type", "n", dec_to_double(F.col("sum_val"), 2).alias("sum_val")
    )


# ---------------------------------------------------------------------------
# Multi-resolution rollup cascade (hypertable continuous-aggregate
# shape): events → minute partials → hour from MINUTE partials → day
# from HOUR partials. At 100 TB you never re-scan raw events to build
# coarser resolutions — each level re-aggregates the previous one
# (~60× smaller), and every re-aggregation is decomposable
# (count→sum, decimal-sum→sum, min→min, max→max). The oracle computes
# day-level directly from raw events: a hash match proves the cascade
# loses nothing.
# ---------------------------------------------------------------------------


@register(
    "q_rollup_cascade",
    oracle=f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       event_type,
       COUNT(*) AS n,
       {sql_dec_to_double("SUM(CAST(value AS DECIMAL(18,2)))", 2)} AS sum_val,
       MIN(value) AS min_val,
       MAX(value) AS max_val
FROM events
GROUP BY 1, 2
""",
)
def q_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("ts", "event_type", "value")
    minute = e.groupBy(
        F.date_trunc("minute", "ts").alias("minute"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
        F.min("value").alias("min_val"),
        F.max("value").alias("max_val"),
    )
    hour = minute.groupBy(
        F.date_trunc("hour", "minute").alias("hour"), "event_type"
    ).agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.min("min_val").alias("min_val"),
        F.max("max_val").alias("max_val"),
    )
    day = hour.groupBy(
        F.date_trunc("day", "hour").alias("day"), "event_type"
    ).agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.min("min_val").alias("min_val"),
        F.max("max_val").alias("max_val"),
    )
    return day.select(
        "day",
        "event_type",
        "n",
        dec_to_double(F.col("s"), 2).alias("sum_val"),
        "min_val",
        "max_val",
    )


# ---------------------------------------------------------------------------
# Merkle-bucket reconciliation (operators/reconcile.py): source vs
# sink diff without a full-table join. The query reconciles orders
# against a deterministically drifted copy (keys % 101 deleted, rows
# % 97 price-shifted); the oracle computes the same diff with a plain
# FULL JOIN — equality proves the bucket-digest prefilter drops
# nothing. The Spark side only full-joins rows from mismatched
# buckets (~2% here; ~0 when in sync — the 100 TB point).
# ---------------------------------------------------------------------------
from ..operators.reconcile import reconcile_keys  # noqa: E402


@register(
    "q_reconcile",
    oracle="""
WITH b AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                  CASE WHEN o_orderkey % 97 = 0
                       THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
                  o_orderdate, o_orderpriority
           FROM orders WHERE o_orderkey % 101 != 0)
SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN b.o_orderkey IS NULL THEN 'missing_in_b'
            WHEN a.o_orderkey IS NULL THEN 'missing_in_a'
            ELSE 'changed' END AS status
FROM orders a FULL JOIN b ON a.o_orderkey = b.o_orderkey
WHERE b.o_orderkey IS NULL OR a.o_orderkey IS NULL
   OR a.o_totalprice != b.o_totalprice
""",
)
def q_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load(spark, sf_dir, "orders")
    b = a.where(F.col("o_orderkey") % 101 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 97 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    return reconcile_keys(a, b, "o_orderkey")


# ---------------------------------------------------------------------------
# Data-quality report: the post-sync validation pass an ETL tool runs
# before promoting a load — key uniqueness, FK integrity, null rates.
# One row out; every check is a scan-side aggregate (no row movement
# beyond the FK anti-join, whose build side is the key column only).
# ---------------------------------------------------------------------------


@register(
    "q_dq_report",
    oracle="""
SELECT
  (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) AS dup_order_keys,
  (SELECT COUNT(*) FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      AS fk_violations,
  (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL) AS null_orderdates,
  (SELECT COUNT(*) FROM customer WHERE c_mktsegment IS NULL) AS null_segments
""",
)
def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer")
    dup = o.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_order_keys")
    )
    fk = (
        l.join(o.select("o_orderkey"), l["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("fk_violations"))
    )
    nulls_o = o.agg(
        F.sum(F.col("o_orderdate").isNull().cast("bigint")).alias("null_orderdates")
    )
    nulls_c = c.agg(
        F.sum(F.col("c_mktsegment").isNull().cast("bigint")).alias("null_segments")
    )
    return dup.crossJoin(fk).crossJoin(nulls_o).crossJoin(nulls_c)


# ---------------------------------------------------------------------------
# SCD Type 2 merge (operators/scd.py): one snapshot applied to an
# initial dimension — deletes close rows, changes close + reopen,
# inserts open. The oracle mirrors the same open-slice ⨝ snapshot
# algebra with IS-DISTINCT-FROM per tracked column.
# ---------------------------------------------------------------------------
from ..operators.scd import scd2_apply  # noqa: E402

_SCD_T0 = "2024-01-01 00:00:00"
_SCD_T1 = "2024-02-01 00:00:00"


@register(
    "q_scd2_merge",
    oracle=f"""
WITH cur AS (
  SELECT c_custkey, c_mktsegment,
         TIMESTAMP '{_SCD_T0}' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to
  FROM customer),
inc AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 53 = 0 THEN 'CHANGED' ELSE c_mktsegment END
           AS c_mktsegment
  FROM customer WHERE c_custkey % 89 != 0
  UNION ALL
  SELECT c_custkey + 1000000, c_mktsegment
  FROM customer WHERE c_custkey % 71 = 0),
closed AS (
  SELECT cur.c_custkey, cur.c_mktsegment, cur.valid_from,
         TIMESTAMP '{_SCD_T1}' AS valid_to
  FROM cur LEFT JOIN inc ON cur.c_custkey = inc.c_custkey
  WHERE inc.c_custkey IS NULL
     OR cur.c_mktsegment IS DISTINCT FROM inc.c_mktsegment),
unchanged AS (
  SELECT cur.c_custkey, cur.c_mktsegment, cur.valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to
  FROM cur JOIN inc ON cur.c_custkey = inc.c_custkey
  WHERE cur.c_mktsegment IS NOT DISTINCT FROM inc.c_mktsegment),
opened AS (
  SELECT inc.c_custkey, inc.c_mktsegment,
         TIMESTAMP '{_SCD_T1}' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to
  FROM inc LEFT JOIN cur ON inc.c_custkey = cur.c_custkey
  WHERE cur.c_custkey IS NULL
     OR cur.c_mktsegment IS DISTINCT FROM inc.c_mktsegment)
SELECT * FROM closed UNION ALL
SELECT * FROM unchanged UNION ALL
SELECT * FROM opened
""",
)
def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    current = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit(_SCD_T0).cast("timestamp_ntz").alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
    )
    incoming = (
        c.where(F.col("c_custkey") % 89 != 0)
        .withColumn(
            "c_mktsegment",
            F.when(F.col("c_custkey") % 53 == 0, F.lit("CHANGED")).otherwise(
                F.col("c_mktsegment")
            ),
        )
        .unionByName(
            c.where(F.col("c_custkey") % 71 == 0).withColumn(
                "c_custkey", F.col("c_custkey") + 1000000
            )
        )
    )
    return scd2_apply(current, incoming, "c_custkey", ["c_mktsegment"], _SCD_T1)


# ---------------------------------------------------------------------------
# Rule-based validation gate (sources/quarantine.py): the row-level
# business-rule half of the dead-letter flow, driver-graded. The
# oracle rebuilds each reason with the same conservative three-valued
# logic (NULL predicate = failure) and the same dict-order reason
# concatenation — concat_ws skips NULLs identically in both engines.
# ---------------------------------------------------------------------------
from ..sources.quarantine import validate_with_quarantine  # noqa: E402

VALIDATE_PRICE_CAP = 450_000.0


@register(
    "q_validate_rules",
    oracle=f"""
WITH t AS (
  SELECT o_orderkey,
         CASE WHEN NOT COALESCE(o_totalprice <= {VALIDATE_PRICE_CAP}, FALSE)
              THEN 'price_over_cap' END AS r1,
         CASE WHEN NOT COALESCE(o_orderstatus IN ('F', 'O'), FALSE)
              THEN 'status_pending' END AS r2
  FROM orders)
SELECT o_orderkey, concat_ws(',', r1, r2) AS reason
FROM t WHERE r1 IS NOT NULL OR r2 IS NOT NULL
""",
)
def q_validate_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantined orders with their violated rules (~35% of rows:
    price cap at the ~90th percentile + pending status)."""
    o = load(spark, sf_dir, "orders")
    split = validate_with_quarantine(
        o.select("o_orderkey", "o_totalprice", "o_orderstatus"),
        {
            "price_over_cap": F.col("o_totalprice") <= VALIDATE_PRICE_CAP,
            "status_pending": F.col("o_orderstatus").isin("F", "O"),
        },
    )
    return split.quarantine.select("o_orderkey", "reason")


# ---------------------------------------------------------------------------
# Skew-salted JOIN, driver-graded like q_salted_agg: the oracle is the
# PLAIN equi join, so a hash match is exactly the claim that the
# n_salts-way small-side replication + (key, salt) shuffle keys change
# the schedule and nothing else. events.user_id ⨝ customer is the
# hot-key shape: one reducer per user at 100 TB would cap on the most
# active users; the salt fans each over 8 tasks.
# ---------------------------------------------------------------------------
from ..operators.skew import salted_join  # noqa: E402


@register(
    "q_salted_join",
    oracle="""
SELECT e.event_id, e.user_id, c.c_name, e.value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
""",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = salted_join(e, c, "user_id", "c_custkey", n_salts=8)
    return j.select("event_id", "user_id", "c_name", "value")


# ---------------------------------------------------------------------------
# KLL mergeable-quantile contract (r5d). KLL is randomized (see
# operators/sketch.py), so — exactly like q_agg_approx_cd's HLL row —
# the registered surface is the accuracy CONTRACT, not the estimate:
# the day-cascaded p50/p90 estimate's EXACT rank within its group must
# sit within ±5% of the target rank (k=800's 99%-confidence bound is
# ~0.4%; 5% is ~12x slack, so the boolean is stable run to run).
# ---------------------------------------------------------------------------
from ..operators.sketch import quantile_cascade  # noqa: E402


@register(
    "q_quantile_sketch",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
       TRUE AS p50_ok, TRUE AS p90_ok
FROM events GROUP BY 1, 2
""",
)
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("ts", "event_type", "value")
    est = quantile_cascade(e, dim="event_type", qs=(0.5, 0.9))
    raw = e.select(
        F.date_trunc("day", "ts").alias("day"), "event_type", "value"
    )
    ranked = (
        raw.join(est, ["day", "event_type"])
        .groupBy("day", "event_type")
        .agg(
            (
                F.sum(F.when(F.col("value") <= F.col("q50_est"), 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("r50"),
            (
                F.sum(F.when(F.col("value") <= F.col("q90_est"), 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("r90"),
        )
    )
    return ranked.select(
        "day",
        "event_type",
        (F.abs(F.col("r50") - 0.5) <= 0.05).alias("p50_ok"),
        (F.abs(F.col("r90") - 0.9) <= 0.05).alias("p90_ok"),
    )


# ---------------------------------------------------------------------------
# Unpivot / melt (r5d): wide measures -> long (measure, value) rows —
# the reshaping Spark 4 exposes natively as DataFrame.unpivot (and the
# inverse of q_pivot). The oracle is the portable UNION ALL spelling,
# so the hash match pins Spark's unpivot against first-principles SQL.
# Per-row fanout x4, no shuffle: scan-shaped at any scale.
# ---------------------------------------------------------------------------
@register(
    "q_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
       l_quantity AS val FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
""",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    )


# ---------------------------------------------------------------------------
# Frequent items (r8): the Misra-Gries heavy-hitter sketch graded in
# its exact regime — capacity 64 ≥ the fixture's 31-token vocabulary,
# so no eviction fires, D = 0, and count_lower == count_upper == the
# exact count (which is precisely what the SQL oracle asserts). The
# eviction-regime bound is property-tested in tests/
# test_frequent_items.py; exactness-when-capacity-suffices is the
# same grading pattern q_quantile_sketch uses for KLL rank error.
# ---------------------------------------------------------------------------
@register(
    "q_heavy_hitters",
    oracle="""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS item
             FROM documents),
c AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS count_lower
      FROM tok GROUP BY item)
SELECT item, count_lower, count_lower AS count_upper,
       CAST(rn AS INT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY count_lower DESC, item) AS rn
      FROM c)
WHERE rn <= 10
""",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 corpus tokens through the bounded-memory Misra-Gries
    sketch: per-partition capacity-64 counter summaries merged by one
    hash-partitioned groupBy (never a full-cardinality shuffle)."""
    from ..operators.sketch import frequent_items

    toks = load(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    return frequent_items(toks, "tok", capacity=64, k=10)
