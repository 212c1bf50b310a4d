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


# ---------------------------------------------------------------------------
# Salesforce 15->18 Id checksum (r5d): the reference domain's signature
# scalar (SURVEY §2.8 F1 "15->18-char Id handling"), registered so the
# driver hash-checks the ALGORITHM — the Spark side and the oracle each
# build the suffix from their own substring/ascii/CASE trees
# (functions/sfid.py emits both). Fixtures carry no real Ids, so a
# deterministic mixed-case pseudo-Id is derived from c_name the same
# way in both engines (translate digits -> uppercase letters).
# ---------------------------------------------------------------------------
from ..functions.sfid import sf_id_15_to_18, sql_sf_id_15_to_18  # noqa: E402

_ID15_SQL = "substring(translate(c_name, '0123456789#', 'ABCDEFGHIJx'), 1, 15)"


@register(
    "q_sfid18",
    oracle=f"""
WITH ids AS (SELECT c_custkey, {_ID15_SQL} AS id15 FROM customer)
SELECT c_custkey, id15, {sql_sf_id_15_to_18("id15")} AS id18
FROM ids
""",
)
def q_sfid18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    ids = c.select(
        "c_custkey",
        F.substring(
            F.translate("c_name", "0123456789#", "ABCDEFGHIJx"), 1, 15
        ).alias("id15"),
    )
    return ids.select("c_custkey", "id15", sf_id_15_to_18("id15").alias("id18"))


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (r5d): per-type stats kept as
# mergeable state — history batch (ts <= W) + delta batch (ts > W)
# merged WITHOUT rescanning, finalized, and hash-checked against the
# oracle's from-scratch aggregate over all events. A hash match is the
# decomposability proof: merge(state(A), state(B)) == state(A ∪ B).
# ---------------------------------------------------------------------------
from ..functions.determinism import sql_dec_sum_to_double  # noqa: E402
from ..operators.incremental_agg import (  # noqa: E402
    agg_state,
    finalize_agg_state,
    merge_agg_state,
)

_INCR_W = "2024-01-15 00:00:00"


@register(
    "q_incremental_agg",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n,
       {sql_dec_sum_to_double("CAST(value AS DECIMAL(18,2))", 2)} AS sum_val,
       MIN(value) AS min_val,
       MAX(value) AS max_val,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
         / (COUNT(*) * 100) AS avg_val
FROM events
GROUP BY event_type
""",
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("ts", "event_type", "value")
    hist = e.where(F.col("ts") <= F.lit(_INCR_W))
    delta = e.where(F.col("ts") > F.lit(_INCR_W))
    state = merge_agg_state(
        agg_state(hist, ["event_type"], "value"),
        agg_state(delta, ["event_type"], "value"),
        ["event_type"],
    )
    return finalize_agg_state(state, ["event_type"])


# ---------------------------------------------------------------------------
# Entity resolution (r5d): the master-data-management core of a
# Salesforce-sync warehouse — find records that are the same real-world
# entity despite textual drift. Standard architecture, all built-ins:
# (1) BLOCKING by a cheap key (name prefix) so candidate pairs are
# per-block, never n² over the table; (2) pairwise edit-distance match
# (levenshtein <= 1 — parity verified Spark vs DuckDB); (3) transitive
# closure via the iterative min-label connected components operator;
# (4) every record (incl. singletons) labeled with its entity id and a
# canonical-survivor flag. Threshold-transitivity over-merging is a
# REAL MDM failure mode; since r6 the CC stage carries a
# max_cluster_size tripwire (operators/clustering.py) that raises on
# chain-merged monster clusters instead of silently fusing them; since
# r7 the escalation itself is implemented — dedup_clusters(
# oversize_action="split", attrs=..., verify=...) re-verifies members
# against the cluster hub and splits non-matches (VERDICT r6 #5,
# pytest-proven on the A–B–C chain). The registered query keeps the
# default raise-tripwire with a cap sized to never bind on the fixture
# (clusters are pairs/triples), so the oracle is unchanged; the wiring
# is what's proven.
# At 100 TB: pairs shuffle on the block key (skew-manageable, bounded
# block sizes), CC shuffles on node id; nothing is ever all-pairs.
# ---------------------------------------------------------------------------
from ..operators.blocking import blocked_pairs  # noqa: E402
from ..operators.clustering import dedup_clusters  # noqa: E402

_ER_BLOCK_LEN = 16
_ER_MAX_LEV = 1
_ER_MAX_CLUSTER = 1000
_ER_MAX_BLOCK = 1000  # prefix-16 fixture blocks hold ~100 records


@register(
    "q_entity_match",
    oracle=f"""
WITH RECURSIVE c AS (
  SELECT c_custkey, c_name, substring(c_name, 1, {_ER_BLOCK_LEN}) AS blk
  FROM customer),
p AS (SELECT a.c_custkey AS u0, b.c_custkey AS v0
      FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= {_ER_MAX_LEV}),
edges AS (SELECT u0 AS u, v0 AS v FROM p UNION SELECT v0, u0 FROM p),
reach AS (
  SELECT u AS node, u AS r FROM edges
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.node),
lab AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node)
SELECT cu.c_custkey,
       COALESCE(lab.cluster_id, cu.c_custkey) AS entity_id,
       CAST(COALESCE(lab.cluster_id, cu.c_custkey) = cu.c_custkey AS INT)
         AS is_canonical
FROM customer cu LEFT JOIN lab ON cu.c_custkey = lab.node
""",
)
def q_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # r7: candidate pairs flow through the reusable blocking operator,
    # which adds the hot-block tripwire (one block-size aggregate; the
    # cap never binds on the fixture — prefix-16 blocks hold ~100
    # records — so the oracle is unchanged; the SKEW guard wiring is
    # what's being proven, mirroring the cluster-size tripwire).
    cand = blocked_pairs(
        cust,
        "c_custkey",
        F.substring("c_name", 1, _ER_BLOCK_LEN),
        attrs=["c_name"],
        max_block_size=_ER_MAX_BLOCK,
        on_oversize="raise",
    )
    # r13 (guide §1.2 per-task work): the match predicate is equivalent
    # to the oracle's full-string levenshtein <= k but O(k·len) instead
    # of O(len²) per pair. (a) block-key equality guarantees both names
    # share their first _ER_BLOCK_LEN characters exactly (names shorter
    # than the prefix only ever block with identical names), and edit
    # distance is invariant under common-prefix stripping, so only the
    # suffixes are compared; (b) the bounded form levenshtein(l, r, k)
    # runs the banded DP and returns -1 past the threshold — and NULL
    # inputs yield NULL in both forms, failing the filter identically.
    # Measured at sf0.1 (742,500 candidate pairs): 2.60s -> 0.36s for a
    # bit-identical 135,000-pair set.
    pairs = (
        cand.where(
            F.levenshtein(
                F.substring("c_name_a", _ER_BLOCK_LEN + 1, 2**30),
                F.substring("c_name_b", _ER_BLOCK_LEN + 1, 2**30),
                _ER_MAX_LEV,
            )
            >= 0
        )
        .select(F.col("k_a").alias("doc_a"), F.col("k_b").alias("doc_b"))
    )
    clusters = dedup_clusters(
        pairs, max_cluster_size=_ER_MAX_CLUSTER
    ).withColumnRenamed("doc_id", "c_custkey")
    return (
        cust.join(clusters, "c_custkey", "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("cluster_id"), F.col("c_custkey")).alias(
                "entity_id"
            ),
        )
        .withColumn(
            "is_canonical",
            (F.col("entity_id") == F.col("c_custkey")).cast("int"),
        )
    )
