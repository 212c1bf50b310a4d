"""Dynamic partition pruning (SURVEY §4.2 — the last physical feature
with no direct proof artifact until r13; VERDICT r12 what's-missing #2).

At 100 TB the S8 partitioned-sink layout only pays off if a join
against a FILTERED dimension prunes fact partitions at runtime: the
dim filter's surviving keys are broadcast, and the fact scan's
PartitionFilters gain a `dynamicpruningexpression(...)` fed by a
`Subquery[Adaptive]Broadcast` — partitions for keys the dim filter
killed are never read. Catalyst inserts this automatically
(`spark.sql.optimizer.dynamicPartitionPruning.enabled`, default true)
when (a) the fact is partitioned on the join key and (b) the dim
filter is NOT statically derivable onto the join key.

(b) is why the dim here carries an attribute column independent of
the key: a filter like `CASE WHEN status='O' ...` is constant-folded
by InferFiltersFromConstraints into a STATIC partition filter on the
fact (verified while building this test — no DPP node appears because
none is needed; that path is q_parquet_roundtrip's static-pruning
evidence). DPP is specifically for filters only the dim's own data
can answer.

Result-equality is checked against DuckDB on the same parquet, driver
differential style. Registration as query #150 was considered and
declined: 149 non-flagship queries over 49 non-flagship slots tile a
3-round cycle with ONE declared staleness-3 deferral; a 150th makes
it two per cycle permanently, breaking the ≤1-staleness-3 invariant
the rotation policy pins (COVERAGE.md r13).

Production knobs documented in SCALE.md §r13 DPP.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.sources import load

from .conftest import SF_DIR

_DIM = [("O", "open"), ("F", "closed"), ("P", "pending")]


@pytest.fixture(scope="module")
def fact_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dpp") / "orders_by_status")
    load(spark, SF_DIR, "orders").write.mode("overwrite").partitionBy(
        "o_orderstatus"
    ).parquet(path)
    return path


def _query(spark, fact_path):
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(_DIM, ["status", "label"])
    return (
        fact.join(
            dim.where(F.col("label") == "open"),
            fact.o_orderstatus == F.col("status"),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").alias("key_sum"),
        )
    )


def _oracle_rows():
    con = duckdb.connect()
    try:
        return sorted(
            tuple(r)
            for r in con.sql(
                f"""
                SELECT o_orderstatus,
                       COUNT(*) AS n_rows,
                       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
                FROM read_parquet('{SF_DIR}/orders.parquet') o
                JOIN (VALUES ('O', 'open'), ('F', 'closed'),
                             ('P', 'pending')) AS dim(status, label)
                  ON o.o_orderstatus = dim.status
                WHERE dim.label = 'open'
                GROUP BY o_orderstatus
                """
            ).fetchall()
        )
    finally:
        con.close()


def test_dpp_subquery_injected_and_result_matches_duckdb(spark, fact_path):
    df = _query(spark, fact_path)
    rows = sorted(tuple(r) for r in df.collect())
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower(), (
        "no DPP expression in the fact scan's PartitionFilters:\n"
        + plan[:4000]
    )
    # the pruning subquery rides the dim's broadcast (reuse, ~free);
    # AQE plans it as SubqueryAdaptiveBroadcast
    assert "SubqueryBroadcast" in plan or "SubqueryAdaptiveBroadcast" in plan
    assert rows == _oracle_rows()


def test_dpp_off_no_injection_same_result(spark, fact_path):
    spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "false"
    )
    try:
        df = _query(spark, fact_path)
        rows = sorted(tuple(r) for r in df.collect())
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true"
        )
    assert "dynamicpruning" not in plan.lower()
    assert rows == _oracle_rows()  # DPP is a scan optimization only


def test_static_inference_preempts_dpp_when_filter_folds_to_key(
    spark, fact_path
):
    """The negative control that shaped the dim design: a dim filter
    expressible as a function of the join key is statically inferred
    onto the fact scan (constant partition filter, better than DPP) —
    asserting DPP's ABSENCE here pins why the attribute column in the
    positive test is load-bearing."""
    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(_DIM, ["status", "label"]).select(
        "status",
        F.when(F.col("status") == "O", 1).otherwise(0).alias("open_flag"),
    )
    df = (
        fact.join(
            dim.where(F.col("open_flag") == 1),
            fact.o_orderstatus == F.col("status"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" not in plan.lower()
    # the fact scan carries the inferred CONSTANT partition filter
    assert "= O)" in plan, plan[:4000]
