"""Runtime bloom-filter join pruning (Catalyst-injected).

Spark's optimizer can inject a bloom filter built from the selective
(creation) side of a shuffle join into the scan of the large
(application) side — rows that cannot match are dropped BEFORE the
shuffle, which at 100 TB is the difference between shuffling the whole
fact table and shuffling the ~matching fraction. This is the idiomatic
Spark answer to "semi-join pushdown": no custom operator, just
`spark.sql.optimizer.runtime.bloomFilter.*` (enabled by default; the
size thresholds are what gate it at fixture scale).

There is no public `bloom_filter_agg` SQL function to build a manual
bloom operator from (verified: UNRESOLVED_ROUTINE), so the engine's
bloom story is exactly this injection — these tests pin that (a) the
injection fires under the documented conditions and (b) it never
changes results (bloom false positives are re-checked by the join).
SCALE.md documents the production thresholds.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.sources import load

from .conftest import SF_DIR

_CONFS = {
    # force a shuffle join (the injection targets shuffle joins: with a
    # broadcast, the filter is pointless) and drop the size gates that
    # 60k-row fixtures can't meet.
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


@contextmanager
def _confs(spark, overrides):
    saved = {}
    for k, v in overrides.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _join(spark):
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, SF_DIR, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))


def test_bloom_filter_injected_and_result_unchanged(spark):
    baseline = sorted(tuple(r) for r in _join(spark).collect())

    with _confs(spark, _CONFS):
        df = _join(spark)
        rows = sorted(tuple(r) for r in df.collect())
        plan = df._jdf.queryExecution().executedPlan().toString()

    assert "might_contain" in plan, (
        "runtime bloom filter was not injected into the application side:\n"
        + plan[:4000]
    )
    assert "bloom_filter_agg" in plan
    assert rows == baseline  # false positives re-checked by the exact join


def test_bloom_filter_off_means_no_injection(spark):
    off = dict(_CONFS)
    off["spark.sql.optimizer.runtime.bloomFilter.enabled"] = "false"
    with _confs(spark, off):
        df = _join(spark)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" not in plan
