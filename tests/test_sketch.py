"""HLL distinct cascade: sketch-merge losslessness + estimate accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.operators.sketch import (
    distinct_cascade,
    distinct_direct,
)
from salesforce_postgresql_etl_spark.sources import load

from .conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cascade_equals_direct_sketch(spark):
    # The whole point: unioning minute-level sketch partials up to day
    # grain must give BIT-IDENTICAL estimates to sketching raw events
    # at day grain — merge is exact; only the sketch approximates.
    e = load(spark, SF_DIR, "events")
    assert _rows(distinct_cascade(e)) == _rows(distinct_direct(e))


def test_estimates_near_truth(spark):
    e = load(spark, SF_DIR, "events")
    truth = {
        (r.day, r.event_type): r.n
        for r in e.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in distinct_cascade(e).collect():
        exact = truth[(r.day, r.event_type)]
        assert abs(r.n_distinct_est - exact) <= max(3, 0.05 * exact)


def test_cascade_partition_independent(spark):
    e = load(spark, SF_DIR, "events")
    assert _rows(distinct_cascade(e)) == _rows(
        distinct_cascade(e.repartition(17))
    )
