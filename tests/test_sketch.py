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


# --------------------------- KLL quantile cascade ---------------------------
# KLL is randomized (operators/sketch.py docstring): no bit-exact
# cascade==direct or partition-independence assertions are possible.
# The verifiable contract is the rank-error bound, checked for both the
# cascade and the direct form, under two different partitionings.


def _rank_errors(est_df, raw_df, qs=(("q50_est", 0.5), ("q90_est", 0.9))):
    import pyspark.sql.functions as F  # noqa: PLC0415

    raw = raw_df.select(
        F.date_trunc("day", "ts").alias("day"), "event_type", "value"
    )
    j = raw.join(est_df, ["day", "event_type"])
    aggs = []
    for col, q in qs:
        aggs.append(
            (
                F.sum(F.when(F.col("value") <= F.col(col), 1).otherwise(0))
                / F.count(F.lit(1))
                - F.lit(q)
            ).alias(f"err_{col}")
        )
    rows = j.groupBy("day", "event_type").agg(*aggs).collect()
    return [
        abs(v) for r in rows for v in (r[f"err_{col}"] for col, _ in qs)
    ]


def test_kll_cascade_rank_contract(spark):
    from salesforce_postgresql_etl_spark.operators.sketch import (  # noqa: PLC0415
        quantile_cascade,
        quantile_direct,
    )

    e = load(spark, SF_DIR, "events")
    for form in (quantile_cascade, quantile_direct):
        for frame in (e, e.repartition(17)):
            errs = _rank_errors(form(frame), e)
            assert errs, "no groups produced"
            assert max(errs) <= 0.05, f"{form.__name__}: max rank err {max(errs)}"


def test_kll_direct_small_groups_tight(spark):
    # At sf0.01 each (day, type) group holds ~285 values — mostly below
    # the k=800 capacity — so rank error should sit well inside the
    # contract bound (measured ~0.026 worst-case; bound 0.05 in the
    # contract test). This pins that the tolerance isn't doing all the
    # work at small n.
    from salesforce_postgresql_etl_spark.operators.sketch import (  # noqa: PLC0415
        quantile_direct,
    )

    e = load(spark, SF_DIR, "events")
    errs = _rank_errors(quantile_direct(e), e)
    assert max(errs) <= 0.04
