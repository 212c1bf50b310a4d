"""The as-of bucket-merge operator (operators/asof.py) must reproduce
the band-join form exactly — the band join is the oracle (it's what
``q_join_asof`` registers, DuckDB-checked by the differential); the
merge is the 100 TB plan shape. Plus edge-case and plan-shape checks
the fixture can't force."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.operators.asof import asof_backward_join
from salesforce_postgresql_etl_spark.queries import registry
from salesforce_postgresql_etl_spark.sources import load

from .conftest import SF_DIR


def _purchases_clicks(spark):
    e = load(spark, SF_DIR, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )
    c = e.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("asof_click_id"),
        F.col("ts").alias("asof_click_ts"),
    )
    return p, c


def test_merge_equals_band_join_on_fixture(spark):
    band = registry()["q_join_asof"].fn(spark, SF_DIR)
    p, c = _purchases_clicks(spark)
    merge = asof_backward_join(
        p, c, keys=["user_id"], probe_ts="p_ts", quote_ts="asof_click_ts",
        tiebreak="asof_click_id",
    ).select("user_id", "p_id", "p_ts", "asof_click_id", "asof_click_ts")
    key = lambda r: (r.p_id,)
    assert sorted(merge.collect(), key=key) == sorted(band.collect(), key=key)


def test_merge_edge_cases(spark):
    ts = lambda s: datetime.datetime.fromisoformat(s)
    quotes = spark.createDataFrame(
        [
            (1, 10, ts("2024-01-01T10:00:00"), "a"),
            (1, 11, ts("2024-01-01T10:00:00"), "b"),  # ts tie: max id wins
            (1, 12, ts("2024-01-01T12:00:00"), "c"),
            (2, 20, ts("2024-01-01T09:00:00"), "d"),
        ],
        "user_id long, q_id long, q_ts timestamp, q_val string",
    )
    probes = spark.createDataFrame(
        [
            (1, 100, ts("2024-01-01T10:00:00")),  # equal ts → eligible (<=)
            (1, 101, ts("2024-01-01T11:59:59")),  # between quotes
            (1, 102, ts("2024-01-01T09:00:00")),  # before all → NULL
            (2, 200, ts("2024-01-01T09:00:00")),  # exact match other key
            (3, 300, ts("2024-01-01T10:00:00")),  # key with no quotes
        ],
        "user_id long, p_id long, p_ts timestamp",
    )
    out = {
        r.p_id: (r.q_id, r.q_val)
        for r in asof_backward_join(
            probes, quotes, keys=["user_id"], probe_ts="p_ts",
            quote_ts="q_ts", tiebreak="q_id",
        ).collect()
    }
    assert out[100] == (11, "b")   # tie on quote ts → greatest tiebreak
    assert out[101] == (11, "b")   # latest at-or-before, not the later 12:00
    assert out[102] == (None, None)
    assert out[200] == (20, "d")
    assert out[300] == (None, None)


def test_merge_plan_has_no_join(spark):
    # The whole point: ONE hash exchange + sort + window, zero join
    # operators — per-key cost is linear-in-rows, never quadratic.
    p, c = _purchases_clicks(spark)
    df = asof_backward_join(
        p, c, keys=["user_id"], probe_ts="p_ts", quote_ts="asof_click_ts",
        tiebreak="asof_click_id",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("hashpartitioning(user_id") >= 1
    assert "Window" in plan


def test_merge_rejects_column_collisions(spark):
    import pytest

    p, c = _purchases_clicks(spark)
    with pytest.raises(ValueError, match="collision"):
        asof_backward_join(
            p, p.withColumnRenamed("user_id", "u2").withColumnRenamed("p_ts", "q_ts"),
            keys=[], probe_ts="p_ts", quote_ts="q_ts",
        )


# ----------------------------- forward variant -----------------------------


def test_forward_equals_band_join_on_fixture(spark):
    """Forward merge vs the band-join form computed inline: for each
    purchase, the earliest click at-or-after; ties -> smallest id."""
    from pyspark.sql import Window
    from salesforce_postgresql_etl_spark.operators.asof import asof_forward_join

    p, c = _purchases_clicks(spark)
    merge = asof_forward_join(
        p, c, keys=["user_id"], probe_ts="p_ts", quote_ts="asof_click_ts",
        tiebreak="asof_click_id",
    ).select("user_id", "p_id", "p_ts", "asof_click_id", "asof_click_ts")

    band = (
        p.join(c, "user_id", "left")
        .where(F.col("asof_click_ts") >= F.col("p_ts"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("p_id").orderBy(
                    F.asc("asof_click_ts"), F.asc("asof_click_id")
                )
            ),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    # band form drops no-match probes; re-add them with NULL payload
    matched_ids = [r.p_id for r in band.select("p_id").collect()]
    unmatched = p.where(~F.col("p_id").isin(matched_ids)).select(
        "user_id", "p_id", "p_ts",
        F.lit(None).cast("long").alias("asof_click_id"),
        F.lit(None).cast("timestamp_ntz").alias("asof_click_ts"),
    )
    want = band.select(merge.columns).unionByName(unmatched)
    key = lambda r: (r.p_id,)
    assert sorted(merge.collect(), key=key) == sorted(want.collect(), key=key)


def test_forward_edge_cases(spark):
    import datetime as dt
    from salesforce_postgresql_etl_spark.operators.asof import asof_forward_join

    ts = lambda s: dt.datetime.fromisoformat(s)
    probe = spark.createDataFrame(
        [(1, "p1", ts("2024-01-01T10:00")), (1, "p2", ts("2024-01-01T23:00"))],
        "k long, pid string, pts timestamp_ntz",
    )
    quote = spark.createDataFrame(
        [
            # exact-ts quote: eligible (>= semantics)
            (1, 10, ts("2024-01-01T10:00")),
            # tie at 12:00 -> SMALLEST id (20) must win
            (1, 21, ts("2024-01-01T12:00")),
            (1, 20, ts("2024-01-01T12:00")),
        ],
        "k long, qid long, qts timestamp_ntz",
    )
    got = {
        r["pid"]: (r["qid"])
        for r in asof_forward_join(
            probe, quote, ["k"], "pts", "qts", tiebreak="qid"
        ).collect()
    }
    assert got["p1"] == 10  # exact ts eligible
    assert got["p2"] is None  # nothing after 23:00

    probe2 = spark.createDataFrame(
        [(1, "p3", ts("2024-01-01T11:00"))], "k long, pid string, pts timestamp_ntz"
    )
    got2 = asof_forward_join(
        probe2, quote, ["k"], "pts", "qts", tiebreak="qid"
    ).collect()[0]
    assert got2["qid"] == 20  # smallest id among the 12:00 tie
