"""SCD Type 2 merge: classification, no-op snapshots, multi-batch history."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.operators.scd import scd2_apply

T0, T1, T2 = "2024-01-01 00:00:00", "2024-02-01 00:00:00", "2024-03-01 00:00:00"


def _dim(spark, rows):
    return spark.createDataFrame(
        [(k, s, dt.datetime.fromisoformat(f), dt.datetime.fromisoformat(t) if t else None)
         for k, s, f, t in rows],
        "k long, seg string, valid_from timestamp_ntz, valid_to timestamp_ntz",
    )


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, seg string")


def test_classification(spark):
    cur = _dim(spark, [(1, "A", T0, None), (2, "B", T0, None), (3, "C", T0, None)])
    inc = _snap(spark, [(1, "A"), (2, "B2"), (4, "D")])  # 3 deleted, 2 changed, 4 new
    out = {(r.k, r.seg, r.valid_to is None) for r in scd2_apply(cur, inc, "k", ["seg"], T1).collect()}
    assert out == {
        (1, "A", True),     # unchanged, still open
        (2, "B", False),    # old version closed
        (2, "B2", True),    # new version open
        (3, "C", False),    # deleted → closed
        (4, "D", True),     # insert → open
    }


def test_noop_snapshot_is_identity(spark):
    cur = _dim(spark, [(1, "A", T0, None), (2, "B", T0, "2024-01-15 00:00:00")])
    inc = _snap(spark, [(1, "A")])
    got = sorted(tuple(r) for r in scd2_apply(cur, inc, "k", ["seg"], T1).collect())
    want = sorted(tuple(r) for r in cur.collect())
    assert got == want


def test_two_batches_accumulate_history(spark):
    cur = _dim(spark, [(1, "A", T0, None)])
    b1 = scd2_apply(cur, _snap(spark, [(1, "B")]), "k", ["seg"], T1)
    b2 = scd2_apply(b1, _snap(spark, [(1, "C")]), "k", ["seg"], T2)
    rows = sorted((r.seg, str(r.valid_from)[:10], str(r.valid_to)[:10] if r.valid_to else None)
                  for r in b2.collect())
    assert rows == [
        ("A", "2024-01-01", "2024-02-01"),
        ("B", "2024-02-01", "2024-03-01"),
        ("C", "2024-03-01", None),
    ]


def test_null_tracked_values(spark):
    # IS-DISTINCT-FROM semantics: NULL→NULL is unchanged, NULL→value is a change
    cur = _dim(spark, [(1, None, T0, None), (2, None, T0, None)])
    inc = _snap(spark, [(1, None), (2, "X")])
    out = {(r.k, r.seg, r.valid_to is None) for r in scd2_apply(cur, inc, "k", ["seg"], T1).collect()}
    assert out == {(1, None, True), (2, None, False), (2, "X", True)}
