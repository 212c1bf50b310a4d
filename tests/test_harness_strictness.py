"""The local differential mirror must be DRIVER-strict — these tests
pin the harness itself against the three failure classes the round-2
grading driver caught that the old (looser) mirror waved through:

1. array-typed output cells → the driver's pandas canonicalizer crashes
   (sort_values → factorize → unhashable list); the mirror must raise,
   not silently tuple-ize.
2. int-vs-float dtype skew (Spark BIGINT 123 vs oracle DOUBLE 123.0) →
   values equal, driver hash differs; the mirror must fail the compare.
3. decimal scale skew (1.570 vs 1.57) → same class.

Plus the non-regression direction: equal frames with matching dtypes
must pass, including nulls, dates, and timestamps (where the two
engines' pandas conversions legitimately differ in container type).
"""

from __future__ import annotations

import pytest

from .differential import CellTypeError, compare


def test_equal_frames_pass(spark, duck):
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], "k long, s string, v double")
    compare(df, duck, "SELECT * FROM (VALUES (1, 'a', 1.5), (2, 'b', 2.5)) t(k, s, v)")


def test_array_cell_raises_driver_crash_class(spark, duck):
    df = spark.createDataFrame([(1, ["x", "y"])], "k long, parts array<string>")
    with pytest.raises(CellTypeError):
        compare(df, duck, "SELECT 1 AS k, ['x', 'y'] AS parts")


def test_int_vs_float_dtype_skew_fails(spark, duck):
    # Spark emits BIGINT 123; oracle emits DOUBLE 123.0 — equal values,
    # driver-distinct hashes. The strict mirror must fail.
    df = spark.createDataFrame([(123,)], "v long")
    with pytest.raises(AssertionError, match="value-hash mismatch"):
        compare(df, duck, "SELECT 123.0 AS v")


def test_decimal_scale_skew_fails(spark, duck):
    df = spark.createDataFrame([(1,)], "k long").selectExpr(
        "CAST(1.57 AS DECIMAL(7,3)) AS d"
    )
    with pytest.raises(AssertionError, match="value-hash mismatch"):
        compare(df, duck, "SELECT CAST(1.57 AS DECIMAL(7,2)) AS d")


def test_decimal_outputs_flagged_even_when_matched(spark, duck):
    """Even scale-matched decimals are a parity hazard: Spark's
    toPandas keeps Decimal('1.570') objects while DuckDB's .df() lands
    float64 1.57 — different pandas containers for the same value. The
    repo's doctrine is therefore NO decimal-typed registered outputs
    (sums run in decimal internally, outputs convert to double;
    enforced in test_output_contract.py) and the mirror deliberately
    fails rather than guessing what a grading canonicalizer would do."""
    df = spark.createDataFrame([(1,)], "k long").selectExpr(
        "CAST(1.57 AS DECIMAL(7,3)) AS d"
    )
    with pytest.raises(AssertionError, match="value-hash mismatch"):
        compare(df, duck, "SELECT CAST(1.57 AS DECIMAL(7,3)) AS d")


def test_nulls_and_temporals_pass(spark, duck):
    df = spark.createDataFrame(
        [(None, "2024-03-15", "2024-03-15 10:30:00")],
        "v string, d string, ts string",
    ).selectExpr("v", "CAST(d AS DATE) AS d", "CAST(ts AS TIMESTAMP_NTZ) AS ts")
    compare(
        df,
        duck,
        "SELECT CAST(NULL AS VARCHAR) AS v, DATE '2024-03-15' AS d, "
        "TIMESTAMP '2024-03-15 10:30:00' AS ts",
    )


def test_value_difference_fails(spark, duck):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    with pytest.raises(AssertionError, match="value-hash mismatch"):
        compare(df, duck, "SELECT 1 AS k, 'b' AS s")


def test_row_count_difference_fails(spark, duck):
    df = spark.createDataFrame([(1,), (2,)], "k long")
    with pytest.raises(AssertionError, match="row count mismatch"):
        compare(df, duck, "SELECT 1 AS k")


def test_column_name_difference_fails(spark, duck):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(AssertionError, match="column mismatch"):
        compare(df, duck, "SELECT 1 AS kk")
