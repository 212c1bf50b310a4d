"""pack_bins operator laws (operators/packing.py). The differential
proves Spark ≡ DuckDB for the registered query; these pin the operator
properties directly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.operators.packing import pack_bins


def _toy(spark, n=100):
    rows = [(i, (i * 7) % 13 + 1) for i in range(n)]  # sizes 1..13
    return spark.createDataFrame(rows, "doc_id long, n_tok long")


def test_offsets_are_exclusive_prefix_sums(spark):
    df = _toy(spark)
    got = {
        r.doc_id: (r.offset, r.bin)
        for r in pack_bins(df, "doc_id", "n_tok", 20).collect()
    }
    sizes = {r.doc_id: r.n_tok for r in df.collect()}
    run = 0
    for i in sorted(sizes):
        assert got[i] == (run, run // 20)
        run += sizes[i]


def test_partition_independent(spark):
    df = _toy(spark, 200)
    a = sorted(map(tuple, pack_bins(df.repartition(3), "doc_id", "n_tok", 32).collect()))
    b = sorted(map(tuple, pack_bins(df.repartition(17), "doc_id", "n_tok", 32).collect()))
    assert a == b


def test_bin_capacity_semantics(spark):
    # A row straddling a boundary belongs to the bin its first token
    # lands in — consecutive bins, no gaps.
    out = pack_bins(_toy(spark), "doc_id", "n_tok", 20).collect()
    bins = sorted({r.bin for r in out})
    assert bins == list(range(len(bins)))


def test_rejects_bad_budget(spark):
    with pytest.raises(ValueError, match="budget"):
        pack_bins(_toy(spark), "doc_id", "n_tok", 0)


def _dup_order(spark):
    # order key 'grp' has ties; doc_id breaks them totally.
    rows = [(i // 3, i, (i * 5) % 7 + 1) for i in range(60)]
    return spark.createDataFrame(rows, "grp long, doc_id long, n_tok long")


def test_check_unique_fails_loudly_on_ties(spark):
    """r5 (advisor): tied order keys make offsets nondeterministic —
    the precondition must be checkable, not silent."""
    with pytest.raises(ValueError, match="total order"):
        pack_bins(_dup_order(spark), "grp", "n_tok", 20, check_unique=True)
    # with the tiebreak the same check passes
    out = pack_bins(
        _dup_order(spark), "grp", "n_tok", 20,
        tiebreak_cols=("doc_id",), check_unique=True,
    )
    assert out.count() == 60


def test_tiebreak_makes_offsets_deterministic(spark):
    df = _dup_order(spark)
    sizes = {r.doc_id: r.n_tok for r in df.collect()}
    # expected: exclusive prefix sums in (grp, doc_id) order — and
    # doc_id order == that order for this fixture
    run, expect = 0, {}
    for i in sorted(sizes):
        expect[i] = (run, run // 20)
        run += sizes[i]
    for parts in (3, 17):
        got = {
            r.doc_id: (r.offset, r.bin)
            for r in pack_bins(
                df.repartition(parts), "grp", "n_tok", 20,
                tiebreak_cols=("doc_id",),
            ).collect()
        }
        assert got == expect
