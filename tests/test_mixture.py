"""Token-budget mixture selection (operators/mixture.py) contracts:
the selected set is the maximal per-group quality-ranked prefix that
fits the budget, deterministically, under any partitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.operators.mixture import budget_select


def _fixture(spark):
    # two domains; quality ties inside 'a' exercise the id tiebreak
    rows = [
        # (id, domain, quality, n_tok)
        (1, "a", 0.9, 100),
        (2, "a", 0.9, 100),  # tie with 1 — id breaks it
        (3, "a", 0.8, 150),
        (4, "a", 0.1, 10),
        (5, "b", 0.7, 300),
        (6, "b", 0.6, 100),
        (7, "b", 0.5, 1),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, dom string, q double, n_tok long"
    )


def _select(spark, budget, reparts=None):
    df = _fixture(spark)
    if reparts:
        df = df.repartition(reparts)
    out = budget_select(
        df, group_col="dom", score_col="q", size_col="n_tok",
        budget=budget, id_col="doc_id",
    )
    return {r.doc_id: (r.cum_tokens, r.selected) for r in out.collect()}


def test_prefix_semantics(spark):
    """budget 250: domain a keeps (1, 2) — 100+100 fits, adding 3
    would overflow, and 4 (tiny but lower-quality) must NOT sneak in
    past the prefix cut; domain b keeps only 5 (300 > 250 already at
    the second doc... 300 ≤ 250 is false, so even 5 is out)."""
    got = _select(spark, 250)
    assert got[1] == (100, 1)
    assert got[2] == (200, 1)
    assert got[3] == (350, 0)
    assert got[4] == (360, 0)  # prefix cut, not knapsack
    assert got[5] == (300, 0)
    assert got[6] == (400, 0)
    assert got[7] == (401, 0)


def test_budget_edges(spark):
    all_in = _select(spark, 10_000)
    assert all(v[1] == 1 for v in all_in.values())
    none_in = _select(spark, 0 + 1)  # smaller than every doc... except
    assert none_in[7] == (401, 0)  # ...7 is 1 token but NOT a prefix
    assert all(v[1] == 0 for v in none_in.values())


def test_tie_breaks_by_id(spark):
    """Docs 1 and 2 tie on quality; budget 150 admits exactly one —
    the LOWER id, every run."""
    got = _select(spark, 150)
    assert got[1][1] == 1 and got[2][1] == 0


def test_partitioning_invariance(spark):
    assert _select(spark, 250) == _select(spark, 250, reparts=1)
    assert _select(spark, 250) == _select(spark, 250, reparts=7)


def test_budget_must_be_positive(spark):
    with pytest.raises(ValueError, match="positive"):
        budget_select(
            _fixture(spark), "dom", "q", "n_tok", 0, "doc_id"
        )
