"""Misra-Gries frequent items (operators/sketch.py frequent_items):
exactness in the no-eviction regime, the merged lower/upper bound
under eviction and ANY partitioning, and edge cases. The registered
query's differential is in test_differential.py."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from salesforce_postgresql_etl_spark.operators.sketch import frequent_items


def _df(spark, vals, parts):
    return spark.createDataFrame(
        [(v,) for v in vals], "w string"
    ).repartition(parts)


class TestExactRegime:
    def test_matches_exact_counts_when_capacity_suffices(self, spark):
        rng = random.Random(8)
        vals = [f"t{rng.randint(0, 19)}" for _ in range(2000)]
        truth = Counter(vals)
        out = frequent_items(_df(spark, vals, 7), "w", capacity=64).collect()
        got = {r.item: (r.count_lower, r.count_upper) for r in out}
        assert got == {t: (c, c) for t, c in truth.items()}

    def test_topk_rank_ties_break_by_item(self, spark):
        vals = ["b"] * 3 + ["a"] * 3 + ["c"] * 5 + ["d"]
        out = frequent_items(
            _df(spark, vals, 3), "w", capacity=16, k=3
        ).collect()
        assert [(r.item, r.rnk) for r in sorted(out, key=lambda r: r.rnk)] == [
            ("c", 1),
            ("a", 2),
            ("b", 3),
        ]

    def test_nulls_ignored(self, spark):
        df = spark.createDataFrame(
            [("a",), (None,), ("a",), (None,)], "w string"
        )
        out = frequent_items(df, "w", capacity=4).collect()
        assert [(r.item, r.count_lower) for r in out] == [("a", 2)]


class TestBoundUnderEviction:
    @pytest.mark.parametrize("parts", [1, 3, 8])
    def test_lower_upper_bracket_truth_any_partitioning(self, spark, parts):
        """The merged guarantee count_lower ≤ true ≤ count_upper must
        hold under any partitioning even though the summary CONTENTS
        are partitioning-dependent (inherent to MG)."""
        rng = random.Random(parts)
        vals = (
            ["hot1"] * 400
            + ["hot2"] * 250
            + [f"n{rng.randint(0, 499)}" for _ in range(600)]
        )
        rng.shuffle(vals)
        truth = Counter(vals)
        out = frequent_items(_df(spark, vals, parts), "w", capacity=8).collect()
        assert out, "heavy hitters must survive eviction"
        for r in out:
            assert r.count_lower <= truth[r.item] <= r.count_upper, (
                r.item,
                r.count_lower,
                truth[r.item],
                r.count_upper,
            )
        # the true heavy hitter is always tracked: an item with
        # true > D cannot have been fully decremented away
        d_total = out[0].count_upper - out[0].count_lower
        tracked = {r.item for r in out}
        for item, c in truth.items():
            if c > d_total:
                assert item in tracked

    def test_capacity_one_majority(self, spark):
        # the classic Boyer-Moore special case: a strict majority
        # element always survives capacity=1
        vals = ["m"] * 11 + [f"x{i}" for i in range(9)]
        out = frequent_items(_df(spark, vals, 1), "w", capacity=1).collect()
        assert [r.item for r in out] == ["m"]

    def test_capacity_validation(self, spark):
        with pytest.raises(ValueError, match="capacity"):
            frequent_items(_df(spark, ["a"], 1), "w", capacity=0)
