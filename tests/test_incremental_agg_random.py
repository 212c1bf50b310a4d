"""Seeded randomized merge-tree differential for incremental
aggregate maintenance (operators/incremental_agg.py).

The fixture test pins the monoid law on two fold shapes over the
events table; this sweep generates random data (negative values,
groups missing from some batches, empty batches), splits it into a
random number of batches, folds the per-batch states through a
RANDOM merge tree, and compares the finalized surface row-for-row
against a from-scratch DuckDB aggregate using the same determinism
expressions the registered oracle uses — so the check covers the
exact-decimal internals AND the double finalization, not just Spark
against itself. Seeded ``random.Random``; failures print the seed.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

# r14 tiering (VERDICT r13 #2): multi-seed randomized sweep — slow
# tier, opt in with SPARK_GRAFT_SLOW=1 (run + recorded in COVERAGE.md
# each round).
pytestmark = pytest.mark.slow

from salesforce_postgresql_etl_spark.functions.determinism import (
    sql_dec_sum_to_double,
)
from salesforce_postgresql_etl_spark.operators.incremental_agg import (
    agg_state,
    finalize_agg_state,
    merge_agg_state,
)

_G = ["grp"]
_SCHEMA = "grp string, value double"


def _gen(rng):
    groups = ["a", "b", "c", "d"]
    return [
        (rng.choice(groups), rng.randint(-99_999, 99_999) / 100.0)
        for _ in range(rng.randint(60, 120))
    ]


@pytest.mark.parametrize("seed", [19, 73, 167])
def test_random_merge_tree_matches_duckdb(spark, seed):
    rng = random.Random(seed)
    rows = _gen(rng)

    # random disjoint batches (some possibly empty)
    n_batches = rng.randint(2, 6)
    batches = [[] for _ in range(n_batches)]
    for row in rows:
        batches[rng.randrange(n_batches)].append(row)
    states = [
        agg_state(spark.createDataFrame(b, _SCHEMA), _G, "value")
        if b
        else agg_state(spark.createDataFrame([], _SCHEMA), _G, "value")
        for b in batches
    ]

    # fold through a random merge tree
    while len(states) > 1:
        i = rng.randrange(len(states) - 1)
        merged = merge_agg_state(states[i], states.pop(i + 1), _G)
        states[i] = merged
    got = sorted(
        tuple(r) for r in finalize_agg_state(states[0], _G).collect()
    )

    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["grp", "value"]))
    want = sorted(
        tuple(r)
        for r in con.sql(
            f"""
            SELECT grp,
                   COUNT(*) AS n,
                   {sql_dec_sum_to_double("CAST(value AS DECIMAL(18,2))", 2)}
                       AS sum_val,
                   MIN(value) AS min_val,
                   MAX(value) AS max_val,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                     / (COUNT(*) * 100) AS avg_val
            FROM t GROUP BY grp
            """
        ).fetchall()
    )
    assert got == want, f"seed {seed}: {got[:3]!r} vs {want[:3]!r}"
