"""Seeded randomized DuckDB differential for the as-of merge join
(operators/asof.py — SURVEY §2.4 J9's bucket-merge scale path).

The fixture tests pin edge cases and band-join equivalence; this
sweep generates adversarial random inputs nobody hand-picked — a
SMALL timestamp range so quote-ts ties and exact-at-probe-ts quotes
occur constantly, plus probe-only keys, quote-only keys, and probes
before any quote — and compares both directions row-for-row against
an independent deterministic oracle: DuckDB ``LEFT JOIN LATERAL
(... ORDER BY ts, tb LIMIT 1)``, the literal spec of "latest quote
at-or-before (earliest at-or-after), greatest (smallest) tiebreak
wins". Seeded ``random.Random``; failures print the seed.
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

from salesforce_postgresql_etl_spark.operators.asof import (
    asof_backward_join,
    asof_forward_join,
)


def _gen(rng: random.Random):
    """Random probe/quote tables over 6 keys: k0 quote-only, k5
    probe-only, ts drawn from [0, 24] so ties are dense. tb is unique
    per quote row → the tie-broken answer is a single row."""
    keys = [f"k{i}" for i in range(6)]
    quotes = [
        (rng.choice(keys[:-1]), rng.randint(0, 24), i, f"q{i}")
        for i in range(rng.randint(25, 45))
    ]
    probes = [
        (rng.choice(keys[1:]), rng.randint(0, 24), f"p{j}")
        for j in range(rng.randint(25, 45))
    ]
    return probes, quotes


def _oracle(con, forward: bool):
    cmp_op, direction = (">=", "ASC") if forward else ("<=", "DESC")
    return con.sql(
        f"""
        SELECT p.key, p.pts, p.pname, q.qts, q.tb, q.payload
        FROM probe p LEFT JOIN LATERAL (
            SELECT qts, tb, payload FROM quote q
            WHERE q.key = p.key AND q.qts {cmp_op} p.pts
            ORDER BY q.qts {direction}, q.tb {direction} LIMIT 1
        ) q ON TRUE
        """
    ).fetchall()


@pytest.mark.parametrize("seed", [5, 17, 59, 131, 211])
def test_asof_both_directions_match_duckdb(spark, seed):
    rng = random.Random(seed)
    probes, quotes = _gen(rng)
    probe = spark.createDataFrame(
        probes, "key string, pts long, pname string"
    )
    quote = spark.createDataFrame(
        quotes, "key string, qts long, tb long, payload string"
    )
    con = duckdb.connect()
    con.register(
        "probe", pd.DataFrame(probes, columns=["key", "pts", "pname"])
    )
    con.register(
        "quote",
        pd.DataFrame(quotes, columns=["key", "qts", "tb", "payload"]),
    )
    for forward, fn in ((False, asof_backward_join), (True, asof_forward_join)):
        got = sorted(
            tuple(r)
            for r in fn(
                probe, quote, ["key"], "pts", "qts", tiebreak="tb"
            )
            .select("key", "pts", "pname", "qts", "tb", "payload")
            .collect()
        )
        want = sorted(tuple(r) for r in _oracle(con, forward))
        assert got == want, (
            f"seed {seed} forward={forward}: "
            f"only-spark={sorted(set(got) - set(want))[:5]!r} "
            f"only-duckdb={sorted(set(want) - set(got))[:5]!r}"
        )


@pytest.mark.parametrize("seed", [23, 97])
def test_asof_no_tiebreak_on_unique_ts(spark, seed):
    """With quote_ts unique per key, tiebreak=None must give the same
    answer as the tie-broken form (ties are the only thing tiebreak
    resolves)."""
    rng = random.Random(seed)
    probes, quotes = _gen(rng)
    seen, uniq = set(), []
    for k, ts, tb, pay in quotes:
        if (k, ts) not in seen:
            seen.add((k, ts))
            uniq.append((k, ts, tb, pay))
    probe = spark.createDataFrame(
        probes, "key string, pts long, pname string"
    )
    quote = spark.createDataFrame(
        uniq, "key string, qts long, tb long, payload string"
    )
    cols = ["key", "pts", "pname", "qts", "tb", "payload"]
    for fn in (asof_backward_join, asof_forward_join):
        with_tb = sorted(
            tuple(r)
            for r in fn(probe, quote, ["key"], "pts", "qts", tiebreak="tb")
            .select(*cols)
            .collect()
        )
        without = sorted(
            tuple(r)
            for r in fn(probe, quote, ["key"], "pts", "qts")
            .select(*cols)
            .collect()
        )
        assert with_tb == without, f"seed {seed} {fn.__name__}"
