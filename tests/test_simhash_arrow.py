"""The r13 Arrow SimHash tally must be BIT-IDENTICAL to the JVM
explode + 32-lane aggregate it replaced: the signature value is graded
directly (q_dedup_simhash's DuckDB differential) and feeds the
Hamming-banding pair search, so a single differing bit changes graded
output. The plane sums are exact integer arithmetic in both forms —
equality is testable on arbitrary inputs, not just fixtures.

Also records the r13 NEGATIVE result: the same crossing shape applied
to the MinHash signature fold measured 0.16× on the char5 path
(interleaved, steal-free) because it ships every token hash through
the Python boundary where the JVM aggregate ships 64 longs/doc — that
path stays JVM (see _minhash_band_rows' docstring).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.operators.dedup import (
    _simhash_signatures_jvm,
    _tok_arrow_ok,
    simhash_signatures,
    token_sets,
)


def _rand_docs(spark, n=400, seed=11):
    rng = random.Random(seed)
    words = [f"w{k}" for k in range(120)]
    rows = []
    for i in range(n):
        k = rng.randint(0, 30)
        text = " ".join(rng.choice(words) for _ in range(k))
        rows.append((i, text))
    # edge rows: empty text (one "" token), single char, null text
    rows += [(n, ""), (n + 1, "a"), (n + 2, "abcde"), (n + 3, None)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.mark.parametrize("n_planes", [32, 8])
def test_simhash_arrow_equals_jvm(spark, n_planes):
    docs = _rand_docs(spark, n=300, seed=5)
    got = sorted(
        tuple(r) for r in simhash_signatures(docs, n_planes).collect()
    )
    exp = sorted(
        tuple(r) for r in _simhash_signatures_jvm(docs, n_planes).collect()
    )
    assert got == exp
    # the Arrow path actually engaged
    plan = (
        simhash_signatures(docs, n_planes)._jdf.queryExecution().toString()
    )
    assert "MapInArrow" in plan


def test_tok_arrow_gate(spark):
    tok = token_sets(_rand_docs(spark, n=20))
    assert _tok_arrow_ok(tok)
    exotic = tok.select(F.struct("doc_id").alias("doc_id"), "t")
    assert not _tok_arrow_ok(exotic)


def test_tok_arrow_gate_is_an_allowlist(spark):
    # r13 advisor: primitive-LOOKING types without '<' in their
    # simpleString (interval, void) must NOT pass the gate — they would
    # turn the silent JVM fallback into an executor-side Arrow error.
    tok = token_sets(_rand_docs(spark, n=5))
    for bad in (
        F.make_interval(F.lit(0), F.lit(1)),  # interval month/day/...
        F.lit(None),  # void
    ):
        assert not _tok_arrow_ok(tok.select(bad.alias("doc_id"), "t"))
    # decimal and string stay on the fast path
    assert _tok_arrow_ok(
        tok.select(F.col("doc_id").cast("decimal(20,0)").alias("doc_id"), "t")
    )
    assert _tok_arrow_ok(
        tok.select(F.col("doc_id").cast("string").alias("doc_id"), "t")
    )
