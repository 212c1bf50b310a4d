"""Randomized entity-resolution differential (r11 depth).

The registered q_entity_match differential pins ONE fixture corpus and
a DuckDB oracle. This sweep generates seeded random dirty-duplicate
corpora — entities with 1–5 perturbed name variants, edits landing
both inside and outside the blocking prefix (so blocking-recall
boundaries are exercised, identically on both sides), plus a forced
HOT BLOCK (many records sharing one prefix) that trips the lossless
salt split — and checks the full Spark pipeline

    blocked_pairs(on_oversize="salt") → levenshtein ≤ L → dedup_clusters

against an INDEPENDENT pure-Python oracle: the same blocking rule,
a hand-rolled DP edit distance, and a hand-rolled union-find. Nothing
is shared with the Spark implementation (no DuckDB either), so this
is a genuinely independent semantics check of the whole ER chain,
including the salt path's losslessness under random hot blocks
(test_blocking.py pins that on a fixture only).

Failures print the seed; SPARK_GRAFT_ER_SEED=<seed> reproduces.
"""

from __future__ import annotations

import os
import random
import string

import pytest

# r14 tiering (VERDICT r13 #2): multi-seed randomized sweep — slow
# tier, opt in with SPARK_GRAFT_SLOW=1 (run + recorded in COVERAGE.md
# each round).
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.operators.blocking import blocked_pairs
from salesforce_postgresql_etl_spark.operators.clustering import dedup_clusters

_SEEDS = (
    [int(os.environ["SPARK_GRAFT_ER_SEED"])]
    if os.environ.get("SPARK_GRAFT_ER_SEED")
    else [47, 1009, 31337]
)

_BLOCK_LEN = 4
_MAX_LEV = 2
_MAX_BLOCK = 12  # small enough that the forced hot block trips the salt


def _lev(a: str, b: str) -> int:
    """Plain DP edit distance — the oracle's own, shared with nothing."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _perturb(rng: random.Random, name: str, n_edits: int) -> str:
    s = list(name)
    for _ in range(n_edits):
        op = rng.random()
        pos = rng.randrange(len(s))
        ch = rng.choice(string.ascii_lowercase)
        if op < 0.5:
            s[pos] = ch  # substitute (may hit the blocking prefix)
        elif op < 0.75 and len(s) > _BLOCK_LEN + 2:
            del s[pos]
        else:
            s.insert(pos, ch)
    return "".join(s)


def _corpus(rng: random.Random):
    rows = []
    rid = 0
    # a forced hot block: >2x the cap sharing one exact prefix, names
    # random in the tail so intra-block similarity varies
    hot_prefix = "zzzz"
    for _ in range(rng.randint(26, 40)):
        rid += 1
        tail = "".join(rng.choices(string.ascii_lowercase, k=rng.randint(6, 10)))
        rows.append((rid, hot_prefix + tail))
    # ordinary entities with variants
    for _ in range(rng.randint(30, 80)):
        base = "".join(rng.choices(string.ascii_lowercase, k=rng.randint(8, 14)))
        for _v in range(rng.randint(1, 5)):
            rid += 1
            rows.append((rid, _perturb(rng, base, rng.randint(0, _MAX_LEV + 1))))
    rng.shuffle(rows)
    return rows


def _oracle_labels(rows) -> dict[int, int]:
    """Same blocking rule + DP levenshtein + union-find, in Python."""
    blocks: dict[str, list[tuple[int, str]]] = {}
    for rid, name in rows:
        blocks.setdefault(name[:_BLOCK_LEN], []).append((rid, name))
    parent = {rid: rid for rid, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for members in blocks.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                (ra, na), (rb, nb) = members[i], members[j]
                if _lev(na, nb) <= _MAX_LEV:
                    union(ra, rb)
    # min-id labeling: find() roots are already min-ids because union
    # parents the larger root under the smaller
    return {rid: find(rid) for rid, _ in rows}


@pytest.mark.parametrize("seed", _SEEDS)
def test_er_chain_matches_python_oracle(spark, seed):
    rng = random.Random(seed)
    rows = _corpus(rng)
    df = spark.createDataFrame(rows, "id long, name string").repartition(
        rng.randint(1, 12)
    )
    cand = blocked_pairs(
        df,
        "id",
        F.substring("name", 1, _BLOCK_LEN),
        attrs=["name"],
        max_block_size=_MAX_BLOCK,
        on_oversize="salt",
    )
    pairs = cand.where(
        F.levenshtein("name_a", "name_b") <= _MAX_LEV
    ).select(F.col("k_a").alias("doc_a"), F.col("k_b").alias("doc_b"))
    labels = dedup_clusters(pairs)
    got = {r.doc_id: r.cluster_id for r in labels.collect()}
    want_all = _oracle_labels(rows)
    # dedup_clusters only labels ids that appear in >= 1 pair;
    # singletons label themselves (exactly q_entity_match's coalesce)
    want = {rid: lab for rid, lab in want_all.items() if got.get(rid) is not None}
    singles = {rid for rid in want_all if rid not in got}
    assert got == want, (
        f"seed={seed}: ER labels diverge from the Python oracle "
        f"(reproduce with SPARK_GRAFT_ER_SEED={seed})"
    )
    for rid in singles:
        assert want_all[rid] == rid, (
            f"seed={seed}: oracle clusters {rid} but Spark saw no pair "
            f"(salt split lost a pair?) "
            f"(reproduce with SPARK_GRAFT_ER_SEED={seed})"
        )
