"""Seeded randomized UNION-FIND differential for all three connected-
components strategies (operators/clustering.py: label propagation,
star contraction, edge contraction).

The existing random-graph tests compare the strategies to EACH OTHER
— a shared semantic bug would agree with itself. This sweep compares
each against an independent driver-side union-find oracle (the
textbook algorithm, ~15 lines, no Spark) on three adversarial graph
families: sparse uniform (self-loops included), chain-heavy (long
paths with random chords — the diameter stressor), and dense blobs
bridged by single edges (the hub/merge stressor). Component label
contract: the MINIMUM node id in the component. Seeded
``random.Random``; failures print the seed and family.
"""

from __future__ import annotations

import random

import pytest

# r14 tiering (VERDICT r13 #2): multi-seed randomized sweep — slow
# tier, opt in with SPARK_GRAFT_SLOW=1 (run + recorded in COVERAGE.md
# each round).
pytestmark = pytest.mark.slow

from salesforce_postgresql_etl_spark.operators.clustering import (
    connected_components,
    connected_components_contract,
    connected_components_star,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps = {}
    for node in list(parent):
        comps.setdefault(find(node), []).append(node)
    return {
        node: min(members)
        for members in comps.values()
        for node in members
    }


def _sparse(rng):
    n = rng.randint(40, 90)
    return [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(rng.randint(n // 2, n))
    ]


def _chains(rng):
    """Several long paths (diameter up to ~35 — labelprop's stressor)
    plus a few random chords that may splice them."""
    edges, base = [], 0
    for _ in range(rng.randint(2, 4)):
        length = rng.randint(15, 35)
        edges += [(base + i, base + i + 1) for i in range(length)]
        base += length + 1 + rng.randint(0, 3)
    for _ in range(rng.randint(0, 4)):
        edges.append((rng.randrange(base), rng.randrange(base)))
    return edges


def _blobs(rng):
    """Dense cliques bridged by single edges — the star/contract
    hub-merge stressor."""
    edges, base, anchors = [], 0, []
    for _ in range(rng.randint(3, 5)):
        size = rng.randint(4, 9)
        nodes = [base + i for i in range(size)]
        edges += [
            (u, v) for i, u in enumerate(nodes) for v in nodes[i + 1 :]
        ]
        anchors.append(rng.choice(nodes))
        base += size + rng.randint(0, 2)
    for i in range(len(anchors) - 1):
        if rng.random() < 0.6:
            edges.append((anchors[i], anchors[i + 1]))
    return edges


_FAMILIES = {"sparse": _sparse, "chains": _chains, "blobs": _blobs}
_STRATEGIES = {
    "labelprop": connected_components,
    "star": connected_components_star,
    "contract": connected_components_contract,
}


@pytest.mark.parametrize("seed", [3, 41, 107])
@pytest.mark.parametrize("family", sorted(_FAMILIES))
def test_cc_strategies_match_union_find(spark, seed, family):
    # NOT hash(family): str hash is per-process randomized — the seed
    # must reproduce across runs
    rng = random.Random(seed * 1000 + sum(family.encode()))
    edges = _FAMILIES[family](rng)
    want = _union_find(edges)
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    for sname, fn in _STRATEGIES.items():
        got = {r.node: r.comp for r in fn(df).collect()}
        assert got == want, (
            f"seed {seed} family {family} strategy {sname}: "
            f"{len(edges)} edges — first diffs "
            f"{dict(list({k: (got.get(k), want.get(k)) for k in set(got) | set(want) if got.get(k) != want.get(k)}.items())[:5])!r}"
        )
