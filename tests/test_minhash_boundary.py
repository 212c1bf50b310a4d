"""In-suite deterministic slice of the r13 boundary-mass measurement
(tests/minhash_boundary_recall.py — the full 50k/30k-pair run lives
there; SCALE.md r13 has its numbers).

Every constructed pair sits at Jaccard == theta EXACTLY, which pins a
regression class the fixture differentials cannot see: the fixture's
planted dups live at J ~ 1, so an off-by-strictness break in the
final verify (`>` for `>=`), a mis-rounded threshold constant, or a
prefilter that excludes ratio-exactly-theta pairs would drop every
BOUNDARY pair while leaving the fixture green. At these sizes the
expected banding-tail miss count is ~0.1 and the corpora are
deterministic prefixes of the measured full run (which observed its
first miss far past this prefix), so strict equality is stable — a
banding regression misses ~23%+ here, three orders of magnitude
above the tail.
"""

from __future__ import annotations

import random

from salesforce_postgresql_etl_spark.operators.dedup import (
    neardup_pairs,
    neardup_pairs_cross,
)

from .minhash_boundary_recall import (
    THETA_CHAR5,
    THETA_WORDS,
    char5_corpus,
    exact_truth,
    pairset,
    words_corpus,
)

_P_WORDS = 600
_P_CHAR5 = 500
_SEED = 41957  # same seed as the full measurement run


def test_words_boundary_pairs_all_found(spark):
    docs = spark.createDataFrame(words_corpus(_P_WORDS), ["doc_id", "text"])
    truth, below = exact_truth(spark, docs, "words", THETA_WORDS)
    assert below == 0 and len(truth) == _P_WORDS
    emitted = pairset(
        neardup_pairs(docs, threshold=THETA_WORDS, strategy="minhash")
    )
    assert emitted == truth

    # bipartite path: same banding, same geometry
    new_b = docs.where("doc_id % 2 = 0")
    corp = docs.where("doc_id % 2 = 1")
    emitted_x = pairset(
        neardup_pairs_cross(
            new_b, corp, threshold=THETA_WORDS, strategy="minhash"
        )
    )
    assert emitted_x == truth


def test_char5_boundary_pairs_all_found(spark):
    docs = spark.createDataFrame(
        char5_corpus(_P_CHAR5, random.Random(_SEED)), ["doc_id", "text"]
    )
    truth, below = exact_truth(spark, docs, "char5", THETA_CHAR5)
    assert below == 0
    emitted = pairset(
        neardup_pairs(
            docs,
            threshold=THETA_CHAR5,
            strategy="minhash",
            n_hashes=64,
            bands=16,
            tokenizer="char5",
        )
    )
    assert emitted == truth
