"""Consumed-id ledger compaction (r9 VERDICT residue (a) / r10 task
#4): ``compact_corpus`` folds the per-re-closure appended ledger
files under ``corpus_dir/consumed`` into one compacted distinct-id
write, through its own staged swap (``consumed__compact_tmp``;
``_SUCCESS`` is the commit point, then delete-live + rename-in).

Pinned claims:
1. Compaction bounds the file count and PRESERVES anti-join
   semantics exactly: retired ids refuse re-sends after compaction
   (the compaction-then-resend test the verdict asked for).
2. Both crash sides of the swap recover: an uncommitted stage is
   discarded (live ledger untouched); a committed stage is swapped
   in whether the live dir survived the crash, half-survived it, or
   is already gone — including the worst window, where consumed/
   does not exist at all and a naive read would see "no ledger".
3. The sink REFUSES to drain over a leftover stage (it could
   otherwise re-ingest retired ids inside the swap window), and
   reclose_corpus recovers the stage at entry so its own append
   lands in the post-swap dir, never in a doomed pre-swap one.
4. Idempotent re-closure re-appends (same ids twice) are collapsed
   by the distinct — the compacted ledger is one row per id.
"""

from __future__ import annotations

import os

import pytest

from salesforce_postgresql_etl_spark.streaming.jobs import (
    _consumed_leftover,
    _recover_consumed_compaction,
    compact_corpus,
    neardup_stream_sink,
    reclose_corpus,
)

THETA = 0.8
BANDING = {"n_hashes": 64, "bands": 16}


def _doc(tokens):
    return " ".join(tokens)


def _chain(offset):
    """A–B–C transitive chain over a token space disjoint per offset:
    reclosing after online ingest retires B (consumed tombstone) and
    C (removed from kept), i.e. two ledger entries per chain."""
    base = [f"o{offset}w{i}" for i in range(1, 21)]
    return (
        _doc(base[:18] + [f"o{offset}x1", f"o{offset}x2"]),
        _doc(base),
        _doc(base[2:] + [f"o{offset}y1", f"o{offset}y2"]),
    )


def _kept(spark, corpus_dir):
    return {
        r.doc_id for r in spark.read.parquet(corpus_dir + "/docs").collect()
    }


def _ledger(spark, corpus_dir):
    return {
        r.doc_id
        for r in spark.read.parquet(corpus_dir + "/consumed").collect()
    }


def _ledger_files(corpus_dir):
    d = os.path.join(corpus_dir, "consumed")
    return [
        f
        for root, _dirs, files in os.walk(d)
        for f in files
        if f.endswith(".parquet")
    ]


def _build_two_recloses(spark, tmp_path):
    """Two ingest+reclose cycles over disjoint chains → the ledger has
    two appended file groups: {2, 3} from cycle one, {12, 13} from
    cycle two."""
    corpus_dir = str(tmp_path / "corpus")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    a1, b1, c1 = _chain(1)
    sink(
        spark.createDataFrame(
            [(1, a1), (2, b1)], "doc_id long, text string"
        ),
        0,
    )
    sink(spark.createDataFrame([(3, c1)], "doc_id long, text string"), 1)
    reclose_corpus(spark, corpus_dir)
    a2, b2, c2 = _chain(2)
    sink(
        spark.createDataFrame(
            [(11, a2), (12, b2)], "doc_id long, text string"
        ),
        2,
    )
    sink(spark.createDataFrame([(13, c2)], "doc_id long, text string"), 3)
    reclose_corpus(spark, corpus_dir)
    assert _kept(spark, corpus_dir) == {1, 11}
    assert _ledger(spark, corpus_dir) == {2, 3, 12, 13}
    return corpus_dir, sink


def test_compaction_bounds_files_and_resends_stay_retired(spark, tmp_path):
    """Claim 1: N appended ledger files → 1 compacted file; a re-send
    of every retired id afterwards (novel dissimilar text) still
    refuses, and a genuinely new id still ingests."""
    corpus_dir, sink = _build_two_recloses(spark, tmp_path)
    assert len(_ledger_files(corpus_dir)) >= 2
    stats = compact_corpus(spark, corpus_dir)
    assert stats["consumed"]["compacted"] is True
    assert stats["consumed"]["files_after"] == 1
    assert len(_ledger_files(corpus_dir)) == 1
    assert _ledger(spark, corpus_dir) == {2, 3, 12, 13}
    sink(
        spark.createDataFrame(
            [
                (2, _doc([f"p{i}" for i in range(20)])),
                (12, _doc([f"q{i}" for i in range(20)])),
                (99, _doc([f"r{i}" for i in range(20)])),
            ],
            "doc_id long, text string",
        ),
        4,
    )
    assert _kept(spark, corpus_dir) == {1, 11, 99}


def test_compaction_collapses_idempotent_reappends(spark, tmp_path):
    """Claim 4: duplicate ledger rows (an idempotent re-closure re-run
    appending the same ids again) collapse to one row per id."""
    corpus_dir, _sink = _build_two_recloses(spark, tmp_path)
    # simulate the documented benign double-append
    spark.createDataFrame(
        [(2,), (3,)], "doc_id long"
    ).repartition(1).write.mode("append").parquet(
        corpus_dir + "/consumed"
    )
    compact_corpus(spark, corpus_dir)
    rows = spark.read.parquet(corpus_dir + "/consumed").collect()
    assert sorted(r.doc_id for r in rows) == [2, 3, 12, 13]


def test_uncommitted_stage_discarded_live_untouched(spark, tmp_path):
    """Claim 2, pre-commit crash: a stage without _SUCCESS is garbage;
    recovery deletes it and the live ledger is byte-identical."""
    corpus_dir, _sink = _build_two_recloses(spark, tmp_path)
    tmp = corpus_dir + "/consumed__compact_tmp"
    os.makedirs(tmp)
    with open(os.path.join(tmp, "part-garbage.parquet"), "wb") as f:
        f.write(b"not parquet")
    assert _consumed_leftover(spark, corpus_dir) is not None
    assert _recover_consumed_compaction(spark, corpus_dir) == 0
    assert _consumed_leftover(spark, corpus_dir) is None
    assert _ledger(spark, corpus_dir) == {2, 3, 12, 13}


def _stage_committed(spark, corpus_dir):
    """Reproduce the compaction's stage write, stopping AT the commit
    point (before any destruction) — the injected-crash fixture."""
    ids = (
        spark.read.parquet(corpus_dir + "/consumed")
        .select("doc_id")
        .distinct()
        .repartition(1)
    )
    ids.write.mode("overwrite").parquet(
        corpus_dir + "/consumed__compact_tmp"
    )


def test_committed_stage_recovers_with_live_dir_present(spark, tmp_path):
    """Claim 2, crash after commit before delete: the committed stage
    swaps in; content unchanged."""
    corpus_dir, _sink = _build_two_recloses(spark, tmp_path)
    _stage_committed(spark, corpus_dir)
    assert _recover_consumed_compaction(spark, corpus_dir) == 1
    assert _consumed_leftover(spark, corpus_dir) is None
    assert _ledger(spark, corpus_dir) == {2, 3, 12, 13}
    assert len(_ledger_files(corpus_dir)) == 1


def test_committed_stage_recovers_after_live_dir_deleted(spark, tmp_path):
    """Claim 2, the worst window — crash after delete before rename:
    consumed/ is GONE; recovery renames the stage in and every
    retired id survives."""
    import shutil

    corpus_dir, sink = _build_two_recloses(spark, tmp_path)
    _stage_committed(spark, corpus_dir)
    shutil.rmtree(corpus_dir + "/consumed")
    # inside this window the sink must refuse to drain (claim 3): a
    # naive read sees "no ledger"
    with pytest.raises(ValueError, match="consumed-ledger staging"):
        sink(
            spark.createDataFrame(
                [(2, _doc([f"z{i}" for i in range(20)]))],
                "doc_id long, text string",
            ),
            4,
        )
    assert _recover_consumed_compaction(spark, corpus_dir) == 1
    assert _ledger(spark, corpus_dir) == {2, 3, 12, 13}
    # and the retired id still refuses after recovery
    sink(
        spark.createDataFrame(
            [(2, _doc([f"z{i}" for i in range(20)]))],
            "doc_id long, text string",
        ),
        4,
    )
    assert _kept(spark, corpus_dir) == {1, 11}


def test_reclose_recovers_stage_before_appending(spark, tmp_path):
    """Claim 3: reclose_corpus at entry completes a committed swap so
    its OWN append lands in the post-swap dir — the third cycle's
    retired ids join the compacted ledger instead of being deleted
    with a doomed pre-swap dir."""
    corpus_dir, sink = _build_two_recloses(spark, tmp_path)
    a3, b3, c3 = _chain(3)
    sink(
        spark.createDataFrame(
            [(21, a3), (22, b3)], "doc_id long, text string"
        ),
        4,
    )
    sink(spark.createDataFrame([(23, c3)], "doc_id long, text string"), 5)
    _stage_committed(spark, corpus_dir)  # crash: commit, no swap
    reclose_corpus(spark, corpus_dir)
    assert _consumed_leftover(spark, corpus_dir) is None
    assert _ledger(spark, corpus_dir) == {2, 3, 12, 13, 22, 23}
    assert _kept(spark, corpus_dir) == {1, 11, 21}


def test_compact_noop_on_single_file_and_missing_ledger(spark, tmp_path):
    """A fresh corpus (no ledger) and an already-compacted one are
    clean no-ops."""
    corpus_dir = str(tmp_path / "corpus")
    sink = neardup_stream_sink(corpus_dir, threshold=THETA, **BANDING)
    sink(
        spark.createDataFrame(
            [(1, _doc([f"a{i}" for i in range(20)]))],
            "doc_id long, text string",
        ),
        0,
    )
    stats = compact_corpus(spark, corpus_dir)
    # one stable stats schema on every path (r10 ADVICE): no-op paths
    # emit files_before == files_after, never a bare 'files' key
    assert stats["consumed"] == {
        "compacted": False,
        "files_before": 0,
        "files_after": 0,
        "recovered": 0,
    }
    corpus2, _sink2 = _build_two_recloses(spark, tmp_path / "two")
    compact_corpus(spark, corpus2)
    again = compact_corpus(spark, corpus2)
    assert again["consumed"]["compacted"] is False
    assert again["consumed"]["files_before"] == 1
    assert again["consumed"]["files_after"] == 1


def test_recovery_refuses_uncommitted_stage_when_live_missing(
    spark, tmp_path
):
    """r10 ADVICE: stage without _SUCCESS + live consumed/ missing is
    unreachable under marksuccessfuljobs=true — it means the marker
    contract was violated and the stage may be the ONLY surviving
    ledger copy. Recovery must refuse (raise), never silently delete
    the stage."""
    import shutil

    corpus_dir, _sink = _build_two_recloses(spark, tmp_path)
    _stage_committed(spark, corpus_dir)
    # simulate a deployment with marker-writing disabled: strip the
    # _SUCCESS, then lose the live dir
    os.remove(corpus_dir + "/consumed__compact_tmp/_SUCCESS")
    shutil.rmtree(corpus_dir + "/consumed")
    with pytest.raises(RuntimeError, match="recovery refused"):
        _recover_consumed_compaction(spark, corpus_dir)
    # the stage is NOT deleted by the refusal — operator can inspect
    assert _consumed_leftover(spark, corpus_dir) is not None
