"""Mechanical SCALE.md invariants: every registered query's physical
plan is audited for the shapes that would break at 100 TB.

Invariants (plans/audit.py):

- NO CartesianProduct anywhere — deliberate pairwise baselines plan as
  BroadcastNestedLoopJoin with a tiny build side instead.
- NO row-at-a-time Python (BatchEvalPython) except X1's deliberate
  slow-path demonstration.
- Exchange SinglePartition only where the funneled data is provably
  tiny: the 1-row final combine of a global aggregate, q_sort's
  numPartitions-row offsets frame, q_tfidf's corpus-N scalar, and the
  roundtrip queries' single-file test writes.
- BroadcastNestedLoopJoin only where the build side is dimension-tiny
  or the query is a documented O(n²) oracle baseline whose scale
  replacement ships alongside (LSH/IVF, operators/{dedup,simsearch}).

Anything new that violates these fails here FIRST, not in a 100 TB run.
"""

from __future__ import annotations

import pytest

from salesforce_postgresql_etl_spark.plans.audit import audit
from salesforce_postgresql_etl_spark.queries import registry

from .conftest import SF_DIR

_REG = registry()
_ALL = sorted(_REG)

# query -> max allowed Exchange SinglePartition nodes, with the reason
# the funneled data is small enough not to matter at scale.
_SP_ALLOWED = {
    "q_agg_global": (1, "global aggregate final combine (1 row/partition in)"),
    "q_filter_null": (1, "global aggregate final combine"),
    "q_sort": (1, "cumulative-offsets frame over numPartitions rows"),
    "q_pack_sequences": (1, "cumulative-offsets frame over numPartitions rows"),
    "q_tfidf": (1, "corpus-N scalar (1 row) broadcast back"),
    "q_csv_roundtrip": (1, "single-file test write"),
    "q_json_roundtrip": (1, "single-file test write"),
    "q_parquet_roundtrip": (1, "single-file test write"),
    "q_dq_report": (4, "four global 1-row aggregates assembled into the report row"),
    "q_bm25": (1, "avgdl/N corpus scalar (1 row) broadcast back"),
    "q_gap_fill": (2, "min/max bounds (1 row) + spine explode from that row"),
    "q_unigram_logprob": (1, "corpus token-total scalar (1 row) broadcast back"),
    "q_heavy_hitters": (1, "global rank window over the bounded MG summary (<= partitions x capacity rows), same budget class as the other sketches' final reductions"),
    "q_orc_roundtrip": (1, "single-file test write"),
    "q_pmi": (1, "bigram-total scalar (1 row) broadcast back"),
    "q_triangles": (3, "three global 1-row aggregates assembled into one row"),
    "q_pareto": (2, "offsets frame over numPartitions rows + 1-row total"),
}

# queries allowed a BroadcastNestedLoopJoin: non-equi band joins with a
# dimension-tiny build side, or documented brute-force oracle baselines.
_BNL_ALLOWED = {
    "q_join_range",  # band join, 4-row band dim broadcast
    "q_join_cross",  # deliberate cross of two 5-25 row dims
    "q_neardup_jaccard",  # brute oracle baseline; scale path = MinHash+LSH
    "q_neardup_incremental",  # brute cross-corpus oracle baseline; scale path = bipartite LSH
    "q_neardup_embed",  # brute oracle baseline; scale path = IVF/LSH
    "q_simsearch_topk",  # brute top-k baseline; scale path = IVF probe
    "q_media_embed",  # brute top-k over a 12-image fixture; scale path = IVF/PQ (tests/test_media_embed.py)
    "q_audio_embed",  # brute top-k over a 12-clip fixture; same scale story
    "q_video_embed",  # brute top-k over a 9-clip fixture; same scale story
    "q_simsearch_ivf",  # queries × k centroids ranking cross — broadcast index metadata, not data×data
    "q_neardup_embed_lsh",  # vectors × plane-matrix projection cross — broadcast index metadata (n_planes×dim)
    "q_semdedup",  # vectors × k-row trained-centroid assignment cross — broadcast index metadata (k×dim)
    "q_simsearch_pq",  # queries × codebook LUT build cross — broadcast index metadata (|Q|·m·k rows)
    "q_tfidf",  # 1-row corpus-N joined to every doc
    "q_dq_report",  # 1-row × 1-row report assembly crosses
    "q_bm25",  # 1-row avgdl/N stats joined to every scored doc
    "q_unigram_logprob",  # 1-row corpus totals joined to the vocab frame
    "q_triangles",  # 1-row × 1-row stat assembly crosses (+ brute pair oracle source)
    "q_pmi",  # 1-row bigram total joined to every scored bigram
    "q_pareto",  # 1-row revenue total joined to every ranked customer
    "q_rolling_distinct",  # deliberate band join, broadcast day spine (~30 rows)
    "q_heavy_hitters",  # 1-row MG slack total joined to the bounded summary
}

_ROW_UDF_ALLOWED = {"q_udf_scalar"}  # X1: the slow path, demonstrated once

# query -> {window partition-key tuple: why rows-per-key is bounded}.
# Every Window-family node keyed by columns must be listed here (VERDICT
# r8 #3): a window keyed by an unbounded-cardinality data column with
# hot keys (gram, band, signature, token) funnels every row of a hot
# key into ONE task — the dupspans.removal_starts trap, caught by hand
# in r8 and mechanically here since. () (global windows) are excluded:
# their funnel is the Exchange SinglePartition check above. The reason
# must say why per-key row counts stay bounded at 100 TB — or why the
# semantics genuinely need a per-key total order.
_WINDOW_ALLOWED = {
    # per-entity event history: a key's rows are one user's own
    # activity — heavy users exist, 10^7-row users don't
    "q_asof_forward": {("user_id",): "per-user event history"},
    "q_attribution": {("user_id",): "per-user event history"},
    "q_sessionize": {("user_id",): "per-user event history"},
    "q_state_running": {("user_id",): "per-user event history"},
    "q_twa": {("user_id",): "per-user event history"},
    "q_win_dedup_latest": {("user_id",): "per-user event history"},
    "q_win_firstlast": {("user_id",): "per-user event history"},
    "q_win_lag": {("user_id",): "per-user event history"},
    "q_win_range": {("user_id",): "per-user event history"},
    "q_dedup_exact": {
        ("user_id", "event_type"): "per-user-per-type event history"
    },
    # per-query candidate shortlists: rows per qid = the (pre-limited)
    # candidate set of one search query, k-bounded downstream
    "q_audio_embed": {("qid",): "per-query ANN candidate shortlist"},
    "q_media_embed": {("qid",): "per-query ANN candidate shortlist"},
    "q_video_embed": {("qid",): "per-query ANN candidate shortlist"},
    "q_simsearch_ivf": {("qid",): "per-query ANN candidate shortlist"},
    "q_simsearch_pq": {("qid",): "per-query ANN candidate shortlist"},
    "q_simsearch_topk": {("qid",): "per-query ANN candidate shortlist"},
    "q_join_asof": {
        ("p_id",): "per-probe-row as-of candidate set (WindowGroupLimit "
        "keeps only the latest match per probe)"
    },
    # per-document: rows per key bounded by one document's length/vocab
    "q_dup_spans": {("doc_id",): "per-doc duplicated-span positions"},
    "q_tfidf": {("doc_id",): "per-doc vocabulary"},
    # per-natural-parent keys with small fan-in
    "q_win_running": {("l_orderkey",): "<= 7 lineitems per order"},
    "q_win_topk_group": {
        ("o_custkey",): "orders per customer; WindowGroupLimit pushes "
        "the top-k partially before the shuffle"
    },
    # dimension-valued demos: the SEMANTIC is a total order within a
    # 5-value segment dimension — inherently n/5 rows per task; these
    # are the W2/W3 operator demonstrations, documented in SCALE.md
    "q_win_ntile": {("c_mktsegment",): "W3 demo: rank within a 5-value dim"},
    "q_win_rank": {("c_mktsegment",): "W2 demo: rank within a 5-value dim"},
    # partition-id frames: numPartitions rows per key by construction
    "q_sort": {("pid",): "cumulative-offsets frame, numPartitions rows"},
    "q_pack_sequences": {
        ("__pid",): "cumulative-offsets frame, numPartitions rows"
    },
    "q_token_budget": {
        ("__pid", "source"): "task-local running sum (grouped_prefix_sum "
        "phase 1 — rows per key bounded by the task partition)",
        ("source",): "per-domain offsets frame over numPartitions rows "
        "per domain (grouped_prefix_sum phase 2)",
    },
    "q_pareto": {
        ("__pid",): "cumulative-offsets frame, numPartitions rows"
    },
}


@pytest.fixture(scope="module")
def audits(spark):
    return {name: audit(_REG[name].fn(spark, SF_DIR)) for name in _ALL}


@pytest.mark.parametrize("name", _ALL)
def test_exchange_counts_pinned(name, audits):
    """(r12) Golden exchange-count ledger: a silent extra shuffle (or
    a broadcast degrading to a shuffled join) changes these counts and
    fails HERE, before it has to be discovered as a bench regression
    or a 100 TB wall-clock surprise. A deliberate plan change is
    recorded with ``python tests/plan_golden_regen.py`` — commit the
    one-line-per-query diff as the review artifact."""
    from .plan_golden import GOLDEN

    assert name in GOLDEN, (
        f"[{name}] not in tests/plan_golden.py — new registration? "
        f"run tests/plan_golden_regen.py"
    )
    a = audits[name]
    exp_sh, exp_bc = GOLDEN[name]
    assert (a.shuffles, a.broadcasts) == (exp_sh, exp_bc), (
        f"[{name}] plan shape moved: (shuffles, broadcasts) = "
        f"({a.shuffles}, {a.broadcasts}), golden ({exp_sh}, {exp_bc}). "
        f"If deliberate, rerun tests/plan_golden_regen.py and commit "
        f"the diff; if not, an edit added/removed an Exchange:\n{a.plan}"
    )


def test_golden_ledger_not_stale():
    """Every golden entry must still be a registered query — a rename
    or deregistration must clean up its ledger row."""
    from .plan_golden import GOLDEN

    stale = sorted(set(GOLDEN) - set(_REG))
    assert not stale, f"plan_golden.py entries not registered: {stale}"


@pytest.mark.parametrize("name", _ALL)
def test_no_cartesian_product(name, audits):
    a = audits[name]
    assert a.cartesian == 0, (
        f"[{name}] CartesianProduct in plan — O(n²) shuffle-free blowup "
        f"at scale:\n{a.plan}"
    )


@pytest.mark.parametrize("name", _ALL)
def test_no_row_python_udf(name, audits):
    a = audits[name]
    allowed = 1 if name in _ROW_UDF_ALLOWED else 0
    assert a.row_udf <= allowed, (
        f"[{name}] BatchEvalPython (row-at-a-time Python) in plan — use "
        f"pandas UDFs / built-ins:\n{a.plan}"
    )


@pytest.mark.parametrize("name", _ALL)
def test_single_partition_funnels_bounded(name, audits):
    a = audits[name]
    allowed, why = _SP_ALLOWED.get(name, (0, "no funnel expected"))
    assert a.single_partition <= allowed, (
        f"[{name}] {a.single_partition} Exchange SinglePartition node(s), "
        f"allowed {allowed} ({why}) — a full-data single-partition funnel "
        f"dies at scale:\n{a.plan}"
    )


@pytest.mark.parametrize("name", _ALL)
def test_nested_loop_joins_allowlisted(name, audits):
    a = audits[name]
    if name in _BNL_ALLOWED:
        return
    assert a.bnl_joins == 0, (
        f"[{name}] unexpected BroadcastNestedLoopJoin — non-equi or "
        f"cross join sneaked into a scale path:\n{a.plan}"
    )


@pytest.mark.parametrize("name", _ALL)
def test_window_partition_keys_allowlisted(name, audits):
    a = audits[name]
    allowed = _WINDOW_ALLOWED.get(name, {})
    for keys in a.window_parts:
        if not keys:
            continue  # global window — the SinglePartition check's job
        assert keys in allowed, (
            f"[{name}] Window partitioned by {keys} has no allowlist "
            f"reason — if the key is an unbounded-cardinality data "
            f"column with hot keys (gram/band/signature), this is the "
            f"single-reducer trap; prefer groupBy+join-back "
            f"(partial-aggregable) or add a bounded-rows-per-key "
            f"reason to _WINDOW_ALLOWED:\n{a.plan}"
        )


def test_window_allowlist_not_stale():
    """Every allowlisted query still exists — a renamed/retired query
    must take its window annotations with it."""
    for name in _WINDOW_ALLOWED:
        assert name in _REG, f"_WINDOW_ALLOWED entry for unknown query {name}"


def test_every_query_scans_parquet_not_collects(audits):
    """Every registered query's plan contains at least one FileScan or
    an in-memory scan of synthesized input — i.e. the operator is a
    distributed plan, not driver-side compute."""
    for name, a in audits.items():
        assert a.scans > 0 or "Scan ExistingRDD" in a.plan or "LocalTableScan" in a.plan, (
            f"[{name}] no scan node in plan?\n{a.plan}"
        )


def test_split_top_comparison_not_nesting():
    """r9 ADVICE (plans/audit.py _split_top): bare '<'/'>' from a
    comparison operator inside a partition-key expression must not be
    counted as nesting — it used to inflate depth permanently and
    merge all subsequent keys into one tuple. Type-annotation angles
    (ident<...>) still nest, including across their commas."""
    from salesforce_postgresql_etl_spark.plans.audit import (
        _split_top,
        window_partitions,
    )

    # comparison inside CASE WHEN: 3 keys, not 1 merged blob
    assert _split_top(
        "CASE WHEN (a#1 < b#2) THEN x#3 ELSE y#4 END, c#5, d#6"
    ) == ["CASE WHEN (a#1 < b#2) THEN x#3 ELSE y#4 END", "c#5", "d#6"]
    # '<=' / '>=' / '<=>' forms
    assert _split_top("(a#1 <= 3), (b#2 >= 4), (c#3 <=> d#4)") == [
        "(a#1 <= 3)",
        "(b#2 >= 4)",
        "(c#3 <=> d#4)",
    ]
    # type annotations still protect their inner commas
    assert _split_top(
        "cast(m#1 as map<string,int>), s#2, cast(x#3 as array<struct<a:int,b:int>>)"
    ) == [
        "cast(m#1 as map<string,int>)",
        "s#2",
        "cast(x#3 as array<struct<a:int,b:int>>)",
    ]
    # end-to-end through the plan-line parser
    plan = (
        "   +- Window [sum(v#9) windowspecdefinition(...) AS s#10], "
        "[CASE WHEN (a#1 < b#2) THEN x#3 ELSE y#4 END, c#5], "
        "[ts#6 ASC NULLS FIRST]"
    )
    assert window_partitions(plan) == (
        ("CASE WHEN (a < b) THEN x ELSE y END", "c"),
    )


def test_split_top_angle_only_after_type_keywords():
    """r10 VERDICT ("what's wrong" #2): a '<' after a non-type
    identifier (e.g. an unspaced comparison ``x<y``) must NOT open an
    angle group — previously a later genuine comparison '>' would have
    been consumed to close the phantom group, corrupting the split.
    Also the verdict's named case: a comparison following a map<...>
    annotation in the same expression list."""
    from salesforce_postgresql_etl_spark.plans.audit import _split_top

    # unspaced comparison: no phantom angle group, later ',' still splits
    assert _split_top("(x#1<y#2), a#3, (b#4>c#5)") == [
        "(x#1<y#2)",
        "a#3",
        "(b#4>c#5)",
    ]
    # CASE WHEN comparison inside a list that ALSO carries a map<...>
    # annotation: the map's angles nest, the comparison's do not
    assert _split_top(
        "cast(m#1 as map<string,int>), CASE WHEN (a#2 < b#3) THEN 1 ELSE 0 END, c#4"
    ) == [
        "cast(m#1 as map<string,int>)",
        "CASE WHEN (a#2 < b#3) THEN 1 ELSE 0 END",
        "c#4",
    ]
    # keyword must sit at a word boundary: 'submap<' is not a type
    assert _split_top("(submap#1<q#2), r#3") == ["(submap#1<q#2)", "r#3"]
    # all three type keywords still open, case-insensitively
    assert _split_top("cast(x#1 as ARRAY<MAP<string,int>>), y#2") == [
        "cast(x#1 as ARRAY<MAP<string,int>>)",
        "y#2",
    ]
    # r11 ADVICE residual edge: a bare identifier EQUAL to a type
    # keyword followed by an unspaced comparison ("map<5" — no #id
    # suffix) must not open a phantom group; the right side of a true
    # type annotation always starts an identifier, a comparison's
    # numeric right side never does
    assert _split_top("(map<5), a#1, (b#2>1)") == ["(map<5)", "a#1", "(b#2>1)"]
    assert _split_top("(array<2), x#1") == ["(array<2)", "x#1"]
    # genuine annotations still nest: right side starts with a letter
    # or underscore (struct field names)
    assert _split_top("cast(s#1 as struct<_f:int,g:map<string,int>>), t#2") == [
        "cast(s#1 as struct<_f:int,g:map<string,int>>)",
        "t#2",
    ]
