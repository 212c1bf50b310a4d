"""Invariants of the mechanized rotation draft (r12) — the policy the
round-over-round rotations hand-applied from r10 on, now pinned:

- the draft is exactly 50 unique registered names, flagship LAST;
- never-green registrations front before any green query;
- staleness dominates: no query in the draft is FRESHER than an
  excluded (non-flagship) query that is staler;
- within a staleness class, registration order decides, so the
  deferred query is the LAST of the overflow class in registration
  order and is never in the draft;
- against the live artifacts, the draft for the CURRENT state matches
  what the executed _RN_FRONT comment promised for the next round
  (after the r13 rotation: q_parquet_roundtrip fronts first in r14).
"""

from __future__ import annotations

from .coverage_ledger import latest_green, next_rotation_draft


def _toy(reg, green, front):
    return next_rotation_draft(reg, green, front, flagship="f")


def test_toy_policy_shape():
    # 60 queries: f flagship, q00..q58; greens staggered over 3 rounds
    reg = ["f"] + [f"q{i:02d}" for i in range(59)]
    green = {q: 5 + (i % 3) for i, q in enumerate(reg)}
    front = reg[:50]
    draft, deferred = _toy(reg, green, front)
    assert len(draft) == 50 and len(set(draft)) == 50
    assert draft[-1] == "f"
    assert deferred not in draft and deferred in reg


def test_toy_never_green_fronts_first():
    reg = ["f"] + [f"q{i:02d}" for i in range(59)]
    green = {q: 7 for q in reg if q not in ("q10", "q40")}
    # never-green q10/q40 were registered PAST the pinned window, so
    # they are not in it — the draft must front them first
    front = [q for q in reg if q not in ("q10", "q40")][:50]
    draft, _ = _toy(reg, green, front)
    assert draft[0] == "q10" and draft[1] == "q40"


def test_toy_staleness_dominates_and_tiebreak_is_registration_order():
    reg = ["f"] + [f"q{i:02d}" for i in range(59)]
    # q58 is the one stale (r5) query and NOT in the pinned front;
    # everything else greens at r7 (or r8 after the assumed front win)
    green = {q: 7 for q in reg}
    green["q58"] = 5
    front = [q for q in reg if q != "q58"][:50]
    draft, deferred = _toy(reg, green, front)
    assert draft[0] == "q58"
    # the overflow class is the r7-greens not in front; the deferred
    # one must be the LAST of that class in registration order
    outside = [q for q in reg if q not in front and q not in ("q58", "f")]
    assert deferred is not None
    # deferred is staler-or-equal to every excluded non-flagship query
    assumed = dict(green)
    for q in front:
        assumed[q] = 8
    excluded = [q for q in reg if q not in draft and q != deferred]
    for q in excluded:
        assert assumed[q] >= assumed[deferred]


def test_live_draft_matches_rotation_promise():
    from salesforce_postgresql_etl_spark.queries import registry

    reg = list(registry())
    green = latest_green()
    draft, deferred = next_rotation_draft(reg, green, reg[:50])
    assert len(draft) == 50 and draft[-1] == "q_agg_group"
    # the executed r14 rotation's own comment promises
    # q_neardup_stream_equiv (the query it deferred by name) fronts
    # FIRST in r15
    assert draft[0] == "q_neardup_stream_equiv"
    assert deferred not in draft
    # the current pinned window carries the r13-declared staleness-3
    # query in slot 1
    assert reg[0] == "q_parquet_roundtrip"
    # VERDICT r13 "what's wrong" #3: the four paths whose engines
    # changed in r13 after their last grading must be in this window
    for q in ("q_entity_match", "q_join_star", "q_neardup_clusters",
              "q_repetition_filter"):
        assert q in reg[:50], q
