"""r14 idle-window A/B + re-reads (VERDICT r13 #1) — run directly.

Arms, interleaved round-robin (one warmup per arm, clearCache between
timed runs, noop sink, min-of-reps reported, steal jiffies bracketed):

- agg_fanout_on / agg_fanout_off: q_agg_group with the r13 fanout()
  gate active vs monkeypatched to identity — does the idle box
  reproduce the claimed 2.77->2.00 direction?
- join_star_memo_on / join_star_memo_off: q_join_star with the reader
  memo warm vs cleared before EVERY build (pre-r13 behavior: 5 parquet
  footer reads per build).
- q_simsearch_pq / q_token_budget: rep distributions (no variant) —
  the two r13 movers without a steal alibi.

Usage:  python tests/r14_movers_ab.py [sf_dir] [reps]
Result: one JSON line; recorded in OPTIMIZATION_r14.md / SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _steal() -> int:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    vals = [int(x) for x in parts[1:]]
    return vals[7] if len(vals) > 7 else 0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from salesforce_postgresql_etl_spark.queries import all_queries
    from salesforce_postgresql_etl_spark.queries import relational
    from salesforce_postgresql_etl_spark.session import get_spark
    from salesforce_postgresql_etl_spark.sources import tables

    spark = get_spark(
        app_name="r14-movers-ab", master="local[32]", shuffle_partitions=32
    )
    qs = all_queries()
    real_fanout = relational.fanout

    def run(name: str, fanout_off: bool = False, memo_off: bool = False) -> float:
        relational.fanout = (
            (lambda df, *k: df) if fanout_off else real_fanout
        )
        if memo_off:
            tables._LOAD_MEMO.clear()
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        el = time.perf_counter() - t0
        relational.fanout = real_fanout
        spark.catalog.clearCache()
        return el

    arms = {
        "agg_fanout_on": lambda: run("q_agg_group"),
        "agg_fanout_off": lambda: run("q_agg_group", fanout_off=True),
        "join_star_memo_on": lambda: run("q_join_star"),
        "join_star_memo_off": lambda: run("q_join_star", memo_off=True),
        "q_simsearch_pq_read": lambda: run("q_simsearch_pq"),
        "q_token_budget_read": lambda: run("q_token_budget"),
    }
    # one untimed warmup each (JIT)
    for fn in arms.values():
        fn()
    s0 = _steal()
    t0 = time.monotonic()
    series: dict[str, list[float]] = {a: [] for a in arms}
    for _ in range(reps):
        for a, fn in arms.items():
            series[a].append(round(fn(), 4))
    el = time.monotonic() - t0
    steal_cores = round((_steal() - s0) / os.sysconf("SC_CLK_TCK") / el, 2)
    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "steal_cores_avg": steal_cores,
        "min": {a: min(v) for a, v in series.items()},
        "series": series,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
