"""Decontamination overlap join with an explicit size-aware strategy.

The hygiene pass flags training docs sharing n-grams with an eval
suite. The join's small side is the eval n-gram set, and its size
decides the physical plan at 100 TB:

- ``broadcast`` — eval-suite-sized sets (the normal case: even a few
  million distinct trigrams is tens of MB). The corpus side is only
  SCANNED, never shuffled; every executor probes a local hash map.
- ``shuffle`` — when the contamination set is itself huge (e.g.
  decontaminating against another corpus slice). Broadcasting would
  OOM every executor; instead both sides hash-partition on the n-gram
  (``shuffle_hash`` hint so AQE can't silently re-broadcast and the
  big-but-smaller bench side builds the hash map, no sort).
- ``auto`` — resolve by counting the bench side only (one cheap agg
  over the SMALL input; the corpus is never touched by the decision).

Both paths are the same logical plan, so results are identical —
``tests/test_decontam.py`` pins equality and the physical operator
choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ~2M distinct trigrams ≈ 60 MB broadcast — comfortably under a sane
# executor's memory and Spark's 8 GB broadcast hard cap.
BROADCAST_MAX_ROWS = 2_000_000


def resolve_strategy(bench_g: DataFrame, broadcast_max_rows: int = BROADCAST_MAX_ROWS) -> str:
    """Pick broadcast vs shuffle by bounded-counting the bench side.

    ``limit(n+1).count()`` short-circuits the scan at n+1 rows, so an
    enormous bench set costs one bounded pass, not a full count.
    """
    n = bench_g.limit(broadcast_max_rows + 1).count()
    return "broadcast" if n <= broadcast_max_rows else "shuffle"


def contamination_overlap(
    train_tri: DataFrame,
    bench_g: DataFrame,
    *,
    strategy: str = "auto",
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> DataFrame:
    """(doc_id, g) train n-grams × (g) bench n-grams → (doc_id, n_overlap).

    ``n_overlap`` counts the train doc's DISTINCT n-grams that appear in
    the bench set (bench is deduped here, so a doc repeating a shared
    n-gram still counts it once per its own distinct occurrences row).
    """
    if strategy not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"unknown strategy {strategy!r}")
    bench = bench_g.select("g").distinct()
    if strategy == "auto":
        strategy = resolve_strategy(bench, broadcast_max_rows)
    right = F.broadcast(bench) if strategy == "broadcast" else bench.hint("shuffle_hash")
    return (
        train_tri.join(right, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
