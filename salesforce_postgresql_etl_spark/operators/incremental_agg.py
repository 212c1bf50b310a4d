"""Incremental aggregate maintenance — append-only materialized rollups.

The reference tool class re-syncs incrementally (SURVEY §3.1 entry
point 2: watermark extract); the warehouse-side dual is keeping
aggregate TABLES current without rescanning history: hold per-group
partial-agg STATE (count, exact decimal sum, min, max), fold each new
extract's state in, and finalize (avg = sum/count) only at read time.

This is the batch form of what `streaming/jobs.py` does per
micro-batch via foreachBatch, and the same decomposability argument as
the rollup cascade (queries/extras_q.py q_rollup_cascade): every kept
statistic is a commutative monoid under merge, so

    state(A ∪ B) == merge(state(A), state(B))        -- exactly

for disjoint append-only batches A, B — any merge tree, any order.
At 100 TB the nightly delta touches only the delta's groups; history
is never re-read. Deletes/updates are out of scope by design (state
min/max are not invertible) — snapshot-diff CDC (operators/cdc.py)
detects them, and an affected-group rebuild is the documented recovery.

Determinism: sums are DECIMAL (exact, order-independent); the
finalized sum/avg go to double via the functions/determinism.py
integer path, so the merged result hash-matches a from-scratch
aggregate in any engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.determinism import dec_to_double

def agg_state(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """Partial-agg state of one batch: (groups, n, decimal sum, min, max)."""
    dec_t = f"decimal(18,{scale})"
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("s__n"),
        F.sum(F.col(value_col).cast(dec_t)).alias("s__sum"),
        F.min(value_col).alias("s__min"),
        F.max(value_col).alias("s__max"),
    )


def merge_agg_state(
    state: DataFrame, delta_state: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Fold a delta batch's state into the materialized state. Both
    inputs must be `agg_state` outputs over the same grouping; groups
    new to the delta appear, untouched groups pass through unchanged
    (union + re-agg — one shuffle over the GROUPS, not the data)."""
    both = state.unionByName(delta_state)
    return both.groupBy(*group_cols).agg(
        F.sum("s__n").alias("s__n"),
        F.sum("s__sum").alias("s__sum"),
        F.min("s__min").alias("s__min"),
        F.max("s__max").alias("s__max"),
    )


def finalize_agg_state(
    state: DataFrame, group_cols: Sequence[str], scale: int = 2
) -> DataFrame:
    """Read-time view: exact-decimal internals -> the deterministic
    double surface (sum via the integer path; avg as one
    bigint/bigint IEEE division)."""
    m = 10**scale
    return state.select(
        *group_cols,
        F.col("s__n").alias("n"),
        dec_to_double(F.col("s__sum"), scale).alias("sum_val"),
        F.col("s__min").alias("min_val"),
        F.col("s__max").alias("max_val"),
        (
            (F.col("s__sum") * F.lit(m)).cast("bigint")
            / (F.col("s__n") * F.lit(m))
        ).alias("avg_val"),
    )
