"""Ordered-sequence funnel analysis over an event stream.

"How many users signed up, then clicked, then purchased — in that
order?" is the canonical product-analytics question over an events
table. The semantics are strictly sequential: stage *k+1* only counts
if it happens **after** the user's qualifying stage-*k* timestamp
(earliest-completion semantics: each stage anchors at its MIN qualifying
timestamp, which maximizes the number of users who can complete later
stages).

Spark-first design for 100 TB:

- Stage 1 is one hash aggregation (``min(ts) where type = s1`` per
  user). Every later stage is a semi-filtered aggregation joined back
  on ``user_id`` — all shuffles share the same key, so Catalyst/AQE
  reuses the hash partitioning instead of re-shuffling (the joins after
  the first aggregation see both sides already distributed by
  ``user_id``).
- Per-stage frames shrink monotonically (only users who reached stage
  *k* survive to the stage-*k+1* join) — the deeper the funnel, the
  cheaper the step, and each join's right side is a (user, ts) pair
  table, never raw events.
- No window over all events, no per-user collect_list: state per user
  is exactly one timestamp per stage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    stages: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """Per-user funnel progression.

    Returns ``(user_col, funnel_stage, stage_ts)`` where ``funnel_stage``
    is the number of consecutive stages completed (0..len(stages)) and
    ``stage_ts`` the timestamp of the deepest completed stage (NULL at
    stage 0). Every user present in ``events`` gets a row.

    ``max_gap_seconds``: conversion-window semantics — stage *k+1* only
    counts within that many seconds after the stage-*k* anchor
    (marketing funnels are always windowed; an unbounded funnel calls a
    purchase three years after signup a conversion). NOTE the window
    anchors at the MIN qualifying timestamp per stage, which is NOT
    globally optimal under a gap cap (a later stage-k event might admit
    a stage-k+1 the earlier anchor's window misses) — that greedy
    semantic is the standard product-analytics definition, and it is
    what the oracle mirrors.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    users = events.select(user_col).distinct()

    # anchor[k] = per-user MIN qualifying ts of stage k (strictly after
    # the stage k-1 anchor).
    anchor = (
        events.where(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    reached = [anchor]
    for k, stage in enumerate(stages[1:], start=2):
        prev = reached[-1].select(user_col, F.col(f"t{k - 1}").alias("prev_t"))
        cond = F.col(ts_col) > F.col("prev_t")
        if max_gap_seconds is not None:
            cond = cond & (
                F.col(ts_col)
                <= F.col("prev_t")
                + F.expr(f"INTERVAL {int(max_gap_seconds)} SECONDS")
            )
        nxt = (
            events.where(F.col(type_col) == stage)
            .join(prev, user_col)
            .where(cond)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{k}"))
        )
        reached.append(nxt)

    out = users
    for k, r in enumerate(reached, start=1):
        out = out.join(r.select(user_col, f"t{k}"), user_col, "left")

    n = len(stages)
    stage_expr = F.lit(0)
    ts_expr = F.lit(None).cast("timestamp_ntz")
    for k in range(1, n + 1):
        stage_expr = F.when(F.col(f"t{k}").isNotNull(), F.lit(k)).otherwise(
            stage_expr
        )
        ts_expr = F.when(F.col(f"t{k}").isNotNull(), F.col(f"t{k}")).otherwise(
            ts_expr
        )
    # t{k} is only non-null if t{k-1} was (construction), so the last
    # non-null t IS the consecutive-stage count.
    return out.select(
        user_col, stage_expr.alias("funnel_stage"), ts_expr.alias("stage_ts")
    )
