"""Token-budget mixture selection (training-data pipeline surface).

Pre-training mixtures are built per domain: rank each domain's
documents by a quality score and keep the top prefix whose cumulative
token count fits that domain's budget (the token-allocation step
behind DoReMi-style domain weights — the weights decide the budgets,
this operator spends them). ``budget_select`` marks every document
with its per-domain inclusive cumulative token count along the
(quality desc, id asc) total order and ``selected = cum ≤ budget``;
since sizes are positive the cumulative sum is monotone, so the
selected set is exactly the maximal quality-ranked prefix that fits.

Scale shape: the obvious implementation — one window per domain over
all of the domain's rows — puts n/|domains| rows in a single task
(domains are few: a hot domain IS the corpus). This instead rides
``operators/packing.grouped_prefix_sum``: per-(task, domain) local
running sums, then per-domain offsets windowed over numPartitions
rows per domain (bounded by the task count, never the data),
broadcast back. Selection is then a per-row predicate. Nothing
anywhere holds more than one task partition's rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .packing import grouped_prefix_sum


def budget_select(
    df: DataFrame,
    group_col: str,
    score_col: str,
    size_col: str,
    budget: int,
    id_col: str,
    cum_col: str = "cum_tokens",
    sel_col: str = "selected",
) -> DataFrame:
    """Attach (cum_col, sel_col): per-``group_col`` inclusive running
    sum of ``size_col`` in (``score_col`` DESC, ``id_col`` ASC) order,
    and selected = cum ≤ budget (int 0/1). ``id_col`` must be unique
    within a group — it makes the ordering total, so ties in the score
    cannot flip selection between runs (same doctrine as pack_bins'
    tiebreak_cols)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    incl = grouped_prefix_sum(
        df,
        [(score_col, False), (id_col, True)],
        size_col,
        group_cols=(group_col,),
        incl_col=cum_col,
    )
    return incl.withColumn(
        sel_col, (F.col(cum_col) <= F.lit(budget)).cast("int")
    )
