"""Sequence packing: global token-offset assignment (training-data
pipeline surface — pretraining batches are built by concatenating docs
along a total order and chunking at a fixed token budget).

``pack_bins`` computes each row's global exclusive prefix-sum of
``size_col`` over a total order and the resulting fixed-budget bin id.
A naive ``Window.orderBy`` would funnel the corpus through ONE task;
this uses the same two-phase shape as q_sort's distributed global rank
(queries/relational.py):

1. ``repartitionByRange(order)`` + ``sortWithinPartitions`` +
   per-partition running sum (window partitioned by
   ``spark_partition_id`` — distributed);
2. per-partition totals (one row per partition) → cumulative offsets →
   broadcast back; global offset = partition offset + local running
   sum − own size.

The only single-partition window runs over ~numPartitions rows. The
result is identical for ANY range boundaries because ``order_col`` is
a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_prefix_sum(
    df: DataFrame,
    order: list[tuple[str, bool]],
    size_col: str,
    group_cols: tuple[str, ...] = (),
    incl_col: str = "__incl_sum",
) -> DataFrame:
    """Per-group INCLUSIVE running sum of ``size_col`` over a total
    order — the distributed two-phase prefix-sum shape shared by
    ``pack_bins`` (empty ``group_cols``: one global sequence) and
    ``operators/mixture.budget_select`` (per-domain sequences).

    ``order`` is [(col, ascending)] and must be total within each
    group (callers add a tiebreak). Phase 1 range-partitions on
    (group, order) and runs the running sum per (task partition,
    group) — local, no cross-task window. Phase 2 aggregates one
    (partition, group) total row per pair, windows the per-group
    offsets over ``numPartitions`` rows per group (bounded by the
    task count, never the data), and broadcasts them back. With no
    groups the offsets window is the allowlisted SinglePartition
    frame over numPartitions rows (q_sort's shape).
    """
    sort_exprs = [F.asc(c) if asc else F.desc(c) for c, asc in order]
    d = (
        df.repartitionByRange(*[F.col(g) for g in group_cols], *sort_exprs)
        .sortWithinPartitions(*[F.col(g) for g in group_cols], *sort_exprs)
        .withColumn("__pid", F.spark_partition_id())
    )
    lw = (
        Window.partitionBy("__pid", *group_cols)
        .orderBy(*sort_exprs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("__incl", F.sum(F.col(size_col).cast("bigint")).over(lw))
    psums = d.groupBy("__pid", *group_cols).agg(
        F.sum(F.col(size_col).cast("bigint")).alias("__ps")
    )
    ow = (
        Window.partitionBy(*group_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = psums.select(
        "__pid",
        *group_cols,
        F.coalesce(F.sum("__ps").over(ow), F.lit(0)).alias("__off"),
    )
    out = d.join(F.broadcast(offsets), ["__pid", *group_cols])
    return (
        out.withColumn(
            incl_col, (F.col("__off") + F.col("__incl")).cast("bigint")
        )
        .drop("__pid", "__incl", "__off")
    )


def pack_bins(
    df: DataFrame,
    order_col: str,
    size_col: str,
    budget: int,
    offset_col: str = "offset",
    bin_col: str = "bin",
    tiebreak_cols: tuple[str, ...] = (),
    check_unique: bool = False,
) -> DataFrame:
    """Attach (offset, bin): offset = Σ sizes of all rows strictly
    before this row in ``order_col`` order; bin = offset div budget —
    "concatenate in order, chunk every ``budget`` tokens" semantics
    (a row straddling a boundary belongs to the bin its first token
    lands in).

    Precondition (r5, advisor): (order_col, *tiebreak_cols) must be a
    TOTAL order — tied rows would get arbitrary relative order under
    the rows-based running sum, so their offsets (and possibly bins)
    would vary run to run. Pass ``tiebreak_cols`` to break known ties
    (they join the sort key everywhere), and/or ``check_unique=True``
    to fail loudly on duplicates (one extra count job — worth it the
    first time a new order key is trusted).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    order = [order_col, *tiebreak_cols]
    if check_unique:
        n_dup = (
            df.groupBy(*order)
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if n_dup:
            raise ValueError(
                f"order key {order} is not a total order: duplicate key "
                "values exist, so offsets would be nondeterministic — add "
                "tiebreak_cols to make the ordering total"
            )
    incl = grouped_prefix_sum(
        df, [(c, True) for c in order], size_col, incl_col="__incl_sum"
    )
    offset = (F.col("__incl_sum") - F.col(size_col)).cast("bigint")
    return (
        incl.withColumn(offset_col, offset)
        .withColumn(bin_col, F.expr(f"{offset_col} div {budget}").cast("bigint"))
        .drop("__incl_sum")
    )
