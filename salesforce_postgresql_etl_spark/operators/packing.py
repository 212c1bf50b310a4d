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
    d = (
        df.repartitionByRange(*[F.asc(c) for c in order])
        .sortWithinPartitions(*[F.asc(c) for c in order])
        .withColumn("__pid", F.spark_partition_id())
    )
    lw = (
        Window.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("__incl", F.sum(F.col(size_col).cast("bigint")).over(lw))
    psums = d.groupBy("__pid").agg(
        F.sum(F.col(size_col).cast("bigint")).alias("__ps")
    )
    ow = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = psums.select(
        "__pid", F.coalesce(F.sum("__ps").over(ow), F.lit(0)).alias("__off")
    )
    out = d.join(F.broadcast(offsets), "__pid")
    offset = (F.col("__off") + F.col("__incl") - F.col(size_col)).cast("bigint")
    return (
        out.withColumn(offset_col, offset)
        .withColumn(bin_col, F.expr(f"{offset_col} div {budget}").cast("bigint"))
        .drop("__pid", "__incl", "__off")
    )
