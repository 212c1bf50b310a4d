"""As-of (backward) join — the 100 TB shape (SURVEY.md §2.4 J9).

The registered ``q_join_asof`` uses the band-join form (non-equi join on
``key AND quote_ts <= probe_ts`` + per-probe ``row_number``): oracle-
checkable, but quadratic per key — one hot user with 1e5 clicks and 1e5
purchases materializes 1e10 join rows in a single task.

``asof_backward_join`` here is the bucket-merge upgrade promised in
queries/windows.py: union the two inputs, hash-partition by key, sort
within partitions by (ts, side, tiebreak), and take a running
``last(quote_payload) IGNORE NULLS`` over rows-between-unbounded-
preceding. That is a merge join expressed declaratively — ONE shuffle
on the key, ONE sort, zero pair materialization: per-key cost is
O((n_probe + n_quote) log(...)) instead of O(n_probe · n_quote), and a
hot key is a bigger sort run, not a quadratic task. Catalyst plans it
as Exchange(hashpartitioning(key)) → Sort → Window — exactly the
physical plan a hand-written mapPartitions merge would need, minus the
Python boundary.

Semantics match the band-join form exactly (asserted on fixtures in
tests/test_properties.py): for each probe row, the quote row with the
greatest ``quote_ts <= probe_ts`` for the same key; ties on quote_ts
broken by the greatest ``tiebreak``; no quote → NULL payload columns
(LEFT as-of).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_backward_join(
    probe: DataFrame,
    quote: DataFrame,
    keys: list[str],
    probe_ts: str,
    quote_ts: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """For each probe row, attach the latest quote at-or-before its ts.

    Output columns: every probe column, then every non-key quote column
    (NULL when no quote precedes). ``tiebreak``: a quote column ordered
    ascending so the LAST (greatest) value wins among equal quote_ts —
    required for deterministic output when quote_ts can tie.

    Column names must be disjoint apart from ``keys`` (as-of pairs two
    differently-shaped streams; name the payloads before joining).
    """
    return _asof_merge_join(
        probe, quote, keys, probe_ts, quote_ts, tiebreak, forward=False
    )


def asof_forward_join(
    probe: DataFrame,
    quote: DataFrame,
    keys: list[str],
    probe_ts: str,
    quote_ts: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """The mirror: for each probe row, the EARLIEST quote at-or-after
    its ts (``quote_ts >= probe_ts``); ties on quote_ts broken by the
    SMALLEST ``tiebreak``. Same bucket-merge physics — the window just
    runs over descending timestamps. This is the "time to next event"
    shape (next shipment after an order, next error after a deploy).
    """
    return _asof_merge_join(
        probe, quote, keys, probe_ts, quote_ts, tiebreak, forward=True
    )


def _asof_merge_join(
    probe: DataFrame,
    quote: DataFrame,
    keys: list[str],
    probe_ts: str,
    quote_ts: str,
    tiebreak: str | None,
    *,
    forward: bool,
) -> DataFrame:
    p_cols = [c for c in probe.columns if c not in keys]
    q_cols = [c for c in quote.columns if c not in keys]
    overlap = set(p_cols) & set(q_cols)
    if overlap:
        raise ValueError(f"probe/quote column collision: {sorted(overlap)}")
    if tiebreak is not None and tiebreak not in q_cols:
        raise ValueError(f"tiebreak {tiebreak!r} is not a quote column")

    q_struct = StructType(
        [StructField(c, quote.schema[c].dataType, True) for c in q_cols]
    )
    # Side tag orders quotes BEFORE probes at equal ts (<= semantics:
    # a quote stamped exactly at probe_ts is eligible).
    p_side = probe.select(
        *keys,
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(quote.schema[tiebreak].dataType if tiebreak else "long").alias("__tb"),
        *p_cols,
        F.lit(None).cast(q_struct).alias("__q"),
    )
    q_side = quote.select(
        *keys,
        F.col(quote_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        (F.col(tiebreak) if tiebreak else F.lit(None).cast("long")).alias("__tb"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in p_cols],
        F.struct(*[F.col(c) for c in q_cols]).alias("__q"),
    )
    u = p_side.unionByName(q_side)

    # Backward: ascending ts, greatest tiebreak wins (appears last).
    # Forward: descending ts, SMALLEST tiebreak wins — __tb descends so
    # the smallest is seen last by the running `last`. Either direction,
    # quotes sort before probes at equal ts (side 0 < 1) so an exact-ts
    # quote is eligible (<=/>= semantics).
    if forward:
        order = [F.col("__ts").desc(), F.col("__side").asc(), F.col("__tb").desc()]
    else:
        order = [F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__q", ignorenulls=True).over(w))
    return matched.where(F.col("__side") == 1).select(
        *keys,
        *p_cols,
        *[F.col("__m").getField(c).alias(c) for c in q_cols],
    )
