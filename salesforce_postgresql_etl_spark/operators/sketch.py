"""HLL-sketch distinct-count cascade — the non-decomposable rollup.

q_rollup_cascade re-aggregates count/sum/min/max because they are
decomposable; COUNT DISTINCT is the canonical stat that is NOT — a
day-level distinct cannot be summed from minute-level distincts. The
warehouse answer is to keep the minute level as HyperLogLog SKETCH
partials (Spark 3.5+ ships Apache DataSketches: hll_sketch_agg /
hll_union_agg / hll_sketch_estimate): sketches of disjoint slices
union into exactly the sketch of the whole — same register maxima —
so cascading minute → hour → day loses NOTHING vs sketching the raw
events (asserted bit-exactly in tests), and the only approximation is
HLL's own ±~1.6% at lgConfigK=12.

At 100 TB: each coarser level reads the previous level's sketch
column (a few KB per group), never the raw events; a year of daily
distincts re-aggregates from day sketches in milliseconds. This is
how hypertable continuous aggregates ship distinct counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LG_CONFIG_K = 12  # 4096 registers — the Spark/DataSketches default


def distinct_cascade(
    events: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    dim: str = "event_type",
) -> DataFrame:
    """(day, dim, n_distinct_est): day-level approximate distinct keys,
    computed minute → hour → day over sketch partials. Every level is
    one hash-partitioned groupBy; the shuffled payload above minute
    level is sketches, not keys."""
    minute = events.groupBy(
        F.date_trunc("minute", ts_col).alias("minute"), dim
    ).agg(F.hll_sketch_agg(key, F.lit(LG_CONFIG_K)).alias("sk"))
    hour = minute.groupBy(
        F.date_trunc("hour", "minute").alias("hour"), dim
    ).agg(F.hll_union_agg("sk").alias("sk"))
    day = hour.groupBy(F.date_trunc("day", "hour").alias("day"), dim).agg(
        F.hll_union_agg("sk").alias("sk")
    )
    return day.select(
        "day", dim, F.hll_sketch_estimate("sk").alias("n_distinct_est")
    )


def distinct_direct(
    events: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    dim: str = "event_type",
) -> DataFrame:
    """The no-cascade control: sketch the raw events straight at day
    grain. Equality with distinct_cascade is the losslessness proof."""
    return (
        events.groupBy(F.date_trunc("day", ts_col).alias("day"), dim)
        .agg(F.hll_sketch_agg(key, F.lit(LG_CONFIG_K)).alias("sk"))
        .select("day", dim, F.hll_sketch_estimate("sk").alias("n_distinct_est"))
    )


# ---------------------------------------------------------------------------
# KLL quantile cascade — mergeable percentiles, the other non-decomposable
# rollup stat. Exact percentiles need the full value multiset (a day-level
# p99 cannot be computed from minute-level p99s); KLL sketches merge the
# way HLL does, so the same minute -> hour -> day cascade ships
# percentile dashboards over 100 TB without ever re-scanning raw data.
#
# One honest difference from HLL, measured and respected throughout:
# Spark's DataSketches KLL is RANDOMIZED (compaction coin flips) — two
# runs over identical data give slightly different estimates, so nothing
# KLL-derived can hash-match an oracle or assert cascade == direct
# bit-for-bit. The verifiable contract is the RANK-ERROR bound: for
# k=800 the 99%-confidence normalized rank error is ~0.4%; tests and the
# registered query check a 5% bound (~12x slack — KLL tail probability
# beyond that is negligible), the same tolerance-contract doctrine as
# q_agg_approx_cd.
# ---------------------------------------------------------------------------

KLL_K = 800


def _kll_merge_all(sk_col: str):
    """Merge a GROUP of KLL sketches into one, aliased back to ``sk_col``.

    Spark exposes KLL merge only as the two-sketch scalar
    ``kll_sketch_merge_double`` (unlike HLL's ``hll_union_agg``), so the
    group merge is a fold over ``collect_list``. The list is bounded by
    the cascade fan-in (≤60 minutes/hour, ≤24 hours/day), so the
    collected array is tiny regardless of data scale."""
    lst = F.collect_list(sk_col)
    merged = F.aggregate(
        F.slice(lst, 2, F.greatest(F.size(lst) - 1, F.lit(0))),
        F.element_at(lst, 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )
    return merged.alias(sk_col)


def quantile_cascade(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    dim: str = "event_type",
    qs: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """(day, dim, q50_est, q90_est, ...): day-level approximate
    percentiles computed minute -> hour -> day over KLL sketch partials.
    Shuffled payload above minute level is sketches (~KB), not values."""
    minute = events.groupBy(
        F.date_trunc("minute", ts_col).alias("minute"), dim
    ).agg(F.kll_sketch_agg_double(value_col, F.lit(KLL_K)).alias("sk"))
    hour = minute.groupBy(
        F.date_trunc("hour", "minute").alias("hour"), dim
    ).agg(_kll_merge_all("sk"))
    day = hour.groupBy(F.date_trunc("day", "hour").alias("day"), dim).agg(
        _kll_merge_all("sk")
    )
    sel = ["day", dim] + [
        F.kll_sketch_get_quantile_double("sk", F.lit(q)).alias(
            f"q{int(q * 100)}_est"
        )
        for q in qs
    ]
    return day.select(*sel)


def quantile_direct(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    dim: str = "event_type",
    qs: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """No-cascade control: sketch raw events straight at day grain.
    (Cannot be compared bit-exactly to the cascade — randomized — but
    both must satisfy the same rank-error contract.)"""
    day = events.groupBy(F.date_trunc("day", ts_col).alias("day"), dim).agg(
        F.kll_sketch_agg_double(value_col, F.lit(KLL_K)).alias("sk")
    )
    sel = ["day", dim] + [
        F.kll_sketch_get_quantile_double("sk", F.lit(q)).alias(
            f"q{int(q * 100)}_est"
        )
        for q in qs
    ]
    return day.select(*sel)


# ---------------------------------------------------------------------------
# Frequent items (Misra-Gries / space-saving) — the third classic
# mergeable sketch beside the KLL quantiles and HLL distincts above:
# heavy hitters over a column whose cardinality dwarfs memory.
# ---------------------------------------------------------------------------
def frequent_items(
    df: DataFrame,
    col: str,
    capacity: int,
    k: int | None = None,
) -> DataFrame:
    """(item, count_lower, count_upper[, rnk]) — Misra-Gries heavy
    hitters with BOUNDED memory per partition.

    Per partition (one ``mapInPandas`` crossing, a ``capacity``-entry
    counter dict held across the partition's Arrow batches): each
    Arrow batch is PRE-REDUCED with a vectorized ``value_counts``
    (an exact, zero-error MG summary of the batch), then merged into
    the running summary with the mergeable-summaries reduce step
    (Agarwal et al., "Mergeable Summaries", §3): sum counters by key,
    and if more than ``capacity`` survive, subtract the
    (capacity+1)-th largest value δ from every counter and drop the
    non-positive ones — at most ``capacity`` strictly-positive
    counters remain. ``d_p`` accumulates the δs: δ is the maximum any
    single item's counter was reduced by in that step, so after the
    partition drains, ``true_partition_count - counter ≤ d_p`` for
    tracked items and an UNtracked item was seen at most ``d_p``
    times — the same invariant the classic one-at-a-time MG update
    yields (where every eviction sweep is a δ=1 reduce). The batch
    form exists because a per-row Python loop was the throughput
    ceiling (VERDICT r8 #3): the Python-level work per batch is now
    O(distinct-in-batch) dict merges plus one sort, so the loop count
    shrinks by the batch's duplication factor. Each partition emits
    its surviving (item, cnt) rows plus one ``(None, d_p)`` error row.

    Merge is a plain hash-partitioned groupBy — fully distributed, NO
    single-partition funnel: per-item lowers sum, and the global slack
    is ``D = Σ_p d_p`` (an item a partition did NOT track was seen at
    most ``d_p`` times there). That gives the standard merged
    guarantee, asserted in tests:

        count_lower ≤ true_count ≤ count_lower + D   (count_upper)

    With ``capacity ≥`` the per-partition distinct count no eviction
    ever fires, ``D = 0``, and the sketch degenerates to exact counts
    — the regime the registered query grades against a SQL oracle.
    Under eviction the summary CONTENTS are partitioning-dependent
    (inherent to MG; arrival order decides which counters survive) but
    the bound above holds under ANY partitioning — the property tests
    pin the bound, never the contents.

    At 100 TB: memory is ``capacity`` counters per task regardless of
    cardinality, the shuffle carries at most ``partitions × capacity``
    summary rows (index-metadata scale, vs the full item-cardinality
    shuffle of an exact groupBy), and ε-heavy-hitter queries pick
    ``capacity = ceil(1/ε)``.

    ``k``: optionally rank by (count_lower desc, item) and keep the
    top k rows.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    from collections.abc import Iterator

    from ..session import configure_runtime

    configure_runtime(df.sparkSession)

    def mg_partition(it: Iterator):
        import pandas as pd

        counters: dict = {}
        d_p = 0
        for pdf in it:
            # vectorized pre-reduction: the batch's exact counts are a
            # zero-error MG summary — merge, then reduce to capacity
            for v, w in pdf["__item"].value_counts(dropna=True).items():
                counters[v] = counters.get(v, 0) + int(w)
            if len(counters) > capacity:
                delta = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    key: c - delta for key, c in counters.items() if c > delta
                }
                d_p += delta
        items = list(counters.keys()) + [None]
        cnts = [counters[key] for key in counters] + [d_p]
        yield pd.DataFrame(
            {
                "item": pd.Series(items, dtype="object"),
                "cnt": pd.Series(cnts, dtype="int64"),
            }
        )

    partials = df.select(F.col(col).cast("string").alias("__item")).mapInPandas(
        mg_partition, "item string, cnt long"
    )
    # D first: the 1-row global slack (error rows have item NULL)
    slack = partials.where(F.col("item").isNull()).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("d_total")
    )
    merged = (
        partials.where(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("cnt").alias("count_lower"))
        .crossJoin(F.broadcast(slack))  # 1 row — index metadata
        .select(
            "item",
            "count_lower",
            (F.col("count_lower") + F.col("d_total")).alias("count_upper"),
        )
    )
    if k is None:
        return merged
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("count_lower"), F.col("item"))
    # the rank window runs over the bounded summary (≤ partitions ×
    # capacity rows), not the data — the same budget class as the
    # other sketches' final reductions
    return (
        merged.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )
