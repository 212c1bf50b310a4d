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
