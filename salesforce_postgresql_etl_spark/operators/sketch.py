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
