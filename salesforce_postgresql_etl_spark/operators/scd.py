"""SCD Type 2 merge — dimension history maintenance (warehouse sync).

The reference's sync loop overwrites (Type 1). The standard warehouse
ask on top is Type 2: keep every historical version with a validity
interval, close the old row when a tracked attribute changes, open a
new one. One batch application is pure relational algebra — a single
full-outer join of the OPEN slice against the incoming snapshot:

- key absent from incoming            → close the open row (delete)
- key present, tracked cols differ    → close old + open new (change)
- key present, tracked cols equal     → pass through (no-op)
- key absent from current             → open new (insert)
- history rows (valid_to set)         → pass through untouched

Scale shape: history never joins anything (filter + union only); the
join is open-slice × snapshot on the key — both sides hash-partition
on the key, and at 100 TB the open slice is exactly one row per live
entity, so this is a 1:1 key join, not a history explosion. Tracked
comparison is per-column IS-DISTINCT-FROM (null-safe, no hashing), so
the same predicate is expressible in the DuckDB oracle verbatim.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    incoming: DataFrame,
    key: str,
    tracked: list[str],
    batch_ts: str,
) -> DataFrame:
    """Apply one snapshot to an SCD2 table; returns the new full table.

    ``current``  : key, *tracked, valid_from, valid_to (NULL = open)
    ``incoming`` : key, *tracked — a FULL snapshot (absence = delete)
    ``batch_ts`` : the effective timestamp literal for this batch
    """
    out_cols = [key, *tracked, "valid_from", "valid_to"]
    ts = F.lit(batch_ts).cast("timestamp_ntz")
    hist = current.where(F.col("valid_to").isNotNull()).select(*out_cols)
    opn = current.where(F.col("valid_to").isNull()).alias("opn")
    inc = incoming.alias("inc")

    diff = reduce(
        lambda a, b: a | b,
        [~F.col(f"opn.{c}").eqNullSafe(F.col(f"inc.{c}")) for c in tracked],
    )
    j = opn.join(inc, F.col(f"opn.{key}") == F.col(f"inc.{key}"), "full")

    closed = j.where(
        F.col(f"opn.{key}").isNotNull() & (F.col(f"inc.{key}").isNull() | diff)
    ).select(
        *[F.col(f"opn.{c}") for c in (key, *tracked)],
        F.col("opn.valid_from"),
        ts.alias("valid_to"),
    )
    unchanged = j.where(
        F.col(f"opn.{key}").isNotNull() & F.col(f"inc.{key}").isNotNull() & ~diff
    ).select(
        *[F.col(f"opn.{c}") for c in (key, *tracked)],
        F.col("opn.valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
    )
    opened = j.where(
        F.col(f"inc.{key}").isNotNull() & (F.col(f"opn.{key}").isNull() | diff)
    ).select(
        *[F.col(f"inc.{c}") for c in (key, *tracked)],
        ts.alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
    )
    return hist.unionByName(closed).unionByName(unchanged).unionByName(opened)
