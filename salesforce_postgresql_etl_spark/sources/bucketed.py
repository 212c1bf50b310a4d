"""Bucketed-table write/read — the co-located fact–fact join (SCALE.md).

At 100 TB the dominant cost of a fact–fact join (lineitem ⋈ orders)
is shuffling BOTH sides on the key every time the join runs. Bucketing
pays that shuffle ONCE at write time: each table is hash-partitioned
into the same number of buckets on the join key and each bucket file
is sorted, so every later join plans as a zero-Exchange SortMergeJoin
reading matching bucket pairs (tests/test_bucketing.py pins the plan).

Spark's bucketing lives in the table catalog, not the parquet footer —
hence ``saveAsTable`` with an explicit ``path`` (data in our directory,
bucket spec in the catalog). ``read_bucketed`` is ``spark.table``; a
plain ``spark.read.parquet`` of the same files would read fine but
LOSE the bucket metadata and re-shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    path: str,
    buckets: int,
    key: str | Sequence[str],
    sorted_by: str | Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and per-bucket sorted) on the join key.

    ``buckets`` must MATCH across the tables that will join — bucket
    co-location only holds for equal bucket counts (Spark will
    re-shuffle the mismatched side otherwise).
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.bucketBy(buckets, *keys).option("path", path).mode(mode)
    sort_keys = (
        keys if sorted_by is None
        else [sorted_by] if isinstance(sorted_by, str)
        else list(sorted_by)
    )
    w = w.sortBy(*sort_keys)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — preserves the bucket spec (shuffle-free joins)."""
    return spark.table(table)
