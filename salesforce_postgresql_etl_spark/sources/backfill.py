"""Idempotent partition backfill — dynamic partition overwrite.

The ETL failure mode this solves: a daily load wrote bad data for
2024-01-15 and must be re-run WITHOUT touching any other day. With
static overwrite (`mode("overwrite")` on a partitioned dir) Spark
truncates the WHOLE table first — re-running one day deletes a year.
The warehouse answer is dynamic partition overwrite
(``spark.sql.sources.partitionOverwriteMode=dynamic``): only the
partitions present in the incoming frame are replaced; everything else
is untouched, and a re-run of the same slice is a byte-level no-op —
the load becomes idempotent per partition.

At 100 TB this composes with the incremental watermark extract
(sources/incremental.py): each run writes only its watermark window's
partitions, retries are safe, and backfills are surgical. The mode is
set per-write via ``DataFrameWriter.option`` (Spark ≥3.0), NOT session
state — no cross-query conf leakage (the same doctrine that keeps
registered queries from mutating the shared driver session).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str]
) -> None:
    """Initial/full write of a partitioned table."""
    df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)


def backfill_partitions(
    df: DataFrame, path: str, partition_cols: Sequence[str]
) -> None:
    """Replace exactly the partitions present in ``df``; leave every
    other partition byte-identical. Idempotent: re-running the same
    slice converges to the same table state."""
    (
        df.write.partitionBy(*partition_cols)
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
