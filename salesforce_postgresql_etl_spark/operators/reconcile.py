"""Merkle-bucket table reconciliation — sync validation at scale.

The reference's job is keeping a warehouse copy in sync with a source;
the operational question after every sync is "do the two sides match,
and if not, WHICH keys differ?". At 100 TB you cannot answer that with
a full-table join of source against sink: the whole point is to move
(almost) no data when the tables DO match.

Two-phase shape:

1. ``table_digest``: each side aggregates locally to ``n_buckets``
   rows — bucket = hash(key) mod n_buckets, digest = bit_xor of a
   full-row hash, plus a row count. XOR is order- and
   partition-independent and cannot overflow; a matching (count,
   digest) pair certifies the bucket equal up to a 2^-64 hash
   collision. Cost: one scan + one tiny shuffle per side, output
   n_buckets rows — that is ALL that crosses the wire when in sync.
2. ``reconcile_keys``: join the two digest tables, keep mismatched
   buckets (normally a handful), semi-join each side down to those
   buckets, and full-outer-join ONLY the survivors to classify each
   key: missing_in_a / missing_in_b / changed.

Preconditions (checked where cheap, documented where not):
- ``key`` is unique per side (keyed reconciliation; duplicate rows
  XOR-cancel and can mask each other).
- "changed" is decided by Spark-side full-row hash inequality on the
  drilled-down rows — a 2^-64 false-negative per colliding pair,
  the standard merkle-tree trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_hash(df: DataFrame) -> "F.Column":
    # xxhash64 over every column, name-ordered so physical column order
    # never matters.
    return F.xxhash64(*[F.col(c) for c in sorted(df.columns)])


def table_digest(df: DataFrame, key: str, n_buckets: int = 4096) -> DataFrame:
    """(bucket, n, digest): the side's merkle summary — n_buckets rows."""
    return (
        df.withColumn("_b", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)))
        .withColumn("_h", _row_hash(df))
        .groupBy(F.col("_b").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(_h)").alias("digest"),
        )
    )


def reconcile_keys(
    a: DataFrame, b: DataFrame, key: str, n_buckets: int = 4096
) -> DataFrame:
    """(key, status) for every differing key; empty when in sync.

    status ∈ {'missing_in_a', 'missing_in_b', 'changed'}.
    """
    da = table_digest(a, key, n_buckets).alias("da")
    db = table_digest(b, key, n_buckets).alias("db")
    bad = (
        da.join(db, "bucket", "full")
        .where(
            F.col("da.n").isNull()
            | F.col("db.n").isNull()
            | (F.col("da.n") != F.col("db.n"))
            | (F.col("da.digest") != F.col("db.digest"))
        )
        .select("bucket")
    )
    # The mismatch set is small by construction (buckets, not rows) —
    # broadcast it so the drill-down semi-joins are map-side.
    bad = F.broadcast(bad)

    def drill(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("_b", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)))
            .join(bad, F.col("_b") == bad["bucket"], "left_semi")
            .select(F.col(key), _row_hash(df).alias("_h"))
        )

    ka = drill(a).alias("ka")
    kb = drill(b).alias("kb")
    joined = ka.join(kb, F.col(f"ka.{key}") == F.col(f"kb.{key}"), "full")
    return joined.select(
        F.coalesce(F.col(f"ka.{key}"), F.col(f"kb.{key}")).alias(key),
        F.when(F.col(f"ka.{key}").isNull(), F.lit("missing_in_a"))
        .when(F.col(f"kb.{key}").isNull(), F.lit("missing_in_b"))
        .when(F.col("ka._h") != F.col("kb._h"), F.lit("changed"))
        .alias("status"),
    ).where(F.col("status").isNotNull())
