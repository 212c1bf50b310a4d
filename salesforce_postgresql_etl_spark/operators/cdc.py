"""Snapshot-diff change data capture (CDC).

The reference tool class syncs Salesforce objects into PostgreSQL and
must answer "what changed since the last load" (SURVEY.md §3.1 entry
point 2/3: incremental sync + reconciliation). When the source cannot
stream changes, the standard technique is **snapshot differencing**:
given yesterday's and today's full extracts, emit the insert / update /
delete row set that turns one into the other.

Spark-first design for 100 TB:

- Each side is reduced map-side to ``(key, fingerprint)`` where the
  fingerprint is a single ``xxhash64`` over the compared columns — a
  wide 400-column row becomes 16 bytes before it ever reaches the
  shuffle, so the full-outer join moves keys + hashes, not payloads.
- One shuffle total: the full-outer sort-merge join on the key. With
  both snapshots written through ``sources.bucketed.write_bucketed`` on
  the key, even that Exchange disappears (bucket-local diff).
- Change typing is pure column algebra after the join (null-side
  probes + hash inequality) — whole-stage codegen, no UDFs.

Caveat (documented, same doctrine as MinHash/SimHash in dedup.py): two
rows whose compared columns differ but collide in ``xxhash64`` would be
reported unchanged. The fingerprint interleaves a null marker per
column (r6, advisor fix) so NULL-position swaps are *not* in this
class — only true 64-bit hash collisions are, and a same-key collision
requires ~2^32 *changed versions of one key* to reach even-odds. For
audit-grade exactness pass ``exact=True`` to compare columns directly
(wider shuffle, zero probability).

``xxhash64`` rejects MapType columns at analysis time (same restriction
as operators/skew.py `_row_salt`); exclude map columns from
``compare_cols`` or serialize them first (``to_json``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_INSERT = "insert"
CHANGE_UPDATE = "update"
CHANGE_DELETE = "delete"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    *,
    exact: bool = False,
    include_unchanged: bool = False,
    include_values: bool = False,
) -> DataFrame:
    """Diff two snapshots of the same logical table.

    Returns one row per key present in either snapshot, with
    ``change_type`` ∈ {insert, update, delete} (plus ``unchanged`` when
    ``include_unchanged``). Keys present only in ``new`` are inserts,
    only in ``old`` are deletes; present in both with differing compared
    columns are updates.

    ``compare_cols`` defaults to all non-key columns common to both
    snapshots (by name). Columns private to one side are ignored —
    schema drift between extracts must not poison the diff (the
    evolution module, sources/evolution.py, is the place to conform
    schemas first).
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        common = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in common if c not in set(keys)]
    cmp_cols = list(compare_cols)

    def tagged(df: DataFrame, side: str) -> DataFrame:
        cols = [F.col(k) for k in keys]
        if exact:
            # Carry the compared columns through the shuffle, renamed.
            cols += [F.col(c).alias(f"{side}_{c}") for c in cmp_cols]
        else:
            # Map-side reduction: whole row -> one 8-byte fingerprint.
            # Interleave a per-column null marker (r6, advisor): Spark's
            # xxhash64 SKIPS null arguments entirely, so without markers
            # xxhash64(NULL,'x') == xxhash64('x',NULL) == xxhash64('x')
            # — a value moving between same-typed columns across a NULL
            # would be reported "unchanged" DETERMINISTICALLY (not a
            # 2^-64 collision). The isnull marker is never null, so it
            # always contributes and pins each value to its position.
            if cmp_cols:
                parts = [
                    x
                    for c in cmp_cols
                    for x in (F.isnull(c).cast("int"), F.col(c))
                ]
                fp = F.xxhash64(*parts)
            else:
                fp = F.lit(0).cast("bigint")
            cols.append(fp.alias(f"{side}_fp"))
        return df.select(*cols).withColumn(f"{side}_present", F.lit(True))

    o = tagged(old, "o")
    n = tagged(new, "n")
    joined = o.join(n, on=keys, how="full_outer")

    if exact:
        if cmp_cols:
            differs = F.lit(False)
            for c in cmp_cols:
                # null-safe inequality per column (IS DISTINCT FROM)
                differs = differs | ~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}"))
        else:
            differs = F.lit(False)
    else:
        differs = F.col("o_fp") != F.col("n_fp")

    change = (
        F.when(F.col("o_present").isNull(), F.lit(CHANGE_INSERT))
        .when(F.col("n_present").isNull(), F.lit(CHANGE_DELETE))
        .when(differs, F.lit(CHANGE_UPDATE))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(*keys, change.alias("change_type"))
    if not include_unchanged:
        out = out.where(F.col("change_type") != "unchanged")
    if include_values:
        # Attach the NEW-side payload (NULL for deletes): one more join
        # on the same key — partitioning reuse, no extra shuffle shape.
        # This is the upsert feed a JDBC MERGE sink consumes (S5/T8).
        out = out.join(new.select(*keys, *cmp_cols), on=keys, how="left")
    return out


def apply_changes(
    old: DataFrame, changes: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """Apply a change feed back onto a snapshot: the CDC inverse.

    ``changes`` must be a ``snapshot_diff(..., include_values=True)``
    output whose compared columns cover every non-key column of
    ``old`` — then ``apply_changes(old, snapshot_diff(old, new, k)) ≡
    new`` exactly (the roundtrip law, pinned in tests). Shapes: one
    left-anti join (drop deleted/updated keys) + one unionByName
    (insert the new versions); both key-partitioned.
    """
    keys = list(key_cols)
    payload = [c for c in old.columns if c not in set(keys)]
    missing = [c for c in payload if c not in set(changes.columns)]
    if missing:
        raise ValueError(
            f"changes feed lacks payload columns {missing}; produce it "
            "with snapshot_diff(include_values=True) comparing all "
            "non-key columns"
        )
    gone = changes.where(
        F.col("change_type").isin(CHANGE_DELETE, CHANGE_UPDATE)
    ).select(*keys)
    survivors = old.join(gone, on=keys, how="left_anti")
    arrived = changes.where(
        F.col("change_type").isin(CHANGE_INSERT, CHANGE_UPDATE)
    ).select(*keys, *payload)
    return survivors.unionByName(arrived)
