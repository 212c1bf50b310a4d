"""Dead-letter quarantine for malformed source records.

An extractor that aborts on the first bad row cannot finish a 100 TB
load; one that silently nulls bad rows corrupts the warehouse. The
production contract is three-way: parse what parses, QUARANTINE what
doesn't (with the raw payload preserved for replay), and count both
so the run report can gate promotion.

Built on Spark's PERMISSIVE mode + ``columnNameOfCorruptRecord``: the
parser itself tags unparseable rows by populating the corrupt column
with the raw text, so the good/bad split is one filter each — no
second parse, no Python in the loop. The split frames share one scan
(Spark caches the parsed batch); at scale the quarantine side is
written ``partitionBy(load_date)`` next to the clean sink and
replayed after the upstream fix.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


@dataclass
class SplitLoad:
    clean: DataFrame  # parsed rows, corrupt column dropped
    quarantine: DataFrame  # (raw payload, reason) rows for replay


def read_json_with_quarantine(
    spark: SparkSession, path: str, schema: str
) -> SplitLoad:
    """JSON-lines load with a dead-letter split.

    ``schema`` must NOT include the corrupt column; it is appended
    here. A row is quarantined if it fails to parse at all OR parses
    but violates the declared types (Spark puts the raw line in the
    corrupt column either way)."""
    raw = (
        spark.read.schema(f"{schema}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # One materialization serves both sides: PERMISSIVE parsing is a
    # single pass, the split is two filters on the tag column. The
    # cache is also REQUIRED: Spark refuses corrupt-column-only
    # queries against the raw file scan (QUERY_ONLY_CORRUPT_RECORD_
    # COLUMN) because a re-parse could disagree with the first pass.
    raw = raw.cache()
    clean = raw.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = raw.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw"),
        F.lit("parse_or_type_error").alias("reason"),
    )
    return SplitLoad(clean=clean, quarantine=quarantine)


def validate_with_quarantine(
    df: DataFrame, rules: dict[str, F.Column]
) -> SplitLoad:
    """Row-level business-rule gate on an already-parsed frame.

    ``rules``: {reason: predicate that GOOD rows satisfy}. Failing
    rows land in quarantine with every violated reason (comma-joined)
    — the replay file explains itself. All predicates evaluate in one
    projection; the split is two filters. SQL three-valued logic is
    resolved conservatively: a predicate that evaluates to NULL is a
    FAILURE (unknown is not clean), hence the coalesce-to-false
    before negating."""
    if not rules:
        raise ValueError("no validation rules given")
    flags = [
        F.when(~F.coalesce(cond, F.lit(False)), F.lit(reason))
        for reason, cond in rules.items()
    ]
    tagged = df.withColumn(
        "__reasons", F.array_compact(F.array(*flags))
    )
    clean = tagged.where(F.size("__reasons") == 0).drop("__reasons")
    quarantine = tagged.where(F.size("__reasons") > 0).select(
        *df.columns, F.array_join("__reasons", ",").alias("reason")
    )
    return SplitLoad(clean=clean, quarantine=quarantine)
