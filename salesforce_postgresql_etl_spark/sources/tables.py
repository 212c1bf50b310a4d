"""Fixture-table source (SURVEY.md §2.1 S1/S8).

The ten driver-generated parquet tables stand in for Salesforce objects
(FIXTURES.md). Reads are plain ``spark.read.parquet`` so the vectorized
columnar reader + Catalyst pushdown/pruning apply untouched.

The one special case is ``events.ts``, normalized to ``timestamp_ntz``
adaptively because the driver has shipped the fixture in two physical
encodings across rounds:

- parquet INT64 TIMESTAMP(NANOS, false) (rounds 1-4): with
  ``spark.sql.legacy.parquet.nanosAsLong`` Spark reads it as a raw
  nanosecond ``long``; we rebuild the timestamp with **integer**
  division (``ts div 1000`` — float division would overflow the 53-bit
  mantissa at ~1.7e18 ns and corrupt microseconds).
- parquet TIMESTAMP(MICROS) (round 5+): Spark reads it natively as
  ``timestamp_ntz`` (inferTimestampNTZ); only an idempotent cast runs.

Either way the result is naive-UTC ``timestamp_ntz`` that compares
bit-for-bit with the DuckDB oracle's naive timestamps regardless of the
session's later timezone (FIXTURES.md "Mandatory events load recipe").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure_runtime

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize an events-shaped frame's ``ts`` to ``timestamp_ntz``.

    Dispatches on the *read* type (see module docstring): raw nanos long
    → integer-div rebuild; any timestamp flavor → plain cast (a no-op
    for ntz, a wall-clock reinterpretation is impossible because the
    session timezone is pinned to UTC in ``configure_runtime``).
    """
    ts_type = df.schema["ts"].dataType.simpleString()
    if ts_type == "bigint":
        return df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


# r13 OPT (guide §5 "the driver should do almost no data work"):
# ``spark.read.parquet`` costs ~90-270 ms of driver-side footer/schema
# setup PER CALL, and a query that joins five tables paid it five times
# per build (the bench's timed runs rebuild each query, so q_join_star
# spent ~0.5 s/run on footer reads alone). DataFrames are immutable, so
# the reader frame is memoized per (session, dir, table) — PLAN
# metadata reuse, not result caching: every execution still scans the
# parquet files. Keyed by applicationId and reset when it changes, so
# test suites that cycle sessions never hold frames of dead contexts.
_LOAD_MEMO: dict[tuple[str, str], DataFrame] = {}
_LOAD_MEMO_APP: list[str] = [""]


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one fixture table; normalizes ``events.ts`` to timestamp_ntz."""
    app = spark.sparkContext.applicationId
    if app != _LOAD_MEMO_APP[0]:
        _LOAD_MEMO.clear()
        _LOAD_MEMO_APP[0] = app
    key = (sf_dir, table)
    cached = _LOAD_MEMO.get(key)
    if cached is not None:
        return cached
    configure_runtime(spark)
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events":
        df = normalize_event_ts(df)
    _LOAD_MEMO[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Expose every fixture table as a temp view (``prefix + name``) so
    users run plain ``spark.sql`` against the same normalized tables
    the registered queries use — the literal "switch engines and keep
    your SQL" surface. Views are lazy: nothing is scanned until a query
    runs, and Catalyst pushdown applies through them unchanged."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(f"{prefix}{t}")


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """One-call ad-hoc SQL over the table set (registers views first)."""
    register_views(spark, sf_dir)
    return spark.sql(sql)
