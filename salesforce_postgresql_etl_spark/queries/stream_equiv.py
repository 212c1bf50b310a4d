"""Batch-equivalents of the streaming operators (SURVEY.md §2.9).

The t2 oracle is batch DuckDB, so each streaming semantic registers
its batch instantiation here (hash-checkable); the true ``readStream``
transport of the SAME transformation functions is exercised by
tests/test_streaming.py (batch ≡ stream assertions).

Sums of the arbitrary-precision ``value`` doubles use the power-of-two
quantizer (``sum_pow2``) — exact scaling, no decimal rounding
boundaries, order-independent (functions.determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load
from ..streaming.jobs import sliding_counts, tumbling_counts
from . import register


# ---------------------------------------------------------------------------
# T1 — tumbling 1-hour window aggregation
# ---------------------------------------------------------------------------
@register(
    "q_stream_tumbling",
    oracle="""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY 1, 2, 3
""",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# T2 — sliding windows: 1 hour long, 15-minute slide. Every event lands
# in exactly 4 windows; the oracle reconstructs Spark's epoch-aligned
# window starts with a 0..3 slide index.
# ---------------------------------------------------------------------------
@register(
    "q_stream_sliding",
    oracle="""
WITH s AS (SELECT ts, event_type, unnest([0, 1, 2, 3]) AS i FROM events)
SELECT make_timestamp(((CAST(floor(date_part('epoch', ts)) AS BIGINT) // 900 - i) * 900)
                      * 1000000) AS window_start,
       event_type,
       COUNT(*) AS n
FROM s
GROUP BY 1, 2
""",
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(load(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# T3 — sessionization (30-minute gap), batch-equivalent form:
# lag-gap flag → running sum = session id. The native
# F.session_window form is asserted equal in tests/test_streaming.py.
# ---------------------------------------------------------------------------
@register(
    "q_sessionize",
    oracle="""
WITH x AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR CAST(floor(date_part('epoch', ts)) AS BIGINT)
                      - CAST(floor(date_part('epoch', lag(ts) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
y AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM x)
SELECT user_id, CAST(sid AS BIGINT) AS session_id,
       MIN(ts) AS start_ts, MAX(ts) AS end_ts, COUNT(*) AS n_events
FROM y
GROUP BY user_id, sid
""",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("timestamp").cast("long")
    lag_sec = F.lag(F.col("ts")).over(w).cast("timestamp").cast("long")
    x = e.withColumn(
        "new_s",
        F.when(lag_sec.isNull() | ((sec - lag_sec) > 1800), 1).otherwise(0),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    y = x.withColumn("sid", F.sum("new_s").over(wsum))
    return y.groupBy("user_id", F.col("sid").alias("session_id")).agg(
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# T5 — streaming dedup, batch-equivalent: first occurrence per key
# (deterministic rn=1, unlike bare dropDuplicates on a non-unique key)
# ---------------------------------------------------------------------------
@register(
    "q_dedup_exact",
    oracle="""
SELECT user_id, event_type, event_id, ts
FROM (SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events)
WHERE rn = 1
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


# ---------------------------------------------------------------------------
# T6 — stateful per-key processing, batch-equivalent: running per-user
# event sequence + running value total. The streaming transport
# (transformWithStateInPandas / state store) is in tests/test_streaming.
# ---------------------------------------------------------------------------
@register(
    "q_state_running",
    oracle="""
SELECT user_id, event_id, ts,
       CAST(ROW_NUMBER() OVER w AS INT) AS event_seq,
       CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 1048576) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1048576.0
           AS running_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q_state_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    m = float(2**20)
    running = (
        F.sum(F.floor(F.col("value").cast("double") * F.lit(m))).over(wsum).cast("double")
        / F.lit(m)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.row_number().over(w).alias("event_seq"),
        running.alias("running_value"),
    )


# ---------------------------------------------------------------------------
# T9 (r5) — stream–stream interval join, batch instantiation. The true
# watermarked two-stream transport of the SAME function is asserted
# batch ≡ stream in tests/test_streaming.py.
# ---------------------------------------------------------------------------
from ..streaming.jobs import attribution_join  # noqa: E402


@register(
    "q_stream_join",
    oracle="""
SELECT c.user_id AS user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       c.ts AS click_ts,
       p.ts AS purchase_ts
FROM events c JOIN events p
  ON c.user_id = p.user_id
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
  AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
""",
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attribution_join(load(spark, sf_dir, "events"))
