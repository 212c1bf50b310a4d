"""UDF / UDAF / UDTF surface (SURVEY.md §2.10, X1–X5).

UDFs are the SLOW path — everything else in this engine is built-in
JVM expressions. These queries exist to prove the full surface works
(row UDF, Arrow-vectorized pandas UDF, grouped-agg UDAF, grouped-map
applyInPandas, explode-as-UDTF), each with a relational oracle.

Determinism notes per query:
- X3 (weighted mean) uses integer-valued inputs so the float64 sums
  inside pandas are exact regardless of row order.
- X4 (z-score) SORTS each group inside the UDF before reducing, so
  pandas' pairwise summation sees a fixed order; the cross-engine
  compare rounds at 6dp because pandas/DuckDB variance differ by ulps.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType

from ..sources import load
from . import register


# ---------------------------------------------------------------------------
# X1 — row-at-a-time Python UDF (the escape hatch; everything a real
# pipeline can express relationally should NOT use this)
# ---------------------------------------------------------------------------
@register(
    "q_udf_scalar",
    oracle="""
SELECT c_custkey, reverse(upper(c_name)) AS rev_name
FROM customer
""",
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    rev_upper = F.udf(lambda s: s.upper()[::-1] if s is not None else None, StringType())
    return c.select("c_custkey", rev_upper("c_name").alias("rev_name"))


# ---------------------------------------------------------------------------
# X2 — Arrow-vectorized scalar pandas UDF (series → series)
# ---------------------------------------------------------------------------
@register(
    "q_pandas_udf",
    oracle="""
SELECT event_id, user_id * 2 + (event_id % 7) AS mixed_key
FROM events
""",
)
def q_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")

    @pandas_udf("long")
    def mixed(user_id: pd.Series, event_id: pd.Series) -> pd.Series:
        return user_id * 2 + (event_id % 7)

    return e.select("event_id", mixed("user_id", "event_id").alias("mixed_key"))


# ---------------------------------------------------------------------------
# X3 — grouped-aggregate pandas UDAF: weighted mean on integer-valued
# inputs (float64 integer sums are exact → order-independent)
# ---------------------------------------------------------------------------
@register(
    "q_pandas_agg",
    oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(floor(l_quantity) AS BIGINT) * l_linenumber) AS DOUBLE)
       / CAST(SUM(l_linenumber) AS DOUBLE) AS wmean_qty
FROM lineitem
GROUP BY l_orderkey
""",
)
def q_pandas_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")

    @pandas_udf(DoubleType())
    def wmean(qty: pd.Series, w: pd.Series) -> float:
        qi = qty.astype("int64")  # floor of positive 2dp values
        wi = w.astype("int64")
        return float((qi * wi).sum()) / float(wi.sum())

    return (
        l.withColumn("qf", F.floor("l_quantity"))
        .groupBy("l_orderkey")
        .agg(wmean("qf", "l_linenumber").alias("wmean_qty"))
    )


# ---------------------------------------------------------------------------
# X4 — grouped-map applyInPandas: per-user z-score normalization
# ---------------------------------------------------------------------------
@register(
    "q_applyinpandas_normalize",
    oracle="""
WITH s AS (SELECT user_id, event_id, value,
                  avg(value) OVER (PARTITION BY user_id) AS mu,
                  stddev_samp(value) OVER (PARTITION BY user_id) AS sd
           FROM events)
SELECT user_id, event_id,
       round(CASE WHEN sd > 0 THEN (value - mu) / sd END, 6) AS z
FROM s
""",
)
def q_applyinpandas_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("user_id", "event_id", "value")

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_id")  # fixed reduction order
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)  # == stddev_samp
        z = (pdf["value"] - mu) / sd if sd and sd > 0 else pd.Series([None] * len(pdf))
        return pd.DataFrame(
            {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "z": z.round(6)}
        )

    return e.groupBy("user_id").applyInPandas(
        normalize, schema="user_id long, event_id long, z double"
    )


# ---------------------------------------------------------------------------
# X5 — table-generating (UDTF-shaped): tokenize one row → many
# ---------------------------------------------------------------------------
@register(
    "q_explode",
    oracle="""
SELECT doc_id,
       CAST(pos AS INT) - 1 AS pos,
       token
FROM (SELECT doc_id,
             unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos,
             unnest(string_split(text, ' ')) AS token
      FROM documents)
""",
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    )


# ---------------------------------------------------------------------------
# X5b — a REAL Python UDTF (Spark 4 `@udtf`), not just explode-as-UDTF:
# run-length encoding of consecutive repeated tokens. The logic is
# genuinely sequential (each output row depends on the previous token),
# which is exactly the case where a table function beats a relational
# rewrite for clarity; the oracle proves the relational rewrite
# (gaps-and-islands over lag) agrees. Arrow-batched (`useArrow=True`)
# per the X-family doctrine: Python is the slow path, Arrow is how you
# cross it.
# ---------------------------------------------------------------------------
from pyspark.sql.functions import udtf  # noqa: E402


@udtf(returnType="run_idx int, token string, run_len int", useArrow=True)
class _RleUdtf:
    def eval(self, text):  # noqa: ANN001 — UDTF protocol
        if text is None:
            return
        run_idx, prev, count = 0, None, 0
        for w in text.split(" "):
            if w == prev:
                count += 1
            else:
                if prev is not None:
                    yield (run_idx, prev, count)
                run_idx, prev, count = run_idx + 1, w, 1
        if prev is not None:
            yield (run_idx, prev, count)


@register(
    "q_udtf_rle",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
  FROM documents),
flagged AS (
  SELECT doc_id, w, pos,
         CASE WHEN lag(w) OVER (PARTITION BY doc_id ORDER BY pos)
                   IS DISTINCT FROM w THEN 1 ELSE 0 END AS new_run
  FROM tok),
runs AS (
  SELECT doc_id, w,
         SUM(new_run) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS run_idx
  FROM flagged)
SELECT doc_id, CAST(run_idx AS INT) AS run_idx, w AS token,
       COUNT(*) AS run_len
FROM runs
GROUP BY doc_id, run_idx, w
""",
)
def q_udtf_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("rle_udtf", _RleUdtf)
    return spark.sql(
        f"""
        SELECT d.doc_id, t.run_idx, t.token, CAST(t.run_len AS BIGINT) AS run_len
        FROM parquet.`{sf_dir}/documents.parquet` d,
             LATERAL rle_udtf(d.text) t
        """
    )
