"""Information-retrieval queries over the documents corpus: inverted
index construction and BM25 ranking. Round-5d additions, tail-registered.

These extend the L-family (tokenization, TF-IDF — queries/llm.py) to
the two remaining IR primitives a corpus pipeline needs: a term ->
postings index (the build side of keyword search / exact-match
decontamination at corpus scale) and the BM25 scoring function that
modern retrieval baselines still use.

100 TB shape: both are explode + hash-aggregate pipelines — the same
physics as q_tfidf. The inverted index's hot keys (stopwords appear in
every doc) are exactly the skew case operators/skew.py handles; the
posting-list collect is bounded per token by corpus document count, and
a production variant would shard postings by (term, doc_id bucket) —
documented here, not needed at fixture scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load
from . import register

# ---------------------------------------------------------------------------
# Inverted index: term -> document frequency + sorted posting list.
# The posting list is emitted as a comma-joined string (driver
# canonicalizer requires scalar cells); both engines sort numerically
# before stringifying, so the cell is deterministic.
# ---------------------------------------------------------------------------


@register(
    "q_inverted_index",
    oracle="""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             FROM documents)
SELECT term,
       COUNT(DISTINCT doc_id) AS df,
       array_to_string(list_sort(list_distinct(list(doc_id))), ',') AS postings
FROM tok
GROUP BY term
""",
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    return tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_set("doc_id")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("postings"),
    )


# ---------------------------------------------------------------------------
# BM25 (k1 = 1.2, b = 0.75) for a fixed 3-term query. FP doctrine: ln()
# is inherently transcendental (SURVEY §4.3.4 "round on BOTH sides"), so
# the score rounds to 6 dp on both engines, and the per-term partial
# scores are added in a FIXED textual order (spark + table + hash as a
# 3-column conditional pivot) — never a float SUM whose reduction order
# floats with partitioning.
# ---------------------------------------------------------------------------
BM25_TERMS = ("spark", "table", "hash")
_K1 = 1.2
_B = 0.75


@register(
    "q_bm25",
    oracle=f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             FROM documents),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
                 COUNT(*) AS n FROM dl),
tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok
       WHERE w IN ('spark', 'table', 'hash') GROUP BY doc_id, w),
dfq AS (SELECT w, COUNT(DISTINCT doc_id) AS dfc FROM tok
        WHERE w IN ('spark', 'table', 'hash') GROUP BY w),
scored AS (
  SELECT tf.doc_id, tf.w,
         ln(1.0 + ((stats.n - dfq.dfc) + 0.5) / (dfq.dfc + 0.5))
         * (tf.tf * {_K1 + 1.0})
         / (tf.tf + {_K1} * ((1.0 - {_B}) + ({_B} * dl.dl) / stats.avgdl)) AS s
  FROM tf JOIN dfq USING (w) JOIN dl USING (doc_id) CROSS JOIN stats)
SELECT doc_id,
       ROUND(COALESCE(MAX(CASE WHEN w = 'spark' THEN s END), 0.0)
             + COALESCE(MAX(CASE WHEN w = 'table' THEN s END), 0.0)
             + COALESCE(MAX(CASE WHEN w = 'hash' THEN s END), 0.0), 6) AS bm25
FROM scored
GROUP BY doc_id
""",
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).alias("n"),
    )
    qtok = tok.where(F.col("w").isin(*BM25_TERMS))
    tf = qtok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dfq = qtok.groupBy("w").agg(F.countDistinct("doc_id").alias("dfc"))
    scored = (
        tf.join(F.broadcast(dfq), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "w",
            (
                F.log(
                    F.lit(1.0)
                    + ((F.col("n") - F.col("dfc")) + F.lit(0.5))
                    / (F.col("dfc") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(_K1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(_K1)
                    * (
                        F.lit(1.0 - _B)
                        + (F.lit(_B) * F.col("dl")) / F.col("avgdl")
                    )
                )
            ).alias("s"),
        )
    )
    per_term = [
        F.coalesce(
            F.max(F.when(F.col("w") == t, F.col("s"))), F.lit(0.0)
        )
        for t in BM25_TERMS
    ]
    total = per_term[0] + per_term[1] + per_term[2]
    return scored.groupBy("doc_id").agg(F.round(total, 6).alias("bm25"))


# ---------------------------------------------------------------------------
# PII scrubbing (r5d): regex redaction of emails / phone numbers / IPv4
# before a corpus ships to training — pure regexp_replace chains, so
# redaction runs at scan speed inside codegen. Fixture docs carry no
# PII, so both engines deterministically PLANT the same pseudo-PII
# first (derived from doc_id), then scrub; the hash match proves the
# patterns and replacement order agree cross-engine. Order matters
# (emails before bare phone-ish digit runs) and is fixed in both.
# ---------------------------------------------------------------------------
_EMAIL_RE = "[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "\\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"
_IP_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"


@register(
    "q_pii_scrub",
    oracle=f"""
WITH planted AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
              || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' AS text
  FROM documents)
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
           '{_PHONE_RE}', '<PHONE>', 'g'),
         '{_IP_RE}', '<IP>', 'g') AS clean_text
FROM planted
""",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1"),
        ).alias("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _IP_RE,
        "<IP>",
    )
    return planted.select("doc_id", clean.alias("clean_text"))


# ---------------------------------------------------------------------------
# Unigram log-probability scoring (r5d): the cheapest useful language-
# model quality proxy — score(doc) = mean over tokens of
# -ln p(w | corpus), with p from corpus-wide token frequencies
# (add-one smoothing over the observed vocabulary). High score = rare-
# token soup (boilerplate/noise); low = stereotypical text. Two hash
# aggs + one broadcast-joined scan, same physics as TF-IDF; ln rounds
# at 6 dp both engines, and the per-doc mean divides two EXACT values
# (a decimal-quantized logprob sum and a token count), so the rounded
# surface is stable. The 1e-6 quantization of each token's logprob
# makes the SUM order-independent (decimal addition is associative).
# ---------------------------------------------------------------------------
@register(
    "q_unigram_logprob",
    oracle="""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             FROM documents),
freq AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tok,
               COUNT(*) AS n_vocab FROM freq),
lp AS (SELECT w,
              CAST(round(-ln((c + 1.0) / (tot.n_tok + tot.n_vocab)), 6)
                   AS DECIMAL(18,6)) AS nll
       FROM freq CROSS JOIN tot)
SELECT tok.doc_id,
       round(CAST(SUM(lp.nll) * 1000000 AS BIGINT)
             / (COUNT(*) * 1000000.0), 6) AS avg_nll,
       COUNT(*) AS n_tok
FROM tok JOIN lp USING (w)
GROUP BY tok.doc_id
""",
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.agg(
        F.sum("c").alias("n_tok"), F.count(F.lit(1)).alias("n_vocab")
    )
    lp = freq.crossJoin(F.broadcast(tot)).select(
        "w",
        F.round(
            -F.log(
                (F.col("c") + F.lit(1.0))
                / (F.col("n_tok") + F.col("n_vocab"))
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("nll"),
    )
    return (
        tok.join(lp, "w")
        .groupBy("doc_id")
        .agg(
            F.round(
                (F.sum("nll") * F.lit(1000000)).cast("bigint")
                / (F.count(F.lit(1)) * F.lit(1000000.0)),
                6,
            ).alias("avg_nll"),
            F.count(F.lit(1)).alias("n_tok"),
        )
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (r5d): Efraimidis–Spirakis via
# deterministic hash keys — each doc gets u ~ Uniform(0,1) derived from
# md5 (13 hex digits -> exact 52-bit integer -> ONE IEEE division), and
# key = -ln(u)/w with w = n_chars; the k smallest keys are a weighted
# sample without replacement. Hash-derived u makes the "random" sample
# reproducible across engines, retries, and partitionings — the only
# sampling discipline that survives a distributed re-run. Selection is
# a global top-k (TakeOrderedAndProject — O2 physics, no full sort at
# scale). The SAME SQL expression text runs on both engines.
# ---------------------------------------------------------------------------
_ES_SEED = "es1:"
_ES_K = 50


def _es_key_sql() -> str:
    """-ln(u)/n_chars with u from md5(seed || doc_id), identical text
    for Spark SQL and DuckDB."""
    digit = (
        "(instr('0123456789abcdef', "
        "substring(md5(concat('" + _ES_SEED + "', cast(doc_id as string))), "
        "{i}, 1)) - 1)"
    )
    # bigint accumulator: Spark's instr yields INT and 16^13 overflows
    # int32 under ANSI; the cast promotes the whole fold (DuckDB's
    # instr is already BIGINT — the cast is a no-op there)
    v = f"cast({digit.format(i=1)} as bigint)"
    for i in range(2, 14):
        v = f"({v} * 16 + {digit.format(i=i)})"
    u = f"((cast({v} as double) + 0.5) / 4503599627370496.0)"
    return f"(-ln({u}) / n_chars)"


@register(
    "q_weighted_sample",
    oracle=f"""
SELECT doc_id, n_chars, round({_es_key_sql()}, 6) AS es_key
FROM documents
ORDER BY round({_es_key_sql()}, 6) ASC, doc_id ASC
LIMIT {_ES_K}
""",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    key = F.expr(_es_key_sql())
    # Order on the 6dp-QUANTIZED key (r6, advisor): the raw key ends in
    # ln(), and the top-k cutoff must not depend on cross-engine ln()
    # bit agreement — selection uses the same rounded surface as the
    # output column, with doc_id as the total-order tiebreak.
    return (
        d.select("doc_id", "n_chars", F.round(key, 6).alias("es_key"))
        .orderBy(F.asc("es_key"), F.asc("doc_id"))
        .limit(_ES_K)
    )


# ---------------------------------------------------------------------------
# PMI collocations (r5d): pointwise mutual information over adjacent
# token pairs — the classic collocation detector (which bigrams occur
# far more than their unigram frequencies predict). All counts are
# exact integers; the single ln rounds at 6 dp on both engines with
# the ratio assembled in one fixed textual order.
# ---------------------------------------------------------------------------
_PMI_MIN_COUNT = 5


@register(
    "q_pmi",
    oracle=f"""
WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
uni AS (SELECT unnest(t) AS w FROM tok),
unic AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
big AS (SELECT unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) AS bigram
        FROM tok),
bigc AS (SELECT bigram, COUNT(*) AS c_ab FROM big GROUP BY bigram
         HAVING COUNT(*) >= {_PMI_MIN_COUNT}),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_big FROM big)
SELECT b.bigram, b.c_ab,
       round(ln((CAST(b.c_ab AS DOUBLE) * tot.n_big)
                / (CAST(ua.c AS DOUBLE) * ub.c)), 6) AS pmi
FROM bigc b
JOIN unic ua ON ua.w = string_split(b.bigram, ' ')[1]
JOIN unic ub ON ub.w = string_split(b.bigram, ' ')[2]
CROSS JOIN tot
""",
)
def q_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    bigrams = F.zip_with(
        F.slice(t, 1, F.size(t) - 1),
        F.slice(t, 2, F.size(t) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    big = d.select(F.explode(bigrams).alias("bigram"))
    bigc = (
        big.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= _PMI_MIN_COUNT)
    )
    uni = d.select(F.explode(t).alias("w"))
    unic = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = big.agg(F.count(F.lit(1)).alias("n_big"))
    ua = unic.select(F.col("w").alias("wa"), F.col("c").alias("ca"))
    ub = unic.select(F.col("w").alias("wb"), F.col("c").alias("cb"))
    parts = F.split(F.col("bigram"), " ")
    return (
        bigc.withColumn("wa", parts.getItem(0))
        .withColumn("wb", parts.getItem(1))
        .join(F.broadcast(ua), "wa")
        .join(F.broadcast(ub), "wb")
        .crossJoin(F.broadcast(tot))
        .select(
            "bigram",
            "c_ab",
            F.round(
                F.log(
                    (F.col("c_ab").cast("double") * F.col("n_big"))
                    / (F.col("ca").cast("double") * F.col("cb"))
                ),
                6,
            ).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental (cross-corpus) near-dup (r5d): which docs of an incoming
# batch already exist in the kept corpus — the recurring-crawl dedup
# shape. Registered in its driver-checkable brute form (the oracle
# mirror); the scale path is neardup_pairs_cross(strategy="minhash")
# — banded bipartite candidates against MATERIALIZED corpus signatures
# — proven ≡ brute in tests/test_llm_ops.py.
# ---------------------------------------------------------------------------
from ..operators.dedup import neardup_pairs_cross  # noqa: E402
from .llm import NEARDUP_THRESHOLD  # noqa: E402


@register(
    "q_neardup_incremental",
    oracle=f"""
WITH tok AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS t
             FROM documents),
newb AS (SELECT * FROM tok WHERE doc_id % 5 = 0),
corp AS (SELECT * FROM tok WHERE doc_id % 5 != 0)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_filter(a.t, x -> list_contains(b.t, x))) AS DOUBLE)
       / CAST(len(a.t) + len(b.t)
              - len(list_filter(a.t, x -> list_contains(b.t, x))) AS DOUBLE)
         AS jaccard
FROM newb a CROSS JOIN corp b
WHERE CAST(len(list_filter(a.t, x -> list_contains(b.t, x))) AS DOUBLE)
      / CAST(len(a.t) + len(b.t)
             - len(list_filter(a.t, x -> list_contains(b.t, x))) AS DOUBLE)
      >= {NEARDUP_THRESHOLD}
""",
)
def q_neardup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    new_b = d.where(F.col("doc_id") % 5 == 0)
    corp = d.where(F.col("doc_id") % 5 != 0)
    return neardup_pairs_cross(
        new_b, corp, threshold=NEARDUP_THRESHOLD, strategy="brute"
    )
