"""Corpus-construction queries: sequence packing and decontamination
(training-data pipeline surface — SURVEY.md §2.11 extensions).

Tail-registered (slots 86+) like sampling_q: the r4 graded window
1–50 stays exactly the rotation recorded in COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.decontam import contamination_overlap
from ..operators.packing import pack_bins
from ..sources import load
from . import register

PACK_BUDGET = 512  # tokens per packed sequence
DECONTAM_K = 2  # distinct shared trigrams that flag contamination
DOMAIN_TOKEN_BUDGET = 600  # tokens kept per source domain (~45% cut
# at sf0.01: each of the 20 domains carries ~1300 tokens)


@register(
    "q_pack_sequences",
    oracle=f"""
WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
o AS (SELECT doc_id, n_tok,
             CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                                            ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING), 0) AS BIGINT) AS off
      FROM t)
SELECT doc_id, n_tok, off AS tok_offset,
       CAST(off // {PACK_BUDGET} AS BIGINT) AS bin
FROM o
""",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate docs in doc_id order, chunk every PACK_BUDGET
    tokens: each doc gets its global token offset and bin id. The
    global prefix sum runs DISTRIBUTED (operators/packing.py — the
    q_sort two-phase shape), never a whole-corpus single-task window."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tok"),
    )
    return pack_bins(
        toks, "doc_id", "n_tok", PACK_BUDGET, offset_col="tok_offset"
    ).select("doc_id", "n_tok", "tok_offset", "bin")


# ---------------------------------------------------------------------------
# Token-budget mixture selection (r9, registry slot 149 under the ≤150
# cap): per domain, keep the top-quality document prefix whose
# cumulative token count fits the domain budget. The quality score is
# q_quality_score's exact expression (fixed double op sequence → both
# engines rank identically); it stays INTERNAL to the ordering — the
# output carries only integer columns, so no float ever reaches the
# hash compare. The oracle's window form is the semantics; the Spark
# side rides the distributed grouped prefix-sum (operators/mixture.py
# — no per-domain single-task window; see its docstring).
# ---------------------------------------------------------------------------
@register(
    "q_token_budget",
    oracle=f"""
WITH m AS (SELECT doc_id, source,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
                  CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop
           FROM documents),
q AS (SELECT doc_id, source, n_tok,
             0.5 * (CAST(n_uniq AS DOUBLE) / n_tok)
             + 0.3 * least(CAST(n_tok AS DOUBLE) / 100.0, 1.0)
             + 0.2 * (1.0 - CAST(n_stop AS DOUBLE) / n_tok) AS quality
      FROM m),
sel AS (SELECT doc_id, source, n_tok,
               CAST(SUM(n_tok) OVER (PARTITION BY source
                                     ORDER BY quality DESC, doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS cum_tokens
        FROM q)
SELECT doc_id, source, n_tok, cum_tokens,
       CAST(cum_tokens <= {DOMAIN_TOKEN_BUDGET} AS INT) AS selected
FROM sel
""",
)
def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain token-budget selection: every doc gets its domain's
    quality-ranked inclusive cumulative token count and a selected
    flag — the maximal top-quality prefix fitting the budget."""
    from ..operators.mixture import budget_select

    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    m = d.select(
        "doc_id",
        "source",
        F.size(toks).cast("bigint").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_uniq"),
        F.size(F.filter(toks, lambda t: (t == "the") | (t == "a")))
        .cast("bigint")
        .alias("n_stop"),
    )
    quality = (
        F.lit(0.5) * (F.col("n_uniq").cast("double") / F.col("n_tok"))
        + F.lit(0.3)
        * F.least(F.col("n_tok").cast("double") / F.lit(100.0), F.lit(1.0))
        + F.lit(0.2)
        * (F.lit(1.0) - F.col("n_stop").cast("double") / F.col("n_tok"))
    )
    scored = m.withColumn("quality", quality)
    return budget_select(
        scored,
        group_col="source",
        score_col="quality",
        size_col="n_tok",
        budget=DOMAIN_TOKEN_BUDGET,
        id_col="doc_id",
    ).select("doc_id", "source", "n_tok", "cum_tokens", "selected")


# ---------------------------------------------------------------------------
# Decontamination: flag train docs sharing ≥ K distinct word-trigrams
# with a benchmark/eval set (the standard pre-training hygiene pass).
# The benchmark here is the deterministic doc_id % 50 == 0 slice; in
# production it is the eval suites' n-gram set — small, so it ships
# broadcast to every executor, which is exactly how this runs at
# 100 TB (the corpus is never shuffled, only scanned).
# ---------------------------------------------------------------------------
def _trigrams():
    # element_at is 1-based in both engines' semantics here; guard
    # size<3 against Spark's descending-sequence trap (llm_ext.py).
    return F.expr(
        "CASE WHEN size(t) >= 3 THEN "
        "array_distinct(transform(sequence(1, size(t) - 2), "
        "i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1), "
        "element_at(t, i + 2)))) "
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    )


@register(
    "q_decontaminate",
    oracle=f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
tri AS (SELECT doc_id,
               unnest(list_distinct(list_transform(range(1, len(t) - 1),
                                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g
        FROM tok),
bench AS (SELECT DISTINCT g FROM tri WHERE doc_id % 50 = 0),
ov AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
       FROM tri t JOIN bench b ON t.g = b.g
       WHERE t.doc_id % 50 != 0
       GROUP BY t.doc_id)
SELECT d.doc_id,
       COALESCE(ov.n_overlap, 0) AS n_overlap,
       CAST(COALESCE(ov.n_overlap, 0) >= {DECONTAM_K} AS INT) AS is_contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 50 != 0) d
LEFT JOIN ov ON d.doc_id = ov.doc_id
""",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tri = d.select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    ).select("doc_id", F.explode(_trigrams()).alias("g"))
    bench_g = tri.where(F.col("doc_id") % 50 == 0).select("g")
    train_tri = tri.where(F.col("doc_id") % 50 != 0)
    # eval-suite-sized set → broadcast; operators/decontam.py documents
    # (and tests) the shuffle fallback for corpus-sized bench sets.
    ov = contamination_overlap(train_tri, bench_g, strategy="broadcast")
    train = d.where(F.col("doc_id") % 50 != 0).select("doc_id")
    return train.join(ov, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_overlap"), F.lit(0)).cast("bigint").alias("n_overlap"),
        (F.coalesce(F.col("n_overlap"), F.lit(0)) >= DECONTAM_K)
        .cast("int")
        .alias("is_contaminated"),
    )
