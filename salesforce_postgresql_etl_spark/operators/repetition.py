"""Repetition-based quality filtering (Gopher-style rules).

Surface ratios (q_quality_score) catch short/stopword-heavy docs;
what they miss is the dominant failure mode of web-scraped training
text: REPETITION — boilerplate lines, keyword stuffing, templated
spam. The published heuristic family (Rae et al., "Scaling Language
Models: ... Gopher", §A1.1) filters on (a) the fraction of the doc
covered by the single most-frequent n-gram and (b) the fraction
covered by all duplicated n-grams. This module computes the exact
integer numerators so the decision is integer arithmetic — no float
thresholds to drift between engines.

Scale shape: one explode of (doc, gram, kind) → two-stage aggregate,
both shuffles keyed on (doc_id, kind, gram) then (doc_id) — partial
aggregation (map-side combine) applies, and no step is quadratic in
document length. The row-local alternative (higher-order-function
counting inside the token array) avoids the shuffle but is O(n²) per
doc — fatal on book-length documents, so the exploded shape is the
one that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# keep iff: max word ≤ 20% of tokens, top bigram ≤ 20% of bigrams,
# duplicated trigrams ≤ 50% of trigrams (integer-scaled comparisons).
MAX_WORD_PCT = 20
TOP_BIGRAM_PCT = 20
DUP_TRIGRAM_PCT = 50


def _grams(n: int):
    """Overlapping word n-grams of the token array `t`, space-joined.

    Spark's sequence(1, k) is DESCENDING for k < 1 (the repo's known
    trap — corpus_q._trigrams), so short docs get an explicit empty.
    """
    if n == 1:
        return F.col("t")
    parts = ", ".join(f"element_at(t, i + {j})" for j in range(n))
    return F.expr(
        f"CASE WHEN size(t) >= {n} THEN "
        f"transform(sequence(1, size(t) - {n - 1}), i -> concat_ws(' ', {parts})) "
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def repetition_profile(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc exact repetition counts + the keep/drop verdict.

    Returns: id, n_tok, n_bigram, n_trigram, max_word_n (count of the
    most frequent word), top_bigram_n (count of the most frequent
    bigram), dup_trigram_n (total instances of trigrams occurring >1
    time), keep (int 0/1).
    """
    t = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("t")
    )
    base = t.select(
        id_col,
        F.size("t").cast("bigint").alias("n_tok"),
        F.greatest(F.size("t") - 1, F.lit(0)).cast("bigint").alias("n_bigram"),
        F.greatest(F.size("t") - 2, F.lit(0)).cast("bigint").alias("n_trigram"),
    )
    # One unioned gram stream so a single two-stage aggregate serves
    # all three statistics (vs three separate explode+agg passes).
    grams = None
    for kind, n in (("w", 1), ("b", 2), ("t", 3)):
        g = t.select(
            id_col, F.lit(kind).alias("kind"), F.explode(_grams(n)).alias("g")
        )
        grams = g if grams is None else grams.unionByName(g)
    counts = grams.groupBy(id_col, "kind", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    stats = counts.groupBy(id_col).agg(
        F.max(F.when(F.col("kind") == "w", F.col("c"))).alias("max_word_n"),
        F.coalesce(
            F.max(F.when(F.col("kind") == "b", F.col("c"))), F.lit(0)
        ).cast("bigint").alias("top_bigram_n"),
        F.coalesce(
            F.sum(
                F.when((F.col("kind") == "t") & (F.col("c") > 1), F.col("c"))
            ),
            F.lit(0),
        ).cast("bigint").alias("dup_trigram_n"),
    )
    out = base.join(stats, id_col)
    keep = (
        (F.col("max_word_n") * 100 <= F.lit(MAX_WORD_PCT) * F.col("n_tok"))
        & (
            F.col("top_bigram_n") * 100
            <= F.lit(TOP_BIGRAM_PCT) * F.greatest(F.col("n_bigram"), F.lit(1))
        )
        & (
            F.col("dup_trigram_n") * 100
            <= F.lit(DUP_TRIGRAM_PCT) * F.greatest(F.col("n_trigram"), F.lit(1))
        )
    )
    return out.select(
        id_col,
        "n_tok",
        "n_bigram",
        "n_trigram",
        F.col("max_word_n").cast("bigint").alias("max_word_n"),
        "top_bigram_n",
        "dup_trigram_n",
        keep.cast("int").alias("keep"),
    )
