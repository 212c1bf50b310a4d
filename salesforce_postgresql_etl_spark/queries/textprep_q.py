"""Text-prep queries: repetition filtering, chunking, mixture
resampling (training-data pipeline surface — SURVEY.md §2.11
extensions; operators/repetition.py, chunking.py, sampling.py).

Tail-registered like sampling_q/corpus_q/extras_q: the r5 graded
window (slots 1–50, rotation ledger in COVERAGE.md) is untouched;
these are proven by the local driver-strict differential until a
future rotation fronts them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.chunking import chunk_documents, chunk_documents_sql
from ..operators.repetition import (
    DUP_TRIGRAM_PCT,
    MAX_WORD_PCT,
    TOP_BIGRAM_PCT,
    repetition_profile,
)
from ..operators.dupspans import (
    dup_span_stats,
    dup_span_stats_sql,
    strip_dup_spans,
    strip_dup_spans_sql,
)
from ..operators.sampling import mixture_copies_sql, mixture_resample
from ..sources import load
from . import register

CHUNK_WINDOW = 16  # tokens per chunk (fixture docs run ~30 tokens)
CHUNK_STRIDE = 12  # overlap = 4 tokens

# Dict order defines CASE order — part of the operator contract.
MIX_WEIGHTS = {"src0": 3.0, "src1": 2.5, "src2": 1.5, "src3": 1.0, "src4": 0.5}
MIX_DEFAULT = 0.25  # the 15 unlisted sources


@register(
    "q_repetition_filter",
    oracle=f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok,
                CAST(greatest(len(t) - 1, 0) AS BIGINT) AS n_bigram,
                CAST(greatest(len(t) - 2, 0) AS BIGINT) AS n_trigram
         FROM tok),
g AS (
  SELECT doc_id, 'w' AS kind, unnest(t) AS g FROM tok
  UNION ALL
  SELECT doc_id, 'b', unnest(list_transform(range(1, len(t)),
                                            i -> t[i] || ' ' || t[i+1]))
  FROM tok
  UNION ALL
  SELECT doc_id, 't', unnest(list_transform(range(1, len(t) - 1),
                                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
  FROM tok
),
c AS (SELECT doc_id, kind, g, COUNT(*) AS c FROM g GROUP BY 1, 2, 3),
s AS (SELECT doc_id,
             MAX(CASE WHEN kind = 'w' THEN c END) AS max_word_n,
             COALESCE(MAX(CASE WHEN kind = 'b' THEN c END), 0) AS top_bigram_n,
             COALESCE(SUM(CASE WHEN kind = 't' AND c > 1 THEN c END), 0) AS dup_trigram_n
      FROM c GROUP BY 1)
SELECT base.doc_id, n_tok, n_bigram, n_trigram,
       CAST(max_word_n AS BIGINT) AS max_word_n,
       CAST(top_bigram_n AS BIGINT) AS top_bigram_n,
       CAST(dup_trigram_n AS BIGINT) AS dup_trigram_n,
       CAST(max_word_n * 100 <= {MAX_WORD_PCT} * n_tok
            AND top_bigram_n * 100 <= {TOP_BIGRAM_PCT} * greatest(n_bigram, 1)
            AND dup_trigram_n * 100 <= {DUP_TRIGRAM_PCT} * greatest(n_trigram, 1)
            AS INT) AS keep
FROM base JOIN s USING (doc_id)
""",
)
def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition counts + keep verdict; exact integer
    numerators so the oracle checks the decision, not a float."""
    return repetition_profile(load(spark, sf_dir, "documents"))


@register(
    "q_chunk_docs",
    oracle=chunk_documents_sql(CHUNK_WINDOW, CHUNK_STRIDE),
)
def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token windows, content-addressed by md5 fingerprint
    so the oracle verifies every chunk's text, not just its bounds."""
    return chunk_documents(
        load(spark, sf_dir, "documents"), CHUNK_WINDOW, CHUNK_STRIDE
    )


@register(
    "q_domain_mix",
    oracle=f"""
WITH n AS (SELECT doc_id, source,
                  ({mixture_copies_sql("source", MIX_WEIGHTS, "doc_id",
                                       default_weight=MIX_DEFAULT)}) AS n_copies
           FROM documents)
SELECT doc_id, source, unnest(range(1, n_copies + 1)) AS copy
FROM n WHERE n_copies > 0
""",
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixture: src0 3×-upsampled through src4
    0.5×-downsampled, unlisted sources at 0.25×; every copy row is
    oracle-checked (the weight math must agree row-for-row)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    return mixture_resample(
        d, "source", MIX_WEIGHTS, "doc_id", default_weight=MIX_DEFAULT
    )


DUP_SPAN_K = 8  # tokens per span (fixture docs run ~30 tokens)


@register("q_dup_spans", oracle=dup_span_stats_sql(DUP_SPAN_K))
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicate-span stats per doc: span starts
    whose k-gram occurs ≥2× corpus-wide, plus the union-interval token
    coverage removal would cut. Registers the HASHED shuffle-key scale
    path (128-bit two-hash keys); the oracle is the exact-string SQL —
    the equality the pytest in test_dupspans.py pins is graded here."""
    return dup_span_stats(
        load(spark, sf_dir, "documents"), k=DUP_SPAN_K, use_hash=True
    )


@register("q_strip_dup_spans", oracle=strip_dup_spans_sql(DUP_SPAN_K))
def q_strip_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaned corpus ExactSubstr removal produces: of every
    duplicated k-gram, all but the globally-first occurrence are cut
    (interval-union at token level) and each doc's text is rebuilt
    with a partition-independent in-array sort. Every clean_text byte
    is oracle-checked, not just the counts."""
    return strip_dup_spans(
        load(spark, sf_dir, "documents"), k=DUP_SPAN_K, use_hash=True
    )
