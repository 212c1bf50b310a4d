"""Registered dataset-split / sampling queries (training-data pipeline
surface — SURVEY.md §2.11 extensions; operators/sampling.py).

Registered in the LAST module slot on purpose: the r4 graded window
(slots 1–50) is frozen to the rotation ledger in COVERAGE.md; these
append at the tail and are proven by the local driver-strict
differential until a future rotation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import (
    hash_split,
    hash_split_sql,
    stratified_sample,
    stratified_sample_sql,
)
from ..sources import load
from . import register

# Dict order defines bucket ranges — part of the operator contract.
SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
SAMPLE_FRACTIONS = {"en": 0.5, "de": 0.25, "fr": 0.125}  # es dropped: allowlist


@register(
    "q_hash_split",
    oracle=f"""
SELECT split, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM (SELECT doc_id, {hash_split_sql("doc_id", SPLIT_FRACTIONS)} AS split
      FROM documents)
GROUP BY split
""",
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment keyed on doc_id; the id_sum aggregate
    makes the oracle sensitive to every single row's assignment, not
    just the split sizes."""
    d = load(spark, sf_dir, "documents")
    return (
        hash_split(d.select("doc_id"), "doc_id", SPLIT_FRACTIONS)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("id_sum"),
        )
    )


@register(
    "q_stratified_sample",
    oracle=f"""
SELECT doc_id, lang
FROM documents
WHERE {stratified_sample_sql("lang", SAMPLE_FRACTIONS, "doc_id")}
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota sampling (es intentionally absent → dropped);
    row-level output so the oracle checks every kept key."""
    d = load(spark, sf_dir, "documents")
    return stratified_sample(
        d.select("doc_id", "lang"), "lang", SAMPLE_FRACTIONS, "doc_id"
    )
