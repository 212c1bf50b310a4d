"""Corpus construction as one composed pipeline — the LLM-data
counterpart of pipeline.py's warehouse sync loop.

Every stage is an independently registered/tested operator; this
module is the composition a training-data team actually runs, in the
canonical order (each stage shrinks the data the next one pays for):

1. **quality gate** — repetition profile (operators/repetition.py)
   keeps docs below the Gopher-style repetition caps;
2. **near-dup dedup** — MinHash-LSH pairs (operators/dedup.py) →
   connected components (operators/clustering.py) → keep one
   canonical survivor per cluster;
3. **decontaminate** — drop docs sharing ≥ k distinct trigrams with
   the benchmark set (operators/decontam.py, broadcast strategy);
4. **split** — deterministic train/val/test hash assignment
   (operators/sampling.py), appended as a column so the output can be
   written ``partitionBy("split")``.

Per-stage surviving counts come back in ``stats`` — the run report
that gates promotion. Five counts = five jobs; they ARE the
deliverable of a corpus build, not incidental driver chatter. Every
stage is hash/threshold-deterministic, so the whole build is
reproducible bit-for-bit (asserted in tests/test_corpus_pipeline.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.clustering import dedup_clusters
from .operators.decontam import contamination_overlap
from .operators.dedup import neardup_pairs
from .operators.repetition import repetition_profile
from .operators.sampling import hash_split


@dataclass
class CorpusBuildResult:
    docs: DataFrame  # doc_id, text(+passthrough cols), split
    stats: dict[str, int] = field(default_factory=dict)


def _trigram_sets(docs: DataFrame) -> DataFrame:
    t = docs.select("doc_id", F.split("text", " ").alias("t"))
    g = F.expr(
        "CASE WHEN size(t) >= 3 THEN "
        "array_distinct(transform(sequence(1, size(t) - 2), "
        "i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1), "
        "element_at(t, i + 2)))) "
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    return t.select("doc_id", F.explode(g).alias("g"))


def build_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    neardup_threshold: float = 0.5,
    decontam_k: int = 2,
    split_fractions: dict[str, float] | None = None,
) -> CorpusBuildResult:
    """Run the four-stage build over ``docs`` (doc_id, text, ...).

    ``benchmark``: optional (doc_id, text) eval set for
    decontamination; None skips stage 3."""
    splits = split_fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    stats: dict[str, int] = {"input": docs.count()}

    keep = repetition_profile(docs).where(F.col("keep") == 1).select("doc_id")
    gated = docs.join(keep, "doc_id")
    stats["after_quality"] = gated.count()

    pairs = neardup_pairs(gated, threshold=neardup_threshold).select(
        "doc_a", "doc_b"
    )
    clusters = dedup_clusters(pairs)
    losers = clusters.where(F.col("is_canonical") == 0).select(
        F.col("doc_id")
    )
    deduped = gated.join(losers, "doc_id", "left_anti")
    stats["after_dedup"] = deduped.count()

    if benchmark is not None:
        tri = _trigram_sets(deduped)
        bench_g = _trigram_sets(benchmark).select("g")
        contaminated = (
            contamination_overlap(tri, bench_g, strategy="broadcast")
            .where(F.col("n_overlap") >= decontam_k)
            .select("doc_id")
        )
        deduped = deduped.join(contaminated, "doc_id", "left_anti")
        stats["after_decontam"] = deduped.count()

    out = hash_split(deduped, "doc_id", splits)
    stats["output"] = stats.get("after_decontam", stats["after_dedup"])
    return CorpusBuildResult(docs=out, stats=stats)
