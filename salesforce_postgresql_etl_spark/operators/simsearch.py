"""Similarity search over embedding columns (SURVEY.md §2.11 L3, L8).

Cosine top-k with two strategies behind one function:

- ``strategy="brute"``: query × corpus cross join, exact cosine, top-k
  per query via a partitioned window. The baseline and oracle form.
- ``strategy="ivf"``: IVF-style coarse quantization. Partition
  centroids come from the ``label`` column (the fixture's natural
  cluster id — a production build would k-means them); each query
  probes only its ``nprobe`` nearest centroids' inverted lists. With
  ``nprobe = n_labels`` the search space degenerates to the full
  corpus and the result EQUALS brute force (the pytest asserts this);
  smaller nprobe trades recall for a 1/nprobe scan-cost cut, which is
  the 100 TB path (the inverted lists are just partition pruning on a
  label-partitioned parquet layout — only probed partitions are read).

Determinism doctrine: dot products and norms are summed in DECIMAL
(float32 → exact double → decimal(12,7) per element; products at
scale 14) so the fold order never matters; the final
``dot / (sqrt(n_a)·sqrt(n_b))`` is a fixed sequence of correctly-
rounded IEEE double ops — bit-identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import dec_to_double

# Element/accumulator decimal shapes: values in [-1, 1], products at
# scale 14 — |sum| ≤ 64 ⇒ scaled bigint ≤ 6.4e15 < 2^63.
_ELEM = "decimal(12,7)"
_ACC = "decimal(26,14)"


def _dot_dec(a: Column, b: Column) -> Column:
    """Exact decimal dot product of two float arrays, as double.

    float32 → DOUBLE first (exact widening in every engine), THEN
    decimal: a direct float→decimal cast scales in float precision in
    DuckDB (±1 ulp at the target scale on ~half the values) while
    Spark rounds the shortest float repr — the double hop makes both
    engines round the same exact value.
    """
    prods = F.zip_with(
        a, b, lambda x, y: x.cast("double").cast(_ELEM) * y.cast("double").cast(_ELEM)
    )
    s = F.aggregate(
        prods,
        F.lit(0).cast(_ACC),
        lambda acc, x: (acc + x).cast(_ACC),
    )
    # prec=18: |dot| ≤ 64 needs only 2 int digits; keeps the ×10¹⁴
    # intermediate under both engines' 38-digit decimal cap.
    return dec_to_double(s, 14, prec=18)


def _sq_norm_dec(a: Column) -> Column:
    return _dot_dec(a, a)


def with_sq_norm(emb: DataFrame, vec: str = "embedding") -> DataFrame:
    return emb.withColumn("sq_norm", _sq_norm_dec(F.col(vec)))


# Power-of-two quantizer for float sums: v·2⁴⁰ is EXACT in double
# (power-of-two multiply), floor is unambiguous everywhere (no decimal
# half-boundary cases), and the resulting bigints sum exactly in any
# order. Mean = (Σ/2⁴⁰)/n — two correctly-rounded double ops.
POW2_Q = 2**40


def mean_q40(val: Column) -> Column:
    """Order-independent mean of a float column at 2^-40 quantization."""
    scaled = F.floor(val.cast("double") * F.lit(float(POW2_Q)))
    return (F.sum(scaled).cast("double") / F.lit(float(POW2_Q))) / F.count(F.lit(1))


def sql_mean_q40(val_sql: str) -> str:
    return (
        f"(CAST(SUM(CAST(floor(CAST({val_sql} AS DOUBLE) * {POW2_Q}) AS BIGINT))"
        f" AS DOUBLE) / {POW2_Q}.0) / COUNT(*)"
    )


def label_centroids(emb: DataFrame, vec: str = "embedding") -> DataFrame:
    """Per-label centroid as an ordered array (order-independent mean).

    This is also the L8 operator: posexplode → exact scaled-integer sum
    per (label, pos) → mean in double → re-assembled ordered array.
    """
    pos = emb.select(
        "label", F.posexplode(vec).alias("pos", "val")
    )
    per_dim = pos.groupBy("label", "pos").agg(
        mean_q40(F.col("val")).alias("c_val")
    )
    return per_dim.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c_val"))),
            lambda s: s.getField("c_val"),
        ).alias("centroid")
    )


def topk_cosine(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    strategy: str = "brute",
    nprobe: int = 3,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Top-k nearest corpus vectors per query vector, by cosine.

    ``emb``: (vec_id, embedding, label); ``queries``: (qid, q_emb).
    Returns (qid, vec_id, cosine, rnk) with rnk 1..k, self-matches
    excluded, ties broken by vec_id.

    ``centroids``: optional prebuilt (label, centroid) table for the
    IVF path. In production the index is trained offline and probes are
    online — passing a persisted centroid table here skips the
    per-query-batch training scan (the bench measures probe-only cost
    this way). ``None`` trains from ``emb`` inline.
    """
    corpus = with_sq_norm(emb).select(
        "vec_id", "label", F.col("embedding").alias("c_emb"), F.col("sq_norm").alias("c_n2")
    )
    q = queries.select(
        "qid", "q_emb", _sq_norm_dec(F.col("q_emb")).alias("q_n2")
    )

    if strategy == "ivf":
        cents = centroids if centroids is not None else label_centroids(emb)
        # Rank centroids per query by cosine (same exact math), keep
        # the nprobe closest labels, then search only those lists.
        qc = q.crossJoin(F.broadcast(cents)).withColumn(
            "c_sim",
            _dot_dec(F.col("q_emb"), F.col("centroid").cast("array<double>"))
            / (F.sqrt("q_n2") * F.sqrt(_sq_norm_dec(F.col("centroid").cast("array<double>")))),
        )
        wq = Window.partitionBy("qid").orderBy(F.desc("c_sim"), "label")
        probes = (
            qc.withColumn("crnk", F.row_number().over(wq))
            .where(F.col("crnk") <= nprobe)
            .select("qid", "q_emb", "q_n2", "label")
        )
        joined = probes.join(corpus, "label")
    elif strategy == "brute":
        joined = q.crossJoin(corpus)
    else:
        raise ValueError(f"unknown strategy: {strategy!r}")

    scored = joined.where(F.col("qid") != F.col("vec_id")).withColumn(
        "cosine",
        _dot_dec(F.col("q_emb"), F.col("c_emb"))
        / (F.sqrt("q_n2") * F.sqrt("c_n2")),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("qid", "vec_id", "cosine", "rnk")
    )
