"""Product quantization (PQ) for approximate nearest neighbor at scale.

IVF (simsearch.py) prunes WHICH vectors are scored; PQ shrinks WHAT is
scored: each vector is split into ``m`` contiguous subvectors and each
subvector is replaced by the id of its nearest codebook centroid
(Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011). A 64-dim float64 embedding (512 bytes) becomes m=8 codes
(8 bytes) — the 100 TB effect is that the scored corpus fits in a
fraction of executor memory and the scan reads a byte column instead
of an array column. Scoring is ADC (asymmetric distance computation):
the query stays exact; dot(q, x) ≈ Σ_j dot(q_j, codebook_j[code_j]),
a per-query lookup table of m·k floats built once and broadcast.

Determinism doctrine (same as kmeans_centroids): farthest-first init
seeded by min-md5(id), L2 assignment with code-ascending tie-breaks,
mean_q40 order-independent centroid updates, fixed iteration count —
codebooks, codes, and rankings are bit-stable under any partitioning.

Subquantizers train on L2 (not cosine): the codebook must reconstruct
the subvector — magnitude included — because ADC sums raw partial dot
products; exact per-vector norms are kept alongside the codes (the
standard trick) so cosine ranking divides by the TRUE |v|, and only
the direction is approximated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .simsearch import _dot_dbl, mean_q40


def _slice_sub(vec: Column, sub: int, d_sub: int) -> Column:
    return F.slice(vec, sub * d_sub + 1, d_sub)


def _l2_sq(a: Column, b: Column) -> Column:
    """|a-b|² as a sequential double fold (fixed order → deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _kmeans_l2(
    base: DataFrame, k: int, iters: int, init: str = "farthest"
) -> list[list[float]]:
    """Deterministic L2 Lloyd's over ``base`` (sid string, v array<double>).

    Same init/update doctrine as simsearch.kmeans_centroids, with L2 as
    the metric (farthest-first = max-min distance). Returns the k
    centroids code-ordered; driver holds only the k×d_sub matrix.

    ``init``: "farthest" (Gonzalez max-min — k-1 one-row driver jobs,
    the quality default) or "md5" (the k lowest-md5(id) vectors in one
    job — for timing builds and smoke paths where codebook quality
    doesn't change what is being measured).
    """
    spark = base.sparkSession
    if init == "md5":
        rows = base.withColumn("h", F.md5("sid")).orderBy("h", "sid").limit(k).collect()
        chosen = [[float(x) for x in r.v] for r in rows]
    elif init == "farthest":
        first = (
            base.withColumn("h", F.md5("sid")).orderBy("h", "sid").limit(1).collect()[0]
        )
        chosen = [[float(x) for x in first.v]]
        for _ in range(k - 1):
            cdf = spark.createDataFrame(
                [(c,) for c in chosen], "centroid array<double>"
            )
            far = (
                base.crossJoin(F.broadcast(cdf))
                .groupBy("sid", "v")
                .agg(F.min(_l2_sq(F.col("v"), F.col("centroid"))).alias("best"))
                .orderBy(F.col("best").desc(), F.col("sid").asc())
                .limit(1)
                .collect()[0]
            )
            chosen.append([float(x) for x in far.v])
    else:
        raise ValueError(f"unknown init {init!r}")
    cents = list(enumerate(chosen))
    dim = len(chosen[0])
    for _ in range(iters):
        cdf = spark.createDataFrame(cents, "code int, centroid array<double>")
        d2 = _l2_sq(F.col("v"), F.col("centroid"))
        assigned = (
            base.crossJoin(F.broadcast(cdf))
            .groupBy("sid", "v")
            .agg(F.min(F.struct(d2.alias("d"), F.col("code"))).alias("b"))
            .select("v", F.col("b.code").alias("code"))
        )
        got = {
            r.code: [float(x) for x in r.c]
            for r in assigned.groupBy("code")
            .agg(
                F.array(
                    *[mean_q40(F.col("v").getItem(i)) for i in range(dim)]
                ).alias("c")
            )
            .collect()
        }
        cents = [(i, got.get(i, c)) for i, c in cents]
    return [c for _, c in cents]


def pq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 4,
    vec: str = "embedding",
    id_col: str = "vec_id",
    init: str = "farthest",
) -> DataFrame:
    """Train per-subspace codebooks → (sub int, code int, centroid
    array<double>), centroid dim = dim/m. Offline-training cost class:
    m independent k-means over subvector slices. ``init`` passes
    through to the subquantizer k-means (see _kmeans_l2)."""
    dim = len(emb.select(vec).limit(1).collect()[0][0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    d_sub = dim // m
    spark = emb.sparkSession
    rows = []
    for sub in range(m):
        base = emb.select(
            F.col(id_col).cast("string").alias("sid"),
            _slice_sub(F.col(vec).cast("array<double>"), sub, d_sub).alias("v"),
        )
        for code, cent in enumerate(_kmeans_l2(base, k, iters, init=init)):
            rows.append((sub, code, cent))
    return spark.createDataFrame(rows, "sub int, code int, centroid array<double>")


def pq_encode(
    emb: DataFrame,
    codebooks: DataFrame,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<int>, norm double): nearest code per subspace
    plus the exact vector norm (kept so ranking divides by the true
    |v|). One broadcast of the m·k codebook rows; the only shuffle is
    the per-id code reassembly."""
    cb = codebooks.select(
        "sub", "code", "centroid", F.size("centroid").alias("d_sub")
    )
    v = emb.select(
        F.col(id_col).alias("pq_id"),
        F.col(vec).cast("array<double>").alias("v"),
    )
    scored = v.crossJoin(F.broadcast(cb)).select(
        "pq_id",
        "sub",
        "code",
        _l2_sq(_slice_sub(F.col("v"), F.col("sub"), F.col("d_sub")), F.col("centroid")).alias("d2"),
    )
    best = scored.groupBy("pq_id", "sub").agg(
        F.min(F.struct(F.col("d2"), F.col("code"))).alias("b")
    )
    codes = best.groupBy("pq_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("sub"), F.col("b.code").alias("code")))),
            lambda s: s.code,
        ).alias("codes")
    )
    norms = v.select(
        "pq_id", F.sqrt(_dot_dbl(F.col("v"), F.col("v"))).alias("norm")
    )
    return codes.join(norms, "pq_id").select(
        F.col("pq_id").alias(id_col), "codes", "norm"
    )


def pq_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    rerank_with: DataFrame | None = None,
    shortlist: int = 50,
) -> DataFrame:
    """ADC top-k: (qid, vec_id, score, rnk) — score ≈ cosine.

    The per-query LUT (qid, sub, code → dot(q_sub, centroid)) is a
    broadcast of |Q|·m·k rows; corpus codes explode to n·m rows, join
    the LUT map-side, and partial+final sum rebuilds the approximate
    dot product — the corpus is scanned once, never holds a float
    vector, and the only wide shuffle is the (qid, id) partial-sum
    merge. Self-matches (qid == id) are excluded for parity with
    topk_cosine; ties break by id.

    ``rerank_with``: pass the float corpus (id, embedding) to run the
    standard two-stage search — ADC selects a ``shortlist`` per query,
    then ONLY those |Q|·shortlist candidates are scored exactly and
    the top k re-ranked. This is how PQ is deployed: the full corpus
    is touched only through its codes; exact vectors are fetched for
    a per-query handful, so recall is set by P(true top-k ∈ ADC
    shortlist), not by raw quantization distortion.
    """
    d_sub = F.size("centroid")
    lut = (
        queries.crossJoin(F.broadcast(codebooks))
        .select(
            "qid",
            "sub",
            "code",
            _dot_dbl(
                _slice_sub(F.col("q_emb").cast("array<double>"), F.col("sub"), d_sub),
                F.col("centroid"),
            ).alias("val"),
            F.sqrt(
                _dot_dbl(
                    F.col("q_emb").cast("array<double>"),
                    F.col("q_emb").cast("array<double>"),
                )
            ).alias("q_norm"),
        )
    )
    doc_codes = codes.select(
        F.col(id_col),
        F.col("norm"),
        F.posexplode("codes").alias("sub", "code"),
    )
    scored = (
        doc_codes.join(F.broadcast(lut), ["sub", "code"])
        .groupBy("qid", id_col, "norm", "q_norm")
        .agg(F.sum("val").alias("dot_approx"))
        .where(F.col("qid") != F.col(id_col))
        .select(
            "qid",
            id_col,
            (F.col("dot_approx") / (F.col("norm") * F.col("q_norm"))).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.col(id_col))
    ranked = scored.withColumn("rnk", F.row_number().over(w))
    if rerank_with is None:
        return ranked.where(F.col("rnk") <= k)
    cand = ranked.where(F.col("rnk") <= shortlist).select("qid", id_col)
    corpus = rerank_with.select(
        F.col(id_col), F.col("embedding").cast("array<double>").alias("c_emb")
    )
    qx = queries.select(
        "qid",
        F.col("q_emb").cast("array<double>").alias("qv"),
    )
    exact = (
        cand.join(corpus, id_col)
        .join(F.broadcast(qx), "qid")
        .select(
            "qid",
            id_col,
            (
                _dot_dbl(F.col("qv"), F.col("c_emb"))
                / (
                    F.sqrt(_dot_dbl(F.col("qv"), F.col("qv")))
                    * F.sqrt(_dot_dbl(F.col("c_emb"), F.col("c_emb")))
                )
            ).alias("score"),
        )
    )
    return exact.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)
