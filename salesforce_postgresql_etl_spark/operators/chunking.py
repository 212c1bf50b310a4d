"""Document chunking with overlap — the context-window prep step.

Training and retrieval pipelines both slice long documents into
fixed-size token windows with a stride < window so no boundary
context is lost (chunk i and i+1 share ``window - stride`` tokens).
This is pure per-row array algebra: sequence → explode → slice, all
JVM expressions, no shuffle, no state — at 100 TB it rides the scan
like every other per-row operator, and the output explodes by
~n_tok/stride per doc, which is the unavoidable output size, not an
intermediate blow-up.

Chunk identity is content-addressed: fp = md5 of the space-joined
chunk text. md5 is the repo's one cross-engine hash, so a DuckDB
oracle verifies every chunk's CONTENT, not just its coordinates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    window: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each doc into overlapping token windows.

    Returns: id, chunk_id (0-based), start_tok, n_tok_chunk, fp.
    Starts are 0, stride, 2*stride, ... while start < n_tok, so every
    token is in ≥1 chunk and the final chunk may be short. A doc's
    chunk count is ceil(n_tok / stride).
    """
    if not 0 < stride <= window:
        raise ValueError(
            f"need 0 < stride <= window, got stride={stride} window={window}"
        )
    t = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("t"))
    # split() never returns an empty array (worst case [""]), so
    # size(t)-1 >= 0 and sequence() is always ascending here.
    s = t.select(
        id_col,
        "t",
        F.size("t").alias("n"),
        F.explode(
            F.sequence(F.lit(0), F.size("t") - 1, F.lit(stride))
        ).alias("start"),
    )
    chunk_len = F.least(F.lit(window), F.col("n") - F.col("start"))
    return s.select(
        id_col,
        (F.col("start") / stride).cast("bigint").alias("chunk_id"),
        F.col("start").cast("bigint").alias("start_tok"),
        chunk_len.cast("bigint").alias("n_tok_chunk"),
        F.md5(
            F.concat_ws(" ", F.slice(F.col("t"), F.col("start") + 1, chunk_len))
        ).alias("fp"),
    )


def chunk_documents_sql(
    window: int, stride: int, table: str = "documents",
    text_col: str = "text", id_col: str = "doc_id",
) -> str:
    """The identical chunking as DuckDB SQL (the oracle). DuckDB's
    range(0, n, step) is end-exclusive and list slicing t[a:b] is
    1-based inclusive — matching Spark's sequence(0, n-1, step) and
    slice(t, a, len) exactly."""
    return f"""
WITH tok AS (SELECT {id_col}, string_split({text_col}, ' ') AS t FROM {table}),
s AS (SELECT {id_col}, t, len(t) AS n,
             unnest(range(0, len(t), {stride})) AS start
      FROM tok)
SELECT {id_col},
       CAST(start // {stride} AS BIGINT) AS chunk_id,
       CAST(start AS BIGINT) AS start_tok,
       CAST(least({window}, n - start) AS BIGINT) AS n_tok_chunk,
       md5(array_to_string(t[start + 1 : start + least({window}, n - start)], ' ')) AS fp
FROM s
"""
