"""The reference's headline workflow as one composed, idempotent unit:
incremental source→warehouse load (SURVEY.md §1 — the
Salesforce→PostgreSQL sync loop), re-expressed Spark-first.

One run =

1. **extract** rows newer than the stored high watermark
   (:class:`~.sources.incremental.WatermarkStore`; the ``ts > wm``
   predicate pushes into the source scan, so a 100 TB table reads only
   its delta);
2. **dedup** to the latest record per business key (the reference's
   latest-SystemModstamp-wins rule) — a partitioned row_number window,
   shuffle keyed on the business key;
3. **upsert** the batch into the warehouse via the staging-table +
   single server-side merge shape (:func:`~.sources.jdbc.upsert` —
   PostgreSQL ``ON CONFLICT`` or ANSI ``MERGE``);
4. **advance** the watermark to max(ts) of the extracted batch — only
   after the load succeeded, so a failed run re-extracts the same
   delta (at-least-once extract + idempotent merge = exactly-once
   warehouse state).

Steps 1–3 are each independently registered/tested operators; this
module is the composition plus its lifecycle contract, integration-
tested end-to-end against embedded Derby in
tests/test_pipeline.py (first run = full load, second run = no-op,
late update rows upserted not duplicated).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sources.incremental import WatermarkStore, advance_watermark, incremental_extract
from .sources.jdbc import upsert, write_full


@dataclass
class LoadResult:
    table: str
    rows_extracted: int
    rows_loaded: int
    watermark: str | None


def latest_per_key(df: DataFrame, key_cols: list[str], ts_col: str) -> DataFrame:
    """Latest record per business key (ties broken by ts desc only —
    callers with non-unique ts should include a tiebreaker column).

    Partitioned window: shuffles once on the key, no global sort."""
    w = Window.partitionBy(*key_cols).orderBy(F.desc(ts_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def run_incremental_load(
    source: DataFrame,
    ts_col: str,
    key_cols: list[str],
    store: WatermarkStore,
    table: str,
    url: str,
    props: dict,
    dialect: str = "postgresql",
    create_target: bool = False,
    lag_seconds: int = 0,
) -> LoadResult:
    """One incremental sync cycle; idempotent under re-runs.

    ``create_target=True`` provisions the warehouse table from the
    batch schema on the FIRST run (empty overwrite → DDL only), the
    way the reference derives DDL from the source schema.

    ``lag_seconds``: re-extract overlap for sources without monotonic
    commit visibility (see incremental_extract) — safe here precisely
    because step 3 is an idempotent merge, so re-read rows collapse to
    no-ops. Note the docstring's exactly-once claim assumes either
    monotonic visibility or a lag wider than the source's worst
    visibility delay.
    """
    delta = incremental_extract(source, ts_col, store, table, lag_seconds=lag_seconds)
    # The deduped batch feeds three actions (count, JDBC write,
    # watermark max) — persist so the delta is computed once, not three
    # times. The global max(ts) row is by definition the latest for its
    # key, so it survives dedup: advancing from `batch` equals
    # advancing from `delta` with one fewer scan.
    batch = latest_per_key(delta, key_cols, ts_col).persist()
    try:
        n_extracted = delta.count()
        n_loaded = batch.count()
        if create_target and store.get(table) is None:
            write_full(batch.limit(0), url, table, props)
        if n_loaded > 0:
            upsert(batch, url, table, key_cols, props, dialect=dialect)
            # Watermark advances ONLY after a successful load, so a
            # failed run re-extracts the same delta; the server-side
            # merge makes the retry idempotent.
            advance_watermark(batch, ts_col, store, table)
    finally:
        batch.unpersist()

    return LoadResult(
        table=table,
        rows_extracted=n_extracted,
        rows_loaded=n_loaded,
        watermark=store.get(table),
    )
