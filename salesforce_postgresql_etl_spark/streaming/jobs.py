"""Structured Streaming wirings (SURVEY.md §2.9).

Design rule: every streaming computation is a plain DataFrame→DataFrame
transformation function that works UNCHANGED on a batch frame and on a
``readStream`` frame — the t2 oracle checks the batch instantiation
(queries/stream_equiv.py registers them), and tests/test_streaming.py
drives the same functions through a real file-source stream with an
``availableNow`` trigger and asserts stream ≡ batch. The semantics are
the operator; the transport (micro-batches, state store, checkpoint)
is Spark's.

At scale: file/Kafka sources shard by partition; tumbling/sliding aggs
shuffle on (window, key) exactly like batch group-bys; watermarks bound
the state store so a 100 TB/day stream holds only the open windows.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure_runtime

def read_events_stream(spark: SparkSession, src_dir: str, max_files: int | None = None) -> DataFrame:
    """File-source stream over events parquet chunks, ts → timestamp_ntz.

    readStream requires a declared schema; we probe it with a driver-side
    batch footer read of the same directory (cheap, no data scan) so the
    stream adapts to either physical ts encoding the driver has shipped
    (raw nanos long or native micros timestamp — see sources/tables.py),
    then normalizes exactly like the batch loader.
    """
    configure_runtime(spark)
    raw_schema = spark.read.parquet(src_dir).schema
    reader = spark.readStream.schema(raw_schema)
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    from ..sources.tables import normalize_event_ts

    return normalize_event_ts(reader.parquet(src_dir))


# --- transformations (batch ≡ stream) --------------------------------------


def tumbling_counts(events: DataFrame) -> DataFrame:
    """T1: per-hour, per-type event counts + min/max value."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "min_value",
            "max_value",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """T2: 1-hour windows sliding every 15 minutes (4 windows/event)."""
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


def dedup_events(events: DataFrame) -> DataFrame:
    """T5: drop duplicate event_ids (exactly-once-ish by key)."""
    return events.dropDuplicates(["event_id"])


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """T3 (native form): gap-based session windows per user.

    Works in batch too — tests assert it matches the lag/cumsum
    batch-equivalent registered as q_sessionize.
    """
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("start_ts"),
            F.col("w.end").alias("end_ts"),
            "n_events",
        )
    )


def stateful_user_counts(events: DataFrame) -> DataFrame:
    """T6 true transport: custom per-key state via applyInPandasWithState.

    Keeps one counter + running value total per user in the state
    store across micro-batches and emits the updated totals each
    batch (update mode). The batch-equivalent semantics are
    q_state_running's final rows per user.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        import numpy as np

        for pdf in pdfs:
            n += len(pdf)
            # power-of-two quantization, same doctrine as sum_pow2:
            # FLOOR, not truncate-toward-zero — astype('int64') alone
            # would diverge from the batch quantizer on negative values
            total += (
                float(np.floor(pdf["value"] * (2**20)).astype("int64").sum())
                / (2**20)
            )
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_user_counts_tws(events: DataFrame) -> DataFrame:
    """T6 on the Spark-4 transport: ``transformWithStateInPandas`` with
    a ``StatefulProcessor`` + ValueState.

    Same semantics as :func:`stateful_user_counts` (one counter +
    floor-quantized running value total per user, updated totals
    emitted each micro-batch); only the state API differs — the
    processor-object transport is the long-term Spark direction (the
    state schema is explicit, timers are first-class, and RocksDB
    state-store backends apply unchanged).

    Environment note: the transformWithState state-server protocol
    imports ``google.protobuf`` in the driver-side worker; containers
    without protobuf can't run it (the pytest import-skips there) —
    :func:`stateful_user_counts` is the transport exercised everywhere.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                # identical floor-based power-of-two quantizer to the
                # batch doctrine (sum_pow2) and the applyInPandasWithState
                # transport — the three must agree bit-for-bit
                total += (
                    float(np.floor(pdf["value"] * (2**20)).astype("int64").sum())
                    / (2**20)
                )
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        UserCounts(),
        outputStructType="user_id long, n_events long, total_value double",
        outputMode="Update",
        timeMode="None",
    )


# --- stream runner ----------------------------------------------------------


def run_available_now(
    sdf: DataFrame,
    checkpoint_dir: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Drain the stream with an availableNow trigger into a memory sink
    and return the final result as a batch DataFrame."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)


def attribution_join(events: DataFrame, horizon: str = "1 hour",
                     watermark: str = "2 hours") -> DataFrame:
    """T9: stream–stream interval join (click→purchase attribution).

    Joins each purchase to the same user's clicks in the preceding
    ``horizon``. As a stream this is the canonical watermarked
    stream–stream inner join: BOTH sides carry a watermark and the join
    condition bounds event-time distance, so the state store can evict
    clicks older than watermark+horizon — bounded state at any scale,
    the property that makes the join runnable forever on an unbounded
    stream. On batch frames ``withWatermark`` is a no-op and the same
    plan is a plain interval join (registered as q_stream_join with a
    DuckDB oracle).
    """
    # withWatermark requires TIMESTAMP (ntz unsupported); the session is
    # pinned UTC (configure_runtime) so the round-trip cast is
    # value-preserving, and we cast back to ntz at the surface so the
    # output schema matches the rest of the engine / the DuckDB oracle.
    c = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").cast("timestamp").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").cast("timestamp").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return c.join(
        p,
        F.expr(
            "c_user = user_id AND purchase_ts > click_ts "
            f"AND purchase_ts <= click_ts + interval {horizon}"
        ),
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
    )


def _read_state_or_none(spark, state_dir: str):
    """Read a parquet state table, returning None ONLY when the path
    does not exist yet (the legitimate first-batch case).

    A bare ``except Exception`` here would be a data-loss bug (r6,
    advisor): any transient IO / corruption error reading accumulated
    state would silently fall back to "no state" and the subsequent
    overwrite would destroy the whole history. Real read errors must
    propagate so the micro-batch fails and the engine retries.
    """
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(state_dir)
    except AnalysisException as e:
        cond = getattr(e, "getCondition", lambda: None)() or ""
        # PATH_NOT_FOUND is the Spark>=3.4 error class; older Sparks
        # raise the same condition with only the "Path does not exist"
        # message and no class (r7 advice) — match both so the
        # legitimate first-batch case never hard-fails on version skew.
        if (
            "PATH_NOT_FOUND" in str(cond)
            or "PATH_NOT_FOUND" in str(e)
            or "Path does not exist" in str(e)
        ):
            return None
        raise


def scd2_stream_sink(
    table_dir: str,
    key: str,
    tracked: list[str],
    ts_col: str = "snapshot_ts",
):
    """foreachBatch function maintaining an SCD2 dimension from a stream
    of FULL-snapshot micro-batches (the streaming closure of the batch
    ``operators/scd.py`` merge — the same warehouse sync loop, pushed to
    continuous arrival).

    Each micro-batch must be one complete snapshot; its effective
    timestamp is max(``ts_col``) within the batch (one 1-row driver
    collect, same budget class as the incremental watermark probe).
    The table lives as parquet at ``table_dir``; the read-merge-
    overwrite is made safe by materializing the merge result
    (localCheckpoint) BEFORE the overwrite truncates the input files —
    on a cluster, swap the parquet dir for a transactional table
    format and drop the checkpoint. Batch order is the stream's
    micro-batch order, so pair this with maxFilesPerTrigger=1 (or a
    source whose batches are single snapshots).
    """
    from ..operators.scd import scd2_apply

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ts = batch_df.agg(F.max(ts_col)).collect()[0][0]
        if ts is None:  # empty micro-batch: no snapshot, no-op
            return
        snap = batch_df.drop(ts_col)
        current = _read_state_or_none(spark, table_dir)
        if current is None:
            current = (
                snap.limit(0)
                .withColumn("valid_from", F.lit(None).cast("timestamp_ntz"))
                .withColumn("valid_to", F.lit(None).cast("timestamp_ntz"))
            )
        merged = scd2_apply(current, snap, key, tracked, str(ts)).localCheckpoint(
            eager=True
        )
        merged.write.mode("overwrite").parquet(table_dir)

    return apply


def incremental_agg_stream_sink(
    state_dir: str,
    group_cols: list[str],
    value_col: str,
    scale: int = 2,
):
    """foreachBatch function maintaining a materialized aggregate table
    from an append-only stream — the streaming closure of
    ``operators/incremental_agg.py`` (T8's MERGE sink generalized from
    row upserts to agg-state upserts).

    Each micro-batch is reduced to its per-group partial state
    (count / exact decimal sum / min / max) and merged into the parquet
    state table: the history is NEVER rescanned, and because every kept
    statistic is a commutative monoid, the final state equals a
    from-scratch aggregate regardless of how the stream was chunked
    (asserted in tests/test_streaming.py). Same overwrite-safety
    doctrine as scd2_stream_sink: materialize (localCheckpoint) before
    overwriting the files being read; at 100 TB swap the dir for a
    transactional table and write per-group upserts instead.
    """
    from ..operators.incremental_agg import agg_state, merge_agg_state

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = agg_state(batch_df, group_cols, value_col, scale)
        current = _read_state_or_none(spark, state_dir)
        merged = (
            merge_agg_state(current, delta, group_cols)
            if current is not None
            else delta
        )
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            state_dir
        )

    return apply


def neardup_stream_sink(
    corpus_dir: str,
    threshold: float = 0.95,
    n_hashes: int | None = None,
    bands: int | None = None,
    tokenizer: str = "words",
):
    """foreachBatch function maintaining a NEAR-DUP-FREE corpus from a
    stream of document micro-batches — dedup-on-ingest, the streaming
    closure of ``neardup_pairs_cross`` (T5's exact streaming dedup
    generalized to Jaccard similarity; the shape every continuous
    crawl-ingest pipeline runs at 100 TB).

    Per micro-batch, two passes:
    1. WITHIN-batch: MinHash-LSH self pairs → ``dedup_clusters`` →
       non-canonical members dropped (transitive, min-doc_id
       canonical — identical semantics to the batch corpus build).
    2. CROSS-batch: survivors checked against the KEPT corpus through
       the stored-signature path (``corpus_bands=`` — history is
       never re-tokenized or re-hashed; only candidate hits are read
       back for the exact verify). Any survivor with Jaccard ≥
       threshold against a kept doc is dropped.
    Kept docs and their ``band_signatures`` rows are APPENDED to
    ``corpus_dir/docs`` and ``corpus_dir/bands`` — append-only state,
    no rewrite of history (unlike the SCD2/agg sinks there is no
    read-merge-overwrite cycle to guard).

    Semantics contract (pinned in tests/test_neardup_stream.py): this
    is ONLINE dedup — every kept doc is pairwise below-threshold
    against every other kept doc. When duplicate groups are CLIQUES
    (each member similar to each member) the kept set equals the
    batch-mode canonical-survivor set regardless of how the stream
    was chunked. For transitive CHAINS split across batches the two
    differ by construction (batch mode merges A–B–C through a dropped
    middle B; online mode never sees B again) — the divergence case
    is itself pinned, not papered over.
    """
    import os

    from ..operators.clustering import dedup_clusters
    from ..operators.dedup import (
        DEFAULT_BANDS,
        DEFAULT_N_HASHES,
        band_signatures,
        neardup_pairs,
        neardup_pairs_cross,
    )

    n_hashes = DEFAULT_N_HASHES if n_hashes is None else n_hashes
    bands = DEFAULT_BANDS if bands is None else bands
    docs_dir = os.path.join(corpus_dir, "docs")
    bands_dir = os.path.join(corpus_dir, "bands")

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select("doc_id", "text")
        if batch.isEmpty():
            return
        wpairs = neardup_pairs(
            batch,
            threshold=threshold,
            strategy="minhash",
            n_hashes=n_hashes,
            bands=bands,
            tokenizer=tokenizer,
        ).select("doc_a", "doc_b")
        dropped = (
            dedup_clusters(wpairs)
            .where(F.col("is_canonical") == 0)
            .select("doc_id")
        )
        survivors = batch.join(dropped, "doc_id", "left_anti")
        stored_bands = _read_state_or_none(spark, bands_dir)
        if stored_bands is not None:
            corpus = spark.read.parquet(docs_dir)
            hits = neardup_pairs_cross(
                survivors,
                corpus,
                threshold=threshold,
                strategy="minhash",
                n_hashes=n_hashes,
                bands=bands,
                tokenizer=tokenizer,
                # persist=False: the recomputed subtrees are all
                # MICRO-BATCH-sized (tok_a, candidates); the corpus-
                # sized work is already cut by corpus_bands, and a
                # library sink must not leave cache residue in the
                # caller's session (r4 rule) — clearCache() here would
                # drop the caller's own caches too
                corpus_bands=stored_bands,
            )
            dup_ids = hits.select(F.col("doc_a").alias("doc_id")).distinct()
            survivors = survivors.join(dup_ids, "doc_id", "left_anti")
        # materialize once: the survivor frame feeds BOTH appends, and
        # its cross-batch lineage reads the state dirs being appended
        # to — checkpoint cuts that read before the writes land
        survivors = survivors.localCheckpoint(eager=True)
        survivors.write.mode("append").parquet(docs_dir)
        band_signatures(
            survivors, n_hashes=n_hashes, bands=bands, tokenizer=tokenizer
        ).write.mode("append").parquet(bands_dir)

    return apply
