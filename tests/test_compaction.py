"""Small-file compaction (sources/compaction.py): content-preserving,
file-count-reducing, idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from salesforce_postgresql_etl_spark.sources import load
from salesforce_postgresql_etl_spark.sources.compaction import (
    compact_parquet_dir,
    dir_parquet_stats,
)

from .conftest import SF_DIR


def _rows(spark, path):
    return sorted(tuple(r) for r in spark.read.parquet(path).collect())


def test_compaction_preserves_rows_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    e = load(spark, SF_DIR, "events").select("event_id", "event_type", "value")
    e.repartition(40).write.parquet(path)  # simulate a fragmented sink
    before_rows = _rows(spark, path)
    n_before, total = dir_parquet_stats(path)
    assert n_before == 40

    stats = compact_parquet_dir(spark, path, target_file_bytes=total)
    assert stats["files_before"] == 40
    assert stats["files_after"] < 40
    assert _rows(spark, path) == before_rows


def test_compaction_idempotent(spark, tmp_path):
    path = str(tmp_path / "frag")
    e = load(spark, SF_DIR, "events").select("event_id", "value")
    e.repartition(10).write.parquet(path)
    _, total = dir_parquet_stats(path)
    compact_parquet_dir(spark, path, target_file_bytes=total)
    rows1 = _rows(spark, path)
    n1, _ = dir_parquet_stats(path)
    compact_parquet_dir(spark, path, target_file_bytes=total)
    assert _rows(spark, path) == rows1
    n2, _ = dir_parquet_stats(path)
    assert n2 == n1


def test_compaction_sizes_by_target(spark, tmp_path):
    path = str(tmp_path / "frag")
    e = load(spark, SF_DIR, "events")
    e.repartition(20).write.parquet(path)
    _, total = dir_parquet_stats(path)
    # target = ~quarter of the data -> expect ~4 files (repartition
    # sizing is approximate; assert the order of magnitude)
    stats = compact_parquet_dir(spark, path, target_file_bytes=max(1, total // 4))
    assert 2 <= stats["files_after"] <= 8


def test_empty_dir_noop(spark, tmp_path):
    path = str(tmp_path / "empty")
    path_dir = tmp_path / "empty"
    path_dir.mkdir()
    stats = compact_parquet_dir(spark, path)
    assert stats == {"files_before": 0, "files_after": 0, "bytes": 0}
