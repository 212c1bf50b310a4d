"""Small-file compaction for parquet directories.

Streaming sinks (foreachBatch parquet writers, availableNow drains)
and per-trigger micro-batches leave directories with thousands of
KB-scale files; every later scan then pays per-file open/footer costs
and the driver pays per-file listing. The warehouse fix is periodic
compaction: rewrite the directory as ceil(total_bytes / target) files.

Local-mode atomicity: Spark cannot overwrite a directory it is reading
from, so the compacted output goes to a sibling temp dir which then
REPLACES the original (rm + rename — atomic enough for a maintenance
job that owns the table; concurrent readers see either old or new,
never partial, on POSIX rename semantics within the swap window). On a
cluster, use a transactional table format's OPTIMIZE instead — this
helper is the plain-parquet equivalent, same contract.

Sizing: `repartition(n)` (round-robin) gives uniformly sized output
files; `coalesce(n)` would avoid the shuffle but inherits upstream
partition skew — for a maintenance rewrite the one shuffle is the
point (it buys the uniform layout).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def dir_parquet_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) of the parquet data files under path."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
) -> dict:
    """Rewrite ``path`` with ~target-sized files; returns before/after
    stats. Row content is preserved exactly (asserted in tests); file
    count becomes ceil(total_bytes / target), minimum 1."""
    n_before, bytes_before = dir_parquet_stats(path)
    if n_before == 0:
        return {"files_before": 0, "files_after": 0, "bytes": 0}
    n_target = max(1, -(-bytes_before // target_file_bytes))
    tmp = f"{path.rstrip('/')}__compact_tmp"
    df = spark.read.parquet(path)
    df.repartition(n_target).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    n_after, bytes_after = dir_parquet_stats(path)
    return {
        "files_before": n_before,
        "files_after": n_after,
        "bytes": bytes_after,
    }
