"""Table-maintenance operators: small-file compaction.

Streaming sinks and incremental merges accumulate many small parquet
files; at 100 TB a scan's task count (and the namenode/liststore load)
is proportional to FILE count, not data size, so a directory with
millions of KB-sized files reads orders of magnitude slower than the
same bytes in right-sized files. Compaction is the maintenance pass
every table format schedules (Delta OPTIMIZE, Iceberg rewrite_data_
files) — here as a dependency-free rewrite with the same atomic
tmp-dir + rename swap the upsert sink uses (a crash leaves a stale
tmp/old dir, never a partial live directory).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import SparkSession

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> int:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(total_bytes / target_file_bytes)`` files (min 1) and swap it
    in atomically. Returns the new file count.

    The on-disk byte size drives the partition count (not row counts —
    compression ratio is what decides scan cost), and the rewrite is
    one round-robin ``repartition``: no keys, no sort, pure re-bin of
    rows into fewer, larger files. Content is unchanged; only layout.

    Crash recovery: a crash between the two renames leaves the data
    under the ``__compact_old`` name with no live path; the next call
    (or any caller invoking this entry point) restores it before doing
    anything else, and stale tmp/old leftovers from an earlier crash
    are cleared so a previous failure can never wedge later
    compactions (``os.rename`` refuses a non-empty destination).

    Concurrency contract: single writer, no concurrent readers of the
    live path during the swap — a reader between the two renames sees
    no live directory, and two compactions of the same path can
    interleave their tmp/old cleanup. This matches the harness's
    single-process maintenance use; a shared deployment needs an
    external mutex (table-format transaction, catalog lock, or a lock
    file) around the call, as with any directory-swap rewrite outside
    a transactional table format.
    """
    tmp = f"{path}__compact_tmp"
    old = f"{path}__compact_old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)  # crash window between the two renames
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    files = glob.glob(os.path.join(path, "*.parquet")) + glob.glob(
        os.path.join(path, "part-*")
    )
    total = sum(os.path.getsize(f) for f in set(files))
    n_out = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(path)
    df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return len(glob.glob(os.path.join(path, "part-*.parquet")))
