"""Streaming ANN index ingestion: foreachBatch -> ivf_index_append.

Completes the persisted IVF index's lifecycle (``similarity.py``:
build once -> append batches -> search many) with the STREAMING ingest
path a production corpus actually has: embedding batches arrive on a
stream, each micro-batch assigns to the index's frozen centroids,
codes with its frozen codebook, and partition-appends into only the
cells it lands in — the index absorbs the stream without a rebuild.

Exactly-once at the sink: Structured Streaming replays a micro-batch
after a crash-before-checkpoint, and a parquet append is not naturally
idempotent (rows would duplicate), so each committed batch leaves a
durable marker under ``{index}/_ingest_commits/`` and a replayed
batch_id is skipped — the same replay-skip contract as the keyed
upsert sinks (``upsert.py``), made durable because the appended rows
are durable. Ordering: the append job runs first and the marker is
written only after it returns; Spark's file output committer only
publishes a job's files on commit, so a crash mid-append leaves no
visible rows and no marker — replay then appends cleanly.

Scale shape: per batch, one projection over the batch + an append
touching only the landed cells (``ivf_index_append``); stream volume
never rewrites existing partitions, and a restart resumes from the
checkpoint with replays skipped.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators import similarity

COMMITS_DIR = "_ingest_commits"


def committed_batches(index_path: str) -> list[int]:
    """Batch ids durably committed into the index (sorted)."""
    d = f"{index_path}/{COMMITS_DIR}"
    if not os.path.isdir(d):
        return []
    return sorted(
        int(name.split("-", 1)[1])
        for name in os.listdir(d)
        if name.startswith("batch-")
    )


def ivf_append_batch(
    spark: SparkSession,
    index_path: str,
    batch_df: DataFrame,
    batch_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> bool:
    """One idempotent ingest step: append unless this batch_id already
    committed (restart replay). Returns whether an append ran."""
    marker_dir = f"{index_path}/{COMMITS_DIR}"
    marker = f"{marker_dir}/batch-{batch_id}"
    if os.path.exists(marker):
        return False
    similarity.ivf_index_append(
        spark, index_path, batch_df, id_col=id_col, vec_col=vec_col
    )
    os.makedirs(marker_dir, exist_ok=True)
    with open(marker, "w") as fh:
        fh.write("ok")
    return True


def ivf_ingest_stream(
    spark: SparkSession,
    index_path: str,
    stream_df: DataFrame,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    timeout_sec: int = 600,
) -> list[int]:
    """Drain a stream of embedding rows into the persisted index with
    ``availableNow`` (process everything currently available, then
    stop — the batch-twin convention of ``plans/streamed.py``).
    Returns the committed batch ids after the drain."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ivf_append_batch(
            spark,
            index_path,
            batch_df,
            batch_id,
            id_col=id_col,
            vec_col=vec_col,
        )

    q = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout=timeout_sec):
        q.stop()
        raise TimeoutError(
            f"IVF ingest stream did not drain availableNow input in "
            f"{timeout_sec}s"
        )
    return committed_batches(index_path)
