"""Bucketed-table co-located joins: the shuffle-elimination technique
for repeated large-large joins.

A 100 TB fact table joined to another large table on the same key pays
a full shuffle of both sides EVERY time the join runs. Writing both
tables bucketed (``bucketBy(n, key)`` + ``sortBy``) pays that shuffle
ONCE at write time; afterwards Spark's FileSourceScan reports the
bucket spec as its output partitioning, and every join or aggregation
on the bucket key plans with ZERO exchanges (and with ``sortBy``, zero
sorts) — the join becomes a per-bucket merge of pre-sorted files.

This module wraps the write/read conventions; the exchange-free plan
is asserted in tests/test_bucketing.py (the executable evidence that
the co-location actually holds — a silently mismatched bucket count
falls back to shuffling both sides).

Requirements for the exchange-free plan (documented because each is a
silent-shuffle trap): identical bucket counts on both sides, the join
key exactly the bucket key, ``spark.sql.sources.bucketing.enabled``
(default true), and at most one file per bucket (one writing task per
bucket, or ``spark.sql.legacy...`` coalescing) for the sort to be
reusable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str,
) -> None:
    """Write ``df`` as a bucketed+sorted external parquet table with
    partition alignment (one file per bucket) — a convenience wrapper
    over :func:`..sources.io.write_bucketed`, the single bucketed-write
    implementation."""
    from ..sources.io import write_bucketed as _write_bucketed

    _write_bucketed(
        df,
        table,
        [key],
        n_buckets=n_buckets,
        sort_cols=[key],
        path=path,
        align_partitions=True,
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans as a
    per-bucket sort-merge with no Exchange on either side.

    The ``merge`` hint pins the large-large strategy this operator
    exists for: at 100 TB neither side broadcasts, and without the
    hint a small test corpus would broadcast (which also makes the
    planner disable the bucketed scan entirely, hiding the very
    co-location being demonstrated)."""
    return spark.table(left_table).join(
        spark.table(right_table).hint("merge"), key
    )
