"""Deterministic sampling operators for training-data pipelines.

``df.sample()`` is seeded per-partition, so its output changes with
partitioning, task retries, and engine — unusable when a sample must
be reproducible across runs (and auditable against an oracle). These
operators decide membership from a *content hash* of a key column
instead: the same row is in or out of the sample everywhere, forever,
independent of physical layout. This is the standard trick for
holdout/eval splits in large corpus pipelines ("hash-mod splits").

Hash = the repo-wide engine-portable md5 bucket
(:mod:`..functions.hashing`), mapped to a bucket in [0, 1e6). A row is
sampled iff bucket < fraction * 1e6.

Scale notes: membership is a pure map-side predicate on already-read
columns — no shuffle, no state, trivially parallel; Catalyst pushes
surrounding filters/projections around it freely. Stratified sampling
adds only a broadcast of the (tiny) per-stratum fraction map, encoded
as a CASE expression — never a join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import token_hash, token_hash_sql

BUCKETS = 1_000_000


def sample_bucket(key: Column, seed: int | str = 0) -> Column:
    """Deterministic bucket in [0, 1e6) for a key column."""
    return token_hash(key.cast("string"), salt=seed) % BUCKETS


def sample_bucket_sql(expr: str, seed: int | str = 0) -> str:
    """DuckDB twin of :func:`sample_bucket` (for oracles)."""
    return f"({token_hash_sql(f'CAST({expr} AS VARCHAR)', salt=seed)} % {BUCKETS})"


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: int | str = 0,
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided by key hash (reproducible
    across runs, partitionings, and engines)."""
    return df.filter(
        sample_bucket(F.col(key_col), seed) < int(fraction * BUCKETS)
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    seed: int | str = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. rebalance languages).

    ``fractions`` maps stratum value -> keep fraction; strata not
    listed keep ``default_fraction``. The fraction lookup compiles to
    a CASE expression — no join, no shuffle.
    """
    threshold = F.lit(int(default_fraction * BUCKETS))
    for value, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(frac * BUCKETS))
        ).otherwise(threshold)
    return df.filter(sample_bucket(F.col(key_col), seed) < threshold)


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    seed: int | str = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (train/val/test...)
    by hash range. ``splits`` fractions must sum to <= 1; rows hashing
    past the last boundary get NULL (excluded-by-design).

    The assignment is stable under data growth: a row's split never
    changes when other rows are added or the frame is repartitioned —
    the property that keeps eval sets uncontaminated across pipeline
    re-runs.
    """
    bucket = sample_bucket(F.col(key_col), seed)
    expr = F.lit(None).cast("string")
    cum = 0.0
    bounds = []
    for name, frac in splits.items():  # preserve caller order
        lo, hi = cum, cum + frac
        bounds.append((name, int(lo * BUCKETS), int(hi * BUCKETS)))
        cum = hi
    if cum > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {cum} > 1")
    for name, lo, hi in reversed(bounds):
        expr = F.when((bucket >= lo) & (bucket < hi), F.lit(name)).otherwise(
            expr
        )
    return df.withColumn(split_col, expr)
