"""Bucketed range join: point-in-interval joins without a cartesian.

Spark has no native range-join optimization: ``l JOIN r ON l.p >=
r.lo AND l.p < r.hi`` compiles to BroadcastNestedLoopJoin (right side
small) or a full cartesian (both large) — O(|L| x |R|) comparisons.
The standard fix is *bucketing by range chunk*:

  1. pick a bucket width W in the point's (integer) domain;
  2. each left point lives in exactly ONE bucket: floor(p / W);
  3. each right interval is exploded to EVERY bucket it overlaps
     (``sequence(floor(lo/W), floor((hi-1)/W))`` — hi exclusive);
  4. equi-join on the bucket, then apply the exact predicate.

The equi-join shuffles both sides by bucket (hash-partitionable,
AQE-skew-splittable), and comparisons drop from |L| x |R| to
|L| x (avg intervals overlapping one bucket). No duplicate pairs are
possible: a point matches an interval in exactly the point's own
bucket. W trades explosion factor (long intervals -> many bucket
rows) against per-bucket fan-in; a W near the median interval length
keeps the explosion ~2x.

This generalizes the interval-join shape of
``streaming/runner.py``'s stream-stream join to arbitrary batch
integer domains (epoch days/seconds/micros, numeric IDs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lo: str,
    hi: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join left rows to right intervals with lo <= point < hi.

    ``point``, ``lo``, ``hi`` are integer-domain columns (cast dates
    to epoch days / timestamps to epoch seconds first). Output carries
    all columns of both inputs (names must not collide).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = F.lit(bucket_width)
    lb = left.withColumn("_bucket", F.floor(F.col(point) / w))
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / w), F.floor((F.col(hi) - 1) / w)
            )
        ),
    )
    return (
        lb.join(rb, "_bucket")
        .filter((F.col(point) >= F.col(lo)) & (F.col(point) < F.col(hi)))
        .drop("_bucket")
    )
