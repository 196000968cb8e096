"""Stream-stream joins with event-time interval bounds.

The reference only needs stream-static lookup joins (SURVEY §2.B B5);
this is the engine-extension tier: joining two *unbounded* streams,
which requires both sides watermarked and a time-range predicate so
Spark can bound the join state (rows outside the interval + watermark
are evicted).

Scale notes: state per side is O(rows within the interval window per
key), not O(stream); the join shuffles both streams on the key once.
The same function body works in batch (watermarks are skipped), which
is how tests assert stream output == batch join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    upper: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Rows of ``left`` joined to ``right`` rows of the same key with
    ``left_ts <= right_ts <= left_ts + upper``.

    Column names must be disjoint apart from ``key`` (rename before
    calling). ``upper`` / ``watermark`` are SQL interval strings.
    """
    l = left
    r = right
    if l.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    r = r.withColumnRenamed(key, f"_r_{key}")
    cond = (
        (F.col(key) == F.col(f"_r_{key}"))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.expr(f"{left_ts} + INTERVAL {upper}"))
    )
    return l.join(r, cond, how).drop(f"_r_{key}")
