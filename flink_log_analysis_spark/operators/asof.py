"""As-of (temporal nearest-preceding) join — an operator Spark lacks.

For every left row, attach the latest right row with
``right.ts <= left.ts`` within the same key — the standard primitive
for "state as of event time" (last quote before a trade, last config
before a request, last purchase before an event).

Spark has no ASOF JOIN; the scalable composition used here is the
union + ordered-window trick:

  1. tag right rows 0 and left rows 1, union them aligned on
     (key, ts, tag, payload...);
  2. one window per key ordered by (ts, tag): the payload columns are
     packed into a single STRUCT per right row (non-null even when
     every payload field is null, so a right row whose payload value
     is legitimately NULL still *matches* instead of letting an older
     non-null value bleed forward) and ``last(struct,
     ignorenulls=True)`` over unbounded-preceding..current carries the
     most recent right row forward onto every left row — right rows
     sort before left rows at equal ts, so the match is inclusive
     (right.ts == left.ts matches), same as DuckDB/ASOF convention;
  3. keep the left rows.

Cost: ONE shuffle on the key (the window sort) over |L|+|R| rows — no
range cross-product, no per-key explosion; at 100 TB this is the same
shape as any keyed window. Compare: a naive join on
``l.key = r.key AND r.ts <= l.ts`` + max-per-row is O(|L|x|R|/keys).

The oracle runs DuckDB's *native* ``ASOF JOIN`` against this
composition — two independent algorithms, same result
(plans/analytics2.py::last_purchase_asof). Right rows must be unique
per (key, ts) for cross-engine determinism; callers dedupe first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """left columns + latest-preceding right ``payload_cols`` (all null
    when no right row precedes; ``how='inner'`` drops those rows)."""
    l_part = left.withColumn("_tag", F.lit(1))
    r_part = right.select(
        key,
        ts,
        F.lit(0).alias("_tag"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_p"),
    )
    # allowMissingColumns fills _p with NULL for left rows; right rows
    # carry a non-null struct even when every payload field is null.
    u = l_part.unionByName(r_part, allowMissingColumns=True)

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_p", F.last("_p", ignorenulls=True).over(w))
    out = u.filter(F.col("_tag") == 1)
    if how == "inner":
        out = out.filter(F.col("_p").isNotNull())
    return out.select(
        *left.columns,
        *[F.col(f"_p.{c}").alias(c) for c in payload_cols],
    )
