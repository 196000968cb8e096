"""Single-pass table profiling: the stats-collection stage a pipeline
runs before planning work over an unfamiliar corpus (row counts, null
densities, distinct cardinalities per column — the inputs to join-order
and skew decisions, Spark's ``ANALYZE TABLE`` surface re-expressed as a
query whose output an oracle can check exactly).

One aggregate computes every column's counts in a single scan: Spark
plans multiple ``COUNT(DISTINCT)`` in one aggregation via an Expand
(input multiplied by the number of distinct aggregates, then partial
aggs collapse each replica to its group cardinality before the
exchange). For k profiled columns that is one k-wide scan rather than
k separate scans of a 100 TB table — the Expand's blow-up is bounded
by the scan's projection width, and the shuffle carries only partial
aggregation state, never rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled column: total rows, null count, exact
    distinct count. Output is (column, n_rows, n_nulls, n_distinct),
    ordered semantics-free (callers sort); all counts are exact
    integers so the profile hashes identically in any engine.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(c).alias(f"_nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"_nd_{c}"))
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                (F.col("n_rows") - F.col(f"_nn_{c}")).alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return row.select(
        F.explode(per_col).alias("s"), F.col("n_rows")
    ).select("s.column", "n_rows", "s.n_nulls", "s.n_distinct")
