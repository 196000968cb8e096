"""Distributed ranking without low-cardinality window partitions.

``Window.partitionBy(k)`` puts each key's ENTIRE group through one
task. Fine when keys are plentiful; a scale killer when the key has a
handful of values (e.g. an order-status column with 3 states — each
window partition is ~1/3 of all rows, and at 100x data each becomes a
straggler task). The same applies to the fully partitionless window
(see operators/quality.pack_chunks).

:func:`distributed_rank` computes the exact per-group row_number under
a strict total order as a two-pass range-partition + offset
composition instead:

1. range-partition by (group cols, order cols) — so each partition
   holds a contiguous slice of the total order and partition k's slice
   precedes partition k+1's — and pin partition ids;
2. per-(partition, group) row counts — a handful of rows per partition
   — come to the driver, which computes each (partition, group)'s rank
   offset and each group's total size (O(partitions x groups) work);
3. a per-(partition, group) row_number (parallel across partitions,
   bounded by partition size not group size) plus the broadcast offset
   is the exact global per-group rank.

rank == row_number because the order is strict (caller must include a
tie-breaking unique column). From (rank, group size) any rank-family
function is plain arithmetic: percent_rank = (rank-1)/(n-1), ntile(b)
per the first-(n%b)-buckets-get-one-extra rule, cume_dist = rank/n.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def distributed_rank(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    rank_col: str = "rank",
    size_col: str = "group_size",
    max_offset_rows: int = 1_000_000,
) -> DataFrame:
    """``df`` + exact per-group rank and group size, computed scalably.

    Equivalent to ``row_number() OVER (PARTITION BY partition_cols
    ORDER BY order_cols)`` plus ``count(*) OVER (PARTITION BY
    partition_cols)``, but never materializes a whole group in one
    task. ``order_cols`` are ascending and must form a strict total
    order within each group (include a unique tie-breaker).

    This operator is for LOW-cardinality partition keys — the case
    where the plain window is a straggler. The driver-side offset
    table is O(partitions x groups); with a high-cardinality key that
    table itself becomes the bottleneck, and the plain
    ``Window.partitionBy`` is already well-distributed there — so
    exceeding ``max_offset_rows`` raises with that advice rather than
    silently flooding the driver.
    """
    keys = [*partition_cols, *order_cols]
    ranged = (
        df.repartitionByRange(*[F.col(c) for c in keys])
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
        # Pin placement: the count pass and the rank pass must see the
        # same (row -> _pid) map, and spark_partition_id is
        # nondeterministic under recomputation.
        .localCheckpoint(eager=True)
    )
    counts_df = ranged.groupBy("_pid", *partition_cols).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    # Guard against a high-cardinality partition key flooding the
    # driver WITHOUT a separate pre-flight job: collect at most
    # max_offset_rows + 1 rows — the limit caps driver transfer to the
    # same bound the guard enforces, and one aggregation job replaces
    # the previous count-then-collect pair.
    counts = counts_df.limit(max_offset_rows + 1).collect()
    if len(counts) > max_offset_rows:
        raise ValueError(
            f"distributed_rank offset table exceeds {max_offset_rows} "
            "(partition, group) rows; the partition key is "
            "high-cardinality — use a plain Window.partitionBy there "
            "(it is already well-distributed)"
        )
    by_group: dict[tuple, list[tuple[int, int]]] = {}
    for r in counts:
        by_group.setdefault(
            tuple(r[c] for c in partition_cols), []
        ).append((r["_pid"], r["_cnt"]))
    offset_rows = []
    for key, lst in by_group.items():
        total = sum(c for _, c in lst)
        acc = 0
        for pid, cnt in sorted(lst):
            offset_rows.append((*key, pid, acc, total))
            acc += cnt
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    part_fields = [f for f in df.schema.fields if f.name in partition_cols]
    offset_schema = StructType(
        [
            *part_fields,
            StructField("_pid", IntegerType()),
            StructField("_offset", LongType()),
            StructField(size_col, LongType()),
        ]
    )
    offsets = df.sparkSession.createDataFrame(offset_rows, offset_schema)
    local_rn = F.row_number().over(
        Window.partitionBy("_pid", *partition_cols).orderBy(
            *[F.col(c).asc() for c in order_cols]
        )
    )
    return (
        ranged.join(F.broadcast(offsets), ["_pid", *partition_cols])
        .withColumn(rank_col, local_rn + F.col("_offset"))
        .drop("_pid", "_offset")
    )


def distributed_prefix_sum(
    df: DataFrame,
    order_exprs: list[Column],
    value_col: str,
    out_col: str = "cum",
) -> DataFrame:
    """``df`` + the running sum of ``value_col`` under the strict total
    order given by ``order_exprs`` (sort direction baked into each
    Column, e.g. ``F.col("score").desc()``), computed as a two-pass
    distributed prefix-sum.

    Equivalent to ``SUM(value) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING)``, but never a partitionless window — ``Window.orderBy``
    with no ``partitionBy`` moves EVERY row through one task
    (WindowExec requires SinglePartition), which serializes/OOMs at
    100 TB. Instead:

    1. range-partition by the order expressions (partition k's slice
       strictly precedes partition k+1's) and pin the (row -> partition)
       placement with an eager localCheckpoint — spark_partition_id is
       nondeterministic under recomputation and both passes must agree;
    2. per-partition subtotals — ONE ROW PER PARTITION — come to the
       driver, which computes the exclusive prefix offsets
       (O(partitions) work/memory, ~KBs even at 100 TB);
    3. a per-partition running sum (window partitioned by partition id,
       fully parallel) plus the broadcast offset is the global running
       sum.

    Exactness caveat: the result is BIT-exact (identical to a
    sequential fold) only for integral value columns — every current
    call site (token counts, byte sizes). For float/double values the
    subtotal+offset composition can round differently than a
    sequential or single-window fold by a few ulps (float addition is
    not associative), and Decimal subtotals are degraded to float by
    the integral check below — treat non-integral cums as
    approximate-to-ulps and round before any comparison/rank use
    (the oracle-parity convention everywhere else in this repo).

    Callers should project down to (order keys, value) first so only a
    narrow relation ever shuffles.
    """
    ranged = (
        df.repartitionByRange(*order_exprs)
        .sortWithinPartitions(*order_exprs)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # Subtotals keep their native numeric type: int sums stay exact
    # Python ints (bigint offsets, so integer cums stay integers for
    # the oracles), float sums stay floats; an all-NULL partition sums
    # to None and contributes 0 to the running offset.
    subtotals = {
        r["_pid"]: r["subtotal"]
        for r in ranged.groupBy("_pid")
        .agg(F.sum(value_col).alias("subtotal"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(subtotals):
        offsets.append((pid, acc))
        acc += subtotals[pid] or 0
    integral = all(
        isinstance(v, int) for v in subtotals.values() if v is not None
    )
    if not integral:
        offsets = [(pid, float(acc_)) for pid, acc_ in offsets]
    offset_df = df.sparkSession.createDataFrame(
        offsets or [(0, 0)],
        schema=f"_pid int, _offset {'bigint' if integral else 'double'}",
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.join(F.broadcast(offset_df), "_pid")
        .withColumn(out_col, F.sum(value_col).over(w) + F.col("_offset"))
        .drop("_pid", "_offset")
    )


def percent_rank_expr(rank: Column, n: Column) -> Column:
    """SQL-standard percent_rank from (rank, group size): (r-1)/(n-1),
    0.0 for a single-row group (matches Spark's PercentRank)."""
    return F.when(n <= 1, F.lit(0.0)).otherwise(
        (rank - 1).cast("double") / (n - 1).cast("double")
    )


def ntile_expr(rank: Column, n: Column, buckets: int) -> Column:
    """SQL-standard ntile from (rank, group size): the first ``n %
    buckets`` tiles hold ``n div buckets + 1`` rows, the rest ``n div
    buckets`` (matches Spark's NTile)."""
    base = F.floor(n / buckets)
    rem = n % buckets
    cut = rem * (base + 1)
    return (
        F.when(rank <= cut, F.ceil(rank / (base + 1)))
        .otherwise(rem + F.ceil((rank - cut) / base))
        .cast("int")
    )
