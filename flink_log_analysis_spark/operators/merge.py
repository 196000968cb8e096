"""Batch MERGE INTO: Delta/Iceberg-shaped keyed merge as one join.

The reference's sink tables are PK-upsert MySQL tables
(``LogAnalysis.java:100-115`` — Flink treats INSERT into a
PK-declared table as MERGE by key; SURVEY §2.B B2, §2.E.5).
:class:`~flink_log_analysis_spark.streaming.upsert.ParquetUpsertSink`
already gives the *streaming* foreachBatch version; this module is the
*batch* tier — the full ``MERGE INTO target USING source ON keys``
statement with Delta's clause semantics, expressed as a single Spark
plan instead of a table-format transaction:

  WHEN MATCHED [AND cond] THEN DELETE
  WHEN MATCHED THEN UPDATE SET ...        (default: all source columns)
  WHEN NOT MATCHED THEN INSERT ...        (default: all source columns)

Plan shape (the whole operator is ONE full-outer shuffle join on the
merge keys — the same data movement a Delta MERGE's join phase does):

  target ──┐
           ├─ full_outer join on keys ── per-row CASE ── project
  source ──┘

Non-key columns of each side are packed into structs aliased ``t``
and ``s``, so custom clause expressions reference them as
``F.col("t.balance")`` / ``F.col("s.revenue")`` — the same row-pair
scoping Delta's SQL clauses get. Match/insert/delete arms become a
filter + column-wise CASE, all Catalyst expressions: whole-stage
codegen, no UDFs, no driver loop.

Scale notes: a full-outer join cannot broadcast either side, so this
shuffles both inputs on the merge keys — identical to Delta/Iceberg's
merge join. Skewed merge keys are handled by AQE skew-join (enabled in
the session factory). Source must be unique per key (pre-aggregate
first — same contract Delta enforces by raising on multi-match);
``dedupe_source='last'`` opts into a deterministic
last-writer-wins pre-pass ordered by a caller-supplied column.

:func:`parquet_merge_into` wraps it read-modify-write with the same
atomic directory swap ParquetUpsertSink uses, giving a dependency-free
"MERGE INTO a parquet table" for environments without Delta.
"""

from __future__ import annotations

import functools
import os
import shutil

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    *,
    update_set: dict[str, Column] | None = None,
    matched_delete: Column | None = None,
    insert: bool = True,
    insert_condition: Column | None = None,
    dedupe_source: str | None = None,
    dedupe_order: str | None = None,
) -> DataFrame:
    """Delta-semantics MERGE as a single DataFrame plan.

    - ``update_set``: per-column expressions for matched rows (structs
      ``t`` / ``s`` are in scope: ``{"balance": F.col("t.balance") +
      F.col("s.balance")}``). Default replaces every non-key column
      with the source value (full-row upsert).
    - ``matched_delete``: matched rows satisfying this predicate are
      deleted; remaining matched rows take the update clause.
    - ``insert`` / ``insert_condition``: WHEN NOT MATCHED THEN INSERT
      (all source columns), optionally gated on a predicate over ``s``.
    - ``dedupe_source='last'`` + ``dedupe_order``: keep the last source
      row per key (ordered by ``dedupe_order``, ties by remaining
      columns) before merging — otherwise the caller guarantees
      key-uniqueness, as Delta requires.

    Target rows with no source match pass through unchanged; output
    columns are exactly the target's columns.
    """
    if dedupe_source == "last" and not dedupe_order:
        raise ValueError("dedupe_source='last' needs dedupe_order")
    nonkeys = [c for c in target.columns if c not in keys]
    missing = [c for c in nonkeys if c not in source.columns]
    if missing:
        raise ValueError(
            f"source lacks target columns {missing}; provide update_set "
            "expressions for them or align the schemas"
        )
    if dedupe_source == "last":
        w = Window.partitionBy(*keys).orderBy(
            F.col(dedupe_order).desc(),
            *[F.col(c).desc() for c in source.columns
              if c not in keys and c != dedupe_order],
        )
        source = (
            source.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    tk = target.select(
        *keys, F.struct(*[F.col(c) for c in nonkeys]).alias("t")
    )
    sk = source.select(
        *keys, F.struct(*[F.col(c) for c in nonkeys]).alias("s")
    )
    j = tk.join(sk, keys, "full_outer")

    matched = F.col("t").isNotNull() & F.col("s").isNotNull()
    t_only = F.col("s").isNull()
    s_only = F.col("t").isNull()

    keep = t_only | matched
    if matched_delete is not None:
        keep = t_only | (matched & ~F.coalesce(matched_delete, F.lit(False)))
    if insert:
        ins = s_only
        if insert_condition is not None:
            ins = s_only & F.coalesce(insert_condition, F.lit(False))
        keep = keep | ins
    j = j.filter(keep)

    update_set = update_set or {}
    out_cols: list[Column] = [F.col(k) for k in keys]
    for c in nonkeys:
        upd = update_set.get(c, F.col(f"s.{c}"))
        out_cols.append(
            F.when(matched, upd)
            .when(t_only, F.col(f"t.{c}"))
            .otherwise(F.col(f"s.{c}"))
            .alias(c)
        )
    return j.select(*out_cols)


def parquet_merge_into(
    spark,
    path: str,
    source: DataFrame,
    keys: list[str],
    **merge_kwargs,
) -> None:
    """MERGE INTO a parquet directory, atomically.

    Read-modify-write with the tmp/old rename dance from
    ParquetUpsertSink: a crash never leaves a partial live directory.
    Missing target path = empty target (pure insert).
    """
    if os.path.exists(path):
        target = spark.read.parquet(path)
        merged = merge_into(target, source, keys, **merge_kwargs)
    else:
        merged = source
    tmp, old = f"{path}__tmp_merge", f"{path}__old_merge"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed diff between two versions of a table — the CDC read side
    of :func:`merge_into`: one row per changed key with ``change`` in
    ``inserted`` (key only in new), ``deleted`` (key only in old), or
    ``updated`` (key in both, any compared column differs,
    null-safely).

    One full-outer shuffle join on the keys (neither snapshot can
    broadcast at scale); non-key columns travel packed in one struct
    per side so the comparison is a single null-safe struct equality,
    not a per-column expression explosion. Unchanged keys are filtered
    out before anything else consumes the result, so the output is
    O(churn), not O(table).

    The join itself is null-safe (``<=>`` per key, still extracted as
    equi-join keys by Catalyst, so the plan stays a hash/sort-merge
    join): a row whose key is NULL in both snapshots compares as the
    same key (unchanged/updated) rather than surfacing as a spurious
    deleted+inserted pair. As with any null-safe key semantics, keys
    should still be unique per snapshot — several NULL-keyed rows on
    both sides would pair many-to-many like any duplicated key.
    """
    if not keys:
        # reduce() over the per-key conditions below has no initializer;
        # fail descriptively instead of with a bare TypeError.
        raise ValueError("snapshot_diff requires at least one key")
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    # An explicit [] is a presence-only diff (inserted/deleted, never
    # updated): compare a constant so matched keys always tie.
    # Dataset aliases (not df[col] references): old and new often share
    # lineage (two filters of one snapshot table), where unqualified
    # per-side column refs are ambiguous self-join columns.
    o = old.select(
        *keys, F.struct(*(compare_cols or [F.lit(0)])).alias("_t")
    ).alias("_dt")
    n = new.select(
        *keys, F.struct(*(compare_cols or [F.lit(0)])).alias("_s")
    ).alias("_ds")
    cond = functools.reduce(
        lambda a, b: a & b,
        [
            F.col(f"_dt.`{k}`").eqNullSafe(F.col(f"_ds.`{k}`"))
            for k in keys
        ],
    )
    j = o.join(n, cond, "full_outer")
    change = (
        F.when(F.col("_t").isNull(), F.lit("inserted"))
        .when(F.col("_s").isNull(), F.lit("deleted"))
        .when(~F.col("_t").eqNullSafe(F.col("_s")), F.lit("updated"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_dt.`{k}`"), F.col(f"_ds.`{k}`")).alias(k)
                for k in keys
            ],
            "change",
        )
    )
