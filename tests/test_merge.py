"""Batch MERGE INTO semantics (operators/merge.py): Delta-clause
behavior on hand-computed inputs, source dedupe, and the atomic
parquet wrapper."""

import pytest
from pyspark.sql import functions as F

from flink_log_analysis_spark.operators.merge import (
    merge_into,
    parquet_merge_into,
)


def _target(spark):
    return spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")],
        "k INT, v DOUBLE, tag STRING",
    )


def _source(spark):
    return spark.createDataFrame(
        # k=2 matched update, k=3 matched delete-candidate,
        # k=4 insert, k=5 insert-candidate failing the condition
        [(2, 200.0, "B"), (3, 300.0, "C"), (4, 400.0, "D"), (5, 500.0, "E")],
        "k INT, v DOUBLE, tag STRING",
    )


def test_full_row_upsert_default(spark):
    out = merge_into(_target(spark), _source(spark), ["k"])
    got = {r["k"]: (r["v"], r["tag"]) for r in out.collect()}
    assert got == {
        1: (10.0, "a"),   # target-only passes through
        2: (200.0, "B"),  # matched -> source row
        3: (300.0, "C"),
        4: (400.0, "D"),  # not matched -> insert
        5: (500.0, "E"),
    }


def test_all_clauses(spark):
    out = merge_into(
        _target(spark),
        _source(spark),
        ["k"],
        update_set={"v": F.col("t.v") + F.col("s.v")},
        matched_delete=F.col("s.v") >= 300.0,
        insert_condition=F.col("s.v") <= 400.0,
    )
    got = {r["k"]: (r["v"], r["tag"]) for r in out.collect()}
    assert got == {
        1: (10.0, "a"),    # target-only
        2: (220.0, "B"),   # matched update: t.v + s.v, tag from source
        # 3 deleted (s.v >= 300)
        4: (400.0, "D"),   # insert passes condition
        # 5 dropped (insert condition fails)
    }


def test_no_insert(spark):
    out = merge_into(_target(spark), _source(spark), ["k"], insert=False)
    assert {r["k"] for r in out.collect()} == {1, 2, 3}


def test_matched_delete_all_updates_none(spark):
    out = merge_into(
        _target(spark), _source(spark), ["k"],
        matched_delete=F.lit(True), insert=False,
    )
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: 10.0}


def test_dedupe_source_last_writer(spark):
    dup = spark.createDataFrame(
        [(2, 111.0, "old", 1), (2, 222.0, "new", 2)],
        "k INT, v DOUBLE, tag STRING, seq INT",
    )
    out = merge_into(
        _target(spark).withColumn("seq", F.lit(0)),
        dup,
        ["k"],
        dedupe_source="last",
        dedupe_order="seq",
    )
    got = {r["k"]: (r["v"], r["tag"]) for r in out.collect()}
    assert got[2] == (222.0, "new")


def test_duplicate_without_dedupe_requires_order():
    with pytest.raises(ValueError, match="dedupe_order"):
        merge_into(None, None, ["k"], dedupe_source="last")


def test_schema_mismatch_raises(spark):
    bad = spark.createDataFrame([(1, 1.0)], "k INT, other DOUBLE")
    with pytest.raises(ValueError, match="lacks target columns"):
        merge_into(_target(spark), bad, ["k"])


def test_parquet_merge_into_roundtrip(spark, tmp_path):
    path = str(tmp_path / "state")
    # first merge: no target yet -> pure insert
    parquet_merge_into(spark, path, _target(spark), ["k"])
    # second merge applies the clauses against the persisted state
    parquet_merge_into(
        spark, path, _source(spark), ["k"],
        update_set={"v": F.col("t.v") + F.col("s.v")},
        matched_delete=F.col("s.v") >= 300.0,
        insert_condition=F.col("s.v") <= 400.0,
    )
    got = {r["k"]: (r["v"], r["tag"])
           for r in spark.read.parquet(path).collect()}
    assert got == {1: (10.0, "a"), 2: (220.0, "B"), 4: (400.0, "D")}


def test_merge_plan_is_single_shuffle_join(spark):
    """The whole operator must stay one full-outer SortMergeJoin —
    no cartesian, no extra exchanges beyond the two key shuffles."""
    out = merge_into(_target(spark), _source(spark), ["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "FullOuter" in plan


def test_snapshot_diff_classifies_changes(spark):
    from pyspark.sql import Row

    from flink_log_analysis_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [Row(k=1, v="a", w=1), Row(k=2, v="b", w=2), Row(k=3, v="c", w=3)]
    )
    new = spark.createDataFrame(
        [Row(k=2, v="b", w=2), Row(k=3, v="X", w=3), Row(k=4, v="d", w=4)]
    )
    out = {r.k: r.change for r in snapshot_diff(old, new, ["k"]).collect()}
    # k=1 deleted, k=2 unchanged (absent), k=3 updated, k=4 inserted
    assert out == {1: "deleted", 3: "updated", 4: "inserted"}


def test_snapshot_diff_null_safe_compare(spark):
    from pyspark.sql import Row
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from flink_log_analysis_spark.operators.merge import snapshot_diff

    schema = StructType(
        [StructField("k", IntegerType()), StructField("v", StringType())]
    )
    old = spark.createDataFrame([(1, None), (2, "x")], schema)
    new = spark.createDataFrame([(1, None), (2, None)], schema)
    out = {r.k: r.change for r in snapshot_diff(old, new, ["k"]).collect()}
    # null == null must be "unchanged"; value -> null must be "updated"
    assert out == {2: "updated"}


def test_snapshot_diff_null_safe_keys(spark):
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from flink_log_analysis_spark.operators.merge import snapshot_diff

    schema = StructType(
        [StructField("k", IntegerType()), StructField("v", StringType())]
    )
    old = spark.createDataFrame([(None, "a"), (1, "b")], schema)
    new = spark.createDataFrame([(None, "a"), (1, "B"), (2, "c")], schema)
    rows = snapshot_diff(old, new, ["k"]).collect()
    out = {r.k: r.change for r in rows}
    # the NULL key matches itself (unchanged, absent from the diff)
    # instead of reporting a spurious deleted+inserted pair
    assert out == {1: "updated", 2: "inserted"}


def test_snapshot_diff_presence_only(spark):
    from pyspark.sql import Row

    from flink_log_analysis_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")])
    new = spark.createDataFrame([Row(k=2, v="CHANGED"), Row(k=3, v="c")])
    out = {
        r.k: r.change
        for r in snapshot_diff(old, new, ["k"], compare_cols=[]).collect()
    }
    # explicit [] = presence-only: value changes are NOT reported
    assert out == {1: "deleted", 3: "inserted"}


def test_snapshot_diff_empty_keys_raises(spark):
    from pyspark.sql import Row

    from flink_log_analysis_spark.operators.merge import snapshot_diff

    df = spark.createDataFrame([Row(k=1, v="a")])
    with pytest.raises(ValueError, match="at least one key"):
        snapshot_diff(df, df, [])
