"""Analytics part-2 semantics the oracle can't check: sketch error
bounds, cube grouping-set structure."""

from pyspark.sql import functions as F

from flink_log_analysis_spark.plans import analytics2
from flink_log_analysis_spark.session import read_table


def test_approx_sketches_error_bounds(spark, sf_dir):
    row = analytics2.approx_sketches(spark, sf_dir).first()
    li = read_table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("orders"),
        F.countDistinct("l_partkey").alias("parts"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
    ).first()
    assert abs(row.approx_orders - exact.orders) / exact.orders < 0.05
    assert abs(row.approx_parts - exact.parts) / exact.parts < 0.05
    assert abs(row.approx_median_price - exact.median) / exact.median < 0.05
    assert row.n_rows == li.count()


def test_cube_contains_all_grouping_sets(spark, sf_dir):
    out = analytics2.orders_cube(spark, sf_dir).collect()
    shapes = {(r.o_orderstatus is None, r.o_orderpriority is None) for r in out}
    # (s,p), (s,NULL), (NULL,p), (NULL,NULL)
    assert shapes == {(False, False), (False, True), (True, False), (True, True)}
    grand = [r for r in out if r.o_orderstatus is None and r.o_orderpriority is None]
    o = read_table(spark, sf_dir, "orders")
    assert len(grand) == 1 and grand[0].n_orders == o.count()


def test_language_id_ngram_known_texts(spark):
    from flink_log_analysis_spark.operators.textstats import language_id_ngram

    rows = [
        (1, "The quick brown fox jumped over the lazy dog and then "
            "ran along the winding road into the morning"),
        (2, "Der schnelle braune Fuchs springt über den faulen Hund "
            "und rennt dann durch das schöne ruhige Dorf"),
        (3, "Le renard brun rapide saute par dessus le chien paresseux "
            "et court ensuite dans les rues de la ville"),
        (4, "El rápido zorro marrón salta sobre el perro perezoso y "
            "luego corre por las calles de la ciudad"),
        (5, "zzz qqq xxx"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r.lang_pred for r in language_id_ngram(df).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "es"
    assert got[5] == "und"


def test_salted_join_equals_plain_join(spark):
    from flink_log_analysis_spark.operators import skew

    fact = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, i) for i in range(20)] + [(9, 0)],
        "k bigint, v bigint",
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "warm"), (3, "unused")],
                                "dk bigint, name string")
    plain = fact.join(dim, fact.k == dim.dk).select("k", "v", "name")
    salted = skew.salted_join(fact, dim, "k", "dk").select("k", "v", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # left join keeps unmatched fact rows exactly once
    lp = fact.join(dim, fact.k == dim.dk, "left").select("k", "v", "name")
    ls = skew.salted_join(fact, dim, "k", "dk", how="left").select("k", "v", "name")
    assert sorted(map(tuple, ls.collect())) == sorted(map(tuple, lp.collect()))


def test_salted_count_equals_groupby_count(spark):
    from flink_log_analysis_spark.operators import skew

    df = spark.createDataFrame(
        [("a",)] * 1000 + [("b",)] * 3 + [("c",)] * 1, "k string"
    )
    got = {r.k: r.cnt for r in skew.salted_count(df, ["k"]).collect()}
    assert got == {"a": 1000, "b": 3, "c": 1}


def test_salted_join_rejects_dim_preserving_joins(spark):
    import pytest
    from flink_log_analysis_spark.operators import skew

    fact = spark.createDataFrame([(1, 1)], "k bigint, v bigint")
    dim = spark.createDataFrame([(1, "x")], "dk bigint, name string")
    with pytest.raises(ValueError, match="fact-preserving"):
        skew.salted_join(fact, dim, "k", "dk", how="full")


def test_asof_join_semantics(spark):
    from flink_log_analysis_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "u", "2020-01-01 10:00:00"),
         (2, "u", "2020-01-01 11:00:00"),
         (3, "u", "2020-01-01 09:00:00"),   # before any right row
         (4, "v", "2020-01-01 12:00:00")],  # key with no right rows
        "id int, k string, ts string",
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts"))
    right = spark.createDataFrame(
        [("u", "2020-01-01 10:00:00", 100.0),   # equal ts -> inclusive
         ("u", "2020-01-01 10:30:00", 200.0)],
        "k string, ts string, val double",
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts"))

    out = {r.id: r.val for r in asof_join(left, right, "k", "ts", ["val"]).collect()}
    assert out == {1: 100.0, 2: 200.0, 3: None, 4: None}

    inner = asof_join(left, right, "k", "ts", ["val"], how="inner")
    assert {r.id for r in inner.collect()} == {1, 2}


def test_session_windows_invariants(spark, sf_dir):
    out = analytics2.session_windows(spark, sf_dir)
    ev = read_table(spark, sf_dir, "events")
    agg = out.agg(
        F.sum("session_hits").alias("total_hits"),
        F.min(F.col("session_end_us") - F.col("session_start_us")).alias("min_len"),
    ).first()
    # Every event lands in exactly one session; window end = last+gap
    # so even a singleton session spans the full 30-min gap.
    assert agg.total_hits == ev.count()
    assert agg.min_len >= 1800 * 1_000_000


def test_profile_columns_counts_nulls_and_distincts(spark):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from flink_log_analysis_spark.operators.profiling import profile_columns

    schema = StructType(
        [StructField("a", LongType()), StructField("b", StringType())]
    )
    df = spark.createDataFrame(
        [(1, "x"), (1, None), (2, "y"), (None, "y")], schema
    )
    out = {r.column: r for r in profile_columns(df, ["a", "b"]).collect()}
    assert out["a"].n_rows == 4 and out["b"].n_rows == 4
    assert out["a"].n_nulls == 1 and out["b"].n_nulls == 1
    assert out["a"].n_distinct == 2 and out["b"].n_distinct == 2
