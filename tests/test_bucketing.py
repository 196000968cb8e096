"""Bucketed co-located joins: the exchange-elimination evidence.

Writes orders and customer bucketed by custkey and asserts the join
plan has NO Exchange (the shuffle was paid once at write time), plus
the negative control: the same join over plain parquet DOES shuffle.
"""

import pytest
from pyspark.sql import functions as F

from flink_log_analysis_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from flink_log_analysis_spark.session import read_table


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"),
        "orders_b", "custkey", 8, str(tmp_path / "orders_b"),
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "custkey"),
        "customer_b", "custkey", 8, str(tmp_path / "customer_b"),
    )
    yield "orders_b", "customer_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "custkey")
    plan = _plan(joined)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange" not in plan, plan
    # correctness: matches the shuffling join over the raw frames
    n_bucketed = joined.count()
    n_plain = (
        spark.table(left).join(spark.table(right).hint("merge"), "custkey")
    ).count()
    assert n_bucketed == n_plain


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Negative control: without bucketing the same merge join needs
    exchanges on both sides — proving the assertion above is
    discriminating, not vacuously true."""
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    customer = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name"
    )
    plan = _plan(orders.join(customer.hint("merge"), "custkey"))
    assert plan.count("Exchange") >= 2


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("custkey").agg(
        F.sum("o_totalprice").alias("total")
    )
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
