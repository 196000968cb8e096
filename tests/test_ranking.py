"""operators/ranking.py: distributed rank/ntile/percent_rank must agree
exactly with Spark's own window functions (which are only safe when the
partition key is high-cardinality — the operator exists for the
low-cardinality case)."""

import random

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_log_analysis_spark.operators.ranking import (
    distributed_rank,
    ntile_expr,
    percent_rank_expr,
)


def _data(spark, n, n_groups, seed):
    rng = random.Random(seed)
    rows = [
        Row(
            k=i,
            g=f"g{rng.randrange(n_groups)}",
            v=rng.randrange(50),  # heavy ties -> tie-breaker k matters
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows).repartition(5)


def test_distributed_rank_matches_window(spark):
    df = _data(spark, 400, 3, seed=7)
    got = {
        r.k: (r.rank, r.group_size)
        for r in distributed_rank(df, ["g"], ["v", "k"]).collect()
    }
    w = Window.partitionBy("g").orderBy(F.col("v").asc(), F.col("k").asc())
    wn = Window.partitionBy("g")
    exp = {
        r.k: (r.rn, r.n)
        for r in df.select(
            "k",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        ).collect()
    }
    assert got == exp


def test_ntile_percent_rank_exprs_match_window(spark):
    # Group sizes both below and above the bucket count, and a
    # single-row group (percent_rank's n==1 special case).
    for n, n_groups, buckets in ((400, 3, 4), (7, 5, 4), (1, 1, 4), (40, 2, 7)):
        df = _data(spark, n, n_groups, seed=n)
        ranked = distributed_rank(df, ["g"], ["v", "k"])
        got = {
            r.k: (r.t, r.pr)
            for r in ranked.select(
                "k",
                ntile_expr(F.col("rank"), F.col("group_size"), buckets).alias("t"),
                F.round(
                    percent_rank_expr(F.col("rank"), F.col("group_size")), 9
                ).alias("pr"),
            ).collect()
        }
        w = Window.partitionBy("g").orderBy(F.col("v").asc(), F.col("k").asc())
        exp = {
            r.k: (r.t, r.pr)
            for r in df.select(
                "k",
                F.ntile(buckets).over(w).alias("t"),
                F.round(F.percent_rank().over(w), 9).alias("pr"),
            ).collect()
        }
        assert got == exp, f"mismatch at n={n} buckets={buckets}"


def test_distributed_rank_plan_has_no_funnel(spark):
    import sys as _sys

    root = __file__.rsplit("/tests/", 1)[0]
    if root not in _sys.path:
        _sys.path.insert(0, root)
    from tools.explain_audit import audit

    props, _ = audit("distributed_rank", distributed_rank(
        _data(spark, 100, 2, seed=3), ["g"], ["v", "k"]
    ))
    assert props["sp_funnels"] == 0


def test_distributed_rank_empty_input(spark):
    df = spark.createDataFrame([], "k long, g string, v long")
    assert distributed_rank(df, ["g"], ["v", "k"]).count() == 0


def test_distributed_rank_single_row(spark):
    from pyspark.sql import Row

    [r] = distributed_rank(
        spark.createDataFrame([Row(k=1, g="a", v=5)]), ["g"], ["v", "k"]
    ).collect()
    assert (r.rank, r.group_size) == (1, 1)
    # percent_rank of a 1-row group is 0 by SQL definition
    [p] = spark.createDataFrame([Row(rank=1, n=1)]).select(
        percent_rank_expr(F.col("rank"), F.col("n")).alias("p")
    ).collect()
    assert p.p == 0.0


def test_distributed_rank_high_cardinality_guard(spark):
    import pytest

    df = _data(spark, 50, 50, seed=5)  # ~unique group per row
    with pytest.raises(ValueError, match="high-cardinality"):
        distributed_rank(df, ["g"], ["v", "k"], max_offset_rows=10)


def test_distributed_prefix_sum_matches_window_desc_order(spark):
    """The generic prefix-sum under a descending+tie-break order equals
    the single-partition window's answer on small data."""
    import random

    from pyspark.sql import Row
    from pyspark.sql.window import Window

    from flink_log_analysis_spark.operators.ranking import (
        distributed_prefix_sum,
    )

    rng = random.Random(7)
    df = spark.createDataFrame(
        [Row(k=i, score=rng.randint(0, 5), v=rng.randint(1, 9)) for i in range(57)]
    )
    got = {
        r.k: r.cum
        for r in distributed_prefix_sum(
            df, [F.col("score").desc(), F.col("k").asc()], "v", "cum"
        ).collect()
    }
    w = Window.orderBy(F.col("score").desc(), F.col("k").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {r.k: r.cum for r in df.select("k", F.sum("v").over(w).alias("cum")).collect()}
    assert got == want


def test_distributed_prefix_sum_empty_input(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    from flink_log_analysis_spark.operators.ranking import (
        distributed_prefix_sum,
    )

    schema = StructType(
        [StructField("k", LongType()), StructField("v", LongType())]
    )
    out = distributed_prefix_sum(
        spark.createDataFrame([], schema), [F.col("k").asc()], "v", "cum"
    )
    assert out.count() == 0


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(-5, 5)),
        min_size=1,
        max_size=80,
    )
)
def test_distributed_prefix_sum_property(spark, rows):
    """For arbitrary (score, value) multisets the distributed prefix-sum
    equals a sequential Python fold over the same strict total order
    (score asc, unique id tie-break) — including negative values."""
    from pyspark.sql import Row

    from flink_log_analysis_spark.operators.ranking import (
        distributed_prefix_sum,
    )

    df = spark.createDataFrame(
        [Row(k=i, score=s, v=v) for i, (s, v) in enumerate(rows)]
    )
    got = {
        r.k: r.cum
        for r in distributed_prefix_sum(
            df, [F.col("score").asc(), F.col("k").asc()], "v", "cum"
        ).collect()
    }
    acc, want = 0, {}
    for i, (s, v) in sorted(enumerate(rows), key=lambda t: (t[1][0], t[0])):
        acc += v
        want[i] = acc
    assert got == want


def test_distributed_prefix_sum_double_values(spark):
    """Fractional values must not be truncated in the partition
    offsets, and an all-NULL partition contributes zero."""
    from pyspark.sql import Row
    from pyspark.sql.window import Window

    from flink_log_analysis_spark.operators.ranking import (
        distributed_prefix_sum,
    )

    df = spark.createDataFrame(
        [Row(k=i, v=(None if i % 7 == 3 else i + 0.25)) for i in range(40)]
    )
    got = {
        r.k: r.cum
        for r in distributed_prefix_sum(
            df, [F.col("k").asc()], "v", "cum"
        ).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.k: r.cum
        for r in df.select("k", F.sum("v").over(w).alias("cum")).collect()
    }
    assert got == want
