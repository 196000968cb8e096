"""Unit tests for sampling, relevance, and range-join operators."""

import math

import pytest
from pyspark.sql import functions as F

from flink_log_analysis_spark.operators import relevance, sampling
from flink_log_analysis_spark.operators.rangejoin import bucketed_range_join


# ---------------------------------------------------------------- sampling

def test_hash_sample_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r["k"] for r in sampling.hash_sample(df, "k", 0.3, seed=1).collect()}
    b = {
        r["k"]
        for r in sampling.hash_sample(
            df.repartition(13), "k", 0.3, seed=1
        ).collect()
    }
    assert a == b  # physical layout must not change membership
    assert 0.25 < len(a) / 2000 < 0.35  # ~fraction


def test_hash_sample_seed_changes_membership(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    a = {r["k"] for r in sampling.hash_sample(df, "k", 0.3, seed=1).collect()}
    b = {r["k"] for r in sampling.hash_sample(df, "k", 0.3, seed=2).collect()}
    assert a != b


def test_stratified_sample_respects_fractions(spark):
    rows = [(i, "a" if i % 2 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "k INT, s STRING")
    out = sampling.stratified_sample(
        df, "k", "s", {"a": 0.5, "b": 0.1}, seed=3
    )
    counts = {
        r["s"]: r["n"]
        for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()
    }
    assert 0.4 < counts["a"] / 1000 < 0.6
    assert 0.05 < counts["b"] / 1000 < 0.16


def test_stratified_default_fraction_drops_unlisted(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k INT, s STRING")
    out = sampling.stratified_sample(df, "k", "s", {"x": 1.0}, seed=0)
    assert [r["s"] for r in out.collect()] == ["x"]


def test_split_assign_partitions_every_row_once(spark):
    df = spark.range(0, 3000).withColumnRenamed("id", "k")
    out = sampling.split_assign(
        df, "k", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=5
    )
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == 3000
    assert counts.get(None, 0) == 0  # fractions sum to 1 -> no holdout
    assert 0.75 < counts["train"] / 3000 < 0.85


def test_split_assign_stable_under_growth(spark):
    """A row's split must not change when the corpus grows."""
    small = spark.range(0, 500).withColumnRenamed("id", "k")
    big = spark.range(0, 5000).withColumnRenamed("id", "k")
    splits = {"train": 0.7, "val": 0.3}
    s = {r["k"]: r["split"]
         for r in sampling.split_assign(small, "k", splits, seed=9).collect()}
    b = {r["k"]: r["split"]
         for r in sampling.split_assign(big, "k", splits, seed=9).collect()}
    assert all(b[k] == v for k, v in s.items())


def test_split_assign_overflow_raises(spark):
    df = spark.range(1).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="> 1"):
        sampling.split_assign(df, "k", {"a": 0.9, "b": 0.2}).collect()


# --------------------------------------------------------------- relevance

def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark join data data"),
            (2, "the quick fox"),
            (3, "data data data join"),
            (4, "spark"),
        ],
        "doc_id INT, text STRING",
    )


def test_bm25_hand_computed(spark):
    out = {
        r["doc_id"]: (r["bm25"], r["n_matched"])
        for r in relevance.bm25(_docs(spark), ["data"]).collect()
    }
    # df(data)=2, N=4, avgdl=(4+3+4+1)/4=3.0
    idf = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5))
    k1, b = 1.2, 0.75

    def score(tf, dl):
        return idf * (tf * (k1 + 1.0)) / (
            tf + k1 * ((1.0 - b) + b * (dl / 3.0))
        )

    assert set(out) == {1, 3}
    assert out[1] == (round(score(2, 4), 6), 1)
    assert out[3] == (round(score(3, 4), 6), 1)


def test_bm25_multi_term_sums_all_matches(spark):
    out = {r["doc_id"]: r["n_matched"]
           for r in relevance.bm25(_docs(spark), ["spark", "data"]).collect()}
    assert out == {1: 2, 3: 1, 4: 1}


def test_tfidf_rank_and_tiebreak(spark):
    out = relevance.tfidf_top_terms(_docs(spark), k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rn"], r["term"]))
    # doc 2: all three terms have identical tf=1; df: the=1,quick=1,fox=1
    # -> identical scores, tie broken by term asc, k=2 keeps fox,quick
    assert sorted(by_doc[2]) == [(1, "fox"), (2, "quick")]
    assert len(by_doc[1]) == 2


# --------------------------------------------------------------- rangejoin

def test_range_join_matches_naive(spark):
    pts = spark.createDataFrame(
        [(i,) for i in range(0, 500, 7)], "p INT"
    )
    iv = spark.createDataFrame(
        [(i, i * 3, i * 3 + 40) for i in range(50)], "iv_id INT, lo INT, hi INT"
    )
    got = sorted(
        (r["p"], r["iv_id"])
        for r in bucketed_range_join(
            pts, iv, point="p", lo="lo", hi="hi", bucket_width=16
        ).collect()
    )
    naive = sorted(
        (r["p"], r["iv_id"])
        for r in pts.join(
            iv, (F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi"))
        ).collect()
    )
    assert got == naive
    assert len(got) > 0


def test_range_join_no_duplicate_pairs(spark):
    """An interval spanning many buckets must match a point once."""
    pts = spark.createDataFrame([(100,)], "p INT")
    iv = spark.createDataFrame([(1, 0, 1000)], "iv_id INT, lo INT, hi INT")
    out = bucketed_range_join(
        pts, iv, point="p", lo="lo", hi="hi", bucket_width=8
    ).collect()
    assert len(out) == 1


def test_range_join_exclusive_upper_bound(spark):
    pts = spark.createDataFrame([(10,), (19,), (20,)], "p INT")
    iv = spark.createDataFrame([(1, 10, 20)], "iv_id INT, lo INT, hi INT")
    got = sorted(r["p"] for r in bucketed_range_join(
        pts, iv, point="p", lo="lo", hi="hi", bucket_width=4
    ).collect())
    assert got == [10, 19]


def test_range_join_bad_width():
    with pytest.raises(ValueError, match="positive"):
        bucketed_range_join(None, None, "p", "lo", "hi", 0)


def test_temperature_resample_proportions(spark):
    """tau=2 pulls the mixture toward uniform: the small stratum keeps
    everything (it is the binding constraint) and the big stratum is
    downsampled toward sqrt-proportional share."""
    from pyspark.sql import Row

    rows = [Row(doc_id=i, lang="big") for i in range(900)] + [
        Row(doc_id=1000 + i, lang="small") for i in range(100)
    ]
    df = spark.createDataFrame(rows)
    out = sampling.temperature_resample(df, "doc_id", "lang", tau=2.0, seed=7)
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got["small"] == 100            # binding stratum keeps all
    # target big share = sqrt(900)/(sqrt(900)+sqrt(100)) = 0.75 ->
    # big_target = 100 * 0.75/0.25 = 300; hash sampling is approximate
    assert 240 <= got["big"] <= 360
    # deterministic: same call -> same rows
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in
         sampling.temperature_resample(df, "doc_id", "lang", tau=2.0, seed=7).collect()}
    assert a == b


def test_training_order_shuffle_is_permutation_and_layout_stable(spark):
    """Positions are exactly 0..n-1 under the hash order, shards are
    round-robin, and the result is identical under different input
    partitionings (the whole point of content-hash shuffling)."""
    import pyspark.sql.functions as F

    from flink_log_analysis_spark.operators import sampling

    df = spark.range(101).withColumnRenamed("id", "doc_id")
    a = sampling.training_order_shuffle(df.repartition(7), seed=3)
    b = sampling.training_order_shuffle(df.repartition(2), seed=3)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb
    positions = sorted(r.position for r in a.collect())
    assert positions == list(range(101))
    for r in a.collect():
        assert r.shard == r.position % sampling.SHUFFLE_SHARDS
    # hash order, not id order: the permutation must not be identity
    by_pos = {r.position: r.doc_id for r in a.collect()}
    assert [by_pos[i] for i in range(101)] != list(range(101))
    # re-seeding permutes differently (fresh epoch order)
    c = sampling.training_order_shuffle(df, seed=4)
    assert sorted(tuple(r) for r in c.collect()) != ra


def test_weighted_sample_bias_and_determinism(spark):
    """A-ES sampling must (a) be identical under different input
    partitionings, (b) re-seed into a different sample, and (c) bias
    toward heavy rows: with weights 100 vs 1, heavy rows dominate."""
    import pyspark.sql.functions as F

    from flink_log_analysis_spark.operators import sampling

    df = spark.range(2000).withColumnRenamed("id", "doc_id").withColumn(
        "w", F.when(F.col("doc_id") < 200, 100.0).otherwise(1.0)
    )
    a = sampling.weighted_sample(df.repartition(7), "doc_id", F.col("w"), 100, seed=1)
    b = sampling.weighted_sample(df.repartition(3), "doc_id", F.col("w"), 100, seed=1)
    ra = [tuple(r) for r in a.collect()]
    rb = [tuple(r) for r in b.collect()]
    assert ra == rb and len(ra) == 100
    heavy = sum(1 for r in ra if r[0] < 200)
    # 200 heavy rows at weight 100 vs 1800 light at 1: expected heavy
    # share ~> 80%; assert a conservative floor.
    assert heavy >= 70, heavy
    c = sampling.weighted_sample(df, "doc_id", F.col("w"), 100, seed=2)
    assert [tuple(r) for r in c.collect()] != ra
