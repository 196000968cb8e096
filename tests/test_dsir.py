"""Behavioral tests for DSIR importance resampling (operators/dsir.py).

The oracle-parity test certifies cross-engine exactness of the
registry rows; these tests pin the SEMANTICS: target-like pool
documents must outscore foreign ones, weights must be invariant to
physical layout, and Gumbel-top-k must be a reproducible, re-seedable
subset of the weighted pool.
"""

import pytest
from pyspark.sql import functions as F

from flink_log_analysis_spark.operators import dsir

TARGET_TEXT = "the quick brown fox jumps over the lazy dog"
FOREIGN_TEXT = "zzz9 qqq8 vvv7 kkk6 jjj5 xxx4 yyy3 www2"


def _docs(spark):
    # ids 0,10,20 are the target slice (mod 10); the pool holds one
    # target-like doc (1) and one foreign doc (2).
    rows = [
        (0, TARGET_TEXT),
        (10, TARGET_TEXT),
        (20, "quick brown fox dog " + TARGET_TEXT),
        (1, TARGET_TEXT),
        (2, FOREIGN_TEXT),
        (3, "the quick brown fox " + FOREIGN_TEXT),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _weights(spark):
    return {
        r["doc_id"]: r["logw"]
        for r in dsir.importance_weights(
            _docs(spark), F.col("doc_id") % 10 == 0
        ).collect()
    }


def test_pool_only_and_target_like_scores_higher(spark):
    w = _weights(spark)
    # only pool docs are scored
    assert sorted(w) == [1, 2, 3]
    # a doc drawn from the target distribution outscores a foreign
    # one, with the mixed doc in between
    assert w[1] > w[3] > w[2]
    assert w[1] > 0 and w[2] < 0


def test_weights_invariant_to_partitioning(spark):
    base = dsir.importance_weights(
        _docs(spark), F.col("doc_id") % 10 == 0
    )
    shuffled = dsir.importance_weights(
        _docs(spark).repartition(7, "text"), F.col("doc_id") % 10 == 0
    )
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, shuffled.collect())
    )


def test_single_token_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(0, "ref ref ref"), (1, "solo"), (2, "   "), (3, "a b")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r
        for r in dsir.importance_weights(
            docs, F.col("doc_id") % 10 == 0
        ).collect()
    }
    # single-token doc: 1 unigram gram, no bigram; whitespace-only
    # doc vanishes (no grams)
    assert got[1]["n_grams"] == 1
    assert 2 not in got
    assert got[3]["n_grams"] == 3  # a, b, "a b"


def test_select_top_k_subset_reproducible_reseedable(spark, sf_dir):
    from flink_log_analysis_spark.plans import pipeline_ops

    w = pipeline_ops.dsir_weights(spark, sf_dir)
    sel1 = pipeline_ops.dsir_select(spark, sf_dir).collect()
    sel2 = pipeline_ops.dsir_select(spark, sf_dir).collect()
    assert [r["doc_id"] for r in sel1] == [r["doc_id"] for r in sel2]
    assert len(sel1) == min(pipeline_ops.DSIR_K, w.count())
    pool_ids = {r["doc_id"] for r in w.select("doc_id").collect()}
    assert {r["doc_id"] for r in sel1} <= pool_ids
    # a different seed perturbs the selection order
    reseeded = dsir.select_top_k(w, pipeline_ops.DSIR_K, seed=99).collect()
    assert [r["doc_id"] for r in reseeded] != [r["doc_id"] for r in sel1]


def test_hash_collisions_merge_before_fit(spark):
    # two distinct grams in the same bucket must act as ONE feature:
    # force it by hashing into a single bucket.
    docs = spark.createDataFrame(
        [(0, "x y"), (1, "p q")], "doc_id bigint, text string"
    )
    feats = dsir.feature_counts(docs, n_buckets=1).collect()
    assert {(r["doc_id"], r["feat"], r["cnt"]) for r in feats} == {
        (0, 0, 3),
        (1, 0, 3),
    }


def test_log_ratio_sign(spark):
    # feature common in target, absent in pool -> positive; reversed
    # -> negative; equal -> ~0 (exactly 0 when counts and totals tie)
    row = spark.range(1).select(
        dsir.log_ratio(F.lit(5), F.lit(0), F.lit(10), F.lit(10), 100).alias("pos"),
        dsir.log_ratio(F.lit(0), F.lit(5), F.lit(10), F.lit(10), 100).alias("neg"),
        dsir.log_ratio(F.lit(5), F.lit(5), F.lit(10), F.lit(10), 100).alias("zero"),
    ).collect()[0]
    assert row["pos"] > 0 > row["neg"]
    assert row["zero"] == pytest.approx(0.0, abs=1e-12)


def test_log_ratio_no_overflow_at_exabyte_totals(spark):
    # ADVICE r13: with gram totals tp/tq ~1e13 the old BIGINT products
    # (cp+1)*(tq+b) exceeded 2^63 and wrapped silently in non-ANSI
    # Spark, producing garbage (often NULL via ln of a negative). The
    # double-first shape must return the true finite ratio and agree
    # with Python's math.log.
    import math

    tp = tq = 10_000_000_000_000  # 1e13 grams each side
    cp, cq, b = 2_000_000, 500_000, dsir.N_BUCKETS
    row = spark.range(1).select(
        dsir.log_ratio(
            F.lit(cp), F.lit(cq), F.lit(tp), F.lit(tq), b
        ).alias("lr")
    ).collect()[0]
    expect = round(
        math.log(((cp + 1) * (tq + b)) / ((tp + b) * (cq + 1))),
        dsir.LR_ROUND,
    )
    assert row["lr"] is not None and math.isfinite(row["lr"])
    assert row["lr"] == pytest.approx(expect, abs=1e-12)
    assert row["lr"] == pytest.approx(math.log(cp / cq), abs=1e-4)
