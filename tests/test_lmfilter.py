"""LM-perplexity filter (operators/lmfilter.py): fit counts, Laplace
smoothing, fold order, OOV accounting — pinned on a hand-computable
corpus."""

import math

from flink_log_analysis_spark.operators import lmfilter


def test_bigram_fit_and_score_hand_computed(spark):
    ref = spark.createDataFrame(
        [(0, "a b a b"), (1, "a c")], "doc_id long, text string"
    )
    u, b, vocab = lmfilter.fit_bigram_model(ref)
    assert vocab == 3  # {a, b, c}
    assert u == {"a": 3, "b": 2, "c": 1}
    assert b == {"a b": 2, "b a": 1, "a c": 1}

    model = lmfilter.model_row(spark, u, b)
    docs = spark.createDataFrame(
        [
            (10, "a b"),        # seen transition
            (11, "b c"),        # unseen transition, seen unigram
            (12, "z z z"),      # fully OOV
            (13, "a"),          # no transitions: out of scope
            (14, ""),           # empty: out of scope
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in lmfilter.score_perplexity(
            docs, model, vocab, threshold=1.10
        ).collect()
    }
    assert sorted(rows) == [10, 11, 12]  # 13/14 carry no evidence

    def lp(cb, cu):
        return round(math.log((cb + 1) / (cu + vocab)), lmfilter.LOG_ROUND)

    # doc 10: P(b|a) = (2+1)/(3+3)
    assert rows[10]["n_trans"] == 1 and rows[10]["n_oov"] == 0
    assert rows[10]["ppl"] == round(-lp(2, 3), lmfilter.PPL_ROUND)
    assert bool(rows[10]["kept"]) is True  # ln 2 = 0.6931 <= 1.10
    # doc 11: P(c|b) = (0+1)/(2+3), OOV transition
    assert rows[11]["n_trans"] == 1 and rows[11]["n_oov"] == 1
    assert rows[11]["ppl"] == round(-lp(0, 2), lmfilter.PPL_ROUND)
    assert bool(rows[11]["kept"]) is False  # ln 5 = 1.6094
    # doc 12: two transitions, both P = 1/3 (zero counts everywhere)
    assert rows[12]["n_trans"] == 2 and rows[12]["n_oov"] == 2
    two = lp(0, 0) + lp(0, 0)
    assert rows[12]["ppl"] == round(-two / 2, lmfilter.PPL_ROUND)
