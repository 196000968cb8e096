"""Behavioral tests for the model-based quality classifier
(operators/qualityclf.py — the GPT-3/LLaMA reference-like-page
filter). The oracle-parity gate certifies cross-engine exactness of
the fit and scoring; these tests pin the SEMANTICS: the classifier
must separate reference-like from foreign pool documents, the fit
must be invariant to physical layout, hostile inputs must degrade
instead of aborting, and the optional pretrain_corpus_prep stage
must compose by pure doc_id intersection.
"""

import pytest
from pyspark.sql import functions as F

from flink_log_analysis_spark.operators import qualityclf as qc

TARGET_TEXT = "the quick brown fox jumps over the lazy dog again and again"
FOREIGN_TEXT = "zzz9 qqq8 vvv7 kkk6 jjj5 xxx4 yyy3 www2 uuu1 ttt0"


def _docs(spark):
    # ids 0,10,20 are the reference slice (mod 10); the training
    # pool (negatives) is purely foreign, so the target grams carry
    # clean positive signal.
    rows = [
        (0, TARGET_TEXT),
        (10, TARGET_TEXT + " quick fox"),
        (20, "quick brown fox dog " + TARGET_TEXT),
        (2, FOREIGN_TEXT),
        (12, FOREIGN_TEXT + " zzz9 qqq8"),
        (22, "vvv7 kkk6 " + FOREIGN_TEXT),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _heldout(spark):
    # UNSEEN documents (never in the fit): one reference-like, one
    # foreign-like — the generalization direction the filter exists
    # for.
    rows = [
        (101, "the quick brown fox jumps over the lazy dog"),
        (102, "qqq8 vvv7 kkk6 jjj5 xxx4"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _fit(spark, docs=None):
    fc = qc.labeled_feature_counts(
        docs if docs is not None else _docs(spark),
        F.col("doc_id") % 10 == 0,
    )
    return qc.fit_logreg(fc)


def test_separates_reference_like_heldout_docs(spark):
    w = _fit(spark)
    scores = {
        r["doc_id"]: r["score"]
        for r in qc.score_docs(_heldout(spark), w).collect()
    }
    # an unseen reference-like page outscores an unseen foreign page
    assert scores[101] > scores[102]


def test_fit_layout_invariant(spark):
    base = _docs(spark)
    w1 = _fit(spark, base)
    w2 = _fit(spark, base.repartition(7).sortWithinPartitions("text"))
    # exact fixed-point integers: any fold-order sensitivity anywhere
    # in the fit would move a weight
    assert w1 == w2


def test_bias_feature_present_and_negative(spark):
    w = dict(_fit(spark))
    # 3 positives / 4 negatives with near-identical content: the
    # intercept must carry (most of) the class prior, i.e. be negative
    assert qc.BIAS_FEAT in w
    assert w[qc.BIAS_FEAT] < 0


def test_zero_gram_docs_excluded_not_crashed(spark):
    rows = [(1, TARGET_TEXT), (2, ""), (3, "   "), (4, None)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    w = _fit(spark, docs.union(_docs(spark)))
    out = qc.score_docs(docs, w)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1}


def test_scores_are_probabilities(spark):
    w = _fit(spark)
    for r in qc.score_docs(_docs(spark), w).collect():
        assert 0.0 <= r["score"] <= 1.0
        assert r["kept"] == (r["score"] >= qc.QC_THRESHOLD)
        assert r["n_feats"] > 0 and r["n_grams"] >= r["n_feats"]


def test_pretrain_compose_is_intersection(spark, sf_dir):
    """The optional classifier stage must only ever REMOVE documents
    (a doc_id-join filter), never add or relabel — the composed
    pipeline's survivors are a subset of the certified default's."""
    from flink_log_analysis_spark.plans.pipeline_full import (
        pretrain_corpus_prep,
    )

    base = {
        r["doc_id"]
        for r in pretrain_corpus_prep(spark, sf_dir).select(
            "doc_id"
        ).collect()
    }
    clf = {
        r["doc_id"]
        for r in pretrain_corpus_prep(
            spark, sf_dir, quality_clf=True
        ).select("doc_id").collect()
    }
    assert clf  # the stage must not annihilate the corpus
    # NOT a subset claim on doc_ids: DSIR refits on the clf-filtered
    # survivor set, so the Gumbel resample can admit different docs.
    # The invariant that IS stable: the pre-DSIR survivor pool only
    # shrinks, so the selection width cannot grow.
    assert len(clf) <= len(base)


def test_pareto_select_keeps_heavy_tail(spark, sf_dir):
    """GPT-3's noise rule must not collapse to a hard threshold:
    some below-median documents survive (the heavy tail) and some
    high scorers fall — and the verdict is deterministic."""
    from flink_log_analysis_spark.plans.llm_quality import (
        quality_classifier_select,
    )

    rows = quality_classifier_select(spark, sf_dir).collect()
    again = quality_classifier_select(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    kept = [r for r in rows if r["kept_sel"]]
    assert 0 < len(kept) < len(rows)
    med = sorted(r["score"] for r in rows)[len(rows) // 2]
    assert any(r["score"] < med for r in kept)


def test_rowwise_scoring_equals_batch(spark):
    docs = _docs(spark).union(_heldout(spark))
    w = _fit(spark)
    batch = {
        tuple(r)
        for r in qc.score_docs(docs, w).collect()
    }
    roww = {
        tuple(r)
        for r in qc.score_docs_rowwise(
            docs, qc.model_row(spark, w)
        ).collect()
    }
    assert batch == roww
