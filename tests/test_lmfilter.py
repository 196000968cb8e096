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


def test_trigram_fit_and_score_hand_computed(spark):
    """Interpolated 3-gram backoff: fit counts, the fixed-weight
    mixture with zero-denominator terms dropping out, the Laplace
    unigram floor, trigram-level OOV accounting, and the >= 3-token
    scope rule — pinned on a hand-computable corpus."""
    ref = spark.createDataFrame(
        [(0, "a b c a b c"), (1, "a b d")], "doc_id long, text string"
    )
    u, b, t, vocab, n_tokens = lmfilter.fit_trigram_model(ref)
    assert (vocab, n_tokens) == (4, 9)  # {a,b,c,d}, 6 + 3 tokens
    assert u == {"a": 3, "b": 3, "c": 2, "d": 1}
    assert b == {"a b": 3, "b c": 2, "c a": 1, "b d": 1}
    assert t == {"a b c": 2, "b c a": 1, "c a b": 1, "a b d": 1}

    u_df, b_df, t_df = lmfilter.trigram_model_frames(spark, u, b, t)
    docs = spark.createDataFrame(
        [
            (10, "a b c"),      # seen trigram
            (11, "a b z"),      # unseen trigram, seen context
            (12, "z z z z"),    # fully OOV: only the Laplace floor
            (13, "a b"),        # no trigram transitions: out of scope
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in lmfilter.score_perplexity_3gram(
            docs, u_df, b_df, t_df, vocab, n_tokens, threshold=1.0
        ).collect()
    }
    assert sorted(rows) == [10, 11, 12]

    L3, L2, L1 = lmfilter.JM_L3, lmfilter.JM_L2, lmfilter.JM_L1

    def lp(ct, cb12, cb23, cu2, cu3):
        t3 = (L3 * ct) / cb12 if cb12 > 0 else 0.0
        t2 = (L2 * cb23) / cu2 if cu2 > 0 else 0.0
        t1 = (L1 * (cu3 + 1)) / (n_tokens + vocab)
        return round(math.log((t3 + t2) + t1), lmfilter.LOG_ROUND)

    # doc 10: P(c | a b) — trigram 2/3, bigram b c 2/3, unigram c
    assert rows[10]["n_trans"] == 1 and rows[10]["n_oov"] == 0
    assert rows[10]["ppl"] == round(
        -lp(2, 3, 2, 3, 2), lmfilter.PPL_ROUND
    )
    # doc 11: unseen trigram a b z; context a b seen (t3 = 0 numerator
    # still divides), b z unseen, z unseen
    assert rows[11]["n_trans"] == 1 and rows[11]["n_oov"] == 1
    assert rows[11]["ppl"] == round(
        -lp(0, 3, 0, 3, 0), lmfilter.PPL_ROUND
    )
    # doc 12: two transitions, all counts zero -> only the floor term
    assert rows[12]["n_trans"] == 2 and rows[12]["n_oov"] == 2
    floor = lp(0, 0, 0, 0, 0)
    assert rows[12]["ppl"] == round(-(floor + floor) / 2,
                                    lmfilter.PPL_ROUND)
    assert bool(rows[12]["kept"]) is False  # -ln(0.2/13) ~ 4.17 > 1.0


def test_fit_trigram_frames_matches_dict_fit(spark):
    """The distributed production fit (frames never round-tripping
    the driver) yields exactly the dict fit's counts and scalars, and
    scoring through either model source is identical."""
    ref = spark.createDataFrame(
        [(0, "a b c a b c"), (1, "a b d")], "doc_id long, text string"
    )
    u, b, t, vocab, n_tokens = lmfilter.fit_trigram_model(ref)
    uf, bf, tf, v2, n2 = lmfilter.fit_trigram_frames(ref)
    assert (v2, n2) == (vocab, n_tokens)
    assert {(r["w"], r["c"]) for r in uf.collect()} == set(u.items())
    assert {
        (f"{r['w1']} {r['w2']}", r["c"]) for r in bf.collect()
    } == set(b.items())
    assert {
        (f"{r['w1']} {r['w2']} {r['w3']}", r["c"]) for r in tf.collect()
    } == set(t.items())
    docs = spark.createDataFrame(
        [(10, "a b c"), (11, "a b z")], "doc_id long, text string"
    )
    via_dicts = lmfilter.score_perplexity_3gram(
        docs, *lmfilter.trigram_model_frames(spark, u, b, t),
        vocab, n_tokens, threshold=1.0,
    )
    via_frames = lmfilter.score_perplexity_3gram(
        docs, uf, bf, tf, vocab, n_tokens, threshold=1.0
    )
    assert sorted(map(tuple, via_dicts.collect())) == sorted(
        map(tuple, via_frames.collect())
    )


def test_kn_fit_and_score_hand_computed(spark):
    """Interpolated Kneser-Ney: continuation/follower counts, the
    absolute-discount interpolation, the unseen-history backoff to
    the floored continuation distribution, and OOV accounting —
    pinned on a hand-computable corpus."""
    ref = spark.createDataFrame(
        [(0, "a b a b"), (1, "a c")], "doc_id long, text string"
    )
    hist, b, foll, pred, n_big, vocab = lmfilter.fit_kn_bigram_model(ref)
    # HISTORY counts c(w1 .) — NOT unigram counts: "b" occurs twice
    # but precedes something only once, and "c" (document-final only)
    # has NO history mass at all, which is exactly the case a unigram
    # denominator would send to ln(0) (caught at sf0.01, r13)
    assert hist == {"a": 3, "b": 1}
    assert b == {"a b": 2, "b a": 1, "a c": 1}
    # distinct continuations per history / distinct histories per word
    assert foll == {"a": 2, "b": 1}      # a -> {b, c}; b -> {a}
    assert pred == {"b": 1, "a": 1, "c": 1}
    assert n_big == 3 and vocab == 3

    D = lmfilter.KN_DISCOUNT
    BV = float(n_big + vocab)  # 6.0

    def pc(p2):
        return (p2 + 1) / BV

    def lp(p):
        return round(math.log(p), lmfilter.LOG_ROUND)

    model = lmfilter.kn_model_row(spark, hist, b, foll, pred)
    docs = spark.createDataFrame(
        [
            (10, "a b"),   # seen bigram, seen history
            (11, "b c"),   # unseen bigram, seen history
            (12, "z a"),   # unseen history -> continuation backoff
            (13, "z z"),   # fully OOV -> floored continuation
            (14, "c a"),   # document-final-only history: c(c)>0 but
                           # c(c .)=0 -> continuation backoff, P>0
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in lmfilter.score_perplexity_kn(
            docs, model, n_big, vocab, threshold=1.0
        ).collect()
    }
    # doc 10: max(2-D,0)/3 + ((D*2)/3)*pc(1)
    p10 = max(2 - D, 0.0) / 3 + ((D * 2) / 3) * pc(1)
    assert rows[10]["n_oov"] == 0
    assert rows[10]["ppl"] == round(-lp(p10), lmfilter.PPL_ROUND)
    assert bool(rows[10]["kept"]) is True
    # doc 11: c(b c)=0 -> discount clamps to 0; lambda(b)=D*1/c(b .)
    # with the HISTORY count c(b .)=1 (not the unigram count 2)
    p11 = 0.0 / 1 + ((D * 1) / 1) * pc(1)
    assert rows[11]["n_oov"] == 1
    assert rows[11]["ppl"] == round(-lp(p11), lmfilter.PPL_ROUND)
    # doc 12: history z unseen -> P = pc(pred[a]) = pc(1)
    assert rows[12]["ppl"] == round(-lp(pc(1)), lmfilter.PPL_ROUND)
    # doc 13: fully OOV -> P = pc(0) = 1/6 (the Laplace floor; ln defined)
    assert rows[13]["n_oov"] == 1
    assert rows[13]["ppl"] == round(-lp(pc(0)), lmfilter.PPL_ROUND)
    assert bool(rows[13]["kept"]) is False
    # doc 14: the regression case — "c" is seen (unigram 1) but only
    # document-finally, so it has zero history mass; the history-count
    # denominator routes it to the continuation backoff instead of
    # the zero-probability ln(0) a unigram denominator produces
    assert rows[14]["ppl"] == round(-lp(pc(1)), lmfilter.PPL_ROUND)


def test_per_key_models_isolate_languages(spark):
    """fit_bigram_frames_per_key / score_perplexity_per_key: each
    document is scored under ITS OWN language's model (a doc whose
    text repeats its language's reference exactly has zero OOV
    transitions; the same text under the other language's model would
    be all-OOV), and unmodeled languages are excluded, not defaulted."""
    from pyspark.sql import functions as F

    from flink_log_analysis_spark.operators import lmfilter

    rows = [
        # reference slice (doc_id % 10 == 0)
        (0, "en", "alpha beta gamma alpha beta"),
        (10, "de", "eins zwei drei eins zwei"),
        # pool: exact reference echoes + an unmodeled language
        (1, "en", "alpha beta gamma"),
        (2, "de", "eins zwei drei"),
        (3, "xx", "quux corge grault"),
        # cross-language text: en words under the de model -> all OOV
        (4, "de", "alpha beta gamma"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, lang string, text string"
    )
    ref = docs.filter(F.col("doc_id") % 10 == 0)
    uni, bi, vocab = lmfilter.fit_bigram_frames_per_key(ref)
    out = {
        r["doc_id"]: r
        for r in lmfilter.score_perplexity_per_key(
            docs, uni, bi, vocab, threshold=10.0
        ).collect()
    }
    assert out[1]["n_oov"] == 0  # en echo under the en model
    assert out[2]["n_oov"] == 0  # de echo under the de model
    assert 3 not in out          # no xx model -> no score
    assert out[4]["n_oov"] == out[4]["n_trans"]  # en text, de model
    # the echo scores strictly better than the cross-language doc
    assert out[2]["ppl"] < out[4]["ppl"]


def test_session_cache_fit_guard_raises_over_bound(spark, monkeypatch):
    """VERDICT r13 item 7: the dict-collecting fits must refuse a
    "reference" whose model tables exceed MAX_COLLECTED_MODEL_ROWS,
    pointing at the distributed path — and stay a no-op in-range."""
    import pytest

    from flink_log_analysis_spark.operators import lmfilter

    ref = spark.createDataFrame(
        [(0, "a b c d e"), (1, "f g h i j")], "doc_id bigint, text string"
    )
    # in-range: identical result through the guard
    u, b, v = lmfilter.fit_bigram_model(ref)
    assert v == 10 and sum(u.values()) == 10
    monkeypatch.setattr(lmfilter, "MAX_COLLECTED_MODEL_ROWS", 4)
    with pytest.raises(ValueError, match="fit_trigram_frames"):
        lmfilter.fit_bigram_model(ref)
    with pytest.raises(ValueError, match="MAX_COLLECTED_MODEL_ROWS"):
        lmfilter.fit_trigram_model(ref)


def test_chunked_scoring_semantics(spark):
    """VERDICT r13 item 4: (a) a doc within one window scores exactly
    as the whole-doc 3-gram scorer (one chunk, weighted mean of one ==
    itself); (b) boundary-crossing transitions drop: with window=4, a
    7-token doc splits 4+3 -> 2+1 transitions, never 5; (c) the
    recombine is the transition-weighted mean of rounded chunk ppls."""
    import pytest

    from flink_log_analysis_spark.operators import lmfilter

    ref = spark.createDataFrame(
        [(0, "a b c a b d b c a")], "doc_id bigint, text string"
    )
    uni, bi, tri, vocab, n_tok = lmfilter.fit_trigram_model(ref)
    u, b, t = lmfilter.trigram_model_frames(spark, uni, bi, tri)
    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, "a b c a b d b")],
        "doc_id bigint, text string",
    )
    whole = {
        r["doc_id"]: r
        for r in lmfilter.score_perplexity_3gram(
            docs, u, b, t, vocab, n_tok, 10.0
        ).collect()
    }
    chunked = {
        r["doc_id"]: r
        for r in lmfilter.score_perplexity_3gram_chunked(
            docs, u, b, t, vocab, n_tok, 10.0, window=4
        ).collect()
    }
    # (a) doc 1 fits one window: identical score, 1 chunk
    assert chunked[1]["n_chunks"] == 1
    assert chunked[1]["ppl"] == whole[1]["ppl"]
    assert chunked[1]["n_trans"] == whole[1]["n_trans"] == 2
    # (b) doc 2 (7 tokens, window 4): chunks "a b c a" (2 trans) +
    # "b d b" (1 trans) = 3, vs 5 whole-doc
    assert chunked[2]["n_chunks"] == 2
    assert chunked[2]["n_trans"] == 3 and whole[2]["n_trans"] == 5
    # (c) recombine = weighted mean of the two chunk ppls
    c1 = lmfilter.score_perplexity_3gram(
        spark.createDataFrame([(0, "a b c a")], "doc_id bigint, text string"),
        u, b, t, vocab, n_tok, 10.0,
    ).collect()[0]["ppl"]
    c2 = lmfilter.score_perplexity_3gram(
        spark.createDataFrame([(0, "b d b")], "doc_id bigint, text string"),
        u, b, t, vocab, n_tok, 10.0,
    ).collect()[0]["ppl"]
    assert chunked[2]["ppl"] == pytest.approx(
        round((c1 * 2 + c2 * 1) / 3, lmfilter.PPL_ROUND), abs=1e-9
    )


def test_chunked_scoring_rejects_subtrigram_window(spark):
    """r14 review: window < 3 would silently drop every document."""
    import pytest

    from flink_log_analysis_spark.operators import lmfilter

    ref = spark.createDataFrame([(0, "a b c")], "doc_id bigint, text string")
    uni, bi, tri, vocab, n_tok = lmfilter.fit_trigram_model(ref)
    u, b, t = lmfilter.trigram_model_frames(spark, uni, bi, tri)
    with pytest.raises(ValueError, match="window=2 < 3"):
        lmfilter.score_perplexity_3gram_chunked(
            ref, u, b, t, vocab, n_tok, 10.0, window=2
        )
