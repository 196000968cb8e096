"""Unigram-LM tokenizer tests: EM fit, Viterbi apply, tie-breaks,
[UNK] path, distributed-vs-reference parity, per-document stats."""

from __future__ import annotations

import math

import pytest

from flink_log_analysis_spark.operators import unigram as ug


def test_encode_word_max_likelihood_not_greedy():
    # greedy longest-first would take 'abc' (very unlikely piece);
    # Viterbi picks the higher-probability split.
    vocab = {"abc": -20.0, "ab": -1.0, "c": -1.0, "a": -5.0, "b": -5.0}
    pieces, score = ug.encode_word("abc", vocab)
    assert pieces == ["ab", "c"]
    assert score == round(-2.0, ug.SCORE_ROUND)


def test_encode_word_tie_prefers_fewer_tokens():
    # two paths with the same total score: ('ab','c') vs ('a','b','c')
    vocab = {"ab": -2.0, "a": -1.0, "b": -1.0, "c": -1.0}
    pieces, _ = ug.encode_word("abc", vocab)
    assert pieces == ["ab", "c"]


def test_encode_word_unk_and_empty():
    vocab = {"a": -1.0}
    assert ug.encode_word("ax", vocab) == ([ug.UNK], 0.0)
    assert ug.encode_word("", vocab) == ([ug.UNK], 0.0)


def test_forward_backward_single_path():
    # 'ab' with only pieces 'a','b': one segmentation, posterior 1
    probs = {"a": 0.5, "b": 0.5}
    expected: dict[str, float] = {}
    ll = ug._forward_backward("ab", 3, probs, 6, expected)
    assert expected["a"] == pytest.approx(3.0)
    assert expected["b"] == pytest.approx(3.0)
    assert ll == pytest.approx(3 * math.log(0.25))


def test_learn_unigram_concentrates_on_repeated_piece():
    counts = [("ababab", 50), ("cd", 5)]
    vocab = dict(ug.learn_unigram(counts, lmax=3, seed_size=20,
                                  n_multi=4, em_rounds=4))
    assert "ab" in vocab
    # 'ab' must dominate its characters after EM
    assert vocab["ab"] > vocab["a"] and vocab["ab"] > vocab["b"]
    pieces, _ = ug.encode_word("ababab", vocab)
    assert pieces == ["ab", "ab", "ab"]


def test_learn_unigram_char_truncation_unk():
    counts = [("aa", 100), ("qz", 1)]
    vocab = dict(ug.learn_unigram(counts, lmax=2, seed_size=10,
                                  n_multi=1, em_rounds=2,
                                  min_char_count=50))
    assert "q" not in vocab and "z" not in vocab and "qz" not in vocab
    assert ug.encode_word("qz", vocab) == ([ug.UNK], 0.0)


def test_word_viterbi_matches_reference(spark):
    vocab = ug.UNIGRAM_VOCAB_V1
    vd = dict(vocab)
    words = [
        "column", "columns", "customer", "custom", "join", "joins",
        "batch", "batched", "hash", "hashjoin", "filter", "scan",
        "z", "42", "!", "x", "a", "aa", "erer", "mergesort", "wow",
    ]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: (r["n_tokens"], r["is_unk"], r["pieces"], r["logprob"])
        for r in ug.word_viterbi(df, vocab).collect()
    }
    for w in words:
        pieces, score = ug.encode_word(w, vd)
        unk = pieces == [ug.UNK]
        exp = (
            1 if unk else len(pieces),
            unk,
            " ".join(pieces),
            0.0 if unk else score,
        )
        assert got[w] == exp, (w, got[w], exp)


def test_encode_docs_stats(spark):
    import hashlib

    vocab = [("ab", round(math.log(0.5), 7)),
             ("a", round(math.log(0.25), 7)),
             ("b", round(math.log(0.25), 7))]
    rows = [
        (1, "ab ab zz"),
        (2, ""),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r.asDict() for r in ug.encode_docs(df, vocab).collect()}
    lp_ab = dict(vocab)["ab"]
    assert got[1]["n_words"] == 3
    assert got[1]["n_tokens"] == 3  # ab, ab, [UNK]
    assert got[1]["n_unk_words"] == 1
    exp_lp = round(
        round(lp_ab, ug.SCORE_ROUND) + round(lp_ab, ug.SCORE_ROUND) + 0.0,
        ug.SCORE_ROUND,
    )
    assert got[1]["logprob"] == pytest.approx(exp_lp)
    assert got[1]["stream_md5"] == hashlib.md5(b"ab ab [UNK]").hexdigest()
    for d in (2, 3):
        assert got[d]["n_words"] == 0
        assert got[d]["n_tokens"] == 0
        assert got[d]["logprob"] == 0.0
        assert got[d]["stream_md5"] == hashlib.md5(b"").hexdigest()


def test_word_viterbi_rejects_empty_vocab(spark):
    df = spark.createDataFrame([("a",)], "word string")
    with pytest.raises(ValueError):
        ug.word_viterbi(df, [])


def test_frozen_vocab_is_fit_output(spark):
    """The frozen literal must equal the documented freeze run so the
    oracle's spliced scored pieces can never drift from the fit."""
    from flink_log_analysis_spark.session import read_table

    vocab = ug.fit_unigram(
        read_table(spark, "/root/testdata/sf0.01", "documents"),
        lmax=6,
        seed_size=120,
        n_multi=48,
        em_rounds=4,
        sample_pieces=10_000,
        min_char_count=40,
    )
    assert vocab == ug.UNIGRAM_VOCAB_V1


def _ffbs_reference(word, vocab, seed):
    """Pure-Python FFBS twin: same probs (math.exp of the frozen
    logp), same md5 uniforms, same ln-ascending fold order, same
    bracketing rule — the independent per-draw reference."""
    import hashlib

    probs = {p: math.exp(lp) for p, lp in vocab}
    lmax = max(len(p) for p in probs)
    L = len(word)
    arcs = {}  # endp -> [(ln, prob, piece)] ln asc
    for endp in range(1, L + 1):
        lst = []
        for ln in range(1, min(lmax, endp) + 1):
            piece = word[endp - ln : endp]
            if piece in probs:
                lst.append((ln, probs[piece], piece))
        arcs[endp] = lst
    alpha = [1.0] + [0.0] * L
    for j in range(1, L + 1):
        s = 0.0
        for ln, pr, _ in arcs[j]:
            s = s + alpha[j - ln] * pr
        alpha[j] = s

    def uniform(endp):
        key = f"{seed}|{word}:{endp}"
        b = int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % 1_000_000
        return (b + 0.5) / 1_000_000.0

    pieces = []
    cur = L
    while cur > 0:
        total = 0.0
        for ln, pr, _ in arcs[cur]:
            total = total + alpha[cur - ln] * pr
        t = uniform(cur) * total
        cum = 0.0
        chosen = None
        for ln, pr, piece in arcs[cur]:
            cum = cum + alpha[cur - ln] * pr
            if cum > t:
                chosen = (ln, piece)
                break
        if chosen is None:
            return [ug.UNK]
        pieces.append(chosen[1])
        cur -= chosen[0]
    return list(reversed(pieces))


def test_sample_word_tokens_matches_reference(spark):
    """Every Spark draw equals the pure-Python FFBS reference exactly
    (validity, UNKs, and the specific sampled segmentation), across
    two seeds."""
    vocab = ug.UNIGRAM_VOCAB_V1
    words = ["column", "columns", "customer", "batch", "hashjoin",
             "mergesort", "quest", "erer", "at", "42", "z"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    for seed in ("e1", "e2"):
        got = {
            r["word"]: (r["n_tokens"], r["is_unk"], r["pieces"])
            for r in ug.sample_word_tokens(df, vocab, seed=seed).collect()
        }
        for w in words:
            ref = _ffbs_reference(w, vocab, seed)
            unk = ref == [ug.UNK]
            exp = (1 if unk else len(ref), unk, " ".join(ref))
            assert got[w] == exp, (seed, w, got[w], exp)
            if not unk:
                assert "".join(ref) == w


def test_sample_word_tokens_matches_posterior(spark):
    """Empirical draw frequency tracks the exact posterior: word 'ab'
    with P(['ab']) = p_ab / (p_ab + p_a*p_b) = 2/3 under the hand
    vocab; 120 deterministic seeds land near it."""
    import math

    p_ab, p_a, p_b = 0.4, 0.3, 0.3  # doubles chosen exactly
    vocab = [("ab", round(math.log(p_ab), 7)),
             ("a", round(math.log(p_a), 7)),
             ("b", round(math.log(p_b), 7))]
    df = spark.createDataFrame([("ab",)], "word string")
    whole = 0
    n = 50  # deterministic draws: the empirical rate is FROZEN, not flaky
    for k in range(n):
        r = ug.sample_word_tokens(df, vocab, seed=f"s{k}").collect()[0]
        assert r["pieces"] in ("ab", "a b")
        whole += r["pieces"] == "ab"
    post = p_ab / (p_ab + p_a * p_b)  # ~0.816
    assert abs(whole / n - post) < 0.15, (whole / n, post)


def test_sample_docs_stats(spark):
    import hashlib
    import math

    vocab = [("hi", round(math.log(0.5), 7)),
             ("h", round(math.log(0.25), 7)),
             ("i", round(math.log(0.25), 7))]
    rows = [(1, "hi zz hi"), (2, ""), (3, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r.asDict()
           for r in ug.sample_docs(df, vocab, seed="t").collect()}
    assert got[1]["n_words"] == 3 and got[1]["n_unk_words"] == 1
    # both 'hi' occurrences share the per-word draw within a run
    assert got[1]["n_tokens"] in (3, 5)
    for d in (2, 3):
        assert got[d]["n_words"] == 0
        assert got[d]["stream_md5"] == hashlib.md5(b"").hexdigest()
