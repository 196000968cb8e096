"""WordPiece operator tests: fit scoring, greedy apply, [UNK] path,
distributed-vs-reference parity, per-document stats."""

from __future__ import annotations

import pytest

from flink_log_analysis_spark.operators import wordpiece as wp


def test_learn_wordpiece_likelihood_not_count():
    # (a,##b) has the HIGHEST pair count (10) but (c,##d) the highest
    # likelihood score 5/(10*5) vs 10/(10*15) — WordPiece must pick
    # (c,##d); a raw-count (BPE) fit would pick (a,##b).
    counts = [("ab", 10), ("cb", 5), ("cd", 5)]
    merges = wp.learn_wordpiece(counts, 1)
    assert merges == [("c", "##d")]


def test_learn_wordpiece_tie_break_lex():
    counts = [("ab", 4), ("cd", 4)]  # identical scores
    merges = wp.learn_wordpiece(counts, 1)
    assert merges == [("a", "##b")]


def test_learn_wordpiece_continuation_marker():
    # merging (##x, ##y) keeps the ## marker on the output
    counts = [("zxy", 5), ("zxyxy", 5)]
    merges = wp.learn_wordpiece(counts, 3)
    outs = [wp._merge_sym(a, b) for a, b in merges]
    assert all(o.startswith("##") or o[0] == "z" for o in outs)
    # every learned part is an initial symbol or an earlier output
    seen: set[str] = set()
    for a, b in merges:
        for part in (a, b):
            assert len(wp._raw(part)) == 1 or part in seen
        seen.add(wp._merge_sym(a, b))


def test_vocab_truncation_drops_rare_chars():
    counts = [("aa", 100), ("qz", 1)]
    vocab = wp.vocab_from_merges(counts, [], min_char_count=50)
    assert "a" in vocab and "##a" in vocab
    assert "q" not in vocab and "##z" not in vocab


def test_encode_word_greedy_longest_first():
    vocab = {"un", "##able", "##a", "##b", "##l", "##e", "u", "##n"}
    assert wp.encode_word("unable", vocab) == ["un", "##able"]
    # greedy != optimal: longest-first at pos 0 can strand the tail
    vocab2 = {"ab", "a", "##bc", "##c"}
    assert wp.encode_word("abc", vocab2) == ["ab", "##c"]


def test_encode_word_unk():
    vocab = {"a", "##b"}
    assert wp.encode_word("abx", vocab) == [wp.UNK]
    assert wp.encode_word("xa", vocab) == [wp.UNK]


def test_word_tokens_matches_reference(spark):
    vocab = wp.WORDPIECE_VOCAB_V1
    vs = set(vocab)
    words = [
        "column", "columns", "window", "windowing", "join", "joins",
        "e", "elephant", "big", "biggest", "42", "!", "q", "quest",
        "wind", "x", "a", "aggregate", "customer", "custom",
    ]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: (r["n_tokens"], r["is_unk"], r["pieces"])
        for r in wp.word_tokens(df, vocab).collect()
    }
    for w in words:
        ref = wp.encode_word(w, vs)
        unk = ref == [wp.UNK]
        assert got[w] == (1 if unk else len(ref), unk, " ".join(ref)), w


def test_encode_docs_stats(spark):
    import hashlib

    vocab = ["h", "i", "##i", "x", "##y"]
    rows = [
        (1, "hi hi zz"),   # hi -> h ##i (x2), zz -> [UNK]
        (2, ""),           # empty: zero counts, md5('')
        (3, None),         # null text behaves as empty
        (4, "xy"),         # x ##y
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r.asDict() for r in wp.encode_docs(df, vocab).collect()}
    assert got[1]["n_words"] == 3
    assert got[1]["n_tokens"] == 5  # 2+2 pieces + 1 UNK
    assert got[1]["n_unk_words"] == 1
    exp1 = hashlib.md5(b"h ##i h ##i [UNK]").hexdigest()
    assert got[1]["stream_md5"] == exp1
    for d in (2, 3):
        assert got[d]["n_words"] == 0
        assert got[d]["n_tokens"] == 0
        assert got[d]["stream_md5"] == hashlib.md5(b"").hexdigest()
    assert got[4]["n_tokens"] == 2 and got[4]["n_unk_words"] == 0


def test_word_tokens_rejects_empty_vocab(spark):
    df = spark.createDataFrame([("a",)], "word string")
    with pytest.raises(ValueError):
        wp.word_tokens(df, [])


def test_frozen_vocab_is_fit_output(spark):
    """The frozen literal must equal the documented freeze run so the
    oracle's spliced vocabulary can never drift from the fit."""
    from flink_log_analysis_spark.session import read_table

    merges, vocab = wp.fit_wordpiece(
        read_table(spark, "/root/testdata/sf0.01", "documents"),
        n_merges=32,
        sample_pieces=10_000,
        min_char_count=40,
    )
    assert vocab == wp.WORDPIECE_VOCAB_V1
