"""Real-BPE operator tests (operators/bpe.py).

Certifies the native replace-chain application against TWO independent
implementations: the pure-Python rank-sequential encoder and a
GPT-2-style lowest-rank-first loop (the classic application algorithm)
— plus learning determinism and the structural property that makes
the two application orders equivalent for learned tables.
"""

import re

import pytest
from pyspark.sql import Row

from flink_log_analysis_spark.operators import bpe
from flink_log_analysis_spark.operators.textstats import BPE_TOKEN_REGEX
from flink_log_analysis_spark.session import read_table


def _minrank_encode(piece: str, merges: list[tuple[str, str]]) -> list[str]:
    """Independent reference: the classic application loop — find the
    LOWEST-RANK pair present, merge all its occurrences, repeat."""
    rank = {pair: i for i, pair in enumerate(merges)}
    seq = list(piece)
    while len(seq) >= 2:
        pairs = {(seq[i], seq[i + 1]) for i in range(len(seq) - 1)}
        ranked = [p for p in pairs if p in rank]
        if not ranked:
            break
        best = min(ranked, key=lambda p: rank[p])
        seq = bpe._merge_seq(tuple(seq), best)
    return seq


def test_learn_merges_deterministic_tiebreak():
    # counts tie between (a,b) and (b,a): lexicographically smaller wins
    merges = bpe.learn_merges([("ab", 2), ("ba", 2)], 1)
    assert merges[0] == ("a", "b")
    # higher count wins regardless of lexicographic order
    merges = bpe.learn_merges([("zz", 3), ("aa", 2)], 1)
    assert merges[0] == ("z", "z")


def test_learn_merges_stops_when_dry():
    # single-char pieces contribute no pairs at all
    assert bpe.learn_merges([("a", 5), ("b", 3)], 4) == []
    # "ab" supports exactly one merge, then the vocab has no pairs left
    assert bpe.learn_merges([("ab", 5)], 4) == [("a", "b")]


def test_frozen_table_well_formed():
    """Every merge part is a single char or an earlier merge's output —
    the property that makes rank-sequential == lowest-rank-first."""
    outputs = set()
    for a, b in bpe.BPE_MERGES_V1:
        for part in (a, b):
            assert len(part) == 1 or part in outputs, (a, b, part)
        outputs.add(a + b)
    assert len(bpe.BPE_MERGES_V1) == 48


def test_encode_matches_minrank_loop():
    """Rank-sequential application (what the replace chain implements)
    equals the classic lowest-rank-first loop on the learned table."""
    words = [
        "customer", "customers", "vector", "vectors", "order", "orders",
        "column", "filter", "filtering", "aaaa", "merge", "join", "slow",
        "hashjoin", "batchscan", "x", "", "smallorder", "ordering",
    ]
    for w in words:
        assert bpe.encode(w, bpe.BPE_MERGES_V1) == _minrank_encode(
            w, bpe.BPE_MERGES_V1
        ), w


def test_encode_greedy_overlap():
    merges = [("a", "a")]
    assert bpe.encode("aaaa", merges) == ["aa", "aa"]
    assert bpe.encode("aaa", merges) == ["aa", "a"]


def test_encode_stats_matches_python_reference(spark, sf_dir):
    """The native replace-chain column expression reproduces the pure-
    Python encoder exactly — counts AND the head token stream — over
    every sf0.001 document."""
    docs = read_table(spark, sf_dir, "documents")
    merges = bpe.BPE_MERGES_V1
    got = {
        r["doc_id"]: r
        for r in bpe.encode_stats(docs, merges).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        text = r["text"].replace("\x1f", "")
        pieces = re.findall(BPE_TOKEN_REGEX, text)
        encoded = [bpe.encode(p, merges) for p in pieces]
        n_base = sum(len(p) for p in pieces)
        n_bpe = sum(len(e) for e in encoded)
        row = got[r["doc_id"]]
        assert row["n_pieces"] == len(pieces)
        assert row["n_base_tokens"] == n_base
        assert row["n_bpe_tokens"] == n_bpe
        assert row["head_encoding"] == (
            " ".join(encoded[0]) if encoded else None
        )
        assert row["merged_per_10k_base"] == (
            (n_bpe * 10000) // n_base if n_base else None
        )


def test_encode_stats_hostile_rows(spark):
    """Empty text, whitespace-only text, and literal delimiter bytes
    degrade gracefully (ANSI mode: no throw, exact zeros/nulls)."""
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=""),
            Row(doc_id=2, text="   \n\t "),
            Row(doc_id=3, text="a\x1fb"),  # scrubbed -> one piece "ab"
        ]
    )
    rows = {r["doc_id"]: r for r in
            bpe.encode_stats(df, [("a", "b")]).collect()}
    assert rows[1]["n_pieces"] == 0
    assert rows[1]["n_bpe_tokens"] == 0
    assert rows[1]["merged_per_10k_base"] is None
    assert rows[2]["n_pieces"] == 0
    assert rows[3]["n_pieces"] == 1
    assert rows[3]["n_bpe_tokens"] == 1
    assert rows[3]["head_encoding"] == "ab"


def test_fit_bpe_driver_side_bounded(spark, sf_dir):
    """fit_bpe learns a well-formed table at sf0.001 and honors the
    requested merge budget."""
    docs = read_table(spark, sf_dir, "documents")
    merges = bpe.fit_bpe(docs, n_merges=8, sample_pieces=1000)
    assert len(merges) == 8
    outputs = set()
    for a, b in merges:
        for part in (a, b):
            assert len(part) == 1 or part in outputs
        outputs.add(a + b)


def test_token_ids_unknowns_and_digest(spark):
    """token_ids: ids follow the closed-form vocab (ASCII + merge
    outputs), non-ASCII chars map to UNK_ID, digest certifies order."""
    import hashlib

    from pyspark.sql import Row

    merges = [("a", "b")]
    voc = bpe.vocab(merges)
    assert voc[-1] == "ab" and voc[ord("!") - 33] == "!"
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="ab ba"),
            Row(doc_id=2, text="café"),  # é outside the ASCII universe
            Row(doc_id=3, text=""),
        ]
    )
    rows = {r["doc_id"]: r for r in bpe.token_ids(df, merges).collect()}
    ab, b_, a_ = voc.index("ab"), voc.index("b"), voc.index("a")
    exp1 = [ab, b_, a_]  # "ab" merges; "ba" stays b,a
    assert rows[1]["n_ids"] == 3 and rows[1]["n_unk"] == 0
    assert rows[1]["ids_md5"] == hashlib.md5(
        ",".join(map(str, exp1)).encode()
    ).hexdigest()
    # c,a,f in vocab; é -> UNK
    assert rows[2]["n_ids"] == 4 and rows[2]["n_unk"] == 1
    assert rows[3]["n_ids"] == 0 and rows[3]["ids_md5"] == hashlib.md5(
        b""
    ).hexdigest()


def test_property_encode_equivalences():
    """Property check (hypothesis): for LEARNED tables over random
    corpora, (a) rank-sequential encode == GPT-2-style min-rank loop,
    (b) both == a pure string-level simulation of the wrapped-string
    replace chain (the exact algorithm the Spark expression runs), and
    (c) concatenating the tokens reproduces the word."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def replace_chain_sim(piece, merges):
        D = "\x1f"
        s = "".join(D + c + D for c in piece)
        for a, b in merges:
            s = s.replace(D + a + D + D + b + D, D + a + b + D)
        return [t for t in s.split(D) if t]

    words_strategy = st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=8),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=200, deadline=None)
    @given(words=words_strategy, n_merges=st.integers(0, 12))
    def check(words, n_merges):
        from collections import Counter

        counts = Counter(words)
        merges = bpe.learn_merges(list(counts.items()), n_merges)
        for w in words:
            seq = bpe.encode(w, merges)
            assert seq == _minrank_encode(w, merges)
            assert seq == replace_chain_sim(w, merges)
            assert "".join(seq) == w

    check()


def test_encode_stats_line_terminator_pieces(spark):
    """r8 advisory regression: U+0085/U+2028/U+2029 are legal
    single-char pieces (outside the explicit whitespace class), and
    U+000B is whitespace on ALL engines now — wrap_expr's (?s) must
    wrap the line-terminator pieces so they count as one token each,
    matching the pure-Python reference."""
    hostile = [
        Row(doc_id=1, text="a\u0085b"),  # NEL: 3 pieces a, NEL, b
        Row(doc_id=2, text="a\u2028b"),  # LINE SEPARATOR
        Row(doc_id=3, text="a\u2029b"),  # PARAGRAPH SEPARATOR
        Row(doc_id=4, text="a\x0bb"),    # VT: whitespace -> 2 pieces
    ]
    df = spark.createDataFrame(hostile)
    got = {r["doc_id"]: r for r in bpe.encode_stats(df, []).collect()}
    for r in hostile:
        pieces = re.findall(BPE_TOKEN_REGEX, r.text)
        row = got[r.doc_id]
        assert row["n_pieces"] == len(pieces), (r.doc_id, pieces)
        assert row["n_bpe_tokens"] == sum(len(p) for p in pieces), r.doc_id
    assert got[1]["n_pieces"] == 3 and got[1]["n_bpe_tokens"] == 3
    assert got[4]["n_pieces"] == 2 and got[4]["n_bpe_tokens"] == 2


def test_vocab_rejects_duplicate_merge_outputs():
    """Two merges yielding the same output string collide on token id;
    vocab() must refuse loudly (r8 advisory) instead of letting
    token_ids hit DUPLICATE_MAP_KEY at runtime."""
    dup = [("a", "b"), ("ab", "c"), ("a", "bc")]  # 'abc' twice
    with pytest.raises(ValueError, match="duplicate merge output"):
        bpe.vocab(dup)
    assert bpe.vocab([("a", "b"), ("ab", "c")])[-1] == "abc"


def test_digit_merges_well_formed():
    m = bpe.digit_merges(1024)
    outputs = set()
    for a, b in m:
        for part in (a, b):
            assert len(part) == 1 or part in outputs, (a, b)
        outputs.add(a + b)
    assert len(outputs) == 1024  # distinct outputs (vocab-safe)
    m4 = bpe.digit_merges(4096)
    outs4 = set()
    for a, b in m4:
        for part in (a, b):
            assert len(part) == 1 or part in outs4, (a, b)
        outs4.add(a + b)
    assert len(outs4) == 4096
    with pytest.raises(ValueError, match="up to"):
        bpe.digit_merges(11101)


def test_token_digests_tier_equivalence(spark, sf_dir):
    """The native chain, the pandas tier, and the pure-Python encoder
    produce identical (n_tokens, stream_md5) rows — the anti-drift
    contract for the deliberately inlined worker closure."""
    import hashlib

    from flink_log_analysis_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    merges = bpe.digit_merges(100)  # <= BPE_NATIVE_CHAIN_MAX: both legal
    nat = {r["doc_id"]: (r["n_tokens"], r["stream_md5"])
           for r in bpe.token_digests(docs, merges).collect()}
    pan = {r["doc_id"]: (r["n_tokens"], r["stream_md5"])
           for r in bpe._token_digests_pandas(
               docs, merges, "text", "doc_id").collect()}
    assert nat == pan
    for r in docs.select("doc_id", "text").collect():
        toks = []
        for p in re.findall(BPE_TOKEN_REGEX, r["text"].replace("\x1f", "")):
            toks.extend(bpe.encode(p, merges))
        exp = (len(toks),
               hashlib.md5("\x1f".join(toks).encode()).hexdigest())
        assert nat[r["doc_id"]] == exp, r["doc_id"]


def test_token_digests_dispatches_past_native_ceiling(spark):
    """Above BPE_NATIVE_CHAIN_MAX token_digests must run (pandas
    tier), while the native-only APIs refuse with a pointer."""
    from pyspark.sql import Row as R

    big = bpe.digit_merges(1024)
    df = spark.createDataFrame([R(doc_id=1, text="ab 1234 cd 56")])
    rows = bpe.token_digests(df, big).collect()
    exp = sum(
        len(bpe.encode(p, big))
        for p in re.findall(BPE_TOKEN_REGEX, "ab 1234 cd 56")
    )
    assert rows[0]["n_tokens"] == exp == 7  # ab,12,34,cd,56
    with pytest.raises(ValueError, match="token_digests"):
        bpe.encode_stats(df, big)
    with pytest.raises(ValueError, match="token_digests"):
        bpe.token_ids(df, big)


def test_token_digests_null_text_tier_parity(spark):
    """NULL text tokenizes as empty on BOTH tiers (the byte-comparable
    dispatch-boundary contract; without the native-side coalesce a
    NULL row diverged between 128 and 129 merges)."""
    import hashlib

    df = spark.createDataFrame(
        [(1, None), (2, "ab")], "doc_id bigint, text string"
    )
    empty = (0, hashlib.md5(b"").hexdigest())
    for merges in (bpe.digit_merges(100), bpe.digit_merges(1024)):
        rows = {r["doc_id"]: (r["n_tokens"], r["stream_md5"])
                for r in bpe.token_digests(df, merges).collect()}
        assert rows[1] == empty, len(merges)
        assert rows[2][0] == 2


def test_staircase_fit_learns_expected_table():
    """The staircase construction proof, executed: learn_merges on the
    formula's piece counts reproduces expected_stair_merges EXACTLY,
    saturating at T1+T2 with headroom requested — the pure-Python half
    of the bpe_learned_deep contract (the Spark half runs the
    distributed fit over the generated corpus)."""
    counts = [
        (bpe.stair_piece(i), bpe.STAIR_C1 - i) for i in range(bpe.STAIR_T1)
    ] + [
        (
            bpe.stair_piece(2 * j) + bpe.stair_piece(2 * j + 1),
            bpe.STAIR_C2 - j,
        )
        for j in range(bpe.STAIR_T2)
    ]
    learned = bpe.learn_merges(counts, bpe.STAIR_T1 + bpe.STAIR_T2 + 32)
    expected = bpe.expected_stair_merges()
    assert learned == expected
    assert len(learned) == bpe.STAIR_T1 + bpe.STAIR_T2 == 768
    # depth-2 chaining: every tier-2 merge's parts are earlier outputs
    outputs = set()
    for k, (a, b) in enumerate(learned):
        if k >= bpe.STAIR_T1:
            assert a in outputs and b in outputs
        outputs.add(a + b)


def test_staircase_corpus_matches_formula(spark):
    """The Spark generator deals exactly the formula's occurrences:
    word mass per tier, doc count, and the per-doc word order being
    idx-sorted (spot-checked via a reconstructed doc)."""
    corpus = bpe.staircase_corpus(spark)
    rows = {r["doc_id"]: r["text"] for r in corpus.collect()}
    assert len(rows) == bpe.STAIR_DOCS
    total_words = sum(len(t.split()) for t in rows.values())
    t1 = bpe.STAIR_T1 * bpe.STAIR_C1 - bpe.STAIR_T1 * (bpe.STAIR_T1 - 1) // 2
    t2 = bpe.STAIR_T2 * bpe.STAIR_C2 - bpe.STAIR_T2 * (bpe.STAIR_T2 - 1) // 2
    assert total_words == t1 + t2 == 296320
    # doc 0 reconstructed from the formula: occurrences with
    # idx % DOCS == 0 in idx order
    words = []
    for i in range(bpe.STAIR_T1):
        off = i * bpe.STAIR_C1 - i * (i - 1) // 2
        for c in range(bpe.STAIR_C1 - i):
            if (off + c) % bpe.STAIR_DOCS == 0:
                words.append((off + c, bpe.stair_piece(i)))
    for j in range(bpe.STAIR_T2):
        off = bpe.STAIR_T1_OCC + j * bpe.STAIR_C2 - j * (j - 1) // 2
        for c in range(bpe.STAIR_C2 - j):
            if (off + c) % bpe.STAIR_DOCS == 0:
                words.append(
                    (off + c,
                     bpe.stair_piece(2 * j) + bpe.stair_piece(2 * j + 1))
                )
    expected_doc0 = " ".join(w for _, w in sorted(words))
    assert rows[0] == expected_doc0
