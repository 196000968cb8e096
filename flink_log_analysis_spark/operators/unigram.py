"""Unigram-LM tokenization: EM-fitted piece probabilities, Viterbi
maximum-likelihood segmentation (Kudo, ACL 2018 "Subword
Regularization" §3 — the SentencePiece `--model_type=unigram`
algorithm; the third real tokenizer family beside BPE and WordPiece).

Semantics: the tokenizer is a VOCABULARY OF SCORED PIECES
``{piece -> log p(piece)}``; a word's tokenization is the segmentation
maximizing the sum of piece log-probabilities (Viterbi over the
segmentation lattice), not a greedy or merge-order rule. Fit is EM:
the E-step computes each piece's expected count over ALL segmentations
of every word (forward-backward on the lattice), the M-step
re-normalizes; the vocabulary is then pruned to all single characters
plus the top multi-char pieces by expected count (this module's
documented simplification of the paper's likelihood-loss prune — the
selection statistic is the EM posterior mass rather than the exact
likelihood delta; same shape, one fewer lattice pass).

Spark-first shape:

- **Fit** is the bounded-sample driver-side pattern (`.bpe.fit_bpe`):
  one distributed explode+agg collects the top ``sample_pieces``
  distinct words; seeding, EM, and pruning run on that dictionary in
  milliseconds. 100 TB changes the agg, never the collect bound.
- **Apply** tokenizes each DISTINCT word once, relationally: candidate
  (start, len<=Lmax) windows broadcast-join the scored vocabulary, are
  regrouped into a dense end-position -> candidate-array map, and ONE
  ``F.aggregate`` fold per word runs the Viterbi forward pass (scores
  + backpointers as growing arrays) followed by one backward fold
  reconstructing the argmax piece stream — pure JVM, O(|w| * Lmax)
  per distinct word, zero Python.
- **Determinism across engines**: cumulative path scores are IEEE
  double sums of the frozen (rounded) log-probs in path-prefix order —
  the DP's ``score[i-len] + logp`` association IS the path's
  left-to-right sum, so Spark's Viterbi and the oracle's exhaustive
  path enumeration (a recursive CTE walking every segmentation, then
  one argmax per word) compare bit-identical doubles. Ties break on
  (fewer tokens, then the lexicographically LARGEST zero-padded
  length-sequence key) — a total order that is prefix-monotone, so
  local DP choice equals the global path argmax (proof in
  ``_VITERBI_ORDER_NOTE`` below).

No counterpart in the reference repo (LogAnalysis.java has no text
pipeline); engine-extension tier, SURVEY.md §2.D.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import textstats

UNK = "[UNK]"

# Words longer than this encode as a single [UNK] (the HF-WordPiece
# ``max_input_chars_per_word`` convention, and SentencePiece's own
# length caps): the engine's DP is O(L * lmax) and would take any
# length, but the ORACLE certifies it by exhaustively enumerating all
# <= 2^(L-1) segmentations per distinct word — an unchecked data
# assumption before this cap (ADVICE r14: one long alphanumeric word
# in a future corpus would blow the DuckDB enumeration up
# exponentially while the engine stayed polynomial). 16 chars = 32k
# paths worst-case per word, tractable forever; the corpus generator
# currently tops out at 8, so the cap is value-invisible on testdata
# and both engines carry it identically.
MAX_WORD_CHARS = 16

# Frozen scored vocabulary: ``fit_unigram(documents @ sf0.01,
# lmax=6, seed_size=120, n_multi=48, em_rounds=4, sample_pieces=10_000,
# min_char_count=40)`` — regenerate with ``python
# tools/freeze_unigram.py``. Frozen (not refit per run) so the
# exact-stream DuckDB oracle can replay the identical scored pieces;
# the runtime-fit path is certified separately by the
# ``unigram_vocab_fit`` contract row.
# pieces: 72
UNIGRAM_VOCAB_V1: list[tuple[str, float]] = [
    ('a', -2.6984616),
    ('al', -4.6205876),
    ('all', -4.4060143),
    ('ar', -21.3611069),
    ('as', -8.4593171),
    ('ash', -21.8708332),
    ('at', -7.2194976),
    ('atch', -19.9683593),
    ('b', -3.7111979),
    ('batc', -21.8814094),
    ('batch', -4.3551303),
    ('c', -4.3821691),
    ('can', -16.6090745),
    ('column', -4.3583356),
    ('cu', -24.1024068),
    ('cus', -23.0909949),
    ('cust', -23.715268),
    ('custo', -7.3629518),
    ('custom', -4.409165),
    ('d', -3.2850228),
    ('e', -2.4148287),
    ('er', -3.4696216),
    ('f', -4.44788),
    ('filt', -18.897541),
    ('filte', -18.1991566),
    ('filter', -4.359409),
    ('g', -2.7917739),
    ('h', -4.4643157),
    ('has', -21.8708332),
    ('hash', -4.3445541),
    ('i', -4.4224449),
    ('in', -3.7044948),
    ('j', -40.2199507),
    ('jo', -19.9054248),
    ('join', -4.3267209),
    ('k', -3.7156931),
    ('l', -3.1979028),
    ('ll', -12.69379),
    ('lu', -9.0819278),
    ('m', -3.6643701),
    ('ma', -12.6845913),
    ('me', -18.2235317),
    ('mer', -4.3837841),
    ('n', -19.6080112),
    ('o', -11.7539436),
    ('olumn', -21.3834161),
    ('omer', -22.8950455),
    ('or', -3.2994784),
    ('ow', -3.6785051),
    ('p', -4.3895492),
    ('pa', -15.2999599),
    ('par', -3.7266273),
    ('q', -4.42817),
    ('r', -3.9642643),
    ('ro', -4.4079536),
    ('row', -4.4037021),
    ('rt', -15.4607568),
    ('s', -2.9526396),
    ('scan', -4.3562013),
    ('st', -3.8743853),
    ('stomer', -18.0708928),
    ('t', -2.9026126),
    ('ta', -3.8955936),
    ('to', -10.104554),
    ('tomer', -22.2015498),
    ('u', -3.8427907),
    ('ue', -4.195043),
    ('ustom', -21.4342455),
    ('ustome', -20.7358611),
    ('v', -3.6972825),
    ('w', -4.3986044),
    ('y', -3.7207736),
]
LOGP_ROUND = 7     # frozen per-piece log-prob rounding (splice-size)
SCORE_ROUND = 6    # final per-word/document log-prob rounding
DEAD = -1.0e18     # unreachable-position sentinel (any real path beats it)
DEAD_FLOOR = -1.0e17

# _VITERBI_ORDER_NOTE: the DP compares candidate prefixes by the
# lexicographic triple (score DESC, n_tokens ASC, len-sequence-key
# DESC). Each component is preserved under extending both prefixes
# with the SAME piece (score: +same logp keeps >, and on = the next
# key decides; n: +1 both sides; key: appending the same fixed-width
# chunk to both strings preserves string order on equal-length keys —
# and keys compared at equal (score, n) reach equal CHAR positions
# with n fixed-width chunks, so they are equal length). A
# prefix-monotone total order makes the locally-best DP choice the
# globally-best path, which is what lets the oracle verify by
# enumerating complete paths instead of replaying the DP.


# ---------------------------------------------------------------- fit


def _substrings(word: str, lmax: int) -> list[str]:
    return [
        word[i : i + n]
        for i in range(len(word))
        for n in range(1, min(lmax, len(word) - i) + 1)
    ]


def _lattice(word: str, vocab: dict[str, float], lmax: int):
    """[(start0, end, piece)] arcs of the segmentation lattice
    (0-based start, exclusive end), sorted for deterministic
    iteration."""
    arcs = []
    for i in range(len(word)):
        for n in range(1, min(lmax, len(word) - i) + 1):
            p = word[i : i + n]
            if p in vocab:
                arcs.append((i, i + n, p))
    return arcs


def _forward_backward(
    word: str, wcount: int, probs: dict[str, float], lmax: int,
    expected: dict[str, float],
) -> float:
    """One word's E-step: accumulate expected piece counts over all
    segmentations (posterior-weighted), return its data likelihood
    contribution. Skips words with no complete segmentation."""
    L = len(word)
    arcs = _lattice(word, probs, lmax)
    alpha = [0.0] * (L + 1)
    alpha[0] = 1.0
    for i, j, p in arcs:  # arcs sorted by start: alpha fills in order
        alpha[j] += alpha[i] * probs[p]
    if alpha[L] <= 0.0:
        return 0.0
    beta = [0.0] * (L + 1)
    beta[L] = 1.0
    for i, j, p in reversed(arcs):
        beta[i] += probs[p] * beta[j]
    z = alpha[L]
    for i, j, p in arcs:
        post = alpha[i] * probs[p] * beta[j] / z
        expected[p] = expected.get(p, 0.0) + wcount * post
    return wcount * math.log(z)


def fit_unigram(
    docs: DataFrame,
    text_col: str = "text",
    lmax: int = 6,
    seed_size: int = 120,
    n_multi: int = 48,
    em_rounds: int = 4,
    sample_pieces: int = 10_000,
    min_char_count: int = 0,
) -> list[tuple[str, float]]:
    """Distributed word-frequency agg -> bounded driver-side EM.

    Returns the frozen-format vocabulary: [(piece, logp)] sorted by
    piece, logp rounded to LOGP_ROUND. Vocabulary = single chars with
    sample count >= min_char_count (rare-char truncation -> [UNK]
    reachability, as in :mod:`.wordpiece`) + the top ``n_multi``
    multi-char pieces by EM expected count (count desc, piece asc)."""
    rows = (
        docs.select(
            F.explode(textstats.bpe_tokens(F.col(text_col))).alias("w")
        )
        .groupBy("w")
        .count()
        .orderBy(F.desc("count"), F.asc("w"))
        .limit(sample_pieces)
        .collect()
    )
    counts = [(r["w"], r["count"]) for r in rows]
    return learn_unigram(
        counts, lmax, seed_size, n_multi, em_rounds, min_char_count
    )


def learn_unigram(
    word_counts: list[tuple[str, int]],
    lmax: int = 6,
    seed_size: int = 120,
    n_multi: int = 48,
    em_rounds: int = 4,
    min_char_count: int = 0,
) -> list[tuple[str, float]]:
    """Driver-side seed + EM + prune over a bounded word sample."""
    # --- seed: substring occurrence mass, chars always included
    sub_c: dict[str, int] = {}
    char_c: dict[str, int] = {}
    for w, c in word_counts:
        for s in _substrings(w, lmax):
            sub_c[s] = sub_c.get(s, 0) + c
        for ch in w:
            char_c[ch] = char_c.get(ch, 0) + c
    chars = {ch for ch, c in char_c.items() if c >= min_char_count}
    multi = sorted(
        ((s, c) for s, c in sub_c.items() if len(s) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(0, seed_size - len(chars))]
    seed = {s: float(c) for s, c in multi}
    seed.update({ch: float(char_c[ch]) for ch in chars})
    total = sum(seed.values())
    probs = {p: c / total for p, c in seed.items()}

    # --- EM over the sample lattices, prune halfway
    kept_multi: set[str] | None = None
    for r in range(em_rounds):
        expected: dict[str, float] = {}
        for w, c in word_counts:
            _forward_backward(w, c, probs, lmax, expected)
        # keep chars alive even when posterior mass starves them:
        # coverage is what bounds [UNK] to truncated chars only
        for ch in chars:
            expected.setdefault(ch, 1e-9)
        # ... and, once the prune has fixed the multi-piece roster,
        # keep THOSE alive on the same floor: a kept piece whose
        # posterior mass hits 0 in a post-prune round would otherwise
        # silently leave the vocabulary, making the fitted piece
        # count data-dependent below n_multi (ADVICE r14 — the
        # unigram_vocab_fit contract pins n_multi_pieces = n_multi,
        # which this floor now guarantees on every corpus, matching
        # the char-survival convention above).
        if kept_multi is not None:
            for p in kept_multi:
                expected.setdefault(p, 1e-9)
        if r == em_rounds // 2 - 1 or (em_rounds == 1 and r == 0):
            keep_multi = sorted(
                (
                    (p, c)
                    for p, c in expected.items()
                    if len(p) > 1
                ),
                key=lambda kv: (-kv[1], kv[0]),
            )[:n_multi]
            expected = dict(keep_multi) | {
                ch: expected.get(ch, 1e-9) for ch in chars
            }
            kept_multi = {p for p, _ in keep_multi}
        z = sum(expected.values())
        probs = {p: c / z for p, c in expected.items()}
    return sorted(
        (p, round(math.log(pr), LOGP_ROUND)) for p, pr in probs.items()
    )


# -------------------------------------------------------------- apply


def encode_word(
    word: str, vocab: dict[str, float], lmax: int | None = None
) -> tuple[list[str], float]:
    """Pure-Python reference Viterbi (tests/oracle design only):
    returns (pieces, score); ([UNK], 0.0) when no path covers the
    word. Tie order: score desc, n asc, zero-padded len-key desc."""
    if lmax is None:
        lmax = max((len(p) for p in vocab), default=0)
    L = len(word)
    # best[i] = (score, n, key, lens)
    best: list[tuple | None] = [None] * (L + 1)
    best[0] = (0.0, 0, "", [])
    for i in range(1, L + 1):
        cands = []
        for n in range(1, min(lmax, i) + 1):
            p = word[i - n : i]
            prev = best[i - n]
            if p in vocab and prev is not None:
                cands.append(
                    (
                        prev[0] + vocab[p],
                        prev[1] + 1,
                        prev[2] + f"{n:02d}",
                        prev[3] + [n],
                    )
                )
        if cands:
            best[i] = max(cands, key=lambda t: (t[0], -t[1], t[2]))
    if L == 0 or best[L] is None:
        return [UNK], 0.0
    pieces = []
    pos = L
    for n in reversed(best[L][3]):
        pieces.append(word[pos - n : pos])
        pos -= n
    return list(reversed(pieces)), round(best[L][0], SCORE_ROUND)


def _vocab_df(spark, vocab: list[tuple[str, float]]) -> DataFrame:
    return spark.createDataFrame(vocab, "piece string, logp double")


def word_viterbi(
    words: DataFrame,
    vocab: list[tuple[str, float]],
    word_col: str = "word",
) -> DataFrame:
    """Viterbi segmentation of each DISTINCT word under the scored
    vocabulary: (word, n_tokens int, is_unk boolean, pieces string,
    logprob double).

    One broadcast candidate join -> dense end-position candidate map
    -> forward fold (scores/backpointers as growing arrays) ->
    backward fold (argmax piece stream). All pure column expressions.
    """
    if not vocab:
        raise ValueError("empty unigram vocabulary")
    lmax = max(len(p) for p, _ in vocab)
    spark = words.sparkSession
    vdf = _vocab_df(spark, vocab)

    w = words.select(F.col(word_col).alias("word")).filter(
        F.length("word") > 0
    )
    cand = w.select(
        "word",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("endp"),
    ).select(
        "word",
        "endp",
        F.explode(
            F.sequence(F.lit(1), F.least(F.lit(lmax), F.col("endp")))
        ).alias("ln"),
    )
    matched = (
        cand.join(
            F.broadcast(vdf),
            F.expr("substring(word, endp - ln + 1, ln)")
            == F.col("piece"),
            "inner",
        )
        .groupBy("word", "endp")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ln", "logp", "piece"))
            ).alias("cands")
        )
    )
    hops = matched.groupBy("word").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("endp"), F.col("cands")))
        ).alias("endmap")
    )

    # forward pass: acc arrays are 1-indexed by position with slot 1
    # holding position 0 (the empty prefix)
    def _fwd(acc, i):
        cands = F.element_at(F.col("endmap"), i)
        scored = F.transform(
            F.coalesce(
                cands,
                F.array().cast(
                    "array<struct<ln:int,logp:double,piece:string>>"
                ),
            ),
            lambda c: F.struct(
                (
                    F.element_at(acc["sc"], i - c["ln"] + 1) + c["logp"]
                ).alias("score"),
                (
                    -(F.element_at(acc["n"], i - c["ln"] + 1) + 1)
                ).alias("negn"),
                F.concat(
                    F.element_at(acc["key"], i - c["ln"] + 1),
                    F.lpad(c["ln"].cast("string"), 2, "0"),
                ).alias("key"),
                c["ln"].alias("ln"),
            ),
        )
        best = F.array_max(scored)
        dead = best.isNull() | (best["score"] < F.lit(DEAD_FLOOR))
        return F.struct(
            F.concat(
                acc["sc"],
                F.array(
                    F.when(dead, F.lit(DEAD)).otherwise(best["score"])
                ),
            ).alias("sc"),
            F.concat(
                acc["n"],
                F.array(
                    F.when(dead, F.lit(0)).otherwise(-best["negn"])
                ),
            ).alias("n"),
            F.concat(
                acc["key"],
                F.array(F.when(dead, F.lit("")).otherwise(best["key"])),
            ).alias("key"),
            F.concat(
                acc["bp"],
                F.array(
                    F.when(dead, F.lit(0)).otherwise(best["ln"])
                ),
            ).alias("bp"),
        )

    init = F.struct(
        F.array(F.lit(0.0)).alias("sc"),
        F.array(F.lit(0)).alias("n"),
        F.array(F.lit("")).alias("key"),
        F.array().cast("array<int>").alias("bp"),
    )
    fwd = w.join(hops, "word", "left").select(
        "word",
        F.aggregate(
            F.sequence(F.lit(1), F.length("word")), init, _fwd
        ).alias("st"),
    )

    L1 = F.length("word") + 1  # terminal slot in the 1-indexed arrays
    term_score = F.element_at(F.col("st")["sc"], L1)
    unk = (term_score < F.lit(DEAD_FLOOR)) | (
        F.length("word") > F.lit(MAX_WORD_CHARS)
    )

    # backward pass: walk backpointers from the terminal position,
    # prepending pieces (positions are visited in descending order and
    # skipped unless the cursor is there — the wordpiece-walk trick,
    # reversed)
    def _bwd(acc, i):
        ln = F.element_at(F.col("st")["bp"], i)
        at_cursor = i == acc["cur"]
        piece = F.expr("word").substr(i - ln + 1, ln)
        return F.when(
            at_cursor,
            F.struct(
                (acc["cur"] - ln).alias("cur"),
                F.when(acc["toks"] == "", piece)
                .otherwise(F.concat(piece, F.lit(" "), acc["toks"]))
                .alias("toks"),
            ),
        ).otherwise(acc)

    binit = F.struct(
        F.length("word").alias("cur"), F.lit("").alias("toks")
    )
    out = fwd.select(
        "word",
        F.element_at(F.col("st")["n"], L1).alias("_n"),
        unk.alias("_unk"),
        F.when(
            unk, F.lit("")
        ).otherwise(
            F.aggregate(
                F.reverse(F.sequence(F.lit(1), F.length("word"))),
                binit,
                _bwd,
            )["toks"]
        ).alias("_toks"),
        F.round(term_score, SCORE_ROUND).alias("_score"),
    )
    return out.select(
        "word",
        F.when(F.col("_unk"), F.lit(1))
        .otherwise(F.col("_n"))
        .cast("int")
        .alias("n_tokens"),
        F.col("_unk").alias("is_unk"),
        F.when(F.col("_unk"), F.lit(UNK))
        .otherwise(F.col("_toks"))
        .alias("pieces"),
        F.when(F.col("_unk"), F.lit(0.0))
        .otherwise(F.col("_score"))
        .alias("logprob"),
    )


def encode_docs(
    df: DataFrame,
    vocab: list[tuple[str, float]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document unigram-LM stats: (id, n_words, n_tokens,
    n_unk_words, logprob, stream_md5). ``logprob`` is the word-order
    left fold of per-word Viterbi scores rounded to SCORE_ROUND (the
    DSIR per-document fold discipline); ``stream_md5`` digests the
    space-joined piece stream in word order. Empty documents keep a
    row with zero counts, 0.0, md5('')."""
    from ..session import ensure_min_partitions

    base = ensure_min_partitions(df).select(
        F.col(id_col),
        F.posexplode_outer(
            textstats.bpe_tokens(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("pos", "word"),
    )
    wt = word_viterbi(
        base.filter(F.col("word").isNotNull()).select("word").distinct(),
        vocab,
    )
    joined = base.join(wt, "word", "left")
    # ONE collect_list+sort per document, consumed by both the ordered
    # log-prob fold and the stream digest: two aggregate expressions
    # with identical collect_list children are NOT deduplicated by the
    # planner, and the duplicate buffer+sort read as ~2x agg cost in
    # the 10x scale probe.
    grouped = joined.groupBy(id_col).agg(
        F.count(F.col("word")).cast("int").alias("n_words"),
        F.coalesce(F.sum("n_tokens"), F.lit(0))
        .cast("int")
        .alias("n_tokens"),
        F.coalesce(
            F.sum(F.when(F.col("is_unk"), 1).otherwise(0)), F.lit(0)
        )
        .cast("int")
        .alias("n_unk_words"),
        F.array_sort(
            F.collect_list(F.struct("pos", "pieces", "logprob"))
        ).alias("_ord"),
    )
    return grouped.select(
        id_col,
        "n_words",
        "n_tokens",
        "n_unk_words",
        F.round(
            F.aggregate(
                F.col("_ord"),
                F.lit(0.0),
                lambda acc, s: acc
                + F.coalesce(s["logprob"], F.lit(0.0)),
            ),
            SCORE_ROUND,
        ).alias("logprob"),
        F.md5(
            F.array_join(
                F.transform(F.col("_ord"), lambda s: s["pieces"]), " "
            )
        ).alias("stream_md5"),
    )


# ------------------------------------------- subword regularization

# Exact double probabilities derived ONCE from the frozen log-probs
# (math.exp here; the plan oracle splices repr() of these same Python
# floats into its VALUES rows, so neither engine ever calls exp at
# runtime and libm rounding differences cannot exist by construction).
def vocab_probs(vocab: list[tuple[str, float]]) -> list[tuple[str, float, float]]:
    return [(p, lp, math.exp(lp)) for p, lp in vocab]


def _empty_cands():
    return F.array().cast(
        "array<struct<ln:int,prob:double,piece:string>>"
    )


def sample_word_tokens(
    words: DataFrame,
    vocab: list[tuple[str, float]],
    seed: int | str = 0,
    word_col: str = "word",
) -> DataFrame:
    """SAMPLE one segmentation per distinct word from the exact
    unigram posterior P(seg | word) ∝ Π p(piece) — subword
    regularization (Kudo ACL'18 §4), the training-time counterpart of
    :func:`word_viterbi`'s argmax, as deterministic
    forward-filtering / backward-sampling:

    - **forward**: alpha[j] = Σ over arcs (j-ln, j, piece) of
      alpha[j-ln] * p(piece) — one fold per word, inner sums in
      ln-ascending order (the association the oracle replays).
    - **backward**: from the word end, choose the arc whose
      cumulative weight interval [cum - w, cum) brackets
      t = u * alpha[endp], where u is the content-hash uniform of
      (word, endp) — exactly the FFBS conditional, and because every
      bracketing quantity is static per (word, position), the chosen
      arc table is precomputable RELATIONALLY and the sample itself is
      the same functional-graph hop walk the WordPiece path uses.
      Dead arcs (alpha[j-ln] = 0) carry zero width and can never
      bracket t; a word with alpha[L] = 0 has no bracketing arc at L
      and falls out as [UNK].

    Deterministic across runs, partitionings, and engines: uniforms
    are md5-derived, probabilities are spliced literals, and every
    float add/multiply happens in a stated order.

    Output: (word, n_tokens int, is_unk boolean, pieces string).
    """
    if not vocab:
        raise ValueError("empty unigram vocabulary")
    from .sampling import BUCKETS, sample_bucket

    lmax = max(len(p) for p, _ in vocab)
    spark = words.sparkSession
    vdf = spark.createDataFrame(
        vocab_probs(vocab), "piece string, logp double, prob double"
    )
    w = words.select(F.col(word_col).alias("word")).filter(
        F.length("word") > 0
    )
    cand = w.select(
        "word",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("endp"),
    ).select(
        "word",
        "endp",
        F.explode(
            F.sequence(F.lit(1), F.least(F.lit(lmax), F.col("endp")))
        ).alias("ln"),
    )
    arcs = cand.join(
        F.broadcast(vdf),
        F.expr("substring(word, endp - ln + 1, ln)") == F.col("piece"),
        "inner",
    )
    matched = arcs.groupBy("word", "endp").agg(
        F.array_sort(
            F.collect_list(F.struct("ln", "prob", "piece"))
        ).alias("cands")
    )
    hops0 = matched.groupBy("word").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("endp"), F.col("cands")))
        ).alias("endmap")
    )
    base = w.join(hops0, "word", "left")

    def _cands_at(i):
        return F.coalesce(
            F.element_at(F.col("endmap"), i), _empty_cands()
        )

    # forward: acc IS the 1-indexed alphas array (al[k] = alpha_{k-1})
    al = F.aggregate(
        F.sequence(F.lit(1), F.length("word")),
        F.array(F.lit(1.0)),
        lambda al_, i: F.concat(
            al_,
            F.array(
                F.aggregate(
                    F.transform(
                        _cands_at(i),
                        lambda c: F.element_at(al_, i - c["ln"] + 1)
                        * c["prob"],
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ),
        ),
    )
    fwd = base.select("word", F.col("endmap"), al.alias("al"))

    def _sel_at(i):
        """Chosen-arc struct for position i (done=false when no arc
        brackets, i.e. alpha[i] = 0 or no arcs end here)."""
        wl = F.transform(
            _cands_at(i),
            lambda c: F.struct(
                (
                    F.element_at(F.col("al"), i - c["ln"] + 1)
                    * c["prob"]
                ).alias("cum"),
                c["ln"].alias("ln"),
                c["piece"].alias("piece"),
                F.lit(False).alias("done"),
            ),
        )
        total = F.aggregate(
            wl, F.lit(0.0), lambda a, x: a + x["cum"]
        )
        u = (
            sample_bucket(
                F.concat_ws(":", F.col("word"), i.cast("string")), seed
            )
            + F.lit(0.5)
        ) / F.lit(float(BUCKETS))
        t = u * total
        zero = F.struct(
            F.lit(0.0).alias("cum"),
            F.lit(0).alias("ln"),
            F.lit("").alias("piece"),
            F.lit(False).alias("done"),
        )
        return F.aggregate(
            wl,
            zero,
            lambda a, x: F.when(a["done"], a).otherwise(
                F.when(
                    (a["cum"] + x["cum"]) > t,
                    F.struct(
                        (a["cum"] + x["cum"]).alias("cum"),
                        x["ln"].alias("ln"),
                        x["piece"].alias("piece"),
                        F.lit(True).alias("done"),
                    ),
                ).otherwise(
                    F.struct(
                        (a["cum"] + x["cum"]).alias("cum"),
                        F.lit(0).alias("ln"),
                        F.lit("").alias("piece"),
                        F.lit(False).alias("done"),
                    )
                )
            ),
        )

    hoparr = F.transform(
        F.sequence(F.lit(1), F.length("word")), _sel_at
    )
    staged = fwd.select("word", hoparr.alias("hops"))

    # backward hop walk (descending positions; skip unless at cursor)
    def _bwd(acc, i):
        h = F.element_at(F.col("hops"), i)
        at_cursor = (i == acc["cur"]) & (acc["cur"] > 0)
        return F.when(
            at_cursor & h["done"],
            F.struct(
                (acc["cur"] - h["ln"]).alias("cur"),
                (acc["n"] + 1).alias("n"),
                F.when(acc["toks"] == "", h["piece"])
                .otherwise(F.concat(h["piece"], F.lit(" "), acc["toks"]))
                .alias("toks"),
            ),
        ).otherwise(acc)

    binit = F.struct(
        F.length("word").alias("cur"),
        F.lit(0).alias("n"),
        F.lit("").alias("toks"),
    )
    out = staged.select(
        "word",
        F.aggregate(
            F.reverse(F.sequence(F.lit(1), F.length("word"))),
            binit,
            _bwd,
        ).alias("st"),
    )
    unk = (F.col("st")["cur"] != 0) | (
        F.length("word") > F.lit(MAX_WORD_CHARS)
    )
    return out.select(
        "word",
        F.when(unk, F.lit(1))
        .otherwise(F.col("st")["n"])
        .cast("int")
        .alias("n_tokens"),
        unk.alias("is_unk"),
        F.when(unk, F.lit(UNK))
        .otherwise(F.col("st")["toks"])
        .alias("pieces"),
    )


def sample_docs(
    df: DataFrame,
    vocab: list[tuple[str, float]],
    seed: int | str = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document sampled-segmentation stats: (id, n_words,
    n_tokens, n_unk_words, stream_md5) under one FFBS draw per
    distinct word (the draw is keyed by word content, so repeated
    words share their sample within a run — the per-epoch reseeding a
    trainer does is the ``seed`` argument)."""
    from ..session import ensure_min_partitions

    base = ensure_min_partitions(df).select(
        F.col(id_col),
        F.posexplode_outer(
            textstats.bpe_tokens(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("pos", "word"),
    )
    wt = sample_word_tokens(
        base.filter(F.col("word").isNotNull()).select("word").distinct(),
        vocab,
        seed,
    )
    joined = base.join(wt, "word", "left")
    grouped = joined.groupBy(id_col).agg(
        F.count(F.col("word")).cast("int").alias("n_words"),
        F.coalesce(F.sum("n_tokens"), F.lit(0))
        .cast("int")
        .alias("n_tokens"),
        F.coalesce(
            F.sum(F.when(F.col("is_unk"), 1).otherwise(0)), F.lit(0)
        )
        .cast("int")
        .alias("n_unk_words"),
        F.array_sort(
            F.collect_list(F.struct("pos", "pieces"))
        ).alias("_ord"),
    )
    return grouped.select(
        id_col,
        "n_words",
        "n_tokens",
        "n_unk_words",
        F.md5(
            F.array_join(
                F.transform(F.col("_ord"), lambda s: s["pieces"]), " "
            )
        ).alias("stream_md5"),
    )
