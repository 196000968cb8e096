"""WordPiece tokenization: likelihood-scored fit, greedy
longest-match-first application (Schuster & Nakajima 2012; Wu et al.
2016 §4.1; the BERT tokenizer's published algorithm).

WordPiece differs from BPE (:mod:`.bpe`) on BOTH halves, which is why
it is a separate operator rather than a parameterization:

- **Fit** picks the merge maximizing the training-data LIKELIHOOD
  gain ``count(ab) / (count(a) * count(b))``, not the raw pair count.
- **Apply** is greedy longest-match-first per word against the final
  VOCABULARY (the merge table is discarded after training), with
  continuation pieces prefixed ``##`` and any word containing an
  unmatchable position collapsing to a single ``[UNK]`` token.

Spark-first shape (both halves):

- **Fit** mirrors :func:`.bpe.fit_bpe`: ONE distributed explode+agg
  builds word frequencies, only the top ``sample_pieces`` distinct
  words (count desc, word asc — total order) are collected, and the
  scored-merge loop runs on that bounded dictionary driver-side in
  milliseconds. Merge selection compares scores by INTEGER
  cross-multiplication (``pc_x * sa_y * sb_y`` vs ``pc_y * sa_x *
  sb_x``), never by float division, so the fit contract's
  SQL-derivable argmax cannot drift on a rounding tie.
- **Apply** tokenizes each DISTINCT word once, relationally, and
  joins the result back to the corpus — tokenization is a pure
  function of the word, and a 100 TB corpus holds orders of magnitude
  fewer distinct words than word occurrences (the same amortization
  the pandas BPE tier gets from its per-piece cache, obtained here
  with zero Python):

  1. candidate windows: every (start, len<=Lmax) substring of each
     distinct word, one broadcast hash join against the vocabulary
     (start pieces match only at position 1, ``##`` continuations
     only past it);
  2. the greedy cursor walk folds ONCE per word over a dense
     position->longest-match map (``F.aggregate`` — pure JVM, O(|w|)
     per word, no per-step vocabulary probes);
  3. per-document stats regroup the walked words by (doc, position)
     with an order-fixed fold, digesting the exact token stream.

  The DuckDB oracle replays candidates and the per-document regroup
  as plain SQL and the cursor walk as a recursive CTE keyed by word
  (depth = max tokens in one word), so counts AND the emitted piece
  stream are hash-exact.

No counterpart in the reference repo (LogAnalysis.java has no text
pipeline); engine-extension tier, SURVEY.md §2.D.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import textstats

UNK = "[UNK]"

# Frozen vocabulary: ``fit_wordpiece(documents @ sf0.01, n_merges=32,
# sample_pieces=10_000, min_char_count=40)`` — regenerate with
# ``python tools/freeze_wordpiece.py``. Frozen (not refit per run) so
# the exact-stream DuckDB oracle can replay the identical vocabulary;
# the runtime-fit path is certified separately by the
# ``wordpiece_vocab_fit`` contract row. min_char_count prunes rare
# single chars from the vocabulary (real WordPiece vocabs are
# truncated the same way), so corpus words touching a pruned char
# exercise the [UNK] path under the frozen contract.
WORDPIECE_VOCAB_V1: list[str] = [
    '##a',
    '##b',
    '##bl',
    '##c',
    '##ch',
    '##d',
    '##e',
    '##g',
    '##h',
    '##i',
    '##in',
    '##k',
    '##l',
    '##lu',
    '##lum',
    '##lumn',
    '##m',
    '##n',
    '##o',
    '##oin',
    '##olumn',
    '##p',
    '##r',
    '##s',
    '##sh',
    '##st',
    '##t',
    '##tch',
    '##u',
    '##up',
    '##us',
    '##w',
    '##y',
    'a',
    'ag',
    'agg',
    'b',
    'bi',
    'big',
    'c',
    'column',
    'cus',
    'cust',
    'd',
    'f',
    'fi',
    'fil',
    'filt',
    'g',
    'h',
    'j',
    'join',
    'k',
    'l',
    'li',
    'lin',
    'm',
    'o',
    'p',
    'q',
    'qu',
    'r',
    's',
    'sp',
    't',
    'th',
    'v',
    'w',
    'wi',
    'win',
    'wind',
]


def _split(word: str) -> list[str]:
    """Initial WordPiece symbol split: first char bare, rest ##-ed."""
    return [word[0]] + ["##" + c for c in word[1:]] if word else []


def _raw(piece: str) -> str:
    return piece[2:] if piece.startswith("##") else piece


def _merge_sym(a: str, b: str) -> str:
    """Merged symbol keeps a's continuation marker: (##x, ##y)->##xy,
    (x, ##y)->xy."""
    return a + _raw(b)


def learn_wordpiece(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Likelihood-scored merge learning over a (word -> count) sample.

    Each round merges the adjacent symbol pair maximizing
    ``count(ab) / (count(a) * count(b))``; ties break on the
    lexicographically smallest (left, right). Scores compare by
    integer cross-multiplication (exact; no float division), the same
    total order the fit-contract oracle states in SQL with DOUBLE
    division — safe there because a double tie implies an integer tie
    on sample-bounded counts far below 2^53.
    """
    vocab: dict[tuple[str, ...], int] = {}
    for word, cnt in word_counts:
        key = tuple(_split(word))
        if key:
            vocab[key] = vocab.get(key, 0) + cnt
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_c: dict[tuple[str, str], int] = {}
        sym_c: dict[str, int] = {}
        for seq, cnt in vocab.items():
            for s in seq:
                sym_c[s] = sym_c.get(s, 0) + cnt
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pair_c[p] = pair_c.get(p, 0) + cnt
        best: tuple[str, str] | None = None
        for p, pc in pair_c.items():
            if best is None:
                best = p
                continue
            bpc = pair_c[best]
            # score(p) > score(best) by integer cross-multiplication
            lhs = pc * sym_c[best[0]] * sym_c[best[1]]
            rhs = bpc * sym_c[p[0]] * sym_c[p[1]]
            if lhs > rhs or (lhs == rhs and p < best):
                best = p
        if best is None:
            break
        merges.append(best)
        a, b = best
        merged = _merge_sym(a, b)
        new_vocab: dict[tuple[str, ...], int] = {}
        for seq, cnt in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    return merges


def vocab_from_merges(
    word_counts: list[tuple[str, int]],
    merges: list[tuple[str, str]],
    min_char_count: int = 0,
) -> list[str]:
    """Final vocabulary = every merge OUTPUT plus the single-char
    symbols whose sample occurrence count reaches ``min_char_count``
    (rare-char truncation — the published vocabs do the same, which is
    what makes [UNK] reachable). Sorted for a stable freeze."""
    char_c: dict[str, int] = {}
    for word, cnt in word_counts:
        for s in _split(word):
            char_c[s] = char_c.get(s, 0) + cnt
    out = {s for s, c in char_c.items() if c >= min_char_count}
    out.update(_merge_sym(a, b) for a, b in merges)
    return sorted(out)


def fit_wordpiece(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 32,
    sample_pieces: int = 10_000,
    min_char_count: int = 0,
) -> tuple[list[tuple[str, str]], list[str]]:
    """Distributed word-frequency agg -> bounded driver-side scored
    merge loop (the :func:`.bpe.fit_bpe` pattern). Returns
    (merges, vocabulary)."""
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
    merges = learn_wordpiece(counts, n_merges)
    return merges, vocab_from_merges(counts, merges, min_char_count)


# -------------------------------------------------------------- apply


def encode_word(word: str, vocab: set[str]) -> list[str]:
    """Pure-Python reference application (tests/oracle design only):
    greedy longest-match-first; any unmatched position -> [UNK]."""
    out: list[str] = []
    pos = 0
    while pos < len(word):
        end = len(word)
        piece = None
        while end > pos:
            cand = word[pos:end]
            if pos > 0:
                cand = "##" + cand
            if cand in vocab:
                piece = cand
                break
            end -= 1
        if piece is None:
            return [UNK]
        out.append(piece)
        pos = end
    return out


def _vocab_df(spark, vocab: list[str]) -> DataFrame:
    """(raw, piece, is_cont) vocabulary frame — broadcast-sized by
    construction (a vocabulary is a config artifact, not data)."""
    rows = [(_raw(p), p, p.startswith("##")) for p in vocab]
    return spark.createDataFrame(
        rows, "raw string, piece string, is_cont boolean"
    )


def word_tokens(
    words: DataFrame, vocab: list[str], word_col: str = "word"
) -> DataFrame:
    """Greedy longest-match tokenization of each DISTINCT word.

    Input: a frame of distinct words. Output: (word, n_tokens int,
    is_unk boolean, pieces string) where ``pieces`` is the
    space-joined emitted piece stream (``[UNK]`` alone for
    unmatchable words).

    Candidate windows explode |w| starts x Lmax lengths per word and
    broadcast-join the vocabulary; the greedy cursor walk is ONE
    ``F.aggregate`` fold per word over the dense position->hop map.
    """
    if not vocab:
        raise ValueError("empty WordPiece vocabulary")
    lmax = max(len(_raw(p)) for p in vocab)
    spark = words.sparkSession
    vdf = _vocab_df(spark, vocab)

    w = words.select(F.col(word_col).alias("word")).filter(
        F.length("word") > 0
    )
    cand = w.select(
        "word",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("start"),
    ).select(
        "word",
        "start",
        F.explode(
            F.sequence(
                F.lit(1),
                F.least(
                    F.lit(lmax), F.length("word") - F.col("start") + 1
                ),
            )
        ).alias("len"),
    )
    matched = (
        cand.join(
            F.broadcast(vdf),
            (
                F.expr("substring(word, start, len)") == F.col("raw")
            )
            & (F.col("is_cont") == (F.col("start") > 1)),
            "inner",
        )
        # longest match per (word, start); piece rides along
        .groupBy("word", "start")
        .agg(F.max(F.struct(F.col("len"), F.col("piece"))).alias("hop"))
    )
    hops = matched.groupBy("word").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("start"), F.col("hop")))
        ).alias("hopmap")
    )
    walked = w.join(hops, "word", "left").select(
        "word",
        F.aggregate(
            F.sequence(F.lit(1), F.length("word")),
            F.struct(
                F.lit(1).alias("pos"),
                F.lit(0).alias("n"),
                F.lit(False).alias("unk"),
                F.lit("").alias("toks"),
            ),
            lambda acc, i: F.when(
                acc["unk"] | (i != acc["pos"]), acc
            ).otherwise(
                F.when(
                    F.col("hopmap").isNull()
                    | F.element_at(F.col("hopmap"), i).isNull(),
                    F.struct(
                        (F.length("word") + 1).alias("pos"),
                        F.lit(0).alias("n"),
                        F.lit(True).alias("unk"),
                        F.lit("").alias("toks"),
                    ),
                ).otherwise(
                    F.struct(
                        (
                            acc["pos"]
                            + F.element_at(F.col("hopmap"), i)["len"]
                        ).alias("pos"),
                        (acc["n"] + 1).alias("n"),
                        F.lit(False).alias("unk"),
                        F.concat_ws(
                            " ",
                            acc["toks"],
                            F.element_at(F.col("hopmap"), i)["piece"],
                        ).alias("toks"),
                    )
                )
            ),
        ).alias("st"),
    )
    return walked.select(
        "word",
        F.when(F.col("st")["unk"], F.lit(1))
        .otherwise(F.col("st")["n"])
        .cast("int")
        .alias("n_tokens"),
        F.col("st")["unk"].alias("is_unk"),
        F.when(F.col("st")["unk"], F.lit(UNK))
        .otherwise(F.ltrim(F.col("st")["toks"]))
        .alias("pieces"),
    )


def encode_docs(
    df: DataFrame,
    vocab: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document WordPiece stats under ``vocab``:
    (id, n_words, n_tokens, n_unk_words, stream_md5) where stream_md5
    digests the space-joined piece stream across the document in word
    order ([UNK] standing in for unmatchable words). Empty documents
    keep a row with zero counts and md5('').

    Tokenizes each distinct word ONCE (word_tokens), then one shuffle
    join back to word occurrences and one order-fixed per-document
    fold — corpus text is scanned once and never carries piece strings
    wider than a word."""
    from ..session import ensure_min_partitions

    base = ensure_min_partitions(df).select(
        F.col(id_col),
        F.posexplode_outer(
            textstats.bpe_tokens(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("pos", "word"),
    )
    wt = word_tokens(
        base.filter(F.col("word").isNotNull()).select("word").distinct(),
        vocab,
    )
    joined = base.join(wt, "word", "left")
    return joined.groupBy(id_col).agg(
        F.count(F.col("word")).cast("int").alias("n_words"),
        F.coalesce(F.sum("n_tokens"), F.lit(0))
        .cast("int")
        .alias("n_tokens"),
        F.coalesce(
            F.sum(F.when(F.col("is_unk"), 1).otherwise(0)), F.lit(0)
        )
        .cast("int")
        .alias("n_unk_words"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "pieces"))
                    ),
                    lambda s: s["pieces"],
                ),
                " ",
            )
        ).alias("stream_md5"),
    )
