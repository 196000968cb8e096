"""Real byte-pair-encoding: learned merge tables, applied natively.

Upgrades the BPE-ish regex *counter* (``textstats.bpe_token_stats``)
to actual merge-table BPE (Sennrich et al. 2016, the public GPT-2
application loop): pre-tokenize with :data:`textstats.BPE_TOKEN_REGEX`,
split each piece into characters, then apply merges in rank order.

Spark-first design — both halves avoid Python in the hot path:

- **Fit** (:func:`fit_bpe`) is driver-side over a BOUNDED sample, like
  the IVF centroid fit (``similarity.py``): piece frequencies come from
  one distributed explode+agg, only the top ``sample_pieces`` distinct
  pieces (count desc, piece asc — total order) are collected, and the
  classic pair-count/merge loop runs on that dictionary in
  milliseconds. 100 TB of text changes the agg, not the collect bound.
- **Apply** (:func:`merge_chain`) is a pure column expression: each
  piece is wrapped into a delimited char string (``\\x1f c \\x1f`` per
  char) and each merge ``(a, b) -> ab`` becomes one literal
  ``replace('\\x1fa\\x1f\\x1fb\\x1f' -> '\\x1fab\\x1f')``. String
  ``replace`` scans left-to-right over non-overlapping matches —
  exactly the greedy within-piece merge order of the reference BPE
  loop — so a chain of N replaces in rank order IS merge-table
  application, JVM-side, codegen-friendly, zero Python per row. (For a
  learned table, rank-sequential application equals the classic
  lowest-rank-first loop: a merge's parts are single chars or outputs
  of strictly earlier merges, so later merges can never create an
  occurrence of an earlier pair.)

The same wrapped-string representation is reproducible verbatim in
DuckDB (``plans/llm_text.py``), giving an EXACT oracle for token
counts and the encoded token stream itself. :func:`encode` is the
pure-Python reference used by unit tests to certify the expression
chain against an independent implementation.

No counterpart in the reference repo (LogAnalysis.java has no text
pipeline); this is part of the LLM-training-data extension tier.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import textstats

# Unit separator: cannot appear in piece text (pieces come from
# BPE_TOKEN_REGEX over delimiter-scrubbed text; see scrub in callers).
DELIM = "\x1f"

# Frozen merge table: ``fit_bpe(documents @ sf0.01, n_merges=48,
# sample_pieces=10_000)`` — regenerate with ``python tools/freeze_bpe.py``.
# Frozen (not refit per run) so the exact-token DuckDB oracle can
# replay the identical table; the runtime-fit path is certified
# separately by the ``bpe_vocab_fit`` contract query.
BPE_MERGES_V1: list[tuple[str, str]] = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"),
    ("s", "mall"), ("g", "e"), ("l", "ow"), ("mer", "ge"),
    ("s", "low"), ("c", "t"), ("ct", "or"), ("d", "er"),
    ("e", "ctor"), ("or", "der"), ("v", "ector"),
]


# ---------------------------------------------------------------- fit

def learn_merges(
    piece_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE learning over a (piece -> occurrence count) sample.

    Deterministic: the best pair each round is max count, ties broken
    by lexicographically smallest (left, right) — the same total order
    the DuckDB fit-contract oracle states in SQL.
    """
    vocab: dict[tuple[str, ...], int] = {}
    for piece, cnt in piece_counts:
        key = tuple(piece)
        vocab[key] = vocab.get(key, 0) + cnt
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for seq, cnt in vocab.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {
            tuple(_merge_seq(seq, best)): cnt for seq, cnt in vocab.items()
        }
    return merges


def _merge_seq(seq: tuple[str, ...], pair: tuple[str, str]) -> list[str]:
    """One greedy left-to-right non-overlapping merge pass."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def fit_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 16,
    sample_pieces: int = 10_000,
) -> list[tuple[str, str]]:
    """Learn a merge table from a corpus — driver-side over a BOUNDED
    sample (the only collect; same pattern as the IVF fit).

    The sample is the ``sample_pieces`` most frequent distinct pieces
    (count desc, piece asc — a total order, so the cut is deterministic
    on both engines). At 100 TB the explode+agg is the distributed
    work; the collected dictionary stays <= sample_pieces rows.
    """
    rows = (
        docs.select(
            F.explode(
                textstats.bpe_tokens(_scrubbed(F.col(text_col)))
            ).alias("piece")
        )
        .groupBy("piece")
        .count()
        .orderBy(F.desc("count"), F.asc("piece"))
        .limit(sample_pieces)
        .collect()
    )
    return learn_merges([(r["piece"], r["count"]) for r in rows], n_merges)


# -------------------------------------------------------------- apply

def encode(piece: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python reference application (tests / oracles only):
    rank-sequential greedy merge passes over the character split."""
    seq: list[str] = list(piece)
    for pair in merges:
        if len(seq) < 2:
            break
        seq = _merge_seq(tuple(seq), pair)
    return seq


def _scrubbed(col: Column) -> Column:
    """Drop any literal delimiter chars from hostile input so the
    wrapped representation stays unambiguous (no-op on normal text;
    the DuckDB twin applies the same replace)."""
    return F.replace(col, F.lit(DELIM), F.lit(""))


def wrap_expr(piece: Column) -> Column:
    """Piece -> delimited char string: ``abc`` -> ``\\x1fa\\x1f\\x1fb
    \\x1f\\x1fc\\x1f`` (every token wrapped on both sides, so merge
    patterns are full-token anchored and a match consumes no shared
    delimiter — overlap-safe).

    Dot-all ``(?s)``: Java's plain ``.`` excludes line terminators
    U+0085/U+2028/U+2029, which BPE_TOKEN_REGEX admits as single-char
    pieces — without (?s) such a piece stays unwrapped and counts as
    zero tokens (r8 advisory). The DuckDB twin (_bpe_chain_sql) carries
    the same flag so both engines wrap every char unconditionally."""
    return F.regexp_replace(piece, "(?s)(.)", DELIM + "$1" + DELIM)


def merge_chain(wrapped: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply the merge table: one literal replace per merge, in rank
    order — the native-expression form of BPE application."""
    out = wrapped
    for a, b in merges:
        out = F.replace(
            out,
            F.lit(DELIM + a + DELIM + DELIM + b + DELIM),
            F.lit(DELIM + a + b + DELIM),
        )
    return out


def token_count_expr(encoded: Column) -> Column:
    """Tokens in a wrapped encoded string: every token carries exactly
    two delimiters, so count = (len - len_without_delims) / 2."""
    return (
        (
            F.length(encoded)
            - F.length(F.replace(encoded, F.lit(DELIM), F.lit("")))
        )
        / F.lit(2)
    ).cast("int")


def doc_token_count(text: Column, merges: list[tuple[str, str]]) -> Column:
    """Per-document REAL-BPE token count as one column expression —
    the measure downstream packing/budget arithmetic should use when
    chunks are denominated in trained-tokenizer tokens rather than
    whitespace words. (Callers feeding a single-file local scan should
    widen it first — see session.ensure_min_partitions — or the
    replace chain serializes onto one core.)"""
    pieces = textstats.bpe_tokens(_scrubbed(text))
    return F.aggregate(
        F.transform(
            pieces,
            lambda p: token_count_expr(merge_chain(wrap_expr(p), merges)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )


# Native-chain depth ceiling, MEASURED (local[32], Spark 4.1.2,
# default driver stack): the chain works at 320 merges and dies at 384
# with a driver-side StackOverflowError inside the analyzer's
# recursive Column-tree conversion (ColumnNodeToExpressionConverter) —
# and the exact failure depth varies with thread-stack state, so the
# dispatch threshold keeps ~3x margin below the shallowest observed
# failure. Below the threshold the chain is pure JVM codegen (the fast
# path); above it :func:`token_digests` switches to the Arrow-batched
# pandas tier, which has no depth limit.
BPE_NATIVE_CHAIN_MAX = 128


def digit_merges(n: int = 1024) -> list[tuple[str, str]]:
    """Constructed well-formed merge table for the large-vocab tier:
    every 2-digit pair merge (100, rank order by value), then every
    3-digit extension (1000) — parts are single chars or earlier
    outputs, outputs distinct, so all application-order equivalences
    hold (test_property_encode_equivalences' well-formedness).

    Constructed rather than learned because the synthetic documents
    corpus SATURATES a learned fit at 89 merges — the pair loop goes
    dry once every sampled piece is fully merged — while digit runs in
    the same corpus genuinely match this table, so throughput probes
    exercise real replace work at realistic depth. (Deep LEARNED
    tables are covered separately: the staircase corpus below supports
    a provable 768-merge end-to-end fit — ``bpe_learned_deep``.)"""
    digits = "0123456789"
    out = [(a, b) for a in digits for b in digits]
    out += [(x + y, c) for x in digits for y in digits for c in digits]
    # 4-digit extensions ('abc', 'd') — enough table for probes in the
    # 1k-4k range a realistic tokenizer occupies
    out += [
        (x + y + z, c)
        for x in digits
        for y in digits
        for z in digits
        for c in digits
    ]
    if n > len(out):
        raise ValueError(f"digit_merges supports up to {len(out)} merges")
    return out[:n]


# --- staircase corpus: a LEARNED deep merge table (round 10) -----------
#
# The natural documents corpus saturates fit_bpe at 89 merges (its
# sampled vocabulary fully merges and the pair loop goes dry), so deep
# LEARNED tables need a corpus engineered with enough pair mass. The
# staircase corpus is that corpus, built from a closed integer formula
# (replicable verbatim in DuckDB) whose BPE merge sequence is PROVABLE:
#
# - Tier 1: STAIR_T1 distinct 2-char pieces p_i = X_i Y_i with X from
#   'a'..'t' (i DIV 26) and Y from 'A'..'Z' (i % 26) — the two halves
#   come from DISJOINT alphabets. Piece i occurs STAIR_C1 - i times.
# - Tier 2: STAIR_T2 4-char pieces q_j = p_{2j} || p_{2j+1} (each
#   tier-1 piece is used by EXACTLY ONE tier-2 piece). Piece j occurs
#   STAIR_C2 - j times.
#
# Why the learned sequence is exactly tier-1-in-i-order then
# tier-2-in-j-order:
#
# 1. A tier-1 pair (X_i, Y_i) is (lower, UPPER); a tier-2 cross pair
#    (Y_{2j}, X_{2j+1}) is (UPPER, lower) — alphabet disjointness means
#    NO cross pair can alias a tier-1 pair, so pair (X_i, Y_i)'s exact
#    count is c(i) = (STAIR_C1 - i) + (STAIR_C2 - i DIV 2): its own
#    occurrences plus the one tier-2 piece containing it. c is strictly
#    decreasing in i (consecutive diffs -1 / -2), so NO TIES and the
#    argmax walks i = 0, 1, 2, ...
# 2. Every other pair present at any point before tier-1 completes —
#    cross pairs, and the emergent (p_{2j}, X_{2j+1}) after p_{2j}
#    merges — has count STAIR_C2 - j <= STAIR_C2, strictly below the
#    tier-1 minimum c(T1-1) = (STAIR_C1 - T1 + 1) + 1, so none of them
#    ever wins before all tier-1 merges are done.
# 3. After tier-1, each q_j is the 2-token sequence [p_{2j}, p_{2j+1}]
#    (crosses vanished with their right halves); the only remaining
#    pairs are the distinct (p_{2j}, p_{2j+1}) with strictly-decreasing
#    counts STAIR_C2 - j — merged in j order, each a DEPTH-2 chained
#    merge (both parts are earlier merge outputs). Then the vocabulary
#    is fully merged and the fit goes dry: requesting more merges than
#    STAIR_T1 + STAIR_T2 certifies saturation at exactly that count.
#
# learn_merges on the formula's piece counts reproduces this sequence
# exactly (asserted in tests/test_bpe.py); the ORACLE's merge table is
# spliced from expected_stair_merges() — the FORMULA, never the fit —
# so a fit regression changes the applied table and every stream md5.

STAIR_T1 = 512
STAIR_T2 = 256
STAIR_C1 = 770
STAIR_C2 = 256
STAIR_DOCS = 512
# total word occurrences: sum(C1-i) + sum(C2-j) = 296,320
STAIR_T1_OCC = STAIR_T1 * STAIR_C1 - STAIR_T1 * (STAIR_T1 - 1) // 2


def stair_piece(i: int) -> str:
    """Tier-1 piece i — the closed formula (mirrored in SQL by the
    oracle's chr() arithmetic)."""
    return chr(97 + i // 26) + chr(65 + i % 26)


def expected_stair_merges() -> list[tuple[str, str]]:
    """The PROVEN merge sequence of the staircase corpus, stated from
    the formula (see the construction proof above) — what the oracle
    splices, and what fit_bpe must reproduce."""
    t1 = [(stair_piece(i)[0], stair_piece(i)[1]) for i in range(STAIR_T1)]
    t2 = [
        (stair_piece(2 * j), stair_piece(2 * j + 1)) for j in range(STAIR_T2)
    ]
    return t1 + t2


def staircase_corpus(spark) -> DataFrame:
    """Materialize the staircase corpus as (doc_id, text): one row per
    word occurrence from the two tier ramps, deterministically dealt
    into STAIR_DOCS documents (doc = occurrence index mod docs, words
    ordered by index within each doc — DuckDB restates the identical
    dealing with generate_series + string_agg ORDER BY).

    Scale shape: generation is two range-explodes (no driver data), the
    group-by shuffles one small (idx, word) row per occurrence, and the
    downstream fit is the usual bounded-sample collect. A bigger
    corpus is a constant change, not a plan change."""
    x = "char(97 + (i DIV 26))"
    y = "char(65 + (i % 26))"
    t1 = (
        spark.range(STAIR_T1)
        .selectExpr("id AS i")
        .selectExpr(
            "i",
            f"explode(sequence(0, {STAIR_C1 - 1} - i)) AS c",
        )
        .selectExpr(
            f"i * {STAIR_C1} - (i * (i - 1)) DIV 2 + c AS idx",
            f"{x} || {y} AS word",
        )
    )
    xa = "char(97 + ((2*j) DIV 26))"
    ya = "char(65 + ((2*j) % 26))"
    xb = "char(97 + ((2*j+1) DIV 26))"
    yb = "char(65 + ((2*j+1) % 26))"
    t2 = (
        spark.range(STAIR_T2)
        .selectExpr("id AS j")
        .selectExpr(
            "j",
            f"explode(sequence(0, {STAIR_C2 - 1} - j)) AS c",
        )
        .selectExpr(
            f"{STAIR_T1_OCC} + j * {STAIR_C2} - (j * (j - 1)) DIV 2 + c"
            " AS idx",
            f"{xa} || {ya} || {xb} || {yb} AS word",
        )
    )
    occ = t1.unionByName(t2)
    return (
        occ.groupBy((F.col("idx") % STAIR_DOCS).alias("doc_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "word"))),
                    lambda s: s["word"],
                ),
                " ",
            ).alias("text")
        )
    )


def _require_native_depth(merges, fn_name: str) -> None:
    """Native-expression APIs refuse tables past the measured chain
    ceiling (a deeper chain dies in the analyzer with a driver-side
    StackOverflowError — an unhelpful crash) and point at the
    dispatching :func:`token_digests` instead."""
    if len(merges) > BPE_NATIVE_CHAIN_MAX:
        raise ValueError(
            f"{fn_name} builds a native replace chain, which is only "
            f"stable to {BPE_NATIVE_CHAIN_MAX} merges (measured "
            "analyzer stack-overflow past ~384); use token_digests, "
            "whose pandas tier handles arbitrarily large merge tables."
        )


def token_digests(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document ``(id, n_tokens, stream_md5)`` under the ACTIVE
    tier — the two-tier dispatch for merge tables of any size:

    - ``len(merges) <= BPE_NATIVE_CHAIN_MAX``: the native replace
      chain (pure JVM projection, zero Python per row).
    - larger vocabularies: Arrow-batched ``mapInPandas`` with a
      cached per-piece encoder — no expression-depth limit, Python
      cost amortized across a batch's repeated pieces.

    ``stream_md5`` digests the DELIM-joined encoded token stream, so
    the two tiers (and the DuckDB recursive-CTE oracle) are
    byte-comparable; tier equivalence is property-tested in
    ``tests/test_bpe.py``.

    Requires a WELL-FORMED table (every merge part is a single char or
    an earlier merge's output — true of fit_bpe and digit_merges):
    that is the property making rank-sequential application (the
    native chain) equal min-rank application (the pandas tier's
    merge-count-independent encoder); an ill-formed table would let
    the tiers disagree, so it is rejected here."""
    from ..session import ensure_min_partitions

    outputs: set[str] = set()
    for a, b in merges:
        for part in (a, b):
            if len(part) != 1 and part not in outputs:
                raise ValueError(
                    f"merge table is not well-formed: part {part!r} of "
                    f"({a!r}, {b!r}) is neither a single character nor "
                    "an earlier merge's output (rank-sequential and "
                    "min-rank application would diverge)"
                )
        outputs.add(a + b)
    df = ensure_min_partitions(df)
    if len(merges) <= BPE_NATIVE_CHAIN_MAX:
        # NULL text tokenizes as empty on BOTH tiers (the pandas tier
        # maps None -> ''; without this coalesce the native chain
        # would propagate NULL and the tiers would diverge at the
        # dispatch boundary)
        toks = token_stream(
            F.coalesce(F.col(text_col), F.lit("")), merges
        )
        return df.select(
            id_col,
            F.size(toks).alias("n_tokens"),
            F.md5(F.array_join(toks, DELIM)).alias("stream_md5"),
        )
    return _token_digests_pandas(df, merges, text_col, id_col)


def _token_digests_pandas(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Arrow-batched large-vocab tokenizer (the declared escape hatch
    above the native chain's depth ceiling). Same pre-tokenization
    (Python ``re`` over BPE_TOKEN_REGEX — the explicit whitespace
    class is bit-identical across engines), same scrub, same greedy
    merge semantics via :func:`encode`."""
    import re as _re

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, n_tokens int, stream_md5 string"
    pat = _re.compile(textstats.BPE_TOKEN_REGEX)
    rank = {tuple(m): i for i, m in enumerate(merges)}
    delim = DELIM

    # Self-contained closure (multimodal.py's portability pattern): the
    # worker fn captures only stdlib + plain data, never this module,
    # so Python workers without the package on PYTHONPATH still run
    # it. The encoder is the MIN-RANK loop (GPT-2's application
    # algorithm): per piece it costs O(len * merges-present), not
    # O(table-size * len) like a rank-sequential scan — measured on
    # sf0.1: 2.63 M tokens/s at 1024 merges and 3.04 M at 4096
    # (merge-count-FLAT), where the sequential scan fell 2.09 -> 0.73 M
    # over the same range. Equal to the native chain's application
    # for the WELL-FORMED tables token_digests admits; the inlined
    # loop duplicates tests' _minrank_encode BY DESIGN — tier
    # equivalence in tests/test_bpe.py is the anti-drift contract.
    def gen(batches):
        import hashlib

        import pandas as pd

        cache: dict = {}

        def enc(piece):
            got = cache.get(piece)
            if got is None:
                seq = list(piece)
                while len(seq) >= 2:
                    best_rank, best = None, None
                    for i in range(len(seq) - 1):
                        r = rank.get((seq[i], seq[i + 1]))
                        if r is not None and (
                            best_rank is None or r < best_rank
                        ):
                            best_rank, best = r, (seq[i], seq[i + 1])
                    if best is None:
                        break
                    a, b = best
                    out, i = [], 0
                    while i < len(seq):
                        if (
                            i + 1 < len(seq)
                            and seq[i] == a
                            and seq[i + 1] == b
                        ):
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(seq[i])
                            i += 1
                    seq = out
                cache[piece] = got = seq
            return got

        for pdf in batches:
            ids, counts, digests = [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                for p in pat.findall((text or "").replace(delim, "")):
                    toks.extend(enc(p))
                ids.append(i)
                counts.append(len(toks))
                digests.append(
                    hashlib.md5(delim.join(toks).encode()).hexdigest()
                )
            yield pd.DataFrame(
                {id_col: ids, "n_tokens": counts, "stream_md5": digests}
            )

    return df.select(id_col, text_col).mapInPandas(gen, out_schema)


def vocab(merges: list[tuple[str, str]]) -> list[str]:
    """The CLOSED-FORM vocabulary for a merge table: printable ASCII
    single chars (33..126, the piece alphabet — pieces contain no
    whitespace) followed by each merge's output in rank order. Token
    id = position in this list; chars outside the universe map to
    UNK_ID. Closed-form (no corpus scan) so the oracle can state the
    identical id assignment from the same constant.

    Rejects merge tables with duplicate OUTPUT strings (e.g. ('a','bc')
    learned after ('ab','c'), both yielding 'abc'): token_ids builds a
    map literal from this list, and Spark's default mapKeyDedupPolicy
    throws DUPLICATE_MAP_KEY at runtime — fail here with a clear error
    instead (r8 advisory). fit_bpe can legitimately learn such tables;
    callers must dedupe or re-fit, not silently alias two ids."""
    outputs = [a + b for a, b in merges]
    seen: set[str] = set()
    for out in outputs:
        if out in seen:
            raise ValueError(
                f"duplicate merge output {out!r}: two merges produce the "
                "same token string, so position-based token ids would "
                "collide (DUPLICATE_MAP_KEY in token_ids' map literal). "
                "Dedupe the merge table (keep the lowest rank) before "
                "building a vocabulary."
            )
        seen.add(out)
    return [chr(c) for c in range(33, 127)] + outputs


UNK_ID = -1


def token_stream(text: Column, merges: list[tuple[str, str]]) -> Column:
    """Per-document encoded token array (across all pieces, in order)
    — the flatten of each piece's delimiter-wrapped encoding."""
    pieces = textstats.bpe_tokens(_scrubbed(text))
    return F.flatten(
        F.transform(
            pieces,
            lambda p: F.filter(
                F.split(merge_chain(wrap_expr(p), merges), DELIM),
                lambda t: t != "",
            ),
        )
    )


def token_ids(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize-to-ids — what a training pipeline actually emits: per
    doc the id count, the unknown-token count (chars outside the
    printable-ASCII piece alphabet), and an md5 digest of the
    comma-joined id sequence (certifies the exact ids AND their order
    without shipping the arrays through the compare).

    The vocab rides as ONE map literal (~140 entries, hash lookup per
    token); ``try_element_at`` returns NULL for unknowns (plain
    element_at THROWS under ANSI), which coalesces to UNK_ID. DuckDB's
    ``coalesce(list_position, 0) - 1`` states the identical
    assignment. Lookup + digest are native expressions — zero Python
    per row.
    """
    from ..session import ensure_min_partitions

    _require_native_depth(merges, "token_ids")
    df = ensure_min_partitions(df)
    vmap = F.create_map(
        *[
            x
            for i, tok in enumerate(vocab(merges))
            for x in (F.lit(tok), F.lit(i))
        ]
    )
    ids = F.transform(
        token_stream(F.col(text_col), merges),
        lambda t: F.coalesce(
            F.try_element_at(vmap, t), F.lit(UNK_ID)
        ).cast("int"),
    )
    return df.select(
        id_col,
        F.size(ids).alias("n_ids"),
        F.size(F.filter(ids, lambda i: i == UNK_ID)).alias("n_unk"),
        F.md5(
            F.array_join(F.transform(ids, lambda i: i.cast("string")), ",")
        ).alias("ids_md5"),
    )


def encode_stats(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document real-BPE statistics in ONE projection pass: piece
    count, base (character) token count, merged token count, the
    compression ratio in exact integer arithmetic, and the encoded
    token stream of the first piece (certifies the actual
    tokenization, not just counts).
    """
    from ..session import ensure_min_partitions

    _require_native_depth(merges, "encode_stats")
    df = ensure_min_partitions(df)
    pieces = textstats.bpe_tokens(_scrubbed(F.col(text_col)))
    n_base = F.aggregate(
        F.transform(pieces, F.length), F.lit(0), lambda acc, v: acc + v
    )
    n_bpe = doc_token_count(F.col(text_col), merges)
    # try_element_at: ANSI mode makes element_at THROW on an empty
    # array (a zero-piece doc); NULL is the contract here.
    head = merge_chain(wrap_expr(F.try_element_at(pieces, F.lit(1))), merges)
    head_tokens = F.btrim(
        F.replace(head, F.lit(DELIM + DELIM), F.lit(" ")), F.lit(DELIM)
    )
    return df.select(
        id_col,
        F.size(pieces).alias("n_pieces"),
        n_base.alias("n_base_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        head_tokens.alias("head_encoding"),
    ).withColumn(
        # exact integer division (DuckDB //): a double ratio would not
        # be bit-reproducible at floor boundaries. NULL when no pieces
        # (ANSI mode: DIV by zero throws, so guard first).
        "merged_per_10k_base",
        F.when(
            F.col("n_base_tokens") > 0,
            F.expr("(n_bpe_tokens * 10000) DIV n_base_tokens"),
        ),
    )
