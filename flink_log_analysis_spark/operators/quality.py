"""Corpus-hygiene operators for LLM training-data pipelines: quality
filtering, PII scrubbing, benchmark decontamination, sequence packing.

These are the stages a pretraining pipeline runs between raw ingest
and tokenization (C4's heuristic filters, Gopher's repetition rules,
test-set decontamination, concat-and-chunk packing). All hot-path
logic is built-in column expressions or one bounded join — no Python
per row — and every output is exactly reproducible in the DuckDB
oracle (plans/llm_quality.py).

Scale notes per operator are on the functions; the common theme: the
filters are single projection passes (linear, no shuffle), the
contamination join shuffles only exploded n-gram rows with the small
benchmark side broadcast, and packing computes its global ordered
cumsum as a two-pass distributed prefix-sum (range partition +
per-partition offsets) — never as a single-partition global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import ngram_token_sets
from .textstats import stopword_count, token_char_sum, tokens

# Gopher/C4-style keep thresholds (deterministic, documented so the
# oracle embeds the same constants).
MIN_TOKENS = 50
MAX_TOKENS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_DUP_TOKEN_RATIO = 0.70
MIN_STOPWORD_RATIO = 0.01

CONTAMINATION_GRAM = 8      # benchmark-overlap shingle width (words)
PACK_BLOCK_TOKENS = 256     # concat-and-chunk block size

# Gopher repetition-rule constants (Rae et al. 2021, Table A1): a doc
# is rejected when the most frequent 2-gram covers > 20% of its
# characters, or duplicated 5-grams cover > 15%.
REP_TOP_N = 2
REP_DUP_N = 5
MAX_TOP_NGRAM_CHAR_FRAC = 0.20
MAX_DUP_NGRAM_CHAR_FRAC = 0.15

# Boilerplate (cross-document template) detection: a word n-gram
# occurring in >= BOILERPLATE_MIN_DF distinct documents is template
# text (navigation chrome, license headers, signatures); a doc is
# flagged when boilerplate grams cover > MAX_BOILERPLATE_FRAC of its
# gram positions. DF >= 2 is tuned to the synthetic corpus (shared
# 5-grams only arise from planted duplicate/template content there); a
# web-scale corpus would raise it well above the duplication floor.
BOILERPLATE_N = 5
BOILERPLATE_MIN_DF = 2
MAX_BOILERPLATE_FRAC = 0.50


def _signal_exprs(text: Column) -> dict[str, Column]:
    """THE canonical quality-signal expressions (rounding included) —
    the single site shared by :func:`keep_predicate`,
    :func:`quality_signals`, and :func:`ablation_report`, so filter,
    per-doc report, and ablation arithmetic can never drift (the
    canonical-expression convention that keeps bit-reproducibility
    contracts honest)."""
    toks = tokens(text)
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    one = F.greatest(n_tokens, F.lit(1))
    return {
        "n_tokens": n_tokens,
        "mean_word_len": F.round(
            token_char_sum(toks).cast("double") / one, 4
        ),
        "dup_token_ratio": F.round(
            (n_tokens - n_distinct).cast("double") / one, 4
        ),
        "stop_ratio": F.round(stopword_count(toks).cast("double") / one, 4),
    }


def _fail_exprs(text: Column) -> dict[str, Column]:
    """Per-signal FAIL flags (the exact negations of the keep
    conjuncts, over the canonical signal expressions), keyed by
    ABLATION_SIGNALS order."""
    s = _signal_exprs(text)
    return {
        "min_tokens": s["n_tokens"] < MIN_TOKENS,
        "max_tokens": s["n_tokens"] > MAX_TOKENS,
        "mean_word_len_low": s["mean_word_len"] < MIN_MEAN_WORD_LEN,
        "mean_word_len_high": s["mean_word_len"] > MAX_MEAN_WORD_LEN,
        "dup_token_ratio": s["dup_token_ratio"] > MAX_DUP_TOKEN_RATIO,
        "stop_ratio": s["stop_ratio"] < MIN_STOPWORD_RATIO,
    }


def keep_predicate(text: Column) -> Column:
    """The C4/Gopher keep verdict as a single boolean Column — usable
    directly as a filter (the composition-pipeline hot path) without
    materializing the per-signal projection."""
    verdict = None
    for flag in _fail_exprs(text).values():
        keep = ~flag
        verdict = keep if verdict is None else verdict & keep
    return verdict


def quality_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document filter signals + keep verdict (single projection).

    Signals follow the public C4/Gopher recipes: token count bounds,
    mean word length band, duplicate-token ratio (the repetition
    signal — near-1 means the doc is the same few tokens repeated),
    and a stopword-ratio floor (gibberish/non-language detector).
    ``keep`` is the conjunction (:func:`keep_predicate` is the
    filter-only form); each signal is also returned so a pipeline can
    re-threshold without rescanning 100 TB. Signals and verdict come
    from the shared :func:`_signal_exprs` / :func:`keep_predicate`
    expressions — one canonical site.
    """
    s = _signal_exprs(F.col(text_col))
    return df.select(
        id_col,
        s["n_tokens"].alias("n_tokens"),
        s["mean_word_len"].alias("mean_word_len"),
        s["dup_token_ratio"].alias("dup_token_ratio"),
        s["stop_ratio"].alias("stop_ratio"),
        keep_predicate(F.col(text_col)).alias("keep"),
    )


# Ablation-report signal order (stable across Spark and the oracle's
# UNION ALL — the report is row-per-signal).
ABLATION_SIGNALS: tuple[str, ...] = (
    "min_tokens",
    "max_tokens",
    "mean_word_len_low",
    "mean_word_len_high",
    "dup_token_ratio",
    "stop_ratio",
)


def ablation_report(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-signal rejection ablation for the C4/Gopher filter bank —
    the report a curation team reads before re-thresholding: for each
    signal, how many documents fail it at all (``n_fail``) and how
    many it UNIQUELY rejects (``n_fail_alone`` — docs that would be
    kept if only this signal were dropped), beside the corpus totals.

    One projection computes the six fail flags (the exact negations of
    :func:`keep_predicate`'s conjuncts via the shared
    :func:`_fail_exprs` — ONE expression site, so the report can never
    drift from the filter), one global aggregate sums them, and the
    per-signal rows come from exploding a 6-struct array over that
    single agg row — the whole report is a linear scan plus a 1-row
    agg at any corpus size."""
    fails = _fail_exprs(F.col(text_col))
    assert tuple(fails) == ABLATION_SIGNALS
    flagged = df.select(
        *[flag.cast("int").alias(f"_f_{name}") for name, flag in fails.items()]
    )
    nf = None
    for name in fails:
        c = F.col(f"_f_{name}")
        nf = c if nf is None else nf + c
    flagged = flagged.withColumn("_nf", nf)
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("_nf") == 0).cast("long")).alias("n_kept"),
        *[F.sum(F.col(f"_f_{n}")).alias(f"_fail_{n}") for n in fails],
        *[
            F.sum(
                ((F.col(f"_f_{n}") == 1) & (F.col("_nf") == 1)).cast("long")
            ).alias(f"_alone_{n}")
            for n in fails
        ],
    )
    per_signal = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(n).alias("signal"),
                    F.col(f"_fail_{n}").alias("n_fail"),
                    F.col(f"_alone_{n}").alias("n_fail_alone"),
                )
                for n in fails
            ]
        )
    ).alias("s")
    return agg.select(per_signal, "n_docs", "n_kept").select(
        F.col("s.signal").alias("signal"),
        F.col("s.n_fail").alias("n_fail"),
        F.col("s.n_fail_alone").alias("n_fail_alone"),
        "n_docs",
        "n_kept",
    )


# PII patterns restricted to the regex subset Java (Spark) and RE2
# (DuckDB) treat identically: character classes, bounded repetition,
# alternation — no backreferences, no lookaround.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("longnum", r"\b[0-9]{6,}\b", "<NUM>"),
)


def scrub_pii(col: Column) -> tuple[Column, dict[str, Column]]:
    """(scrubbed text, per-pattern match counts). Patterns apply
    sequentially: each pattern is counted on the text after all PRIOR
    patterns' replacements, immediately before its own replacement —
    so e.g. digit runs inside an email are NOT counted by ``longnum``
    (the email was already replaced by the time longnum counts). The
    oracle replays the identical sequence."""
    counts: dict[str, Column] = {}
    out = col
    for name, pat, repl in PII_PATTERNS:
        counts[name] = F.regexp_count(out, F.lit(pat))
        out = F.regexp_replace(out, pat, repl)
    return out, counts


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails / IPv4s / long digit runs; per-doc redaction
    counts + md5 of the scrubbed text (the digest is what downstream
    exact-dedup keys on, so it is part of the contract).

    Map-side only: a 100 TB corpus scrubs as one codegen'd projection.
    """
    scrubbed, counts = scrub_pii(F.col(text_col))
    return df.select(
        id_col,
        *[counts[n].alias(f"n_{n}") for n, _, _ in PII_PATTERNS],
        F.md5(scrubbed).alias("scrubbed_md5"),
        F.length(scrubbed).alias("scrubbed_len"),
    )


def _gram_multiset(w: Column, n: int) -> Column:
    """ALL word n-gram occurrences (with repeats — this is the multiset
    the repetition signals count, unlike dedup's distinct shingle
    sets). Docs shorter than ``n`` words yield an empty list: a window
    that never fits has no occurrences, hence zero repetition. ``w``
    must be a plain column reference (see dedup._grams_from_tokens on
    the lambda-CSE pitfall)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - n + 1),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)]),
    )
    return F.when(F.size(w) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document n-gram repetition signals.

    Per document: ``top2_char_frac`` = characters covered by the most
    frequent word 2-gram (count x gram length) as a fraction of total
    token characters; ``dup5_char_frac`` = characters covered by all
    word 5-grams occurring more than once, same denominator;
    ``rep_keep`` = the Gopher verdict (top-2-gram <= 20%, dup-5-gram
    <= 15%). Coverage counts every occurrence (overlaps double-count,
    as in the public reimplementations) and is capped at 1.0.

    Line/paragraph duplicate fractions from the same recipe are
    deliberately omitted: this corpus model treats a document as one
    text blob (no newline structure), so those signals are constant-0
    and verify nothing.

    Shape at 100 TB: one narrow (id, tokens) projection feeds both
    n-gram explodes; the only shuffles carry (id, gram, count) rows
    with map-side partial aggregation collapsing repeated grams before
    the exchange, then (id, coverage) rows. The document text itself
    never shuffles. The lineage cut before the explodes prevents
    Catalyst from pushing the explode's size>0 predicate through the
    token projection and re-inlining tokenization per gram position
    (same trap as benchmark_contamination).
    """
    toks = tokens(F.col(text_col))
    base = (
        df.select(F.col(id_col), toks.alias("w"))
        .select(
            id_col,
            "w",
            token_char_sum(F.col("w")).alias("total_token_chars"),
        )
        .localCheckpoint(eager=True)
    )

    def coverage(n: int, dup_only: bool, out: str) -> DataFrame:
        counts = (
            base.select(
                F.col(id_col),
                F.explode(_gram_multiset(F.col("w"), n)).alias("gram"),
            )
            .groupBy(id_col, "gram")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        cov = (
            F.sum(
                F.when(
                    F.col("cnt") > 1, F.col("cnt") * F.length("gram")
                ).otherwise(F.lit(0))
            )
            if dup_only
            else F.max(F.col("cnt") * F.length("gram"))
        )
        return counts.groupBy(id_col).agg(cov.alias(out))

    top = coverage(REP_TOP_N, dup_only=False, out="top_cov")
    dup = coverage(REP_DUP_N, dup_only=True, out="dup_cov")

    def frac(cov: str) -> Column:
        return F.round(
            F.least(
                F.coalesce(F.col(cov), F.lit(0)).cast("double")
                / F.greatest(F.col("total_token_chars"), F.lit(1)),
                F.lit(1.0),
            ),
            4,
        )

    top_frac = frac("top_cov")
    dup_frac = frac("dup_cov")
    return (
        base.select(id_col, "total_token_chars")
        .join(top, id_col, "left")
        .join(dup, id_col, "left")
        .select(
            id_col,
            F.col("total_token_chars").cast("int").alias("total_token_chars"),
            top_frac.alias("top2_char_frac"),
            dup_frac.alias("dup5_char_frac"),
            (
                (top_frac <= MAX_TOP_NGRAM_CHAR_FRAC)
                & (dup_frac <= MAX_DUP_NGRAM_CHAR_FRAC)
            ).alias("rep_keep"),
        )
    )


def boilerplate_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cross-document template (boilerplate) detection: word
    ``BOILERPLATE_N``-grams appearing in >= ``BOILERPLATE_MIN_DF``
    distinct documents are template text, and each document reports
    the fraction of its gram positions covered by them (the
    RefinedWeb/MassiveText-style boilerplate signal — the corpus-level
    complement of :func:`repetition_signals`' within-doc rules).

    Per document: ``n_grams`` (gram positions), ``n_boiler`` (positions
    whose gram is boilerplate), ``boiler_frac`` (ratio, 4dp),
    ``bp_keep`` (frac <= ``MAX_BOILERPLATE_FRAC``). Docs shorter than
    n words have 0 positions and keep.

    Shape at 100 TB: ONE explode pass builds the per-doc gram counts
    (map-side partial agg collapses repeats before the shuffle), which
    are lineage-cut and reused for both the document-frequency
    aggregate and the per-doc flagging — the corpus text is read once
    and never shuffled. The boilerplate gram set is small by nature
    (templates, not content) and broadcasts.
    """
    toks = tokens(F.col(text_col))
    base = (
        df.select(F.col(id_col), toks.alias("w"))
        .select(id_col, _gram_multiset(F.col("w"), BOILERPLATE_N).alias("g"))
        .localCheckpoint(eager=True)
    )
    dg = (
        base.select(F.col(id_col), F.explode("g").alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    boiler = (
        dg.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= BOILERPLATE_MIN_DF)
        .select("gram", F.lit(1).alias("is_bp"))
    )
    per_doc = (
        dg.join(F.broadcast(boiler), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.sum(
                F.when(F.col("is_bp") == 1, F.col("cnt")).otherwise(F.lit(0))
            ).alias("n_boiler"),
        )
    )
    frac = F.round(
        F.coalesce(F.col("n_boiler"), F.lit(0)).cast("double")
        / F.greatest(F.coalesce(F.col("n_grams"), F.lit(0)), F.lit(1)),
        4,
    )
    return (
        base.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("int").alias("n_grams"),
            F.coalesce(F.col("n_boiler"), F.lit(0)).cast("int").alias("n_boiler"),
            frac.alias("boiler_frac"),
            (frac <= MAX_BOILERPLATE_FRAC).alias("bp_keep"),
        )
    )


def benchmark_contamination(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = CONTAMINATION_GRAM,
    text_col: str = "text",
    id_col: str = "doc_id",
    bloom_prefilter: bool = False,
    bloom_m_bits: int | None = None,
    bloom_k: int | None = None,
) -> DataFrame:
    """Docs sharing >= 1 word ``n``-gram with any benchmark document —
    the standard test-set decontamination check (n-gram overlap, as in
    public LM training reports).

    Join shape at 100 TB: the benchmark side is small by construction
    (eval sets are thousands of docs) — its exploded distinct grams
    BROADCAST; the corpus side explodes to (doc, gram) rows and the
    overlap is a broadcast hash join + per-doc aggregation. The corpus
    is scanned once; nothing shuffles but the matched rows.
    """
    # Materialize both shingle sets before exploding: the explode's
    # implicit size>0 filter otherwise pushes down THROUGH the token
    # projection, and Catalyst inlines the full tokenization once per
    # element_at inside the pushed predicate (~2n x per gram position —
    # measured 40s vs 4s at sf0.1). Same lineage cut ngram_jaccard_pairs
    # uses; at scale this is one narrow (id, grams) materialization.
    corpus_grams = (
        ngram_token_sets(df, n, text_col, id_col)
        .localCheckpoint(eager=True)
        .select(F.col(id_col), F.explode("toks").alias("gram"))
    )
    bench_grams = (
        ngram_token_sets(benchmark, n, text_col, id_col)
        .localCheckpoint(eager=True)
        .select(F.col(id_col).alias("bench_id"), F.explode("toks").alias("gram"))
        .distinct()
    )
    if bloom_prefilter:
        # Semi-join reduction (operators/bloom.py): when the standing
        # exclusion list outgrows a raw-gram broadcast (every benchmark
        # suite's n-grams, 10^8+ keys), a fixed-size Bloom built from
        # the bench grams prunes the corpus side BEFORE the exact join.
        # No false negatives -> the result is bit-identical to the
        # plain path (same oracle, the salted-twin framing); false
        # positives just ride into the exact join and die there.
        from .bloom import K_HASHES, bloom_build, bloom_might_contain, sized_m_bits

        # Size the filter to the ACTUAL key count (ADVICE r13: the
        # module default m=2^17 saturates past ~25k keys — at the
        # motivating 10^8-key list FP ~ 100% and the prefilter prunes
        # nothing while still paying its k joins). The key count is
        # DISTINCT grams — the set actually inserted — not the
        # (bench_id, gram) pair count, which over-sizes by the
        # cross-document gram multiplicity (r14 review: a templated
        # suite sharing grams 10x across docs would size a 8-16x
        # larger filter for no FP benefit). bench_grams is
        # checkpointed, so this is a cheap second consumption.
        k = K_HASHES if bloom_k is None else bloom_k
        m = (
            sized_m_bits(
                bench_grams.select("gram").distinct().count(), k
            )
            if bloom_m_bits is None
            else bloom_m_bits
        )
        # cut the build lineage: the table is consumed once per hash
        # (k joins) and would otherwise re-aggregate the bench grams
        # each time; it is <= m/64 rows, the cheapest checkpoint in
        # the repo
        filt = bloom_build(bench_grams, "gram", m, k).localCheckpoint(
            eager=True
        )
        corpus_grams = bloom_might_contain(corpus_grams, "gram", filt, m, k)
        # NO broadcast hint on the exact join here: the prefilter
        # exists precisely for the bench side that no longer fits a
        # broadcast, so forcing one would re-create the failure the
        # Bloom removes. The planner (AQE) still broadcasts when the
        # runtime size allows; above that it shuffle-joins the
        # Bloom-pruned candidates — a tiny fraction of the corpus.
        hits = corpus_grams.join(bench_grams, "gram")
    else:
        hits = corpus_grams.join(F.broadcast(bench_grams), "gram")
    return (
        hits.filter(F.col(id_col) != F.col("bench_id"))
        .groupBy(id_col)
        .agg(
            F.countDistinct("gram").alias("n_shared_grams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )


def pack_chunks(
    df: DataFrame,
    block: int = PACK_BLOCK_TOKENS,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_tokens_expr: Column | None = None,
) -> DataFrame:
    """Concat-and-chunk packing assignment: documents are concatenated
    in ``id_col`` order and split into fixed ``block``-token training
    chunks; each doc learns the chunk range its tokens land in.

    This is the GPT-style packing layout (concatenate everything,
    split at block boundaries): chunk_first = floor((cum - n) / block),
    chunk_last = floor((cum - 1) / block), where ``cum`` is the global
    running token total in ``id_col`` order.

    The cumsum is :func:`..ranking.distributed_prefix_sum` — a two-pass
    distributed prefix-sum (range partition -> per-partition subtotals
    -> driver offsets -> parallel per-partition cumsum), never a
    partitionless global window (``Window.orderBy`` with no
    ``partitionBy`` forces every row through ONE task). Only the
    two-int ``(id, n_tokens)`` projection ever shuffles; the corpus
    text never moves.
    """
    from .ranking import distributed_prefix_sum

    # n_tokens_expr swaps the token MEASURE (default: whitespace words;
    # pass operators.bpe.doc_token_count for trained-tokenizer tokens)
    # without touching the packing arithmetic or its scale shape.
    n_tokens = (
        n_tokens_expr
        if n_tokens_expr is not None
        else F.size(tokens(F.col(text_col)))
    )
    t = df.select(F.col(id_col), n_tokens.alias("n_tokens"))
    c = distributed_prefix_sum(
        t, [F.col(id_col).asc()], "n_tokens", out_col="cum_tokens"
    )
    cum = F.col("cum_tokens")
    return c.select(
        id_col,
        "n_tokens",
        "cum_tokens",
        F.floor((cum - F.col("n_tokens")) / block).alias("chunk_first"),
        F.floor((cum - 1) / block).alias("chunk_last"),
    )


# Token-budget data selection: the "pick the best documents until the
# training budget is spent" stage (quality-ordered greedy selection, as
# in DoReMi/DsDm-style data curation but with a transparent heuristic
# score). The quality proxy is DISTINCT-token count (lexical diversity,
# pure integer — no float-comparison drift between engines), descending,
# doc_id tie-break.
TOKEN_BUDGET_FRAC = 0.5


def select_token_budget(
    df: DataFrame,
    budget_frac: float = TOKEN_BUDGET_FRAC,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy quality-ordered selection under a corpus token budget.

    Documents are ranked by distinct-token count (desc, id tie-break);
    the running token total over that order is compared against
    ``budget_frac`` of the corpus's total tokens; a doc is ``selected``
    iff it fits ENTIRELY under the budget (cum <= budget).

    Scale shape: one projection pass computes the two int features per
    doc (text never shuffles again); the budget is a 1-row aggregate
    broadcast; the global running sum is a distributed prefix-sum
    (:func:`..ranking.distributed_prefix_sum`), never a
    single-partition global window.
    """
    from .ranking import distributed_prefix_sum

    w = tokens(F.col(text_col))
    t = df.select(
        F.col(id_col),
        F.size(F.array_distinct(w)).cast("int").alias("n_distinct_tokens"),
        F.size(w).cast("int").alias("n_tokens"),
    )
    c = distributed_prefix_sum(
        t,
        [F.col("n_distinct_tokens").desc(), F.col(id_col).asc()],
        "n_tokens",
        out_col="cum_tokens",
    )
    # Corpus total = the last row's running sum; aggregating it off the
    # (already materialized) prefix-sum output avoids a second
    # tokenize+scan pass over the corpus for the budget.
    budget = c.agg(
        F.floor(F.max("cum_tokens") * budget_frac)
        .cast("long")
        .alias("_budget")
    )
    return c.crossJoin(F.broadcast(budget)).select(
        id_col,
        "n_distinct_tokens",
        "n_tokens",
        "cum_tokens",
        (F.col("cum_tokens") <= F.col("_budget")).alias("selected"),
    )


# Training-shard export assignment: fixed doc-count shards in global
# id order (the writer side of pack_chunks' layout). 64 docs/shard is
# sized to the test corpus; a production corpus would use O(100k).
SHARD_DOCS = 64


# C4-style cross-document span dedup granularity: the corpus is cut
# into non-overlapping SPAN_TOKENS-token spans and every repeated span
# keeps exactly its first occurrence (lexicographic (doc_id, pos)),
# corpus-wide.
SPAN_TOKENS = 8
# (id, pos) packed into one bigint for the first-occurrence min: low
# SPAN_POS_BITS bits carry the span position (2^24 spans/doc bound),
# the rest the doc id (non-negative, < 2^39) — see span_dedup.
SPAN_POS_BITS = 24


def _pack_id_pos(id_col: str, pos_col: str, what: str) -> Column:
    """(id << SPAN_POS_BITS) | pos as ONE guarded bigint — the
    skew-immune first-occurrence key shared by span_dedup and
    substring_dedup. Injective only for 0 <= id < 2^39 and
    pos < 2^24; violations raise from inside the expression instead
    of silently corrupting which occurrence survives."""
    return F.when(
        (F.col(id_col) < 0)
        | (F.col(id_col) >= F.lit(1 << (63 - SPAN_POS_BITS)))
        | (F.col(pos_col) >= F.lit(1 << SPAN_POS_BITS)),
        F.raise_error(
            F.concat(
                F.lit(
                    f"{what}: (doc_id, pos) outside the packing "
                    f"bounds (0 <= id < 2^{63 - SPAN_POS_BITS}, "
                    f"pos < 2^{SPAN_POS_BITS}): id="
                ),
                F.col(id_col).cast("string"),
                F.lit(" pos="),
                F.col(pos_col).cast("string"),
            )
        ).cast("bigint"),
    ).otherwise(
        F.shiftleft(F.col(id_col), SPAN_POS_BITS) + F.col(pos_col)
    )


def span_dedup(
    df: DataFrame,
    span: int = SPAN_TOKENS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document span-level dedup — the C4 hygiene step between
    exact doc dedup and MinHash near-dedup in granularity: cut every
    document into non-overlapping ``span``-token spans (final short
    span included), keep exactly the FIRST occurrence of each distinct
    span corpus-wide (lexicographic (doc_id, pos) — deterministic and
    engine-independent), and report per doc the surviving text.

    Output per doc (docs with at least one token): total and kept span
    counts plus an md5 of the kept spans re-joined in position order —
    the digest certifies WHICH spans survived and their order, not
    just how many. Docs whose every span already appeared earlier in
    the corpus keep zero spans and still appear (n_kept = 0).

    Scale shape: explode multiplies rows by ~n/span (narrow rows: id,
    pos, span text); first-occurrence selection is a skew-immune HASH
    AGGREGATION over the span key — NOT a window: first occurrence =
    the (id, pos)-minimal row per key, and packing (id, pos) into ONE
    bigint (id << 24 | pos) makes that a plain ``min``, which plans as
    a true HashAggregate with a map-side partial. (A ``min_by`` over a
    struct plans as SortAggregate, and a window funnels the hot key
    through one task's sort — both measured slower on BOTH arms.) The
    partial aggregate collapses even a pathological hot span (one span
    in half the corpus) to one row per input partition BEFORE the
    shuffle. Measured (tools/dedup_skew_probe.py, 1.5M docs,
    50%-hot-span, median-of-3): this shape 3.5s uniform / 3.2s skewed
    (ratio 0.92 — the shuffle SHRINKS under skew) vs the window's
    4.1s / 4.0s — slower on BOTH arms, and its hot group's
    single-task sort grows with the group where this shape provably
    cannot. Packing bounds, stated AND enforced (r12 advisory):
    non-negative ids below 2^39 (~550 B documents) and at most 2^24
    spans per document (~134 M tokens at span=8) — an out-of-range
    (id, pos) raises from inside the packing expression rather than
    silently corrupting which span survives. Rebuild is one hash
    aggregation with an in-group sort bounded by the doc's own span
    count. No driver state, no low-cardinality window anywhere.
    """
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n")
    ).filter(F.col("_n") > 0)
    n_spans = F.ceil(F.col("_n") / span).cast("int")
    spans = base.select(
        id_col,
        n_spans.alias("n_spans"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_spans - 1),
                lambda i: F.concat_ws(
                    " ", F.slice("_toks", i * span + 1, span)
                ),
            )
        ).alias("pos", "span_text"),
    )
    # packing-bounds guard (r12 advisory): one cheap branch per
    # exploded row — see _pack_id_pos.
    packed = _pack_id_pos(id_col, "pos", "span_dedup")
    kept = (
        spans.groupBy("span_text")
        .agg(F.min(packed).alias("_packed"))
        .select(
            F.shiftright("_packed", SPAN_POS_BITS).alias(id_col),
            F.col("_packed")
            .bitwiseAND(F.lit((1 << SPAN_POS_BITS) - 1))
            .cast("int")
            .alias("pos"),
            "span_text",
        )
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_kept_spans"),
        # tokens surviving span dedup — the measure downstream packing
        # uses when it runs AFTER this stage (tokens are whitespace-
        # free, so splitting the span text on single spaces recovers
        # the exact token count)
        F.sum(F.size(F.split(F.col("span_text"), " ")))
        .cast("int")
        .alias("n_kept_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "span_text"))
                    ),
                    lambda s: s["span_text"],
                ),
            )
        ).alias("kept_md5"),
    )
    totals = spans.groupBy(id_col).agg(
        F.first("n_spans").alias("n_spans")
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            "n_spans",
            F.coalesce("n_kept_spans", F.lit(0)).alias("n_kept_spans"),
            F.coalesce("n_kept_tokens", F.lit(0)).alias("n_kept_tokens"),
            F.coalesce("kept_md5", F.md5(F.lit(""))).alias("kept_md5"),
        )
    )


# Exact-substring dedup window (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better" — the
# deduplicate-text-datasets default recipe): every repeated token
# sequence of at least this many tokens, at ANY alignment, keeps its
# first corpus occurrence. The paper uses 50 BPE tokens; contract
# rows pass a smaller window so the synthetic corpus discriminates.
SUBSTR_TOKENS = 50


def substring_dedup(
    df: DataFrame,
    min_tokens: int = SUBSTR_TOKENS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact substring dedup at arbitrary alignment — the Lee et al.
    2022 tier :func:`span_dedup` approximates with fixed
    non-overlapping spans: ANY repeated token sequence of length >=
    ``min_tokens``, wherever it starts, keeps exactly its first corpus
    occurrence (lexicographic (doc_id, pos)) and is removed everywhere
    else. A repeated substring of length L >= N is exactly the union
    of its L-N+1 duplicated N-token windows, so sliding N-windows at
    EVERY offset + first-occurrence selection + per-doc interval merge
    reproduces the suffix-array recipe's removals without ever
    building a suffix array.

    Output per doc (>= 1 token): (doc_id, n_tokens, n_dup_windows,
    n_removed_tokens, n_ranges, kept_md5) — n_ranges counts the
    maximal merged removed intervals and kept_md5 digests the
    surviving tokens in position order (md5('') when everything went).

    Spark-first shape, stage by stage:

    - **Windows explode with FIXED-WIDTH keys.** Each of the ~n
      offsets emits (id, pos, md5(window_text)) — 32 hex chars
      whatever ``min_tokens`` is, so the shuffle carries ~40 bytes per
      corpus token instead of the N-token window text (a 50-token
      window would 50x the corpus through the exchange — the reason
      the naive formulation dies at 100 TB). md5 is the repo's
      engine-portable digest, so the DuckDB oracle groups on the SAME
      keys; a false key collision needs an md5 collision
      (~w^2 / 2^129 — at 10^13 windows, ~1e-13), accepted and
      documented rather than hidden (the published tool's suffix
      array is exact but single-machine; a 64-bit rolling hash — the
      other distributed folklore — collides at real corpus sizes).
    - **First occurrence is the span_dedup packed-key min-agg** —
      a true HashAggregate with map-side partials, so even a window
      repeated across half the corpus collapses to one row per input
      partition before the shuffle (the skew-immunity argument
      measured in tools/dedup_skew_probe.py). The duplicate verdict
      is one hash join of the window rows back to that (key, first)
      table: a hot key concentrates its OCCURRENCE rows (linear) in
      one task, never occurrence^2.
    - **Interval merge is per-doc arithmetic**, bounded by the doc's
      own window count: collect_list + array_sort + one left fold
      (positions sorted; window [p, p+N) merges into the open range
      iff p <= last.e). No window function, no per-key funnel.
    - **Rebuild** filters each doc's tokens by index against its
      merged ranges (O(tokens x ranges) per doc — ranges, not dup
      windows, after the merge).

    MEASURED N-vs-cost envelope (tools/substr_scale_probe.py, 10x
    replica of sf0.1, min-of-2 steady-state, VERDICT r14 item 6):
    N=50 (the paper's default) 2.31x wall at 10x rows, N=25 2.22x,
    N=10 3.43x — sublinear at every window size. Cost RISES as N
    shrinks not because the explode widens (one ~40-byte md5 key per
    corpus token regardless of N — window count per doc is
    L-N+1 <= L) but because more documents clear the length gate and
    more windows repeat, fattening the verdict join and the per-doc
    merges; the curve stays linear-shaped because every stage is
    occurrence-linear by construction. No rare-window prefilter is
    needed at these densities; one would slot in as a Bloom
    left-semi on wkey before the min-agg if a corpus ever inverts
    the economics.
    """
    n = min_tokens
    base = _substr_base(df, text_col, id_col)
    # Cut the explode once: wins feeds BOTH the first-occurrence agg
    # and the verdict join — uncut, the tokenize+slice+md5 chain
    # recomputes per consumer, and the recompute multiplier grows
    # with scale (tools/substr_scale_probe.py measured the composed
    # query at 4.2x its single-pass stage sum on a 10x N=10 replica:
    # 54 s vs 13 s dissected; with the cut the 10x ratio is ~linear).
    # ~40 bytes/window, so the blocks are ~the corpus token count.
    wins = _substr_windows(base, n, id_col).localCheckpoint(eager=True)
    packed = _pack_id_pos(id_col, "pos", "substring_dedup")
    firsts = wins.groupBy("wkey").agg(F.min(packed).alias("_first"))
    dups = (
        wins.join(firsts, "wkey")
        .filter(packed != F.col("_first"))
        .select(id_col, "pos")
    )
    return _substr_report(base, dups, n, id_col)


def _substr_base(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, _toks, _n) for docs with >= 1 token, lineage-cut: two
    consumers (window explode + final rebuild join) would otherwise
    re-tokenize (the benchmark_contamination convention)."""
    toks = tokens(F.col(text_col))
    return (
        df.select(
            F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n")
        )
        .filter(F.col("_n") > 0)
        .localCheckpoint(eager=True)
    )


def _substr_windows(base: DataFrame, n: int, id_col: str) -> DataFrame:
    """(id, pos, wkey): md5 of the n-token window at EVERY offset."""
    return base.filter(F.col("_n") >= n).select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("_n") - n),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice("_toks", i + 1, n))
                ),
            )
        ).alias("pos", "wkey"),
    )


def _substr_report(
    base: DataFrame, dups: DataFrame, n: int, id_col: str
) -> DataFrame:
    """Per-doc removal report from a (id, pos) duplicate-window frame:
    sorted positions -> maximal merged [s, e) ranges (one left fold,
    bounded by the doc's own window count) -> stats + surviving-token
    md5 (every base doc appears; zero-removal docs digest their full
    text)."""
    hits = dups.groupBy(id_col).agg(
        F.array_sort(F.collect_list("pos")).alias("_ps")
    )
    empty_ranges = F.array().cast("array<struct<s:int,e:int>>")
    ranges = F.aggregate(
        F.slice(F.col("_ps"), 2, F.greatest(F.size("_ps") - 1, F.lit(0))),
        F.array(
            F.struct(
                F.element_at("_ps", 1).alias("s"),
                (F.element_at("_ps", 1) + n).alias("e"),
            )
        ),
        lambda acc, p: F.when(
            p <= F.element_at(acc, -1)["e"],
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["s"].alias("s"),
                        (p + n).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(acc, F.array(F.struct(p.alias("s"), (p + n).alias("e"))))
        ),
    )
    stats = hits.select(
        id_col,
        F.size("_ps").cast("int").alias("_n_dup"),
        ranges.alias("_ranges"),
    )
    rng = F.coalesce(F.col("_ranges"), empty_ranges)
    kept = F.filter(
        F.col("_toks"),
        lambda x, i: ~F.exists(
            rng, lambda r: (i >= r["s"]) & (i < r["e"])
        ),
    )
    return base.join(stats, id_col, "left").select(
        id_col,
        F.col("_n").cast("int").alias("n_tokens"),
        F.coalesce("_n_dup", F.lit(0)).alias("n_dup_windows"),
        F.aggregate(
            rng, F.lit(0), lambda a, r: a + (r["e"] - r["s"])
        ).alias("n_removed_tokens"),
        F.size(rng).alias("n_ranges"),
        F.md5(F.concat_ws(" ", kept)).alias("kept_md5"),
    )


def build_substring_index(
    corpus: DataFrame,
    min_tokens: int = SUBSTR_TOKENS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The standing corpus's DISTINCT window-key table — the persisted
    build-once artifact a continuous-ingest loop writes (parquet of
    32-char keys) and every arriving batch probes. One explode + one
    distinct (hash agg with map-side partials); size is bounded by the
    corpus's distinct n-gram count, never the batch rate."""
    return _substr_windows(
        _substr_base(corpus, text_col, id_col), min_tokens, id_col
    ).select("wkey").distinct()


def substring_dedup_incremental(
    new: DataFrame,
    corpus: DataFrame | None = None,
    min_tokens: int = SUBSTR_TOKENS,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_keys: DataFrame | None = None,
) -> DataFrame:
    """Arriving-batch exact-substring dedup against the FROZEN
    standing corpus — the substring member of the incremental family
    (incremental_near_dups / semantic_dedup_incremental shape): a
    batch window is removed iff its ``min_tokens``-token sequence
    already exists ANYWHERE in the corpus. Batch-internal repeats are
    deliberately NOT deduped here — never batch x batch, the family's
    contract — run :func:`substring_dedup` over the batch for those.

    Output: the :func:`substring_dedup` report over the BATCH docs
    (kept_md5 digests the batch content genuinely novel vs the
    corpus).

    A production ingest loop passes ``corpus_keys`` (the persisted
    :func:`build_substring_index` table) so each batch pays only its
    own window explode plus one hash semi-join against the index —
    per-batch cost tracks the batch, never the corpus. With it
    omitted, THIS call derives the index from ``corpus`` (the
    self-contained contract shape, which re-scans the corpus and is
    NOT incremental across calls)."""
    if corpus_keys is None:
        if corpus is None:
            raise ValueError(
                "substring_dedup_incremental needs corpus or corpus_keys"
            )
        corpus_keys = build_substring_index(
            corpus, min_tokens, text_col, id_col
        )
    base = _substr_base(new, text_col, id_col)
    wins = _substr_windows(base, min_tokens, id_col)
    dups = wins.join(corpus_keys, "wkey", "left_semi").select(
        id_col, "pos"
    )
    return _substr_report(base, dups, min_tokens, id_col)


# Context-window chunking defaults: window = model context slots per
# chunk, stride < window gives (window - stride) tokens of overlap
# between consecutive chunks — the standard long-document treatment
# when truncation would lose tail content.
CHUNK_WINDOW_TOKENS = 64
CHUNK_STRIDE_TOKENS = 48


def chunk_documents(
    df: DataFrame,
    window: int = CHUNK_WINDOW_TOKENS,
    stride: int = CHUNK_STRIDE_TOKENS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window chunking: split each document's token sequence
    into ``window``-token chunks every ``stride`` tokens (overlap =
    window - stride), the long-document complement of
    :func:`pack_chunks` (which concatenates SHORT docs; this splits
    LONG ones — real pipelines run both).

    One row per (doc, chunk) with the exact token span and an md5 of
    the chunk text, so the contract certifies the slicing itself, not
    just the counts. A doc with ``n <= window`` tokens yields exactly
    one chunk; otherwise ``ceil((n - window) / stride) + 1`` chunks
    and only the last is short.

    Scale shape: pure map-side projection + explode — no shuffle, no
    Python; the token array is built once per row and sliced per
    chunk inside one codegen stage. Chunk explosion multiplies rows
    by ~n/stride, which is the output's intrinsic size.
    """
    toks = tokens(F.col(text_col))
    n = F.col("n_tokens")
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.floor((n - window + (stride - 1)) / stride) + 1
    )
    base = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.size(toks).alias("n_tokens"),
    ).select(
        id_col,
        "_toks",
        "n_tokens",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
            "chunk_idx"
        ),
    )
    start = F.col("chunk_idx") * stride
    clen = F.least(F.lit(window), n - start)
    return base.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("int").alias("chunk_start"),
        clen.cast("int").alias("chunk_len"),
        F.md5(F.concat_ws(" ", F.slice("_toks", start + 1, clen))).alias(
            "chunk_md5"
        ),
        "n_tokens",
    )


def corpus_shards(
    df: DataFrame,
    docs_per_shard: int = SHARD_DOCS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-shard manifest for fixed-size training-shard export: shard
    ``k`` holds docs ranked ``[k*docs_per_shard, (k+1)*docs_per_shard)``
    in global ``id_col`` order; reports doc/token/char totals and the
    id range per shard.

    The global rank comes from :func:`..ranking.distributed_rank` in
    its partitionless mode (empty group key = one global group) — the
    exact case where ``Window.orderBy`` with no ``partitionBy`` would
    single-partition the corpus. Only the narrow (id, 2 ints)
    projection shuffles; the shard manifest is O(corpus/docs_per_shard)
    rows.
    """
    from .ranking import distributed_rank

    t = df.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("int").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
    )
    ranked = distributed_rank(
        t, [], [id_col], rank_col="_rank", size_col="_n"
    )
    return (
        ranked.withColumn(
            "shard_id",
            F.floor((F.col("_rank") - 1) / docs_per_shard).cast("long"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.sum("n_chars").alias("shard_chars"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
    )
