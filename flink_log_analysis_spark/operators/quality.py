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
benchmark side broadcast, and packing is one global range-partitioned
window (the one intentionally-global stage — document order IS the
contract there).
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


def quality_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document filter signals + keep verdict (single projection).

    Signals follow the public C4/Gopher recipes: token count bounds,
    mean word length band, duplicate-token ratio (the repetition
    signal — near-1 means the doc is the same few tokens repeated),
    and a stopword-ratio floor (gibberish/non-language detector).
    ``keep`` is the conjunction; each signal is also returned so a
    pipeline can re-threshold without rescanning 100 TB.
    """
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    mean_wl = F.round(
        token_char_sum(toks).cast("double") / F.greatest(n_tokens, F.lit(1)), 4
    )
    dup_ratio = F.round(
        (n_tokens - n_distinct).cast("double") / F.greatest(n_tokens, F.lit(1)), 4
    )
    stop_ratio = F.round(
        stopword_count(toks).cast("double") / F.greatest(n_tokens, F.lit(1)), 4
    )
    keep = (
        (n_tokens >= MIN_TOKENS)
        & (n_tokens <= MAX_TOKENS)
        & (mean_wl >= MIN_MEAN_WORD_LEN)
        & (mean_wl <= MAX_MEAN_WORD_LEN)
        & (dup_ratio <= MAX_DUP_TOKEN_RATIO)
        & (stop_ratio >= MIN_STOPWORD_RATIO)
    )
    return df.select(
        id_col,
        n_tokens.alias("n_tokens"),
        mean_wl.alias("mean_word_len"),
        dup_ratio.alias("dup_token_ratio"),
        stop_ratio.alias("stop_ratio"),
        keep.alias("keep"),
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
    """(scrubbed text, per-pattern match counts). Counting happens
    BEFORE each replacement so patterns don't eat each other's spans
    (an email contains digit runs; count both against the original
    stage, replace sequentially)."""
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


def benchmark_contamination(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = CONTAMINATION_GRAM,
    text_col: str = "text",
    id_col: str = "doc_id",
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
) -> DataFrame:
    """Concat-and-chunk packing assignment: documents are concatenated
    in ``id_col`` order and split into fixed ``block``-token training
    chunks; each doc learns the chunk range its tokens land in.

    This is the GPT-style packing layout (concatenate everything,
    split at block boundaries) expressed as one running-total window:
    chunk_first = floor((cum - n) / block), chunk_last =
    floor((cum - 1) / block). The global ordered cumsum is the one
    deliberately-global stage in this module — Spark executes it as a
    range-partitioned sort, which is how a 100 TB corpus gets a total
    order; per-shard packing (PARTITION BY shard) drops the global
    barrier when exact cross-shard continuity isn't required.
    """
    from pyspark.sql.window import Window

    n_tokens = F.size(tokens(F.col(text_col)))
    w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, 0)
    t = df.select(F.col(id_col), n_tokens.alias("n_tokens"))
    cum = F.sum("n_tokens").over(w)
    return t.select(
        id_col,
        "n_tokens",
        cum.alias("cum_tokens"),
        F.floor((cum - F.col("n_tokens")) / block).alias("chunk_first"),
        F.floor((cum - 1) / block).alias("chunk_last"),
    )
