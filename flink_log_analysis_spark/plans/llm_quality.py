"""Corpus-hygiene plans over ``documents``: quality filtering, PII
scrubbing, benchmark decontamination, sequence packing.

Oracle notes: the PII plan injects deterministic fake PII (built from
``doc_id`` identically in both engines) so the redaction counts and
scrubbed digests are discriminating even on a clean synthetic corpus;
the quality/packing plans follow the llm_text int-cast conventions;
the contamination oracle mirrors the 8-gram shingle expression from
llm_dedup's 4-gram twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import lmfilter, quality, qualityclf
from ..operators.textstats import EN_STOPWORDS
from ..session import read_table

# Whitespace tokens over RAW text (twin of textstats.tokens — the
# quality/packing operators do not normalize first).
_TOKS = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
_STOP = "(" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + ")"

# Normalized-text 8-gram shingles (twin of dedup.ngram_token_sets(n=8),
# mirroring llm_dedup._TOKS4's construction).
_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_W = f"list_filter(string_split_regex({_NORM}, '\\s+'), x -> x <> '')"
_G = quality.CONTAMINATION_GRAM
_TOKS8 = f"""
    CASE WHEN len({_W}) >= {_G}
         THEN list_distinct(list_transform(
                  generate_series(1, len({_W}) - {_G - 1}),
                  i -> {" || ' ' || ".join(f"{_W}[i + {j}]" for j in range(_G))}))
         ELSE [array_to_string({_W}, ' ')] END
"""

# The C4/Gopher keep verdict collapsed to one SQL predicate over a
# relation exposing ``toks`` (= _TOKS of text) — the oracle twin of
# operators.quality.keep_predicate. Shared by the corpus_prep and
# corpus_ingest_stream oracles and the corpus_report rollup.
_KEEP_PRED = f"""
    len(toks) >= {quality.MIN_TOKENS}
    AND len(toks) <= {quality.MAX_TOKENS}
    AND ROUND(list_sum(list_transform(toks, x -> length(x))) * 1.0
              / GREATEST(len(toks), 1), 4) >= {quality.MIN_MEAN_WORD_LEN}
    AND ROUND(list_sum(list_transform(toks, x -> length(x))) * 1.0
              / GREATEST(len(toks), 1), 4) <= {quality.MAX_MEAN_WORD_LEN}
    AND ROUND((len(toks) - len(list_distinct(toks))) * 1.0
              / GREATEST(len(toks), 1), 4) <= {quality.MAX_DUP_TOKEN_RATIO}
    AND ROUND(len(list_filter(toks, x -> lower(x) IN {_STOP})) * 1.0
              / GREATEST(len(toks), 1), 4) >= {quality.MIN_STOPWORD_RATIO}
"""

# Pseudo-benchmark set: doc_id % 29 == 0 (~3% of the corpus). 29 was
# chosen so the synthetic corpus's near-duplicate pairs actually put a
# few contaminated docs in the result at every test SF — a 0-row
# contamination check would hash-match trivially and verify nothing.
BENCH_MOD = 29


def doc_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.quality_signals(read_table(spark, sf_dir, "documents"))


def _augmented(docs: DataFrame) -> DataFrame:
    """Append deterministic fake PII (same construction as the oracle's
    SQL concatenation) so the scrub has real spans to redact."""
    return docs.withColumn(
        "aug",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 ref 123456789"),
        ),
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _augmented(read_table(spark, sf_dir, "documents"))
    return quality.pii_scrub(docs, text_col="aug")


def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % BENCH_MOD == 0)
    return quality.benchmark_contamination(docs, bench)


def bloom_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """benchmark_contamination through the Bloom semi-join reduction
    (operators/bloom.py): a fixed-size bit table built from the
    benchmark shingles prunes the corpus grams before the exact
    overlap join. No false negatives -> the logical result is
    BIT-IDENTICAL to the plain path, so this row is held to the plain
    row's oracle VERBATIM — the physical-rewrite contract the salted
    twins use. The deployment shape when the standing exclusion list
    (every benchmark suite's n-grams) outgrows a raw broadcast."""
    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % BENCH_MOD == 0)
    return quality.benchmark_contamination(
        docs, bench, bloom_prefilter=True
    )


def pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.pack_chunks(read_table(spark, sf_dir, "documents"))


def bpe_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing denominated in REAL BPE tokens: the same
    two-pass distributed prefix-sum layout as pack_chunks, but the
    token measure is the frozen merge-table tokenizer
    (operators/bpe.doc_token_count) — what a training pipeline packing
    toward a model's actual context length computes. The oracle
    replays the identical merge chain, then windows the cumsum."""
    from ..operators import bpe as bpe_ops
    from ..session import ensure_min_partitions

    # widen the single-file local scan BEFORE the replace chain runs
    # (else the expression-heavy count serializes onto one core —
    # a no-op on a real cluster's multi-split scans)
    docs = ensure_min_partitions(read_table(spark, sf_dir, "documents"))
    return quality.pack_chunks(
        docs,
        n_tokens_expr=bpe_ops.doc_token_count(
            F.col("text"), bpe_ops.BPE_MERGES_V1
        ),
    )


def span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document span dedup: every repeated 8-token span
    keeps exactly its first corpus occurrence; kept_md5 certifies the
    surviving spans and their order per doc."""
    return quality.span_dedup(read_table(spark, sf_dir, "documents"))


# Exact-substring contract window: 8 tokens (the span_dedup
# granularity, now at EVERY alignment) — the paper's 50-token default
# finds nothing in a 500-doc synthetic corpus; 8 touches 24 docs at
# sf0.01, so the row discriminates.
SUBSTR_DEDUP_TOKENS = 8


def substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup at arbitrary alignment (Lee et al. 2022,
    the deduplicate-text-datasets recipe — VERDICT r13 item 2): ANY
    repeated token run of >= 8 tokens keeps its first corpus
    occurrence and is removed everywhere else, reported per doc as
    merged maximal ranges + a kept-text digest. The oracle re-derives
    the sliding md5-keyed windows, the packed-key first-occurrence
    rule, the interval union (distinct removed token positions — set
    semantics, definitionally equal to the operator's merged-range
    sum), the LAG-based range count, and the surviving-token digest."""
    return quality.substring_dedup(
        read_table(spark, sf_dir, "documents"),
        min_tokens=SUBSTR_DEDUP_TOKENS,
    )


# Incremental batch split: every 7th doc plays the arriving batch
# (the SEM_BATCH_MOD convention — any modulus works here; 7 keeps the
# same family shape), the rest the standing corpus.
SUBSTR_BATCH_MOD = 7

_SUBSTR_INDEX_CACHE: dict[str, str] = {}


def _substr_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standing corpus's distinct window-key index
    (quality.build_substring_index), parquet-materialized ONCE per
    (session, sf_dir) and shared by the batch and streaming
    incremental queries — the llm_dedup._corpus_index convention:
    production writes this artifact when the corpus is committed and
    every arriving batch probes it; the parquet materialization (not
    localCheckpoint) survives the harness's release_checkpoints()
    between queries. bench.py prebuilds it (recorded under
    "substr_corpus_index") so the timed rows measure the steady-state
    per-batch probe path, exactly like incremental_near_dups. Cache
    key is sf_dir with no content fingerprint (ADVICE r16):
    regeneration-in-process of the documents table would leave this
    stale — acceptable because the harness's testdata is immutable
    per interpreter (the _corpus_index convention's documented
    trade)."""
    path = _SUBSTR_INDEX_CACHE.get(sf_dir)
    if path is None:
        from ..session import shared_tmp_dir

        corpus = read_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % SUBSTR_BATCH_MOD != 0
        )
        path = shared_tmp_dir("loganalysis_substridx_")
        quality.build_substring_index(
            corpus, min_tokens=SUBSTR_DEDUP_TOKENS
        ).write.mode("overwrite").parquet(f"{path}/wkeys")
        _SUBSTR_INDEX_CACHE[sf_dir] = path
    return spark.read.parquet(f"{path}/wkeys")


def substring_dedup_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Continuous-ingest exact-substring dedup: the arriving batch
    (every 7th doc) deduped against the FROZEN standing corpus — a
    batch window is removed iff its 8-token sequence exists anywhere
    in the corpus; never batch x batch or corpus x corpus (the
    incremental family's contract, substring edition). The corpus
    index comes prebuilt from :func:`_substr_index` (the
    incremental_near_dups convention); the row measures the
    steady-state per-batch probe path. The oracle derives the
    corpus's distinct window-key index, semi-joins the batch's
    windows, and replays the SAME report tail as the full row."""
    docs = read_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % SUBSTR_BATCH_MOD == 0)
    return quality.substring_dedup_incremental(
        new,
        min_tokens=SUBSTR_DEDUP_TOKENS,
        corpus_keys=_substr_index(spark, sf_dir),
    )


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking with overlap (the long-document
    complement of pack_chunks); chunk_md5 certifies the exact token
    slices, not just the arithmetic."""
    return quality.chunk_documents(read_table(spark, sf_dir, "documents"))


def token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.select_token_budget(read_table(spark, sf_dir, "documents"))


def corpus_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.corpus_shards(read_table(spark, sf_dir, "documents"))


def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hygiene dashboard: ROLLUP(source, lang) over the keep verdict —
    docs, kept docs, keep rate (exact integer per-10k, no float
    rounding ambiguity), token volume. One scan + one rollup
    aggregation; the keep predicate is the same single-projection
    expression the filter stage uses, so report and filter can't
    drift.
    """
    docs = read_table(spark, sf_dir, "documents")
    # coalesce: a NULL-text doc is "not kept" (0), matching the
    # oracle's CASE ... ELSE 0 — without it a rollup group of only
    # NULL-text docs would sum to NULL in Spark but 0 in the oracle.
    keep = F.coalesce(
        quality.keep_predicate(F.col("text")).cast("long"), F.lit(0)
    )
    n_tokens = F.size(quality.tokens(F.col("text")))
    base = docs.select("source", "lang", keep.alias("keep"),
                       n_tokens.alias("n_tokens"))
    return (
        base.rollup("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("keep").alias("n_kept"),
            F.expr("(sum(keep) * 10000) DIV count(1)").alias("kept_per_10k"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


def quality_ablation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-signal rejection ablation over the C4/Gopher filter bank
    (operators/quality.ablation_report): one row per signal with its
    total and UNIQUE rejection counts beside the corpus totals — the
    re-thresholding report (which filter is pulling its weight, which
    is redundant) computed in one scan + one 1-row agg."""
    return quality.ablation_report(read_table(spark, sf_dir, "documents"))


def doc_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.repetition_signals(read_table(spark, sf_dir, "documents"))


def doc_boilerplate_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.boilerplate_signals(read_table(spark, sf_dir, "documents"))


def _pii_oracle(relation: str = "documents") -> str:
    """PII-scrub oracle over ``relation`` (any rel with doc_id, text).

    Counts are taken on the text as scrubbed so far, replacements
    applied sequentially — the exact semantics of
    operators.quality.scrub_pii."""
    aug = (
        "(text || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com at 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
        " || '.7 ref 123456789')"
    )
    cur = aug
    selects = []
    for name, pat, repl in quality.PII_PATTERNS:
        esc = pat.replace("'", "''")
        selects.append(
            f"CAST(len(regexp_extract_all({cur}, '{esc}')) AS INTEGER)"
            f" AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{esc}', '{repl}', 'g')"
    return f"""
        SELECT doc_id,
               {", ".join(selects)},
               md5({cur}) AS scrubbed_md5,
               CAST(length({cur}) AS INTEGER) AS scrubbed_len
        FROM {relation}
    """


# Raw-token n-gram MULTISETS (all occurrences, no dedup) for the
# repetition signals; short docs yield [] (window never fits).
def _gram_multiset_sql(n: int) -> str:
    join = " || ' ' || ".join(f"w[i + {j}]" for j in range(n))
    return f"""
        CASE WHEN len(w) >= {n}
             THEN list_transform(generate_series(1, len(w) - {n - 1}),
                                 i -> {join})
             ELSE [] END
    """


def _repetition_oracle() -> str:
    frac = (
        "ROUND(LEAST(COALESCE({cov}, 0) * 1.0"
        " / GREATEST(total_token_chars, 1), 1.0), 4)"
    )
    top = frac.format(cov="top_cov")
    dup = frac.format(cov="dup_cov")
    return f"""
        WITH b AS (
            SELECT doc_id, {_TOKS} AS w FROM documents
        ), base AS (
            SELECT doc_id, w,
                   list_sum(list_transform(w, x -> length(x)))
                       AS total_token_chars
            FROM b
        ), c2 AS (
            SELECT doc_id, gram, COUNT(*) AS cnt
            FROM (SELECT doc_id,
                         unnest({_gram_multiset_sql(quality.REP_TOP_N)}) AS gram
                  FROM base)
            GROUP BY doc_id, gram
        ), a2 AS (
            SELECT doc_id, MAX(cnt * length(gram)) AS top_cov
            FROM c2 GROUP BY doc_id
        ), c5 AS (
            SELECT doc_id, gram, COUNT(*) AS cnt
            FROM (SELECT doc_id,
                         unnest({_gram_multiset_sql(quality.REP_DUP_N)}) AS gram
                  FROM base)
            GROUP BY doc_id, gram
        ), a5 AS (
            SELECT doc_id,
                   SUM(CASE WHEN cnt > 1 THEN cnt * length(gram) ELSE 0 END)
                       AS dup_cov
            FROM c5 GROUP BY doc_id
        )
        SELECT base.doc_id,
               CAST(total_token_chars AS INTEGER) AS total_token_chars,
               {top} AS top2_char_frac,
               {dup} AS dup5_char_frac,
               ({top} <= {quality.MAX_TOP_NGRAM_CHAR_FRAC}
                AND {dup} <= {quality.MAX_DUP_NGRAM_CHAR_FRAC}) AS rep_keep
        FROM base
        LEFT JOIN a2 USING (doc_id)
        LEFT JOIN a5 USING (doc_id)
    """


def _boilerplate_oracle() -> str:
    frac = (
        "ROUND(COALESCE(n_boiler, 0) * 1.0"
        " / GREATEST(COALESCE(n_grams, 0), 1), 4)"
    )
    return f"""
        WITH b AS (
            SELECT doc_id, {_TOKS} AS w FROM documents
        ), dg AS (
            SELECT doc_id, gram, COUNT(*) AS cnt
            FROM (SELECT doc_id,
                         unnest({_gram_multiset_sql(quality.BOILERPLATE_N)})
                             AS gram
                  FROM b)
            GROUP BY doc_id, gram
        ), boiler AS (
            SELECT gram FROM (SELECT gram, COUNT(*) AS df FROM dg GROUP BY 1)
            WHERE df >= {quality.BOILERPLATE_MIN_DF}
        ), per AS (
            SELECT dg.doc_id, SUM(cnt) AS n_grams,
                   SUM(CASE WHEN boiler.gram IS NOT NULL THEN cnt ELSE 0 END)
                       AS n_boiler
            FROM dg LEFT JOIN boiler USING (gram)
            GROUP BY dg.doc_id
        )
        SELECT b.doc_id,
               CAST(COALESCE(n_grams, 0) AS INTEGER) AS n_grams,
               CAST(COALESCE(n_boiler, 0) AS INTEGER) AS n_boiler,
               {frac} AS boiler_frac,
               ({frac} <= {quality.MAX_BOILERPLATE_FRAC}) AS bp_keep
        FROM b LEFT JOIN per USING (doc_id)
    """


ORACLE = {
    "doc_quality_signals": f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ), s AS (
            SELECT doc_id,
                   CAST(len(toks) AS INTEGER) AS n_tokens,
                   ROUND(list_sum(list_transform(toks, x -> length(x))) * 1.0
                         / GREATEST(len(toks), 1), 4) AS mean_word_len,
                   ROUND((len(toks) - len(list_distinct(toks))) * 1.0
                         / GREATEST(len(toks), 1), 4) AS dup_token_ratio,
                   ROUND(len(list_filter(toks, x -> lower(x) IN {_STOP})) * 1.0
                         / GREATEST(len(toks), 1), 4) AS stop_ratio
            FROM t
        )
        SELECT doc_id, n_tokens, mean_word_len, dup_token_ratio, stop_ratio,
               (n_tokens >= {quality.MIN_TOKENS}
                AND n_tokens <= {quality.MAX_TOKENS}
                AND mean_word_len >= {quality.MIN_MEAN_WORD_LEN}
                AND mean_word_len <= {quality.MAX_MEAN_WORD_LEN}
                AND dup_token_ratio <= {quality.MAX_DUP_TOKEN_RATIO}
                AND stop_ratio >= {quality.MIN_STOPWORD_RATIO}) AS keep
        FROM s
    """,
    "pii_scrub": _pii_oracle(),
    "doc_repetition_signals": _repetition_oracle(),
    "doc_boilerplate_signals": _boilerplate_oracle(),
    "benchmark_contamination": f"""
        WITH toks AS (SELECT doc_id, {_TOKS8} AS toks FROM documents),
        cg AS (SELECT doc_id, unnest(toks) AS gram FROM toks),
        bg AS (SELECT DISTINCT doc_id AS bench_id, gram
               FROM (SELECT doc_id, unnest(toks) AS gram FROM toks
                     WHERE doc_id % {BENCH_MOD} = 0)),
        hits AS (SELECT c.doc_id, c.gram, b.bench_id
                 FROM cg c JOIN bg b USING (gram)
                 WHERE c.doc_id <> b.bench_id)
        SELECT doc_id,
               COUNT(DISTINCT gram) AS n_shared_grams,
               COUNT(DISTINCT bench_id) AS n_bench_docs
        FROM hits GROUP BY doc_id
    """,
    "pack_chunks": f"""
        WITH t AS (
            SELECT doc_id, CAST(len({_TOKS}) AS INTEGER) AS n_tokens
            FROM documents
        ), c AS (
            SELECT doc_id, n_tokens,
                   CAST(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM t
        )
        SELECT doc_id, n_tokens, cum_tokens,
               CAST(FLOOR((cum_tokens - n_tokens)
                          / {quality.PACK_BLOCK_TOKENS}.0) AS BIGINT)
                   AS chunk_first,
               CAST(FLOOR((cum_tokens - 1)
                          / {quality.PACK_BLOCK_TOKENS}.0) AS BIGINT)
                   AS chunk_last
        FROM c
    """,
    "span_dedup": f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS toks,
                   len({_TOKS}) AS n
            FROM {{span_src}}
        ), b AS (
            SELECT doc_id, toks, n,
                   CAST(CEIL(n / {quality.SPAN_TOKENS}.0) AS INTEGER)
                       AS n_spans
            FROM t WHERE n > 0
        ), s AS (
            SELECT doc_id, toks, n_spans,
                   unnest(generate_series(0, n_spans - 1)) AS pos
            FROM b
        ), sp AS (
            SELECT doc_id, n_spans, pos,
                   array_to_string(
                       toks[pos * {quality.SPAN_TOKENS} + 1
                            : pos * {quality.SPAN_TOKENS}
                              + {quality.SPAN_TOKENS}], ' ') AS span_text
            FROM s
        ), k AS (
            SELECT doc_id, n_spans, pos, span_text,
                   ROW_NUMBER() OVER (PARTITION BY md5(span_text)
                                      ORDER BY doc_id, pos) AS rn
            FROM sp
        ), kept AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS INTEGER) AS n_kept_spans,
                   CAST(SUM(len(string_split(span_text, ' ')))
                        AS INTEGER) AS n_kept_tokens,
                   md5(string_agg(span_text, ' ' ORDER BY pos))
                       AS kept_md5
            FROM k WHERE rn = 1 GROUP BY doc_id
        )
        SELECT b.doc_id, b.n_spans,
               COALESCE(kept.n_kept_spans, 0) AS n_kept_spans,
               COALESCE(kept.n_kept_tokens, 0) AS n_kept_tokens,
               COALESCE(kept.kept_md5, md5('')) AS kept_md5
        FROM b LEFT JOIN kept ON b.doc_id = kept.doc_id
    """,
    "doc_chunks": f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS toks,
                   CAST(len({_TOKS}) AS INTEGER) AS n
            FROM documents
        ), d AS (
            SELECT doc_id, toks, n,
                   CASE WHEN n <= {quality.CHUNK_WINDOW_TOKENS} THEN 1
                        ELSE (n - {quality.CHUNK_WINDOW_TOKENS}
                              + {quality.CHUNK_STRIDE_TOKENS - 1})
                             // {quality.CHUNK_STRIDE_TOKENS} + 1
                   END AS n_chunks
            FROM t
        ), e AS (
            SELECT doc_id, toks, n,
                   unnest(generate_series(0, n_chunks - 1)) AS ci
            FROM d
        )
        SELECT doc_id,
               CAST(ci AS INTEGER) AS chunk_idx,
               CAST(ci * {quality.CHUNK_STRIDE_TOKENS} AS INTEGER)
                   AS chunk_start,
               CAST(LEAST({quality.CHUNK_WINDOW_TOKENS},
                          n - ci * {quality.CHUNK_STRIDE_TOKENS}) AS INTEGER)
                   AS chunk_len,
               md5(array_to_string(
                   toks[ci * {quality.CHUNK_STRIDE_TOKENS} + 1
                        : ci * {quality.CHUNK_STRIDE_TOKENS}
                          + LEAST({quality.CHUNK_WINDOW_TOKENS},
                                  n - ci * {quality.CHUNK_STRIDE_TOKENS})],
                   ' ')) AS chunk_md5,
               n AS n_tokens
        FROM e
    """,
    "corpus_report": f"""
        WITH qt AS (
            SELECT source, lang, {_TOKS} AS toks FROM documents
        ), base AS (
            SELECT source, lang,
                   CASE WHEN {_KEEP_PRED} THEN 1 ELSE 0 END AS keep,
                   len(toks) AS n_tokens
            FROM qt
        )
        SELECT source, lang,
               COUNT(*) AS n_docs,
               CAST(SUM(keep) AS BIGINT) AS n_kept,
               CAST((SUM(keep) * 10000) // COUNT(*) AS BIGINT)
                   AS kept_per_10k,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM base GROUP BY ROLLUP(source, lang)
    """,
    "token_budget_select": f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ), s AS (
            SELECT doc_id,
                   CAST(len(list_distinct(toks)) AS INTEGER)
                       AS n_distinct_tokens,
                   CAST(len(toks) AS INTEGER) AS n_tokens
            FROM t
        ), c AS (
            SELECT *,
                   CAST(SUM(n_tokens) OVER (
                       ORDER BY n_distinct_tokens DESC, doc_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM s
        ), b AS (
            SELECT CAST(FLOOR(SUM(n_tokens)
                        * {quality.TOKEN_BUDGET_FRAC}) AS BIGINT) AS budget
            FROM s
        )
        SELECT doc_id, n_distinct_tokens, n_tokens, cum_tokens,
               cum_tokens <= budget AS selected
        FROM c, b
    """,
    "corpus_shards": f"""
        WITH t AS (
            SELECT doc_id,
                   CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM documents
        ), r AS (
            SELECT *, ROW_NUMBER() OVER (ORDER BY doc_id) AS rn FROM t
        )
        SELECT CAST(FLOOR((rn - 1) / {quality.SHARD_DOCS}.0) AS BIGINT)
                   AS shard_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS shard_chars,
               MIN(doc_id) AS first_doc,
               MAX(doc_id) AS last_doc
        FROM r GROUP BY 1
    """,
}


_SPAN_DEDUP_TMPL = ORACLE["span_dedup"]


def span_dedup_sql(src: str) -> str:
    """The span-dedup oracle parameterized on its source relation —
    the _sig_cte convention: composition queries (pipeline_full
    web_corpus_prep) run the IDENTICAL span chain on a filtered
    corpus by naming their survivor CTE here."""
    return _SPAN_DEDUP_TMPL.replace("{span_src}", src)


ORACLE["span_dedup"] = span_dedup_sql("documents")


def _bpe_pack_sql() -> str:
    """Build the bpe_pack_chunks oracle by splicing the SAME frozen
    merge table as the Spark side (single-constant pattern; the chain
    builder lives beside the bpe_merge_tokens oracle in llm_text)."""
    from ..operators import bpe as _bpe_ops
    from .llm_text import _BPE_D, _BPE_PIECES, _bpe_chain_sql

    chain = _bpe_chain_sql("p", _bpe_ops.BPE_MERGES_V1)
    n = (
        f"CAST(COALESCE(list_sum(list_transform({_BPE_PIECES}, "
        f"p -> (length({chain}) - length(replace({chain}, '{_BPE_D}', '')))"
        f" // 2)), 0) AS INTEGER)"
    )
    return f"""
        WITH t AS (
            SELECT doc_id, {n} AS n_tokens FROM documents
        ), c AS (
            SELECT doc_id, n_tokens,
                   CAST(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM t
        )
        SELECT doc_id, n_tokens, cum_tokens,
               CAST(FLOOR((cum_tokens - n_tokens)
                          / {quality.PACK_BLOCK_TOKENS}.0) AS BIGINT)
                   AS chunk_first,
               CAST(FLOOR((cum_tokens - 1)
                          / {quality.PACK_BLOCK_TOKENS}.0) AS BIGINT)
                   AS chunk_last
        FROM c
    """


ORACLE["bpe_pack_chunks"] = _bpe_pack_sql()

def _ablation_oracle(relation: str = "documents", prelude: str = "") -> str:
    """quality_ablation_report twin: the same six fail flags (same
    rounding as _KEEP_PRED's conjuncts, list_sum COALESCEd because an
    empty token list is NULL in DuckDB but 0 in Spark's aggregate),
    one agg row, six UNION ALL signal rows. ``relation``/``prelude``
    are the composition hook (the span_dedup_sql convention): a caller
    can prepend its own CTE chain and point the report at any relation
    with a text column — pipeline_full wraps the web-funnel CTEs this
    way for quality_ablation_web."""
    flags = {
        "min_tokens": f"n_tokens < {quality.MIN_TOKENS}",
        "max_tokens": f"n_tokens > {quality.MAX_TOKENS}",
        "mean_word_len_low": f"mean_wl < {quality.MIN_MEAN_WORD_LEN}",
        "mean_word_len_high": f"mean_wl > {quality.MAX_MEAN_WORD_LEN}",
        "dup_token_ratio": f"dup_ratio > {quality.MAX_DUP_TOKEN_RATIO}",
        "stop_ratio": f"stop_ratio < {quality.MIN_STOPWORD_RATIO}",
    }
    assert tuple(flags) == quality.ABLATION_SIGNALS
    flag_cols = ",\n               ".join(
        f"CASE WHEN {cond} THEN 1 ELSE 0 END AS f_{n}"
        for n, cond in flags.items()
    )
    nf = " + ".join(f"f_{n}" for n in flags)
    aggs = ",\n               ".join(
        f"SUM(f_{n}) AS fail_{n}, "
        f"SUM(CASE WHEN f_{n} = 1 AND nf = 1 THEN 1 ELSE 0 END) AS alone_{n}"
        for n in flags
    )
    rows = "\n        UNION ALL\n        ".join(
        f"SELECT '{n}' AS signal, CAST(fail_{n} AS BIGINT) AS n_fail, "
        f"CAST(alone_{n} AS BIGINT) AS n_fail_alone, n_docs, "
        f"CAST(n_kept AS BIGINT) AS n_kept FROM a"
        for n in flags
    )
    return f"""
        WITH {prelude}t AS (SELECT {_TOKS} AS toks FROM {relation}),
        s AS (SELECT
               len(toks) AS n_tokens,
               ROUND(COALESCE(list_sum(list_transform(toks, x -> length(x))),
                              0) * 1.0 / GREATEST(len(toks), 1), 4)
                   AS mean_wl,
               ROUND((len(toks) - len(list_distinct(toks))) * 1.0
                     / GREATEST(len(toks), 1), 4) AS dup_ratio,
               ROUND(len(list_filter(toks, x -> lower(x) IN {_STOP})) * 1.0
                     / GREATEST(len(toks), 1), 4) AS stop_ratio
              FROM t),
        f AS (SELECT {flag_cols} FROM s),
        g AS (SELECT *, {nf} AS nf FROM f),
        a AS (SELECT COUNT(*) AS n_docs,
               SUM(CASE WHEN nf = 0 THEN 1 ELSE 0 END) AS n_kept,
               {aggs}
              FROM g)
        {rows}
    """


ORACLE["quality_ablation_report"] = _ablation_oracle()

# --- LM-perplexity quality filter (the CCNet recipe) ---------------
#
# Reference slice: every 10th document plays the "clean reference"
# (CCNet fits on Wikipedia and scores Common Crawl; the slice is the
# deterministic stand-in). Threshold 3.55 sits just above the sf0.01
# median ln-perplexity (3.52, range 3.17-4.06) so the verdict splits
# the corpus non-trivially. LOW perplexity = reference-like = keep.
LM_REF_MOD = 10
LM_PPL_THRESHOLD = 3.55

# One LM fit per corpus per session (the _IVF_CENTROIDS convention):
# a production filter fits its reference model once and scores many
# batches; the cached maps are plain Python (session-cache-safe).
_LM_MODELS: dict[str, tuple[dict, dict, int]] = {}


def _lm_model(spark: SparkSession, sf_dir: str) -> tuple[dict, dict, int]:
    m = _LM_MODELS.get(sf_dir)
    if m is None:
        ref = read_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % LM_REF_MOD == 0
        )
        m = lmfilter.fit_bigram_model(ref)
        _LM_MODELS[sf_dir] = m
    return m


def lm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document ln-perplexity under a Laplace-smoothed bigram LM
    fit on the reference slice, with the CCNet keep verdict and the
    OOV-transition diagnostic (operators/lmfilter.py). The oracle
    refits the model from the same slice and replays the smoothing
    formula, the 12-digit-rounded per-transition logs, the
    position-ordered left-assoc fold, and the rounded threshold
    verdict — fit and score both certified."""
    uni, bi, vocab = _lm_model(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents")
    return lmfilter.score_perplexity(
        docs,
        lmfilter.model_row(spark, uni, bi),
        vocab,
        LM_PPL_THRESHOLD,
    )


# The twin refits the counts and restates the one smoothing
# expression; list(lp ORDER BY i) + the 0.0-seeded list_reduce is the
# position-ordered left-assoc fold matching F.aggregate exactly, and
# both sides round each ln to 12 BEFORE the fold (ln is the one
# non-IEEE-exact op in the oracle surface — see lmfilter.py).
ORACLE["lm_perplexity_filter"] = """
    WITH refdocs AS (
        SELECT {toks} AS toks FROM documents WHERE doc_id % {mod} = 0
    ),
    uni AS (
        SELECT w, COUNT(*) AS c
        FROM (SELECT unnest(toks) AS w FROM refdocs) GROUP BY w
    ),
    v AS (SELECT COUNT(*) AS vs FROM uni),
    bi AS (
        SELECT w1, w2, COUNT(*) AS c FROM (
            SELECT toks[i] AS w1, toks[i + 1] AS w2
            FROM (SELECT toks,
                         unnest(generate_series(1, len(toks) - 1)) AS i
                  FROM refdocs WHERE len(toks) >= 2)
        ) GROUP BY w1, w2
    ),
    d AS (SELECT doc_id, {toks} AS toks FROM documents),
    trans AS (
        SELECT doc_id, i, toks[i] AS w1, toks[i + 1] AS w2
        FROM (SELECT doc_id, toks,
                     unnest(generate_series(1, len(toks) - 1)) AS i
              FROM d WHERE len(toks) >= 2)
    ),
    scored AS (
        SELECT t.doc_id, t.i,
               ROUND(ln((COALESCE(b.c, 0) + 1) * 1.0
                        / (COALESCE(u.c, 0) + v.vs)), {lr}) AS lp,
               CASE WHEN b.c IS NULL THEN 1 ELSE 0 END AS oov
        FROM trans t
        LEFT JOIN bi b ON b.w1 = t.w1 AND b.w2 = t.w2
        LEFT JOIN uni u ON u.w = t.w1
        CROSS JOIN v
    ),
    agg AS (
        SELECT doc_id, COUNT(*) AS n_trans,
               CAST(SUM(oov) AS INTEGER) AS n_oov,
               list_reduce([0.0] || list(lp ORDER BY i),
                           (a, x) -> a + x) AS s
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_trans AS INTEGER) AS n_trans, n_oov,
           ROUND(-s / n_trans, {pr}) AS ppl,
           ROUND(-s / n_trans, {pr}) <= {th} AS kept
    FROM agg
""".format(
    toks=_TOKS,
    mod=LM_REF_MOD,
    lr=lmfilter.LOG_ROUND,
    pr=lmfilter.PPL_ROUND,
    th=LM_PPL_THRESHOLD,
)

# --- interpolated 3-gram depth (the KenLM shape; r11 verdict #4) ---
#
# Threshold 3.96 sits just above the sf0.01 median ln-perplexity
# (3.9564; quartiles 3.83 / 3.96 / 4.05) so the verdict splits the
# corpus non-trivially at every scale factor.
LM3_PPL_THRESHOLD = 3.96

_LM3_MODELS: dict[str, tuple[dict, dict, dict, int, int]] = {}


def _lm3_model(
    spark: SparkSession, sf_dir: str
) -> tuple[dict, dict, dict, int, int]:
    m = _LM3_MODELS.get(sf_dir)
    if m is None:
        ref = read_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % LM_REF_MOD == 0
        )
        m = lmfilter.fit_trigram_model(ref)
        _LM3_MODELS[sf_dir] = m
    return m


# Per-language threshold: 3.50 sits at the per-lang medians
# (3.46-3.54 across langs at sf0.001/0.01) so the verdict splits every
# language non-trivially.
LM_LANG_PPL_THRESHOLD = 3.50


def lm_perplexity_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet proper: a reference LM PER LANGUAGE (Wenzek et al. §4.3
    fit one Wikipedia model per language — a shared model punishes
    every non-majority language as 'unlike the reference'). The fit
    is one explode+hash-agg pass with lang riding the grouping keys
    (lmfilter.fit_bigram_frames_per_key — the union of per-language
    vocabularies is the case the distributed-fit posture exists for);
    scoring joins each document's transitions to ITS OWN language's
    counts (broadcast hash joins, the 3-gram scorer's shape) with the
    bigram filter's exact smoothing and rounding. Documents of
    unmodeled languages are excluded by the inner vocab join — no
    model, no score. The oracle refits all per-lang tables and
    replays smoothing, fold order, and verdict."""
    ref = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % LM_REF_MOD == 0
    )
    uni, bi, vocab = lmfilter.fit_bigram_frames_per_key(ref)
    docs = read_table(spark, sf_dir, "documents")
    return lmfilter.score_perplexity_per_key(
        docs, uni, bi, vocab, LM_LANG_PPL_THRESHOLD
    )


def ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail corpus split (Wenzek et al. LREC'20
    §4.3): per-LANGUAGE perplexity terciles, each language scored
    under ITS OWN reference model (lm_perplexity_per_lang — the
    recipe's actual scorer; ADVICE r13 flagged the earlier shared-
    reference scoring as a fidelity gap) — the shape CCNet actually
    ships Common Crawl in (head = most reference-like third of each
    language, the slice most pipelines train on first). Composes the
    certified per-language scorer with the distributed-rank NTILE: a
    ``Window.partitionBy(lang)`` would funnel each language through
    ONE task (three langs here — three straggler tasks at 100x data),
    so the per-lang rank comes from operators.ranking.distributed_rank
    and the tercile is arithmetic on (rank, group size), identical to
    NTILE(3) (the order_value_ntile precedent). The oracle wraps the
    per-language refit-and-replay oracle verbatim and buckets with
    real NTILE. Documents of unmodeled languages are absent here
    exactly as they are from the scorer (no model, no bucket)."""
    from ..operators.ranking import distributed_rank, ntile_expr

    scored = lm_perplexity_per_lang(spark, sf_dir).select(
        "doc_id", "lang", "ppl"
    )
    ranked = distributed_rank(
        scored,
        partition_cols=["lang"],
        order_cols=["ppl", "doc_id"],
        rank_col="_rn",
        size_col="_n",
    )
    b = ntile_expr(F.col("_rn"), F.col("_n"), 3)
    return ranked.select(
        "doc_id",
        "lang",
        "ppl",
        F.when(b == 1, F.lit("head"))
        .when(b == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def lm_perplexity_filter_3gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LM filter at the depth curation teams actually run (the
    KenLM-shaped CCNet scorer): per-document ln-perplexity under an
    interpolated 3-gram backoff model fit on the reference slice, with
    fixed Jelinek-Mercer weights and a Laplace unigram floor
    (operators/lmfilter.py:_interpolated3 — the one smoothing site,
    restated verbatim by the oracle; counts attach via broadcast HASH
    joins over exploded transitions, never a map column — a trigram
    table is big enough that Spark's linear-scan map lookup becomes
    the query, measured 25 s vs 3 s at sf0.1). The oracle refits all
    three count tables from the same slice and replays the
    interpolation arithmetic in the pinned operation order, the
    12-digit-rounded per-transition logs, the position-ordered
    left-assoc fold, and the rounded threshold verdict — fit and
    score both certified, same as the bigram row."""
    uni, bi, tri, vocab, n_tokens = _lm3_model(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents")
    u_df, b_df, t_df = lmfilter.trigram_model_frames(spark, uni, bi, tri)
    return lmfilter.score_perplexity_3gram(
        docs, u_df, b_df, t_df, vocab, n_tokens, LM3_PPL_THRESHOLD
    )


def lm_perplexity_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3-gram LM filter with CHUNKED scoring (VERDICT r13 item 4 —
    the production kill for the per-document regroup bound): documents
    cut into non-overlapping 32-token chunks, each chunk scored by the
    unchanged certified 3-gram scorer (regroup group size <= 30 by
    construction, whatever the document length — CCNet itself scores
    paragraph units, Wenzek et al. §3.3), then a chunk-ordered
    transition-weighted recombine per document. The oracle refits the
    model, drops boundary-crossing trigrams, and replays chunk fold,
    rounding, and recombine."""
    uni, bi, tri, vocab, n_tokens = _lm3_model(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents")
    u_df, b_df, t_df = lmfilter.trigram_model_frames(spark, uni, bi, tri)
    return lmfilter.score_perplexity_3gram_chunked(
        docs, u_df, b_df, t_df, vocab, n_tokens, LM_CHUNKED_PPL_THRESHOLD
    )


def lm_perplexity_filter_3gram_dist(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 3-gram LM filter through its PRODUCTION fit path
    (lmfilter.fit_trigram_frames — the count frames stay DISTRIBUTED;
    the model never round-trips through the driver, which is the path
    a deployment wires when the reference trigram table outgrows
    driver dicts) and with ``broadcast_model=False`` scoring (no
    broadcast hints planted — the planner picks the join strategy the
    runtime sizes allow, the honest configuration for a
    driver-scale-exceeding model; r12 advisory). Fit and score are
    held to the SAME refit-and-replay oracle as the session-cache row
    VERBATIM — the distributed fit and the hint-free join scoring
    must be value-identical to the dict path, or the hash breaks.
    The fit runs inside the row (its checkpointed frames cannot
    outlive a harness's release_checkpoints between queries); the
    whole pipeline is still two bounded count scans + five joins +
    one regroup."""
    ref = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % LM_REF_MOD == 0
    )
    uni, bi, tri, vocab, n_tokens = lmfilter.fit_trigram_frames(ref)
    docs = read_table(spark, sf_dir, "documents")
    return lmfilter.score_perplexity_3gram(
        docs,
        uni,
        bi,
        tri,
        vocab,
        n_tokens,
        LM3_PPL_THRESHOLD,
        broadcast_model=False,
    )


# The 3-gram twin: refits uni/bi/tri counts, restates the one
# interpolation expression with the SAME left-assoc parenthesization
# ((L*num)/den per term; (t3+t2)+t1), rounds each ln to 12 BEFORE the
# position-ordered fold, and replays the verdict. N (total reference
# tokens) and V (vocabulary) both derive from the refit uni table.
ORACLE["lm_perplexity_filter_3gram"] = """
    WITH refdocs AS (
        SELECT {toks} AS toks FROM documents WHERE doc_id % {mod} = 0
    ),
    uni AS (
        SELECT w, COUNT(*) AS c
        FROM (SELECT unnest(toks) AS w FROM refdocs) GROUP BY w
    ),
    v AS (SELECT COUNT(*) AS vs FROM uni),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS nt FROM uni),
    bi AS (
        SELECT w1, w2, COUNT(*) AS c FROM (
            SELECT toks[i] AS w1, toks[i + 1] AS w2
            FROM (SELECT toks,
                         unnest(generate_series(1, len(toks) - 1)) AS i
                  FROM refdocs WHERE len(toks) >= 2)
        ) GROUP BY w1, w2
    ),
    tri AS (
        SELECT w1, w2, w3, COUNT(*) AS c FROM (
            SELECT toks[i] AS w1, toks[i + 1] AS w2, toks[i + 2] AS w3
            FROM (SELECT toks,
                         unnest(generate_series(1, len(toks) - 2)) AS i
                  FROM refdocs WHERE len(toks) >= 3)
        ) GROUP BY w1, w2, w3
    ),
    d AS (SELECT doc_id, {toks} AS toks FROM documents),
    trans AS (
        SELECT doc_id, i, toks[i] AS w1, toks[i + 1] AS w2,
               toks[i + 2] AS w3
        FROM (SELECT doc_id, toks,
                     unnest(generate_series(1, len(toks) - 2)) AS i
              FROM d WHERE len(toks) >= 3)
    ),
    scored AS (
        SELECT t.doc_id, t.i,
               ROUND(ln(
                   (CASE WHEN COALESCE(b12.c, 0) > 0
                         THEN ({l3} * COALESCE(tr.c, 0)) / b12.c
                         ELSE 0.0 END
                    + CASE WHEN COALESCE(u2.c, 0) > 0
                           THEN ({l2} * COALESCE(b23.c, 0)) / u2.c
                           ELSE 0.0 END)
                   + ({l1} * (COALESCE(u3.c, 0) + 1)) / (n.nt + v.vs)
               ), {lr}) AS lp,
               CASE WHEN tr.c IS NULL THEN 1 ELSE 0 END AS oov
        FROM trans t
        LEFT JOIN tri tr
               ON tr.w1 = t.w1 AND tr.w2 = t.w2 AND tr.w3 = t.w3
        LEFT JOIN bi b12 ON b12.w1 = t.w1 AND b12.w2 = t.w2
        LEFT JOIN bi b23 ON b23.w1 = t.w2 AND b23.w2 = t.w3
        LEFT JOIN uni u2 ON u2.w = t.w2
        LEFT JOIN uni u3 ON u3.w = t.w3
        CROSS JOIN v CROSS JOIN n
    ),
    agg AS (
        SELECT doc_id, COUNT(*) AS n_trans,
               CAST(SUM(oov) AS INTEGER) AS n_oov,
               list_reduce([0.0] || list(lp ORDER BY i),
                           (a, x) -> a + x) AS s
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_trans AS INTEGER) AS n_trans, n_oov,
           ROUND(-s / n_trans, {pr}) AS ppl,
           ROUND(-s / n_trans, {pr}) <= {th} AS kept
    FROM agg
""".format(
    toks=_TOKS,
    mod=LM_REF_MOD,
    lr=lmfilter.LOG_ROUND,
    pr=lmfilter.PPL_ROUND,
    th=LM3_PPL_THRESHOLD,
    l3=lmfilter.JM_L3,
    l2=lmfilter.JM_L2,
    l1=lmfilter.JM_L1,
)

# The distributed-fit row reuses the session-cache row's oracle STRING
# verbatim: fit_trigram_frames and hint-free joins must be value-
# identical to the dict path (the knn_pq_streamed/compacted pattern —
# a lossy fit round-trip or a join-strategy-dependent divergence
# breaks the hash).
ORACLE["lm_perplexity_filter_3gram_dist"] = ORACLE[
    "lm_perplexity_filter_3gram"
]

# Chunked 3-gram scoring (VERDICT r13 item 4): the oracle refits the
# same three count tables, keeps only trigrams that fit inside one
# window-token chunk ((i-1) % W <= W-3 — transitions never cross a
# boundary), replays the per-chunk position-ordered fold + rounding,
# then the per-doc chunk-ordered weighted recombine. Threshold 3.96 =
# the 3-gram row's (chunked quartiles at sf0.01: 3.83/3.956/4.05 —
# the verdict still splits the corpus non-trivially).
LM_CHUNKED_PPL_THRESHOLD = 3.96
ORACLE["lm_perplexity_chunked"] = """
    WITH refdocs AS (
        SELECT {toks} AS toks FROM documents WHERE doc_id % {mod} = 0
    ),
    uni AS (
        SELECT w, COUNT(*) AS c
        FROM (SELECT unnest(toks) AS w FROM refdocs) GROUP BY w
    ),
    v AS (SELECT COUNT(*) AS vs FROM uni),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS nt FROM uni),
    bi AS (
        SELECT w1, w2, COUNT(*) AS c FROM (
            SELECT toks[i] AS w1, toks[i + 1] AS w2
            FROM (SELECT toks,
                         unnest(generate_series(1, len(toks) - 1)) AS i
                  FROM refdocs WHERE len(toks) >= 2)
        ) GROUP BY w1, w2
    ),
    tri AS (
        SELECT w1, w2, w3, COUNT(*) AS c FROM (
            SELECT toks[i] AS w1, toks[i + 1] AS w2, toks[i + 2] AS w3
            FROM (SELECT toks,
                         unnest(generate_series(1, len(toks) - 2)) AS i
                  FROM refdocs WHERE len(toks) >= 3)
        ) GROUP BY w1, w2, w3
    ),
    d AS (SELECT doc_id, {toks} AS toks FROM documents),
    trans AS (
        SELECT doc_id, (i - 1) // {w} AS chunk, i,
               toks[i] AS w1, toks[i + 1] AS w2, toks[i + 2] AS w3
        FROM (SELECT doc_id, toks,
                     unnest(generate_series(1, len(toks) - 2)) AS i
              FROM d WHERE len(toks) >= 3)
        WHERE (i - 1) % {w} <= {w} - 3
    ),
    scored AS (
        SELECT t.doc_id, t.chunk, t.i,
               ROUND(ln(
                   (CASE WHEN COALESCE(b12.c, 0) > 0
                         THEN ({l3} * COALESCE(tr.c, 0)) / b12.c
                         ELSE 0.0 END
                    + CASE WHEN COALESCE(u2.c, 0) > 0
                           THEN ({l2} * COALESCE(b23.c, 0)) / u2.c
                           ELSE 0.0 END)
                   + ({l1} * (COALESCE(u3.c, 0) + 1)) / (n.nt + v.vs)
               ), {lr}) AS lp,
               CASE WHEN tr.c IS NULL THEN 1 ELSE 0 END AS oov
        FROM trans t
        LEFT JOIN tri tr
               ON tr.w1 = t.w1 AND tr.w2 = t.w2 AND tr.w3 = t.w3
        LEFT JOIN bi b12 ON b12.w1 = t.w1 AND b12.w2 = t.w2
        LEFT JOIN bi b23 ON b23.w1 = t.w2 AND b23.w2 = t.w3
        LEFT JOIN uni u2 ON u2.w = t.w2
        LEFT JOIN uni u3 ON u3.w = t.w3
        CROSS JOIN v CROSS JOIN n
    ),
    cagg AS (
        SELECT doc_id, chunk, COUNT(*) AS n_trans,
               CAST(SUM(oov) AS INTEGER) AS n_oov,
               list_reduce([0.0] || list(lp ORDER BY i),
                           (a, x) -> a + x) AS s
        FROM scored GROUP BY doc_id, chunk
    ),
    cp AS (SELECT doc_id, chunk, n_trans, n_oov,
                  ROUND(-s / n_trans, {pr}) AS ppl FROM cagg),
    dagg AS (
        SELECT doc_id,
               CAST(COUNT(*) AS INTEGER) AS n_chunks,
               CAST(SUM(n_trans) AS INTEGER) AS n_trans,
               CAST(SUM(n_oov) AS INTEGER) AS n_oov,
               list_reduce([0.0] || list(ppl * n_trans ORDER BY chunk),
                           (a, x) -> a + x) AS num
        FROM cp GROUP BY doc_id
    )
    SELECT doc_id, n_chunks, n_trans, n_oov,
           ROUND(num / n_trans, {pr}) AS ppl,
           ROUND(num / n_trans, {pr}) <= {th} AS kept
    FROM dagg
""".format(
    toks=_TOKS,
    mod=LM_REF_MOD,
    w=lmfilter.CHUNK_SCORE_WINDOW,
    lr=lmfilter.LOG_ROUND,
    pr=lmfilter.PPL_ROUND,
    th=LM_CHUNKED_PPL_THRESHOLD,
    l3=lmfilter.JM_L3,
    l2=lmfilter.JM_L2,
    l1=lmfilter.JM_L1,
)

# --- Kneser-Ney depth (the smoothing KenLM actually ships) ---------
#
# Threshold sits just above the sf0.01 median KN ln-perplexity
# (3.5717; quartiles 3.49 / 3.57 / 3.64) so the verdict splits the
# corpus non-trivially at every scale factor.
LM_KN_PPL_THRESHOLD = 3.58

_LM_KN_MODELS: dict[str, tuple[dict, dict, dict, dict, int, int]] = {}


def _lm_kn_model(
    spark: SparkSession, sf_dir: str
) -> tuple[dict, dict, dict, dict, int, int]:
    m = _LM_KN_MODELS.get(sf_dir)
    if m is None:
        ref = read_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % LM_REF_MOD == 0
        )
        m = lmfilter.fit_kn_bigram_model(ref)
        _LM_KN_MODELS[sf_dir] = m
    return m


def lm_perplexity_filter_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LM filter under interpolated KNESER-NEY smoothing — the
    family KenLM ships (Chen & Goodman 1998 §2.7; absolute discount
    D=0.75, and the lower-order model is the CONTINUATION distribution
    N1+(·w2)/N1+(··), not raw frequency — 'how many contexts does this
    word follow', the fix for Laplace/JM's overestimate of words that
    are frequent only inside one collocation). Laplace-floored
    continuation keeps ln defined for OOV. Same bounded reference-fit,
    broadcast-row scoring, and round-before-fold discipline as the
    bigram row; the oracle refits ALL the count tables — including the
    distinct-continuation and distinct-history counts — and replays
    the discount/interpolation arithmetic in the pinned operation
    order (operators/lmfilter.py _kn_transition_score, the one
    smoothing site)."""
    hist, bi, foll, pred, n_bigrams, vocab = _lm_kn_model(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents")
    return lmfilter.score_perplexity_kn(
        docs,
        lmfilter.kn_model_row(spark, hist, bi, foll, pred),
        n_bigrams,
        vocab,
        LM_KN_PPL_THRESHOLD,
    )


# The KN twin: refits bi AND the continuation tables (HISTORY counts
# c(w1.) as the interpolation denominator — see fit_kn_bigram_model's
# docstring for why unigram counts there would produce ln(0) —
# follower counts per history, predecessor counts per word, total
# distinct bigrams) from the same slice, restates the one smoothing
# expression with the SAME left-assoc parenthesization
# (GREATEST(cb-D,0)/hc + ((D*f1)/hc) * pc, pc = (p2+1)/(B+V)), rounds
# each ln to 12 BEFORE the position-ordered fold, and replays the
# verdict.
ORACLE["lm_perplexity_filter_kn"] = """
    WITH refdocs AS (
        SELECT {toks} AS toks FROM documents WHERE doc_id % {mod} = 0
    ),
    uni AS (
        SELECT w, COUNT(*) AS c
        FROM (SELECT unnest(toks) AS w FROM refdocs) GROUP BY w
    ),
    v AS (SELECT COUNT(*) AS vs FROM uni),
    bi AS (
        SELECT w1, w2, COUNT(*) AS c FROM (
            SELECT toks[i] AS w1, toks[i + 1] AS w2
            FROM (SELECT toks,
                         unnest(generate_series(1, len(toks) - 1)) AS i
                  FROM refdocs WHERE len(toks) >= 2)
        ) GROUP BY w1, w2
    ),
    hist AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS hc FROM bi GROUP BY w1),
    foll AS (SELECT w1, COUNT(*) AS f FROM bi GROUP BY w1),
    pred AS (SELECT w2, COUNT(*) AS p FROM bi GROUP BY w2),
    nb AS (SELECT COUNT(*) AS b FROM bi),
    d AS (SELECT doc_id, {toks} AS toks FROM documents),
    trans AS (
        SELECT doc_id, i, toks[i] AS w1, toks[i + 1] AS w2
        FROM (SELECT doc_id, toks,
                     unnest(generate_series(1, len(toks) - 1)) AS i
              FROM d WHERE len(toks) >= 2)
    ),
    scored AS (
        SELECT t.doc_id, t.i,
               ROUND(ln(
                   CASE WHEN COALESCE(h.hc, 0) > 0
                        THEN GREATEST(COALESCE(b.c, 0) - {D}, 0.0)
                               / COALESCE(h.hc, 0)
                             + (({D} * COALESCE(f.f, 0))
                                  / COALESCE(h.hc, 0))
                               * ((COALESCE(p.p, 0) + 1)
                                    / (nb.b + v.vs))
                        ELSE (COALESCE(p.p, 0) + 1) / (nb.b + v.vs)
                   END
               ), {lr}) AS lp,
               CASE WHEN b.c IS NULL THEN 1 ELSE 0 END AS oov
        FROM trans t
        LEFT JOIN bi b ON b.w1 = t.w1 AND b.w2 = t.w2
        LEFT JOIN hist h ON h.w1 = t.w1
        LEFT JOIN foll f ON f.w1 = t.w1
        LEFT JOIN pred p ON p.w2 = t.w2
        CROSS JOIN nb CROSS JOIN v
    ),
    agg AS (
        SELECT doc_id, COUNT(*) AS n_trans,
               CAST(SUM(oov) AS INTEGER) AS n_oov,
               list_reduce([0.0] || list(lp ORDER BY i),
                           (a, x) -> a + x) AS s
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_trans AS INTEGER) AS n_trans, n_oov,
           ROUND(-s / n_trans, {pr}) AS ppl,
           ROUND(-s / n_trans, {pr}) <= {th} AS kept
    FROM agg
""".format(
    toks=_TOKS,
    mod=LM_REF_MOD,
    D=repr(lmfilter.KN_DISCOUNT),
    lr=lmfilter.LOG_ROUND,
    pr=lmfilter.PPL_ROUND,
    th=LM_KN_PPL_THRESHOLD,
)

# --- model-based quality classifier (the GPT-3/LLaMA page filter) --
#
# One fit per corpus per session (the _LM_MODELS convention): a
# production filter trains its classifier once and scores many
# batches; the weight table is bounded at n_buckets rows + intercept
# (operators/qualityclf.py — the HashingTF argument).
_QC_MODELS: dict[str, list[tuple[int, int]]] = {}


def _qc_model(spark: SparkSession, sf_dir: str) -> list[tuple[int, int]]:
    m = _QC_MODELS.get(sf_dir)
    if m is None:
        docs = read_table(spark, sf_dir, "documents")
        m = qualityclf.fit_logreg(
            qualityclf.labeled_feature_counts(
                docs, F.col("doc_id") % LM_REF_MOD == 0
            )
        )
        _QC_MODELS[sf_dir] = m
    return m


def quality_classifier_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The FITTED weight table itself as the contract: (feat, w),
    one row per observed hashed feature plus the intercept, weights
    at fixed-point scale 10^QC_SCALE. The oracle re-derives the
    ENTIRE 4-step logistic fit as a CTE chain (score -> residual ->
    gradient -> update per step, all integer-exact sums, the sigmoid
    rounded straight into the fixed-point grid), so any divergence
    anywhere in the distributed fit — featurization, a gradient
    partial, an update round — moves some weight and fails the hash.
    Positives = the reference slice (doc_id % LM_REF_MOD == 0, the
    CCNet stand-in the LM filters already use), negatives = the rest
    of the pool: the GPT-3 Appendix-A construction on this corpus."""
    w = _qc_model(spark, sf_dir)
    return spark.createDataFrame(w, "feat bigint, w bigint")


def quality_classifier_scores(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document classifier verdict under the session-fitted
    weights: (doc_id, n_feats, n_grams, score, kept). The dot
    product is an exact BIGINT sum (fixed-point weights — no float
    fold-ordering discipline anywhere), the sigmoid is taken once on
    the exact total and rounded to QC_ROUND, and the keep verdict
    compares the rounded score to the corpus-calibrated threshold.
    The oracle replays fit AND scoring in one statement."""
    docs = read_table(spark, sf_dir, "documents")
    return qualityclf.score_docs(docs, _qc_model(spark, sf_dir))


def quality_classifier_select(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GPT-3's ACTUAL keep rule over the classifier scores (Brown et
    al. 2020 Appendix A): kept iff pareto(alpha=9) draw > 1 - score
    — mostly-high-scoring documents survive but every document keeps
    a heavy-tailed chance, preserving distributional breadth (the
    paper's stated reason for not hard-thresholding). The draw is
    the deterministic content-hash uniform through the Pareto
    inverse-CDF, rounded before the comparison, so the oracle
    replays fit, scores, draw, and verdict in one statement."""
    docs = read_table(spark, sf_dir, "documents")
    scored = qualityclf.score_docs(docs, _qc_model(spark, sf_dir))
    return qualityclf.pareto_select(scored)


_QC_LABEL = f"CASE WHEN doc_id % {LM_REF_MOD} = 0 THEN 1 ELSE 0 END"

ORACLE["quality_classifier_weights"] = (
    "WITH "
    + qualityclf.fit_sql(label_expr=_QC_LABEL)
    + f" SELECT feat, w FROM w{qualityclf.QC_STEPS}"
)

ORACLE["quality_classifier_scores"] = (
    "WITH "
    + qualityclf.fit_sql(label_expr=_QC_LABEL)
    + " "
    + qualityclf.score_sql(f"w{qualityclf.QC_STEPS}")
)

ORACLE["quality_classifier_select"] = (
    "WITH "
    + qualityclf.fit_sql(label_expr=_QC_LABEL)
    + ", scored AS ("
    + qualityclf.score_sql(f"w{qualityclf.QC_STEPS}")
    + ") "
    + qualityclf.pareto_select_sql("scored")
)


QUERIES = {
    "quality_classifier_weights": quality_classifier_weights,
    "quality_classifier_scores": quality_classifier_scores,
    "quality_classifier_select": quality_classifier_select,
    "lm_perplexity_filter": lm_perplexity_filter,
    "ccnet_buckets": ccnet_buckets,
    "lm_perplexity_per_lang": lm_perplexity_per_lang,
    "lm_perplexity_filter_3gram": lm_perplexity_filter_3gram,
    "lm_perplexity_filter_3gram_dist": lm_perplexity_filter_3gram_dist,
    "lm_perplexity_chunked": lm_perplexity_chunked,
    "lm_perplexity_filter_kn": lm_perplexity_filter_kn,
    "quality_ablation_report": quality_ablation_report,
    "corpus_report": corpus_report,
    "bpe_pack_chunks": bpe_pack_chunks,
    "doc_quality_signals": doc_quality_signals,
    "doc_repetition_signals": doc_repetition_signals,
    "doc_boilerplate_signals": doc_boilerplate_signals,
    "pii_scrub": pii_scrub,
    "benchmark_contamination": benchmark_contamination,
    "bloom_decontam": bloom_decontam,
    "pack_chunks": pack_chunks,
    "span_dedup": span_dedup,
    "substring_dedup": substring_dedup,
    "substring_dedup_incremental": substring_dedup_incremental,
    "doc_chunks": doc_chunks,
    "token_budget_select": token_budget_select,
    "corpus_shards": corpus_shards,
}

# The Bloom-prefiltered row is held to the PLAIN exact-overlap oracle
# verbatim: Bloom has no false negatives, so the prefilter is a
# physical rewrite with a bit-identical logical result (the salted
# twins' contract shape — the oracle never sees the filter).
ORACLE["bloom_decontam"] = ORACLE["benchmark_contamination"]

# Per-language LM filter: the bigram refit-and-replay oracle with
# lang riding every grouping/join key; the inner v-join is the
# no-model-no-score rule.
ORACLE["lm_perplexity_per_lang"] = """
    WITH refdocs AS (
        SELECT lang, {toks} AS toks FROM documents
        WHERE doc_id % {mod} = 0
    ),
    uni AS (
        SELECT lang, w, COUNT(*) AS c
        FROM (SELECT lang, unnest(toks) AS w FROM refdocs)
        GROUP BY lang, w
    ),
    v AS (SELECT lang, COUNT(*) AS vs FROM uni GROUP BY lang),
    bi AS (
        SELECT lang, w1, w2, COUNT(*) AS c FROM (
            SELECT lang, toks[i] AS w1, toks[i + 1] AS w2
            FROM (SELECT lang, toks,
                         unnest(generate_series(1, len(toks) - 1)) AS i
                  FROM refdocs WHERE len(toks) >= 2)
        ) GROUP BY lang, w1, w2
    ),
    d AS (SELECT doc_id, lang, {toks} AS toks FROM documents),
    trans AS (
        SELECT doc_id, lang, i, toks[i] AS w1, toks[i + 1] AS w2
        FROM (SELECT doc_id, lang, toks,
                     unnest(generate_series(1, len(toks) - 1)) AS i
              FROM d WHERE len(toks) >= 2)
    ),
    scored AS (
        SELECT t.doc_id, t.lang, t.i,
               ROUND(ln((COALESCE(b.c, 0) + 1) * 1.0
                        / (COALESCE(u.c, 0) + v.vs)), {lr}) AS lp,
               CASE WHEN b.c IS NULL THEN 1 ELSE 0 END AS oov
        FROM trans t
        LEFT JOIN bi b ON b.lang = t.lang AND b.w1 = t.w1
                      AND b.w2 = t.w2
        LEFT JOIN uni u ON u.lang = t.lang AND u.w = t.w1
        JOIN v ON v.lang = t.lang
    ),
    agg AS (
        SELECT doc_id, lang, COUNT(*) AS n_trans,
               CAST(SUM(oov) AS INTEGER) AS n_oov,
               list_reduce([0.0] || list(lp ORDER BY i),
                           (a, x) -> a + x) AS s
        FROM scored GROUP BY doc_id, lang
    )
    SELECT doc_id, lang, CAST(n_trans AS INTEGER) AS n_trans, n_oov,
           ROUND(-s / n_trans, {pr}) AS ppl,
           ROUND(-s / n_trans, {pr}) <= {th} AS kept
    FROM agg
""".format(
    toks=_TOKS,
    mod=LM_REF_MOD,
    lr=lmfilter.LOG_ROUND,
    pr=lmfilter.PPL_ROUND,
    th=LM_LANG_PPL_THRESHOLD,
)

# CCNet head/middle/tail: wraps the PER-LANGUAGE refit-and-replay
# oracle verbatim (a WITH over the full per-lang scorer CTE chain,
# the dup_cluster_sizes composition pattern — ADVICE r13: CCNet §4.3
# buckets each language under its own model, which is exactly the
# scorer this round wires in) and buckets with real NTILE(3) over
# (lang; ppl, doc_id) — certifying that ntile_expr on the distributed
# rank is value-identical to the window formulation.
ORACLE["ccnet_buckets"] = f"""
    WITH lmq AS ({ORACLE["lm_perplexity_per_lang"]}),
    r AS (SELECT doc_id, lang, ppl,
                 NTILE(3) OVER (PARTITION BY lang
                                ORDER BY ppl, doc_id) AS b
          FROM lmq)
    SELECT doc_id, lang, ppl,
           CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                  ELSE 'tail' END AS bucket
    FROM r
"""

# Exact-substring dedup (Lee et al. 2022): the oracle replays the
# sliding md5 window keys, the (id << 24 | pos) first-occurrence min,
# the duplicate verdict join, the removed-token UNION as DISTINCT
# token positions (set semantics == the operator's merged-interval
# sum), the LAG(pos) range count (new range iff the gap exceeds the
# window), and the position-ordered surviving-token md5 (string_agg
# skips the removed rows' NULLs; fully-removed docs coalesce to
# md5('')). The report tail (everything downstream of the `d` docs
# CTE and the `dup` duplicate-window CTE) is ONE template consumed by
# both the full and the incremental rows, so the replicas cannot
# drift.
_SN = SUBSTR_DEDUP_TOKENS
_SUBSTR_TAIL = f"""
    tok AS (SELECT doc_id, t - 1 AS t0, toks[t] AS tok
            FROM (SELECT doc_id, toks,
                         unnest(generate_series(1, len(toks))) AS t
                  FROM d)),
    rem AS (SELECT DISTINCT k.doc_id, k.t0
            FROM tok k JOIN dup p
              ON p.doc_id = k.doc_id
             AND k.t0 >= p.pos AND k.t0 < p.pos + {_SN}),
    nd AS (SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_dup_windows
           FROM dup GROUP BY doc_id),
    nr AS (SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_removed_tokens
           FROM rem GROUP BY doc_id),
    ng AS (SELECT doc_id, CAST(SUM(newr) AS INTEGER) AS n_ranges FROM (
               SELECT doc_id,
                      CASE WHEN pos - LAG(pos) OVER (
                               PARTITION BY doc_id ORDER BY pos)
                               <= {_SN}
                           THEN 0 ELSE 1 END AS newr
               FROM dup) GROUP BY doc_id),
    kept AS (SELECT k.doc_id,
                    md5(COALESCE(string_agg(
                        CASE WHEN r.t0 IS NULL THEN k.tok END, ' '
                        ORDER BY k.t0), '')) AS kept_md5
             FROM tok k LEFT JOIN rem r
               ON r.doc_id = k.doc_id AND r.t0 = k.t0
             GROUP BY k.doc_id)
    SELECT d.doc_id,
           CAST(len(d.toks) AS INTEGER) AS n_tokens,
           COALESCE(nd.n_dup_windows, 0) AS n_dup_windows,
           COALESCE(nr.n_removed_tokens, 0) AS n_removed_tokens,
           COALESCE(ng.n_ranges, 0) AS n_ranges,
           kept.kept_md5
    FROM d
    LEFT JOIN nd USING (doc_id)
    LEFT JOIN nr USING (doc_id)
    LEFT JOIN ng USING (doc_id)
    JOIN kept USING (doc_id)
"""

ORACLE["substring_dedup"] = f"""
    WITH d AS (SELECT doc_id, toks FROM
                   (SELECT doc_id, {_TOKS} AS toks FROM documents)
               WHERE len(toks) > 0),
    w AS (SELECT doc_id, i - 1 AS pos,
                 md5(array_to_string(toks[i:i + {_SN - 1}], ' ')) AS wkey
          FROM (SELECT doc_id, toks,
                       unnest(generate_series(1, len(toks) - {_SN} + 1))
                           AS i
                FROM d WHERE len(toks) >= {_SN})),
    f AS (SELECT wkey, MIN(doc_id * {1 << 24} + pos) AS fp
          FROM w GROUP BY wkey),
    dup AS (SELECT w.doc_id, w.pos FROM w JOIN f USING (wkey)
            WHERE w.doc_id * {1 << 24} + w.pos <> f.fp),
    {_SUBSTR_TAIL}
"""

# Incremental substring dedup: the batch plays `d`, the duplicate
# verdict is one semi-join of the batch's windows against the
# corpus's DISTINCT window keys (the frozen standing index — never
# batch x batch, the incremental family's contract), and the report
# tail is the SAME template as the full row.
ORACLE["substring_dedup_incremental"] = f"""
    WITH d AS (SELECT doc_id, toks FROM
                   (SELECT doc_id, {_TOKS} AS toks FROM documents
                    WHERE doc_id % {{bmod}} = 0)
               WHERE len(toks) > 0),
    cw AS (SELECT DISTINCT
                  md5(array_to_string(toks[i:i + {_SN - 1}], ' '))
                      AS wkey
           FROM (SELECT toks,
                        unnest(generate_series(1, len(toks) - {_SN} + 1))
                            AS i
                 FROM (SELECT {_TOKS} AS toks FROM documents
                       WHERE doc_id % {{bmod}} <> 0)
                 WHERE len(toks) >= {_SN})),
    w AS (SELECT doc_id, i - 1 AS pos,
                 md5(array_to_string(toks[i:i + {_SN - 1}], ' ')) AS wkey
          FROM (SELECT doc_id, toks,
                       unnest(generate_series(1, len(toks) - {_SN} + 1))
                           AS i
                FROM d WHERE len(toks) >= {_SN})),
    dup AS (SELECT w.doc_id, w.pos FROM w JOIN cw USING (wkey)),
    {_SUBSTR_TAIL}
"""

ORACLE["substring_dedup_incremental"] = ORACLE[
    "substring_dedup_incremental"
].format(bmod=SUBSTR_BATCH_MOD)
