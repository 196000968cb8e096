"""End-to-end corpus-prep pipeline as ONE oracle-backed query.

``corpus_prep`` composes the hygiene operators the way a real
pretraining data pipeline runs them, over ``documents``:

    quality filter (C4/Gopher keep verdict)
      -> exact dedup (keep min doc_id per normalized-content md5)
        -> near dedup (MinHash-LSH + Jaccard verify, drop doc_b)
          -> sequence packing (chunk range per surviving doc)

Each stage is an already-oracle-checked operator; this query proves
they COMPOSE — the DuckDB oracle chains the same four stages as CTEs
(reusing llm_dedup's parameterizable signature fragments, which exist
precisely so a composition query can run the identical LSH pipeline
on a filtered corpus) and must agree hash-for-hash on the final
packed survivor set.

Scale posture is the sum of its parts: the filter is a map-side
predicate, exact dedup shuffles 16-byte digests, the LSH chain is
bucketed (never all-pairs), and packing is the two-pass distributed
prefix-sum — no stage funnels through a single task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, quality
from ..session import read_table
from .llm_dedup import NEAR_DUP_THRESHOLD, _bands_cte, _sig_cte
from .llm_quality import _TOKS


def corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    kept = docs.filter(quality.keep_predicate(F.col("text")))
    exact = dedup.exact_dedup_keep(kept)
    survivors = dedup.near_dedup_keep(exact, threshold=NEAR_DUP_THRESHOLD)
    packed = quality.pack_chunks(survivors)
    return packed.join(
        survivors.select("doc_id", "source", "lang"), "doc_id"
    ).select(
        "doc_id",
        "source",
        "lang",
        "n_tokens",
        "cum_tokens",
        "chunk_first",
        "chunk_last",
    )


# The oracle chains the same stages. Stage twins:
#  - keep: llm_quality's signal expressions, collapsed to a predicate
#  - exact dedup: min doc_id per md5(normalized text)
#  - near dedup: llm_dedup's _sig_cte/_bands_cte parameterized on the
#    exact-deduped relation k1 (the hook built for composition)
#  - pack: llm_quality's cumsum over the survivor set
# Canonical keep-predicate SQL lives next to the signal expressions it
# collapses (llm_quality owns _TOKS/_STOP).
from .llm_quality import _KEEP_PRED  # noqa: E402

ORACLE = {
    "corpus_prep": f"""
        WITH qt AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        kept AS (
            SELECT d.* FROM documents d
            JOIN qt USING (doc_id)
            WHERE {_KEEP_PRED}
        ),
        efp AS (
            SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                       AS fp
            FROM kept
        ),
        k1 AS (
            SELECT k.* FROM kept k
            JOIN (SELECT MIN(doc_id) AS doc_id FROM efp GROUP BY fp) e
            USING (doc_id)
        ),
        {_sig_cte("k1")},
        {_bands_cte()},
        cands AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
        ),
        dropped AS (
            SELECT DISTINCT doc_b AS doc_id
            FROM cands
            JOIN toks ta ON ta.doc_id = doc_a
            JOIN toks tb ON tb.doc_id = doc_b
            WHERE ROUND(len(list_intersect(ta.toks, tb.toks)) * 1.0
                        / (len(ta.toks) + len(tb.toks)
                           - len(list_intersect(ta.toks, tb.toks))), 4)
                  >= {NEAR_DUP_THRESHOLD}
        ),
        k2 AS (
            SELECT k.* FROM k1 k
            WHERE NOT EXISTS (SELECT 1 FROM dropped x
                              WHERE x.doc_id = k.doc_id)
        ),
        pt AS (
            SELECT doc_id, source, lang,
                   CAST(len({_TOKS}) AS INTEGER) AS n_tokens
            FROM k2
        ),
        pc AS (
            SELECT doc_id, source, lang, n_tokens,
                   CAST(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM pt
        )
        SELECT doc_id, source, lang, n_tokens, cum_tokens,
               CAST(FLOOR((cum_tokens - n_tokens)
                          / {quality.PACK_BLOCK_TOKENS}.0) AS BIGINT)
                   AS chunk_first,
               CAST(FLOOR((cum_tokens - 1)
                          / {quality.PACK_BLOCK_TOKENS}.0) AS BIGINT)
                   AS chunk_last
        FROM pc
    """,
}

QUERIES = {
    "corpus_prep": corpus_prep,
}
