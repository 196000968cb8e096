"""Corpus relevance scoring: TF-IDF and BM25 as pure column algebra.

A training-data pipeline ranks/filters documents against query terms
(dataset curation, contamination checks, quality weighting). Both
operators here are classic bag-of-words statistics computed entirely
with built-in expressions — explode + two hash aggregations — no
Python, no UDFs:

  tokens --explode--> (doc, term) --agg--> tf
                                   --agg--> df (docs containing term)
  score  = f(tf, df, doc_len, corpus stats)

Scale notes: for BM25 the query-term filter is applied to the
exploded stream BEFORE any shuffle, so the (doc,term) aggregation
carries only O(docs x |query|) rows regardless of corpus vocabulary;
document length and corpus aggregates ride along as one broadcast
scalar row. TF-IDF-top-k is the corpus-wide variant: its two
aggregations shuffle the full (doc,term) distinct stream — that *is*
the job (building a per-doc term profile), and both aggs are
partial-aggregated map-side first.

Cross-engine determinism (oracle-checkable doubles): every constant
is injected as a Python float repr on BOTH sides, per-term scores are
summed in fixed lexicographic term order (double addition is not
associative), and final scores are rounded to 6 digits before any
rank or compare — same discipline as the cosine operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens


def doc_terms(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term) stream: lowercased whitespace tokens, exploded."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )


def doc_lengths(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.lower(F.col(text_col)))).alias("dl"),
    )


def bm25(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 score of every document against a fixed term set.

    Output: (doc_id, bm25, n_matched) for docs matching >= 1 term.
    idf is the standard BM25 form ln(1 + (N - df + .5)/(df + .5)).
    """
    terms = sorted(set(t.lower() for t in query_terms))
    dt = doc_terms(docs, text_col, id_col)
    dl = doc_lengths(docs, text_col, id_col)
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    tf = (
        dt.filter(F.col("term").isin(terms))  # before the shuffle
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / avgdl)
    )
    per_term = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            "term",
            (idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom).alias("s"),
        )
    )
    # Fixed-order summation: one conditional-agg column per query term,
    # added lexicographically (groupBy SUM order is nondeterministic).
    agg_cols = [
        F.sum(F.when(F.col("term") == t, F.col("s"))).alias(f"_s_{i}")
        for i, t in enumerate(terms)
    ]
    out = per_term.groupBy("doc_id").agg(
        *agg_cols, F.count(F.lit(1)).alias("n_matched")
    )
    total = F.lit(0.0)
    for i in range(len(terms)):
        total = total + F.coalesce(F.col(f"_s_{i}"), F.lit(0.0))
    return out.select(
        "doc_id", F.round(total, 6).alias("bm25"), "n_matched"
    )


def bm25_oracle_sql(
    query_terms: list[str], k1: float = 1.2, b: float = 0.75
) -> str:
    """DuckDB twin of :func:`bm25` — identical formula structure,
    identical float constants (repr-injected), identical sum order."""
    terms = sorted(set(t.lower() for t in query_terms))
    in_list = ", ".join(f"'{t}'" for t in terms)
    sum_expr = " + ".join(
        f"COALESCE(SUM(CASE WHEN term = '{t}' THEN s END), "
        f"CAST(0.0 AS DOUBLE))"
        for t in terms
    )
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(
                       string_split_regex(lower(text), '\\s+'),
                       x -> x <> '')) AS term
            FROM documents
        ), dl AS (
            SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1
        ), corpus AS (
            SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM toks
            WHERE term IN ({in_list}) GROUP BY 1, 2
        ), dfreq AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
        ), scored AS (
            SELECT t.doc_id, t.term,
                   ln(CAST(1.0 AS DOUBLE)
                      + (c.n_docs - d.df + CAST(0.5 AS DOUBLE))
                        / (d.df + CAST(0.5 AS DOUBLE)))
                   * (t.tf * CAST({k1 + 1.0!r} AS DOUBLE))
                   / (t.tf + CAST({k1!r} AS DOUBLE)
                      * (CAST({1.0 - b!r} AS DOUBLE)
                         + CAST({b!r} AS DOUBLE)
                           * (l.dl / (CAST(c.sum_dl AS DOUBLE)
                                      / c.n_docs)))) AS s
            FROM tf t
            JOIN dfreq d USING (term)
            JOIN dl l USING (doc_id)
            CROSS JOIN corpus c
        )
        SELECT doc_id,
               ROUND(CAST(0.0 AS DOUBLE) + {sum_expr}, 6) AS bm25,
               COUNT(*) AS n_matched
        FROM scored GROUP BY doc_id
    """


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k terms by classic TF-IDF (tf * ln(N/df)).

    Output: (doc_id, term, tfidf, rn). Ranking happens on the ROUNDED
    score with a term tie-break, so a last-ulp ln() divergence can't
    reorder ranks across engines.
    """
    dt = doc_terms(docs, text_col, id_col)
    # tf feeds BOTH the document-frequency aggregate and the score
    # join; Catalyst does not share subtrees across join branches, so
    # without a lineage cut the explode + (doc, term) aggregation runs
    # twice. The materialized tf is O(distinct doc-term pairs) — the
    # same volume its own shuffle already writes.
    tf = (
        dt.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )


def tfidf_top_terms_oracle_sql(k: int = 3) -> str:
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(
                       string_split_regex(lower(text), '\\s+'),
                       x -> x <> '')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        ), dfreq AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
        ), n AS (
            SELECT COUNT(*) AS n_docs FROM documents
        ), scored AS (
            SELECT t.doc_id, t.term,
                   ROUND(t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df), 6)
                       AS tfidf
            FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tfidf,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY doc_id
                   ORDER BY tfidf DESC, term ASC) AS INTEGER) AS rn
        FROM scored
        QUALIFY rn <= {k}
    """
