"""Contract queries for the pipeline-curation operators: BM25/TF-IDF
relevance, deterministic hash sampling/splits, and the bucketed range
join. Every query here is exactly oracle-checked — the sampling
predicates and score formulas are reproduced in DuckDB from the same
md5 bucket scheme and repr-injected float constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import relevance, sampling
from ..operators.rangejoin import bucketed_range_join
from ..session import read_table
from .analytics import _dec

QUERY_TERMS = ["data", "join", "spark"]

STRATA_FRACTIONS = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.1}
SPLITS = {"train": 0.8, "val": 0.1, "test": 0.05}  # 5% held out entirely
SAMPLE_SEED = 7


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return relevance.bm25(docs, QUERY_TERMS)


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return relevance.tfidf_top_terms(docs, k=3)


def stratified_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing sample: per-lang keep fractions, decided by
    doc_id hash (zh unlisted -> dropped entirely)."""
    docs = read_table(spark, sf_dir, "documents")
    out = sampling.stratified_sample(
        docs, "doc_id", "lang", STRATA_FRACTIONS, seed=SAMPLE_SEED
    )
    return out.select("doc_id", "lang", "source")


def train_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable train/val/test assignment by doc_id hash range; rows past
    the split boundaries get a NULL split (held out by design)."""
    docs = read_table(spark, sf_dir, "documents")
    out = sampling.split_assign(docs, "doc_id", SPLITS, seed=SAMPLE_SEED)
    return out.select("doc_id", "split")


def promo_window_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders falling in overlapping 90-day promo windows (one window
    per nation, staggered by 60 days from 1995-06-01), via the
    bucketed range join — per-window order count + revenue."""
    nation = read_table(spark, sf_dir, "nation")
    orders = read_table(spark, sf_dir, "orders")
    base = F.datediff(F.lit("1995-06-01").cast("date"),
                      F.lit("1970-01-01").cast("date"))
    windows = nation.select(
        F.col("n_nationkey").alias("window_id"),
        (base + F.col("n_nationkey") * 60).alias("lo"),
        (base + F.col("n_nationkey") * 60 + 90).alias("hi"),
    )
    points = orders.select(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).alias("day"),
        _dec("o_totalprice").alias("price"),
    )
    joined = bucketed_range_join(
        points, windows, point="day", lo="lo", hi="hi", bucket_width=64
    )
    return (
        joined.groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price").cast("double").alias("revenue"),
        )
    )


def _bucket(expr: str) -> str:
    return sampling.sample_bucket_sql(expr, seed=SAMPLE_SEED)


def _strata_case() -> str:
    whens = " ".join(
        f"WHEN lang = '{v}' THEN {int(f * sampling.BUCKETS)}"
        for v, f in sorted(STRATA_FRACTIONS.items())
    )
    return f"(CASE {whens} ELSE 0 END)"


def _split_case() -> str:
    cum = 0.0
    arms = []
    for name, frac in SPLITS.items():
        lo, hi = int(cum * sampling.BUCKETS), int((cum + frac) * sampling.BUCKETS)
        arms.append(f"WHEN b >= {lo} AND b < {hi} THEN '{name}'")
        cum += frac
    return "CASE " + " ".join(arms) + " ELSE NULL END"


ORACLE = {
    "bm25_scores": relevance.bm25_oracle_sql(QUERY_TERMS),
    "tfidf_top_terms": relevance.tfidf_top_terms_oracle_sql(k=3),
    "stratified_doc_sample": f"""
        SELECT doc_id, lang, source FROM documents
        WHERE {_bucket("doc_id")} < {_strata_case()}
    """,
    "train_split_assign": f"""
        WITH b AS (
            SELECT doc_id, {_bucket("doc_id")} AS b FROM documents
        )
        SELECT doc_id, {_split_case()} AS split FROM b
    """,
    "promo_window_orders": """
        WITH w AS (
            SELECT n_nationkey AS window_id,
                   (DATE '1995-06-01' - DATE '1970-01-01')
                       + n_nationkey * 60 AS lo,
                   (DATE '1995-06-01' - DATE '1970-01-01')
                       + n_nationkey * 60 + 90 AS hi
            FROM nation
        ), o AS (
            SELECT (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS day,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price
            FROM orders
        )
        SELECT w.window_id, COUNT(*) AS n_orders,
               CAST(SUM(o.price) AS DOUBLE) AS revenue
        FROM o JOIN w ON o.day >= w.lo AND o.day < w.hi
        GROUP BY 1
    """,
}

QUERIES = {
    "bm25_scores": bm25_scores,
    "tfidf_top_terms": tfidf_top_terms,
    "stratified_doc_sample": stratified_doc_sample,
    "train_split_assign": train_split_assign,
    "promo_window_orders": promo_window_orders,
}
