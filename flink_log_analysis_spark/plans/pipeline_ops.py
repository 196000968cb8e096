"""Contract queries for the pipeline-curation operators: BM25/TF-IDF
relevance, deterministic hash sampling/splits, the bucketed range
join, and the explicit skew-mitigation operators. Every query here is
exactly oracle-checked — the sampling predicates and score formulas
are reproduced in DuckDB from the same md5 bucket scheme and
repr-injected float constants, and the salted operators' oracles are
the *plain* join/GROUP BY formulations: salting is a physical rewrite
whose whole contract is bit-identical logical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import relevance, sampling, skew
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


MIX_TAU = 2.0


def lang_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-2 language rebalancing: target share per lang
    ∝ sqrt(count), realized as the largest exact-proportion subsample
    with no upsampling — the standard multilingual training-mix
    recipe, fully deterministic via hash-bucket membership."""
    docs = read_table(spark, sf_dir, "documents")
    out = sampling.temperature_resample(
        docs, "doc_id", "lang", tau=MIX_TAU, seed=SAMPLE_SEED
    )
    return out.select("doc_id", "lang", "source")


def train_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable train/val/test assignment by doc_id hash range; rows past
    the split boundaries get a NULL split (held out by design)."""
    docs = read_table(spark, sf_dir, "documents")
    out = sampling.split_assign(docs, "doc_id", SPLITS, seed=SAMPLE_SEED)
    return out.select("doc_id", "split")


def training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle + round-robin sharding of the
    corpus: exact global position under the md5(seed:id) pseudorandom
    order via the distributed rank (partitionless mode), reproducible
    across runs/partitionings/engines."""
    docs = read_table(spark, sf_dir, "documents")
    return sampling.training_order_shuffle(docs, seed=SAMPLE_SEED)


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


def salted_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type counts through the two-phase salted aggregation.

    ``event_type`` has a handful of distinct values over the whole
    events table — the exact shape where one shuffle partition would
    receive one giant group. The salt spreads each group over 16
    reducers; the oracle is the plain GROUP BY, because the operator's
    contract is identical results (operators/skew.py).
    """
    ev = read_table(spark, sf_dir, "events")
    return skew.salted_count(ev, ["event_type"], n_salts=16)


def salted_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand quantity/revenue via the salted fact-dim join.

    lineitem (fact) is salted, part (dim, ~5x smaller but modeled as
    too big to broadcast) is replicated across the 8 salt values —
    the explicit rewrite for a hot part key that AQE's post-hoc skew
    split can't fan out. Oracle = the plain equi-join + GROUP BY.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", _dec("l_quantity").alias("qty"),
        _dec("l_extendedprice").alias("price"),
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = skew.salted_join(li, part, "l_partkey", "p_partkey", n_salts=8)
    return joined.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("qty").cast("double").alias("total_qty"),
        F.sum("price").cast("double").alias("total_price"),
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
    # Plain formulations on purpose: the salted rewrites must be
    # logically invisible (see operators/skew.py docstring).
    "salted_event_counts": """
        SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type
    """,
    "salted_brand_revenue": """
        SELECT p.p_brand AS brand, COUNT(*) AS n_items,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_qty,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1
    """,
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
    "lang_mixture_resample": f"""
        SELECT doc_id, lang, source FROM (
            {sampling.temperature_resample_oracle_sql(
                "documents", "doc_id", "lang",
                tau=MIX_TAU, seed=SAMPLE_SEED,
            )}
        )
    """,
    "training_order_shuffle": f"""
        WITH k AS (
            SELECT doc_id,
                   md5('{SAMPLE_SEED}:' || CAST(doc_id AS VARCHAR))
                       AS shuffle_key
            FROM documents
        ), r AS (
            SELECT doc_id, shuffle_key,
                   ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) - 1
                       AS position
            FROM k
        )
        SELECT doc_id, shuffle_key,
               CAST(position AS BIGINT) AS position,
               CAST(position % {sampling.SHUFFLE_SHARDS} AS INTEGER) AS shard
        FROM r
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
    "salted_event_counts": salted_event_counts,
    "salted_brand_revenue": salted_brand_revenue,
    "bm25_scores": bm25_scores,
    "tfidf_top_terms": tfidf_top_terms,
    "stratified_doc_sample": stratified_doc_sample,
    "train_split_assign": train_split_assign,
    "lang_mixture_resample": lang_mixture_resample,
    "training_order_shuffle": training_order_shuffle,
    "promo_window_orders": promo_window_orders,
}
