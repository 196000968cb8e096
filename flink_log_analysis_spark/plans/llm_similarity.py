"""Similarity-search plans over ``embeddings``.

The brute-force top-k is exactly oracle-checked: the Spark cosine is a
sequential double fold, bit-identical to DuckDB's
``list_cosine_similarity`` (verified empirically — no rounding in the
comparison). The LSH ANN variant is approximate by construction ->
rows-only driver check + a recall-vs-bruteforce unit test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity
from ..session import read_table

N_QUERIES = 10  # query set = vec_id < 10
K = 5


def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return similarity.knn_bruteforce(emb, queries, k=K)


def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return similarity.knn_lsh(emb, queries, k=K)


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    v = similarity.as_double(F.col("embedding"))
    return emb.select(
        "vec_id",
        "label",
        similarity.norm(v).alias("l2_norm"),
        F.size("embedding").alias("dim"),
    )


ORACLE = {
    "knn_bruteforce": f"""
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id < {N_QUERIES}),
             c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
                   FROM embeddings),
             s AS (SELECT query_id, neighbor_id,
                          list_cosine_similarity(qv, cv) AS cos
                   FROM q CROSS JOIN c WHERE neighbor_id <> query_id),
             r AS (SELECT *, CAST(ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rn
                   FROM s)
        SELECT query_id, neighbor_id, cos, rn FROM r WHERE rn <= {K}
    """,
    "embedding_norms": """
        SELECT vec_id, label,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                   AS l2_norm,
               CAST(len(embedding) AS INTEGER) AS dim
        FROM embeddings
    """,
    # knn_lsh: approximate -> rows-only check (no oracle by design)
}

QUERIES = {
    "knn_bruteforce": knn_bruteforce,
    "knn_lsh": knn_lsh,
    "embedding_norms": embedding_norms,
}
