"""Similarity-search semantics: exact top-k sanity + LSH recall."""

import pytest
from pyspark.sql import functions as F

from flink_log_analysis_spark.operators import similarity
from flink_log_analysis_spark.session import read_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings").cache()


def test_bruteforce_topk_shape(spark, emb):
    q = emb.filter(F.col("vec_id") < 3)
    out = similarity.knn_bruteforce(emb, q, k=5).collect()
    assert len(out) == 15
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rn)
        assert [r.rn for r in rows] == [1, 2, 3, 4, 5]
        cosines = [r.cos for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.neighbor_id != qid for r in rows)
        assert all(-1.0001 <= r.cos <= 1.0001 for r in rows)


def test_self_similarity_is_one(spark, emb):
    v = similarity.as_double(F.col("embedding"))
    row = emb.select(similarity.cosine(v, v).alias("c")).agg(
        F.min("c").alias("lo"), F.max("c").alias("hi")
    ).first()
    assert abs(row.lo - 1.0) < 1e-9 and abs(row.hi - 1.0) < 1e-9


def test_lsh_recall_vs_bruteforce(spark, emb):
    """ANN must hit a reasonable fraction of true neighbors. With 4
    hyperplanes (16 buckets) recall@5 over random vectors is imperfect
    by design — assert it beats a random-bucket baseline comfortably."""
    q = emb.filter(F.col("vec_id") < 10)
    exact = similarity.knn_bruteforce(emb, q, k=5).collect()
    approx = similarity.knn_lsh(emb, q, k=5).collect()
    truth = {(r.query_id, r.neighbor_id) for r in exact}
    hits = {(r.query_id, r.neighbor_id) for r in approx} & truth
    recall = len(hits) / len(truth)
    assert recall >= 0.2, f"LSH recall {recall} below floor"
    # every ANN result must also be correctly ranked within its bucket
    for r in approx:
        assert r.rn <= 5
