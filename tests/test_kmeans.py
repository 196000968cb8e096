"""Behavioral tests for the distributed Lloyd fit (operators/kmeans.py).

The oracle-parity gate certifies cross-engine exactness of the full
fit chain; these pin the SEMANTICS the fixed-point construction
exists for: distributed == local replica, convergence idempotence,
the empty-cell keep rule, and the exact rational rounding.
"""

from pyspark.sql import functions as F

from flink_log_analysis_spark.operators import kmeans as km
from flink_log_analysis_spark.operators.similarity import clustered_corpus


def _corpus(spark, n_clusters=8, per_cluster=16, dim=4):
    return clustered_corpus(
        spark, n_clusters=n_clusters, per_cluster=per_cluster, dim=dim
    )


def _collect_quantized(emb):
    return [
        (int(r["vec_id"]), [int(v) for v in r["xq"]])
        for r in km.quantize_vectors(emb).collect()
    ]


def test_distributed_matches_local_replica(spark):
    emb = _corpus(spark)
    dist = km.lloyd_fit(emb, n_cells=6)
    local = km.lloyd_fit_local(_collect_quantized(emb), n_cells=6)
    assert dist == local


def test_converged_fit_is_a_fixed_point(spark):
    """Extra SQL iterations past convergence must be no-ops — the
    property that makes the Spark early-stop safe under the oracle's
    fixed iteration count."""
    emb = _corpus(spark, n_clusters=4, per_cluster=8)
    rows = _collect_quantized(emb)
    c4 = km.lloyd_fit_local(rows, n_cells=4, n_iter=4)
    c8 = km.lloyd_fit_local(rows, n_cells=4, n_iter=8)
    assert c4 == c8


def test_empty_cells_keep_previous_centroid(spark):
    """Two distinct point locations, four cells: the duplicate seeds
    lose every member to the lower-indexed twin (tie-break) and must
    keep their seed coordinates."""
    pts = [(i, [0.0, 0.0]) if i < 4 else (i, [1.0, 1.0]) for i in range(8)]
    emb = spark.createDataFrame(
        pts, "vec_id bigint, embedding array<double>"
    )
    cents = km.lloyd_fit(emb, n_cells=4)
    # every centroid is one of the two point locations (quantized)
    assert all(c in ([0, 0], [10**6] * 2) for c in cents)
    # and both locations are represented among the four cells
    assert [0, 0] in cents and [10**6] * 2 in cents


def test_round_quotient_is_half_away_from_zero():
    assert km._round_quotient(5, 2) == 3
    assert km._round_quotient(-5, 2) == -3
    assert km._round_quotient(4, 2) == 2
    assert km._round_quotient(7, 3) == 2
    assert km._round_quotient(-7, 3) == -2
    assert km._round_quotient(0, 7) == 0


def test_centroids_to_floats_roundtrip(spark):
    cents = [[1_000_000, -500_000], [0, 250_000]]
    assert km.centroids_to_floats(cents) == [[1.0, -0.5], [0.0, 0.25]]


def test_seed_centroids_are_corpus_vectors_in_digest_order(spark):
    emb = _corpus(spark, n_clusters=4, per_cluster=4)
    q = km.quantize_vectors(emb)
    seeds = km.seed_centroids(q, n_cells=3, seed=42)
    all_vecs = {tuple(xq) for _, xq in _collect_quantized(emb)}
    assert len(seeds) == 3
    assert all(tuple(s) in all_vecs for s in seeds)
    # a different seed selects a different (deterministic) set
    seeds7 = km.seed_centroids(q, n_cells=3, seed=7)
    assert seeds7 == km.seed_centroids(q, n_cells=3, seed=7)
    assert seeds != seeds7


def test_local_fit_exact_outside_numpy_envelope():
    """ADVICE r16: coordinates past _NP_ASSIGN_MAX_ABS must take the
    exact Python-int path (int64 numpy squared distances would wrap),
    keeping the local twin's answers identical to exact arithmetic."""
    big = 4 * 10**17  # (2*big)^2 wraps int64 by ~10 orders of magnitude
    rows = [
        (0, [-big, -big]),
        (1, [-big, -big + 2]),
        (2, [big, big]),
        (3, [big, big - 2]),
    ]
    cents = km.lloyd_fit_local(rows, n_cells=2, n_iter=4)
    # Exact arithmetic puts each pair in its own cell and the centroid
    # at the pair's exact mean; a wrapped distance matrix would
    # scramble the assignment.
    assert sorted(cents) == sorted(
        [[-big, -big + 1], [big, big - 1]]
    )
