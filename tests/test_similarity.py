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


def test_ivf_recall_vs_bruteforce(spark, emb):
    """IVF with 2-cell probe must beat the LSH floor on clustered data
    (the embeddings table has 10 labeled clusters)."""
    q = emb.filter(F.col("vec_id") < 10)
    exact = similarity.knn_bruteforce(emb, q, k=5).collect()
    approx = similarity.knn_ivf(emb, q, k=5, n_cells=8, n_probe=2).collect()
    truth = {(r.query_id, r.neighbor_id) for r in exact}
    hits = {(r.query_id, r.neighbor_id) for r in approx} & truth
    recall = len(hits) / len(truth)
    assert recall >= 0.3, f"IVF recall {recall} below floor"
    by_q = {}
    for r in approx:
        by_q.setdefault(r.query_id, []).append(r.rn)
    for rns in by_q.values():
        assert sorted(rns) == list(range(1, len(rns) + 1))


def test_embedding_near_dups_subset_of_bruteforce(spark, emb):
    """LSH-pruned cosine near-dup pairs: every reported pair must be a
    true pair (>= threshold, ordered), and candidate pruning must keep
    a decent fraction of the brute-force truth."""
    from flink_log_analysis_spark.operators import dedup

    got = dedup.embedding_near_dup_pairs(emb, threshold=0.4).collect()
    v = emb.select(
        F.col("vec_id"), similarity.as_double(F.col("embedding")).alias("e")
    )
    a = v.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"))
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"))
    truth = (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b",
            similarity.cosine(F.col("ea"), F.col("eb")).alias("cos"),
        )
        .filter(F.col("cos") >= 0.4)
        .collect()
    )
    truth_pairs = {(r.vec_a, r.vec_b) for r in truth}
    got_pairs = {(r.vec_a, r.vec_b) for r in got}
    assert got_pairs <= truth_pairs  # no false positives (exact verify)
    assert all(r.cos >= 0.4 and r.vec_a < r.vec_b for r in got)
    if truth_pairs:
        assert len(got_pairs) / len(truth_pairs) >= 0.25


def test_probe_cells_order_and_tiebreak(spark):
    """probe_cells ranks centroids by squared L2 ascending, ties broken
    toward the LOWER cell index (the contract the assignment, the
    multiprobe explode, and the partition-pruning layout all rely on)."""
    from pyspark.sql import functions as F

    from flink_log_analysis_spark.operators.similarity import probe_cells

    # Centroids 0/1 equidistant from the probe point; 2 is farther.
    cmat = spark.createDataFrame(
        [([[1.0, 0.0], [-1.0, 0.0], [5.0, 5.0]],)],
        "cmat array<array<double>>",
    )
    df = spark.createDataFrame([(0, [0.0, 0.0])], "id long, v array<double>")
    out = probe_cells(
        df.select("id", F.col("v").alias("arr")), "arr", cmat, [0, 1, 2]
    ).collect()[0]
    assert out.cell_p0 == 0  # tie with cell 1 -> lower index wins
    assert out.cell_p1 == 1
    assert out.cell_p2 == 2
    assert "cmat" not in out.asDict()


def test_scalar_quantize_codes_and_bound(spark):
    """Crafted 2-dim corpus: codes follow the per-dimension [min,max]
    linear map (half-up), constant dims code to 0, and every
    dequantization error is within the half-step guarantee."""
    from pyspark.sql import Row

    from flink_log_analysis_spark.operators.similarity import (
        scalar_quantize_stats,
    )

    df = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[0.0, 7.5]),
            Row(vec_id=1, embedding=[1.0, 7.5]),
            Row(vec_id=2, embedding=[2.0, 7.5]),
        ]
    )
    out = {r.vec_id: r for r in scalar_quantize_stats(df).collect()}
    # dim 0 spans [0, 2] -> codes 0, floor(127.5+0.5)=128, 255;
    # dim 1 is constant -> code 0 for everyone.
    assert out[0].code_sum == 0
    assert out[1].code_sum == 128
    assert out[2].code_sum == 255
    assert all(r.err_ok for r in out.values())
    assert all(r.n_dims == 2 for r in out.values())


def test_quantized_knn_recall_vs_bruteforce(spark, emb):
    """255-level scalar quantization should barely perturb cosine
    ranks: recall@5 vs the float brute force stays near-perfect."""
    q = emb.filter(F.col("vec_id") < 10)
    exact = similarity.knn_bruteforce(emb, q, k=5).collect()
    quant = similarity.knn_quantized(emb, q, k=5).collect()
    truth = {(r.query_id, r.neighbor_id) for r in exact}
    hits = {(r.query_id, r.neighbor_id) for r in quant} & truth
    recall = len(hits) / len(truth)
    assert recall >= 0.9, f"quantized recall {recall} below floor"


def test_dequantized_within_half_step(spark, emb):
    """The codec round-trip never moves a value more than half a
    quantization step of its dimension's range."""
    ranges = similarity.quantization_ranges(emb)
    dq = emb.crossJoin(F.broadcast(ranges)).select(
        "vec_id",
        similarity._dequantized(
            F.col("embedding"), F.col("mn_arr"), F.col("mx_arr")
        ).alias("dv"),
        similarity.as_double(F.col("embedding")).alias("xv"),
        "mn_arr",
        "mx_arr",
    )
    bad = dq.select(
        F.exists(
            F.zip_with(
                F.zip_with(F.col("dv"), F.col("xv"), lambda d, x: d - x),
                F.zip_with(
                    F.col("mx_arr"), F.col("mn_arr"), lambda a, b: a - b
                ),
                lambda err, rng: F.abs(err) > rng / (2 * 255) + 1e-9,
            ),
            lambda v: v,
        ).alias("bad")
    ).filter("bad")
    assert bad.count() == 0


def test_jl_contract_holds_and_counts_pairs(spark, emb):
    out = similarity.jl_projection_contract(emb, dim=64).collect()
    assert len(out) == 1
    r = out[0]
    assert r.band_ok
    assert r.n_pairs > 0 and r.n_in_band <= r.n_pairs


def test_quantize_hostile_vectors(spark):
    """Constant dims, negatives, and extreme ranges: codes stay in
    [0, 255] and the half-step bound still holds."""
    from pyspark.sql import Row

    from flink_log_analysis_spark.operators.similarity import (
        scalar_quantize_stats,
    )

    df = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[-1000.0, 0.0, 5.0]),
            Row(vec_id=1, embedding=[1000.0, 0.0, 5.0]),
            Row(vec_id=2, embedding=[0.0, 0.0, 5.0]),
        ]
    )
    out = {r.vec_id: r for r in scalar_quantize_stats(df).collect()}
    assert all(r.err_ok for r in out.values())
    # dim 1 and 2 constant -> contribute 0; dim 0 spans [-1000, 1000]
    assert out[0].code_sum == 0
    assert out[1].code_sum == 255
    assert out[2].code_sum == 128


def test_knn_ivf_quantized_recall_floor(spark):
    """The IVF-over-int8-codes composition must keep recall at the
    same floor as plain IVF (quantization error is sub-ulp relative to
    cosine gaps at this dim), and its candidates must respect cell
    pruning (every result pair scored, none fabricated)."""
    import pyspark.sql.functions as F

    from flink_log_analysis_spark.operators import similarity
    from flink_log_analysis_spark.session import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    cents = similarity.ivf_fit(emb, n_cells=4, seed=42)
    exact = similarity.knn_bruteforce(emb, qs, k=5).select(
        "query_id", "neighbor_id"
    )
    approx = similarity.knn_ivf_quantized(
        emb, qs, k=5, n_cells=4, centroids=cents
    )
    got = approx.select("query_id", "neighbor_id",
                        F.lit(1).alias("hit"))
    row = exact.join(got, ["query_id", "neighbor_id"], "left").agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("hit"), F.lit(0)).alias("h"),
    ).first()
    assert row.h / row.n >= 0.4
    # per query at most k rows, rn dense from 1
    per = approx.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("c"), F.max("rn").alias("m")
    ).collect()
    assert all(r.c <= 5 and r.m == r.c for r in per)


def test_hard_negatives_excludes_same_and_null_labels(spark):
    from pyspark.sql import Row

    from flink_log_analysis_spark.operators.similarity import hard_negatives

    rows = [
        Row(vec_id=0, label="a", embedding=[1.0, 0.0]),
        Row(vec_id=1, label="a", embedding=[0.99, 0.01]),  # same label
        Row(vec_id=2, label="b", embedding=[0.98, 0.02]),  # hard negative
        Row(vec_id=3, label=None, embedding=[0.97, 0.03]),  # unknown
        Row(vec_id=4, label="b", embedding=[0.0, 1.0]),    # easy negative
    ]
    df = spark.createDataFrame(rows)
    out = hard_negatives(df, df.filter("vec_id = 0"), k=2).collect()
    got = [(r["negative_id"], r["rn"]) for r in
           sorted(out, key=lambda r: r["rn"])]
    # nearest different-label first; same-label and NULL-label excluded
    assert got == [(2, 1), (4, 2)]
    assert all(r["anchor_label"] == "a" and r["negative_label"] == "b"
               for r in out)


def test_clustered_corpus_matches_closed_formula(spark):
    """The Spark generator reproduces the documented integer formula
    exactly (the same formula the manycell oracle replicates in SQL)."""
    from flink_log_analysis_spark.operators.similarity import clustered_corpus

    nc, pc, dim, spread = 4, 8, 4, 0.3
    got = {
        r["vec_id"]: list(r["embedding"])
        for r in clustered_corpus(
            spark, n_clusters=nc, per_cluster=pc, dim=dim, spread=spread
        ).collect()
    }
    assert len(got) == nc * pc
    for v in range(nc * pc):
        c = v // pc
        exp = [
            (c * 37 + d * 101) * 1000003 % 1997 / 998.5 - 1.0
            + spread * ((v * 7919 + d * 104729) % 1009 / 504.5 - 1.0)
            for d in range(dim)
        ]
        assert got[v] == exp, v


def test_l2_normalize_unit_norms_and_zero_passthrough(spark):
    from flink_log_analysis_spark.operators.similarity import l2_normalize

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [-2.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    rows = {r["vec_id"]: list(r["embedding"])
            for r in l2_normalize(df).collect()}
    assert rows[1] == [0.6, 0.8]
    assert rows[2] == [0.0, 0.0]  # zero vector: unchanged, not NaN
    assert rows[3] == [-1.0, 0.0]


def test_manycell_geometry_bounds(spark):
    """The many-cell contract's three bounds hold with margin on the
    clustered corpus (the driver row asserts the same booleans; this
    pins the MEASURED values so a silent geometry regression is
    visible before the gate)."""
    from flink_log_analysis_spark.operators import similarity as sim
    from flink_log_analysis_spark.plans import llm_similarity as plan

    raw, nrm = plan._manycell_corpora(spark)
    cents = sim.ivf_fit(nrm, n_cells=plan.MANYCELL_CELLS, seed=42)
    q = nrm.filter(F.col("vec_id") % plan.MANYCELL_QUERY_MOD == 0)
    q_raw = raw.filter(F.col("vec_id") % plan.MANYCELL_QUERY_MOD == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.knn_bruteforce(raw, q_raw, k=5).collect()
    }
    routed = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.knn_ivf(
            nrm, q, k=5, n_probe=plan.MANYCELL_PROBE, centroids=cents
        ).collect()
    }
    assert len(exact & routed) / len(exact) >= plan.MANYCELL_ROUTING_FLOOR


def test_hard_negatives_ivf_recall_floor(spark):
    """The IVF-composed negative miner recovers >= the contract floor
    of the exact hard-negative set on the clustered corpus, and never
    emits a same-label or self pair."""
    from flink_log_analysis_spark.operators import similarity as sim
    from flink_log_analysis_spark.plans import llm_similarity as plan

    raw, nrm = plan._manycell_corpora(spark)
    lbl = (F.col("vec_id") % plan.HN_LABELS).cast("int").alias("label")
    raw = raw.select("vec_id", lbl, "embedding")
    nrm = nrm.select("vec_id", lbl, "embedding")
    cents = sim.ivf_fit(nrm, n_cells=plan.MANYCELL_CELLS, seed=42)
    a_raw = raw.filter(F.col("vec_id") % plan.MANYCELL_QUERY_MOD == 0)
    a_nrm = nrm.filter(F.col("vec_id") % plan.MANYCELL_QUERY_MOD == 0)
    exact = {
        (r["anchor_id"], r["negative_id"])
        for r in sim.hard_negatives(raw, a_raw, k=5).collect()
    }
    rows = sim.hard_negatives_ivf(
        nrm, a_nrm, k=5, n_cells=plan.MANYCELL_CELLS,
        n_probe=plan.MANYCELL_PROBE, centroids=cents,
    ).collect()
    got = {(r["anchor_id"], r["negative_id"]) for r in rows}
    assert len(exact & got) / len(exact) >= plan.HN_IVF_RECALL_FLOOR
    for r in rows:
        assert r["anchor_label"] != r["negative_label"]
        assert r["anchor_id"] != r["negative_id"]


def test_pq_encode_matches_numpy(spark, sf_dir):
    """pq_encode's expression argmin equals an independent numpy
    implementation (first-min tie rule) for FITTED codebooks over the
    real embeddings — the native encode path certified against a
    reference implementation."""
    import numpy as np

    from flink_log_analysis_spark.session import read_table

    emb = read_table(spark, sf_dir, "embeddings").limit(60)
    books = similarity.pq_fit(emb, m=8, n_codewords=8, seed=7)
    got = {
        r["vec_id"]: list(r["pq_code"])
        for r in similarity.pq_encode(emb, books).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    cb = np.array(books)  # (m, n_cw, d_sub)
    m, _, d_sub = cb.shape
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        exp = [
            int(
                np.argmin(
                    ((v[s * d_sub : (s + 1) * d_sub] - cb[s]) ** 2).sum(
                        axis=1
                    )
                )
            )
            for s in range(m)
        ]
        assert got[r["vec_id"]] == exp


def test_pq_constructed_codebooks_repr_roundtrip():
    """The oracle splices constructed codebook doubles via repr();
    shortest-roundtrip repr must reproduce every value exactly, or the
    two engines would quantize against different codebooks."""
    books = similarity.constructed_pq_codebooks(4, 16, 2)
    for book in books:
        for cw in book:
            for v in cw:
                assert float(repr(v)) == v


def test_pq_adc_zero_error_on_codeword_vectors(spark):
    """A vector that IS a concatenation of codewords has zero
    quantization error: its ADC self-distances to other such vectors
    equal the exact L2 — the asymmetric-distance arithmetic collapses
    to the true metric when the code is lossless."""
    books = similarity.constructed_pq_codebooks(4, 8, 2)
    # vectors = codeword picks (i, i, i, i) for i in 0..7
    rows = [
        (i, [x for s in range(4) for x in books[s][i]]) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    codes = similarity.pq_encode(df, books)
    got = {r["vec_id"]: list(r["pq_code"]) for r in codes.collect()}
    assert got == {i: [i] * 4 for i in range(8)}
    res = similarity.knn_pq_adc(codes, df, books, k=3).collect()
    import math

    vecs = {i: v for i, v in rows}
    for r in res:
        exact = sum(
            (a - b) * (a - b)
            for a, b in zip(vecs[r["query_id"]], vecs[r["neighbor_id"]])
        )
        assert math.isclose(r["adc_dist"], round(exact, 6), abs_tol=1e-9)


def test_ivf_pq_all_probes_equals_full_scan(spark):
    """IVF-PQ with n_probe == n_cells must return EXACTLY the
    full-scan ADC result — cell pruning changes the candidate set,
    never the arithmetic — and with a small n_probe the result is a
    subset of each query's probed cells' population."""
    corpus = similarity.clustered_corpus(
        spark, n_clusters=8, per_cluster=16, dim=8, spread=0.3
    ).localCheckpoint()
    centers = similarity.clustered_corpus_centers(n_clusters=8, dim=8)
    books = similarity.constructed_pq_codebooks(4, 8, 2)
    queries = corpus.filter("vec_id % 32 = 0")
    full = similarity.knn_pq_adc(
        similarity.pq_encode(corpus, books), queries, books, k=5
    )
    via_ivf = similarity.knn_ivf_pq(
        corpus, queries, centers, books, k=5, n_probe=8
    )
    canon = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert canon(via_ivf) == canon(full)
    # pruned probe: every returned neighbor sits in one of its query's
    # 2 nearest cells
    pruned = similarity.knn_ivf_pq(
        corpus, queries, centers, books, k=5, n_probe=2
    )
    assigned, _, cmat = similarity.ivf_assign(corpus, centroids=centers)
    cell_of = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    qp = similarity.probe_cells(
        queries.selectExpr("vec_id AS query_id", "embedding AS qv"),
        "qv", cmat, [0, 1],
    ).collect()
    allowed = {r["query_id"]: {r["cell_p0"], r["cell_p1"]} for r in qp}
    for r in pruned.collect():
        assert cell_of[r["neighbor_id"]] in allowed[r["query_id"]]


def test_pq_fit_replica_matches_spark_fit(spark):
    """The import-time numpy fit replica (oracle side of
    knn_pq_fitted_exact) equals the real Spark-side pq_fit over the
    same corpus in vec_id order, float-for-float — the equality the
    fitted exactness bridge rests on. Also pins the corpus replica's
    bit-identity with the Spark projection."""
    import numpy as np

    corpus = similarity.clustered_corpus(
        spark, n_clusters=8, per_cluster=16, dim=8, spread=0.3
    )
    rows = corpus.orderBy("vec_id").collect()
    got = np.array([r["embedding"] for r in rows], dtype=np.float64)
    want = similarity.clustered_corpus_numpy(
        n_clusters=8, per_cluster=16, dim=8, spread=0.3
    )
    assert got.shape == want.shape
    assert (got == want).all()  # bit-identical, not approx

    fitted = similarity.pq_fit(
        corpus.orderBy("vec_id"), m=4, n_codewords=8, seed=7
    )
    replica = similarity.pq_fit_replica(
        4, 8, seed=7, n_clusters=8, per_cluster=16, dim=8, spread=0.3
    )
    assert fitted == replica  # exact float equality, every codeword


def test_recall_curve_matches_physical_research(spark):
    """The retention theorem ivf_recall_curve rests on: a true top-k
    neighbor entering the candidate set always survives to the
    approximate top-k, so the curve's routing-only hit counts must
    equal hits from PHYSICALLY re-running the search at each probe
    depth. Pinned at several depths, plus the tuner's contract."""
    corpus = similarity.clustered_corpus(
        spark, n_clusters=8, per_cluster=16, dim=8, spread=0.3
    ).localCheckpoint()
    centers = similarity.clustered_corpus_centers(n_clusters=8, dim=8)
    queries = corpus.filter("vec_id % 16 = 0")
    exact = similarity.knn_bruteforce(corpus, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    curve = {
        r["n_probe"]: r["hits"]
        for r in similarity.ivf_recall_curve(
            corpus, queries, centers, k=5
        ).collect()
    }
    assert sorted(curve) == list(range(1, 9))
    n_truth = exact.count()
    assert curve[8] == n_truth  # full probe depth recalls everything
    for p in (1, 2, 4):
        measured = (
            similarity.knn_ivf(
                corpus, queries, k=5, n_probe=p, centroids=centers
            )
            .select("query_id", "neighbor_id")
            .join(exact, ["query_id", "neighbor_id"])
            .count()
        )
        assert curve[p] == measured, (p, curve[p], measured)
    tuned, hits, total = similarity.tune_n_probe(
        corpus, queries, centers, k=5, target_recall=0.9
    )
    assert total == n_truth and hits == curve[tuned]
    import math

    need = math.ceil(0.9 * n_truth)
    assert hits >= need
    assert tuned == 1 or curve[tuned - 1] < need  # minimality


def test_pq_probe_curve_transfer_needs_rerank(spark):
    """Does the retention-theorem recall curve transfer to IVF-PQ
    (r11 verdict optional-depth)? Measured answer, pinned: NO for
    ADC-only ranking — codec distortion caps recall regardless of
    probe depth (hits stay FLAT below the curve as p grows; a true
    neighbor entering the candidate set can be outranked by distorted
    ADC distances, which breaks the theorem's survival step) — and
    YES re-rank-aware: an exact re-rank whose shortlist covers the
    candidate set restores the survival argument, so recall(p) equals
    the routing-only curve again; a PARTIAL shortlist sits between
    (upper-bounded by the curve). tune_n_probe therefore applies to
    the IVF-PQ composition exactly when searches re-rank, which is
    the production shape (knn_pq_rerank_recall)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    corpus = similarity.clustered_corpus(
        spark, n_clusters=8, per_cluster=16, dim=8, spread=0.3
    ).localCheckpoint()
    centers = similarity.clustered_corpus_centers(n_clusters=8, dim=8)
    books = similarity.constructed_pq_codebooks(4, 8, 2)
    queries = corpus.filter("vec_id % 16 = 0")
    exact = similarity.knn_bruteforce(corpus, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    curve = {
        r["n_probe"]: r["hits"]
        for r in similarity.ivf_recall_curve(
            corpus, queries, centers, k=5
        ).collect()
    }
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        similarity.as_double(F.col("embedding")).alias("cv"),
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        similarity.as_double(F.col("embedding")).alias("qv"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )

    def hits_adc(p: int) -> int:
        return (
            similarity.knn_ivf_pq(
                corpus, queries, centers, books, k=5, n_probe=p
            )
            .select("query_id", "neighbor_id")
            .join(exact, ["query_id", "neighbor_id"])
            .count()
        )

    def hits_rerank(p: int, shortlist: int) -> int:
        short = similarity.knn_ivf_pq(
            corpus, queries, centers, books, k=shortlist, n_probe=p
        ).select("query_id", "neighbor_id")
        rr = (
            short.join(c, "neighbor_id")
            .join(F.broadcast(q), "query_id")
            .select(
                "query_id",
                "neighbor_id",
                F.round(
                    similarity.cosine(F.col("qv"), F.col("cv")), 6
                ).alias("cos"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select("query_id", "neighbor_id")
        )
        return rr.join(exact, ["query_id", "neighbor_id"]).count()

    # ADC-only: strictly below the curve once routing stops being the
    # binding constraint, and FLAT in p (the codec is the cap) — the
    # theorem does not transfer (measured 13 at every depth here)
    adc = {p: hits_adc(p) for p in (1, 2, 4)}
    assert adc[1] == adc[2] == adc[4]  # flat: deeper probes add nothing
    assert adc[4] < curve[4]
    # full-coverage exact re-rank: the survival argument is restored
    # and the routing curve is recovered EXACTLY at every depth
    for p in (1, 2, 4):
        assert hits_rerank(p, shortlist=1000) == curve[p], p
    # partial shortlist: between the ADC floor and the curve
    part = hits_rerank(4, shortlist=15)
    assert adc[4] <= part < curve[4]


def test_residual_pq_beats_raw_at_same_budget(spark):
    """Residual encoding (knn_ivf_pq_residual — the faiss IVFx,PQy
    codec proper) lifts fitted-path ADC recall@5 over raw-vector codes
    at the SAME m×n_codewords budget: the books only have to cover the
    within-cell ball, not the corpus range. Measured on the 64×64
    clustered geometry (spread 0.3): raw ≈ 0.36, residual ≈ 0.76 —
    this test pins the ordering with margin, and that the codes the
    two paths produce actually differ (same budget, different codec).
    Also pins residual_vec's exactness: a vector equal to its cell's
    centroid has an all-zero residual."""
    corpus = similarity.clustered_corpus(
        spark, n_clusters=64, per_cluster=64, dim=8, spread=0.3
    ).localCheckpoint()
    centers = similarity.clustered_corpus_centers(64, 8)
    queries = corpus.filter("vec_id % 64 = 0")
    k, n_probe = 5, 2
    truth = similarity.knn_ivf(
        corpus, queries, k=k, n_probe=n_probe, centroids=centers
    ).select("query_id", "neighbor_id")
    n_truth = truth.count()
    books_raw = similarity.pq_fit(corpus, m=4, n_codewords=16, seed=42)
    raw = similarity.knn_ivf_pq(
        corpus, queries, centers, books_raw, k=k, n_probe=n_probe
    ).select("query_id", "neighbor_id")
    assigned, _, cmat = similarity.ivf_assign(corpus, centroids=centers)
    resid = assigned.crossJoin(F.broadcast(cmat)).select(
        "vec_id",
        similarity.residual_vec(
            F.col("arr"), F.col("cmat"), F.col("cell")
        ).alias("rv"),
    )
    books_res = similarity.pq_fit(
        resid, m=4, n_codewords=16, seed=42, vec_col="rv"
    )
    res = similarity.knn_ivf_pq_residual(
        corpus, queries, centers, books_res, k=k, n_probe=n_probe
    ).select("query_id", "neighbor_id")
    r_raw = raw.join(truth, ["query_id", "neighbor_id"]).count() / n_truth
    r_res = res.join(truth, ["query_id", "neighbor_id"]).count() / n_truth
    assert r_res > r_raw + 0.2, (r_raw, r_res)
    assert r_res >= 0.6, r_res
    # exactness spot-check: centroid row -> zero residual
    one = spark.createDataFrame(
        [(0, centers[3], 3)], "vec_id bigint, arr array<double>, cell int"
    )
    rv = one.crossJoin(F.broadcast(cmat)).select(
        similarity.residual_vec(
            F.col("arr"), F.col("cmat"), F.col("cell")
        ).alias("rv")
    ).first()["rv"]
    assert rv == [0.0] * 8


def test_cosine_safe_null_propagates_zero_norm_sentinels(spark):
    """r14 review: a NULL embedding must stay NULL (DuckDB's own
    convention for NULL lists) — only genuine zero-norm inputs take
    the -1.0 sentinel."""
    from pyspark.sql import functions as F

    from flink_log_analysis_spark.operators import similarity

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, None)],
        "i bigint, v array<double>",
    )
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i",
            similarity.cosine_safe(
                F.col("v"), F.array(F.lit(1.0), F.lit(0.0))
            ).alias("c"),
        ).collect()
    }
    assert got[0] == 1.0
    assert got[1] == -1.0
    assert got[2] is None
