"""Behavioral tests for SemDeDup (operators/semdedup.py).

The oracle-parity test certifies the registry row cross-engine; these
pin the semantics on a constructed corpus with known geometry:
cluster assignment (nearest pinned centroid by rounded cosine, low-id
ties), transitive duplicate components, and the paper's keep rule
(lowest cosine-to-centroid survives, everything else in the
component drops).
"""

import math

from flink_log_analysis_spark.operators import semdedup


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
    )


def test_keep_rule_and_components(spark):
    # seeds (seed_mod=3): ids 0 and 3. Cell 0 holds a duplicate CHAIN
    # 1~2, 2~4 (transitive component even though cos(1,4) is lowest);
    # cell 3's member 5 is a singleton.
    vecs = [
        [1.0, 0.0, 0.0, 0.0],        # 0: seed A
        [1.0, 0.08, 0.0, 0.0],       # 1: cell 0
        [1.0, 0.045, 0.0, 0.0],      # 2: cell 0, ~1 and ~4
        [0.0, 1.0, 0.0, 0.0],        # 3: seed B
        [1.0, 0.005, 0.0, 0.0],      # 4: cell 0
        [0.1, 1.0, 0.4, 0.0],        # 5: cell 3 singleton
    ]
    out = {
        r["vec_id"]: r
        for r in semdedup.semantic_dedup(
            _emb(spark, vecs), seed_mod=3, tau=0.999
        ).collect()
    }
    assert len(out) == 6
    # assignment
    for i, cell in [(0, 0), (1, 0), (2, 0), (4, 0), (3, 3), (5, 3)]:
        assert out[i]["cell"] == cell, i
    # seeds cos to themselves is 1.0
    assert out[0]["cos_centroid"] == 1.0
    assert out[3]["cos_centroid"] == 1.0
    # transitivity: 1,2,4 share one component labeled by the min id
    # (0 is in it too iff cos(0, x) >= tau for some member — check)
    comp_members = [
        i for i in out if out[i]["cluster_id"] == out[1]["cluster_id"]
    ]
    assert {1, 2, 4} <= set(comp_members)
    # keep rule: exactly one survivor in the component — the member
    # with the LOWEST rounded cosine to the centroid, tie lower id
    survivors = [i for i in comp_members if out[i]["kept"]]
    expected = min(
        comp_members, key=lambda i: (out[i]["cos_centroid"], i)
    )
    assert survivors == [expected]
    # singletons survive
    assert out[5]["kept"] and out[5]["cluster_id"] == 5


def test_no_duplicates_all_kept(spark):
    vecs = [
        [1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [0.0, 0.0, 1.0],
        [1.0, 1.0, 0.0],
    ]
    out = semdedup.semantic_dedup(
        _emb(spark, vecs), seed_mod=2, tau=0.9999
    ).collect()
    assert all(r["kept"] for r in out)
    assert {r["cluster_id"] for r in out} == {0, 1, 2, 3}


def test_assignment_tie_breaks_to_lower_seed(spark):
    # both seeds are the SAME direction: every vector ties on cosine
    # to seed 0 and seed 2 -> everyone lands in cell 0.
    vecs = [
        [1.0, 0.0],   # seed 0
        [0.6, 0.8],
        [1.0, 0.0],   # seed 2, identical direction to seed 0
        [0.0, 1.0],
    ]
    out = semdedup.semantic_dedup(_emb(spark, vecs), seed_mod=2, tau=2.0)
    assert {r["cell"] for r in out.collect()} == {0}


def test_partitioning_invariance(spark):
    vecs = [[float(i % 5), float((i * 7) % 3), 1.0] for i in range(24)]
    a = semdedup.semantic_dedup(_emb(spark, vecs), seed_mod=6, tau=0.98)
    b = semdedup.semantic_dedup(
        _emb(spark, vecs).repartition(5, "vec_id"), seed_mod=6, tau=0.98
    )
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.collect())
    )


def test_match_against_cells_batch_vs_corpus_only(spark):
    import pytest

    # corpus: seeds 0 and 4 (seed_mod=4), non-seed corpus member 2 in
    # seed 0's cell; batch member 3 duplicates that cell's members;
    # batch member 5 is orthogonal to everything.
    vecs = {
        0: [1.0, 0.0, 0.0],    # corpus seed A
        2: [1.0, 0.01, 0.0],   # corpus, lands in cell 0 (NOT a seed)
        4: [0.0, 1.0, 0.0],    # corpus seed B
        3: [1.0, 0.005, 0.0],  # batch: dup of corpus cell 0
        5: [0.0, 0.0, 1.0],    # batch: orthogonal to everything
    }
    rows = [(i, [float(x) for x in v]) for i, v in vecs.items()]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )
    new = emb.filter("vec_id % 2 = 1")
    corpus = emb.filter("vec_id % 2 = 0")
    out = semdedup.match_against_cells(
        new, corpus, seed_mod=4, tau=0.99
    ).collect()
    got = {(r["new_id"], r["corpus_id"]) for r in out}
    # batch 3 matches corpus 0 and 2 (same cell, cos ~1); batch 5
    # matches nothing; no corpus x corpus or batch x batch pairs
    assert got == {(3, 0), (3, 2)}
    assert all(r["cos"] >= 0.99 for r in out)

    # empty seed set raises loudly instead of 0-row "green"
    with pytest.raises(ValueError, match="no seed centroids"):
        semdedup.match_against_cells(new, corpus.filter("vec_id = 2"),
                                     seed_mod=40, tau=0.5)


def test_external_seeds_and_standing_assignment(spark):
    """The production entry points added by review: (a) semantic_dedup
    accepts EXTERNALLY FITTED centroids (config-bounded — the paper's
    k-means) and then ignores seed_mod; (b) match_against_cells
    accepts a frozen seeds frame + standing corpus assignment and
    must return exactly what the self-contained call returns."""
    vecs = [[float(i % 5), float((i * 7) % 3), 1.0] for i in range(30)]
    emb = _emb(spark, vecs)
    # (a) external seeds: two hand-picked centroids, NOT corpus rows
    ext = spark.createDataFrame(
        [([100, 200], [[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]])],
        "sids array<bigint>, smat array<array<double>>",
    )
    out = semdedup.semantic_dedup(emb, seed_mod=999, tau=0.98, seeds=ext)
    cells = {r["cell"] for r in out.collect()}
    assert cells <= {100, 200} and len(out.collect()) == 30
    # (b) frozen seeds + standing assignment == self-contained call
    new = emb.filter("vec_id % 3 = 0")
    corpus = emb.filter("vec_id % 3 <> 0")
    seeds = semdedup.seed_centroids(corpus, seed_mod=7)
    standing = semdedup.assign_to_centroids(corpus, seeds)
    a = semdedup.match_against_cells(new, corpus, seed_mod=7, tau=0.9)
    b = semdedup.match_against_cells(
        new, corpus, seed_mod=7, tau=0.9,
        seeds=seeds, assigned_corpus=standing,
    )
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.collect())
    )


def test_salted_hot_cell_edges_value_identical(spark):
    """VERDICT r13 item 3: the grid-salted triangle join over hot
    cells must emit the construction-identical pair set — asserted by
    forcing the dispatch (bound=3) on a corpus whose two cells both
    exceed it, against the plain single-key join (bound=None), and
    end-to-end through semantic_dedup."""
    # 40 vectors, two directions -> 2 cells of ~20 (> bound 3); small
    # per-id offsets create a mix of dup pairs and non-pairs
    vecs = []
    for i in range(40):
        base = [1.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 1.0, 0.0]
        base = list(base)
        base[2] = (i % 7) * 0.03
        vecs.append(base)
    emb = _emb(spark, vecs)
    seeds = semdedup.seed_centroids(emb, seed_mod=20)
    assigned = semdedup.assign_to_centroids(emb, seeds)
    plain = semdedup.cell_dup_edges(
        assigned, tau=0.995, hot_cell_bound=None
    )
    salted = semdedup.cell_dup_edges(
        assigned, tau=0.995, hot_cell_bound=3
    )
    p = sorted(map(tuple, plain.collect()))
    s = sorted(map(tuple, salted.collect()))
    assert p == s and len(p) > 5
    # every emitted pair is normalized a < b, each exactly once
    assert all(a < b for a, b in s)
    assert len(s) == len(set(s))
    # end-to-end: the verdict frame is bound-invariant
    full_a = semdedup.semantic_dedup(emb, seed_mod=20, tau=0.995)
    full_b = semdedup.semantic_dedup(
        emb, seed_mod=20, tau=0.995, hot_cell_bound=3
    )
    assert sorted(map(tuple, full_a.collect())) == sorted(
        map(tuple, full_b.collect())
    )


def test_zero_norm_vector_sentinel_cell(spark):
    """ADVICE r13: a zero-norm embedding's raw cosine is an ANSI
    DIVIDE_BY_ZERO in Spark and -1.0 in DuckDB; cosine_safe adopts
    DuckDB's -1.0 convention, pinning the vector to the LOWEST seed id
    deterministically in both engines."""
    vecs = [
        [1.0, 0.0],   # seed 0
        [0.0, 0.0],   # zero-norm
        [0.0, 1.0],   # seed 2
        [0.8, 0.6],
    ]
    out = {
        r["vec_id"]: r
        for r in semdedup.semantic_dedup(
            _emb(spark, vecs), seed_mod=2, tau=0.999
        ).collect()
    }
    assert out[1]["cell"] == 0
    assert out[1]["cos_centroid"] == -1.0
    assert out[1]["kept"]  # -1.0 never reaches tau -> singleton
