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
