"""Semantic tests for the dedup operators (the oracle-parity tests in
test_oracle_parity.py cover cross-engine hash equality; these pin the
*meaning*: known dups found, distinct docs kept)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_log_analysis_spark.operators import dedup

DOCS = [
    # two exact dups (after normalization) of doc 1
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "  The quick   brown fox jumps over the lazy dog  "),
    (3, "the quick brown fox jumps over the lazy dog"),
    # near-dup of doc 1 (one word changed)
    (4, "the quick brown fox leaps over the lazy dog"),
    # unrelated
    (5, "completely different content about spark engines"),
    (6, "yet another unrelated document with other words"),
    # single-token doc (shingle fallback path)
    (7, "singleton"),
]


def _df(spark):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])


def test_exact_dedup_groups(spark):
    groups = dedup.exact_dedup_groups(_df(spark)).collect()
    by_rep = {r.doc_id: r.n_copies for r in groups}
    assert by_rep[1] == 3  # docs 1,2,3 collapse (case/whitespace normalized)
    assert by_rep[4] == 1 and by_rep[5] == 1
    assert len(groups) == 5


def test_near_dup_pairs_finds_known_pair(spark):
    """Identical shingle sets ALWAYS collide (same signature in every
    band), so docs 1/2/3 must pair up. Doc 4 (one-word edit, j≈0.56)
    is BELOW the banding threshold (1/b)^(1/r)≈0.71 — LSH finding it
    is coin-flip by design, so it is not asserted here; its exact
    jaccard is pinned in test_jaccard_exact instead."""
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.near_dup_pairs(_df(spark), threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0  # case/whitespace-normalized dup
    assert pairs[(1, 3)] == 1.0  # exact dup
    assert pairs[(2, 3)] == 1.0
    assert (5, 6) not in pairs


def test_jaccard_exact(spark):
    """Direct check of the verify-stage arithmetic on the 1-edit pair:
    9 words -> 8 distinct bigrams; one word changed breaks 2 bigrams
    on each side: |∩|=6, |∪|=10 -> 0.6."""
    toks = {r.doc_id: r.toks for r in dedup.distinct_token_sets(_df(spark)).collect()}
    pair = spark.createDataFrame([Row(ta=toks[1], tb=toks[4])])
    j = pair.select(dedup.jaccard(F.col("ta"), F.col("tb")).alias("j")).first().j
    assert j == 0.6
    a, b = set(toks[1]), set(toks[4])
    assert len(a & b) == 6 and len(a | b) == 10


def test_ngram_jaccard_pairs_exact_no_false_negatives(spark):
    """Prefix filtering must return EXACTLY the brute-force all-pairs
    answer (its whole point vs MinHash-LSH is zero false negatives) —
    checked at two widths x two thresholds. At n=2 the (1,4) pair sits
    right ON the 0.6 boundary (j = 6/10, see test_jaccard_exact); at
    n=4 the one-word edit breaks 4 of 6 shingles (j = 2/10) and must
    vanish."""
    for n in (2, 4):
        toks = {
            r.doc_id: set(r.toks)
            for r in dedup.ngram_token_sets(_df(spark), n).collect()
        }

        def brute(threshold):
            out = {}
            ids = sorted(toks)
            for i, a in enumerate(ids):
                for b in ids[i + 1:]:
                    j = round(len(toks[a] & toks[b]) / len(toks[a] | toks[b]), 4)
                    if j >= threshold:
                        out[(a, b)] = j
            return out

        for t in (0.5, 0.6):
            got = {
                (r.doc_a, r.doc_b): r.jaccard
                for r in dedup.ngram_jaccard_pairs(
                    _df(spark), threshold=t, n=n
                ).collect()
            }
            assert got == brute(t), f"n {n} threshold {t}"
        if n == 2:
            assert brute(0.6)[(1, 4)] == 0.6  # kept: >= boundary
        else:
            assert (1, 4) not in brute(0.5)  # 4-gram j=0.2: gone


def test_near_dedup_keep_drops_higher_ids(spark):
    kept = {r.doc_id for r in dedup.near_dedup_keep(_df(spark), threshold=0.5).collect()}
    assert 1 in kept
    assert 2 not in kept and 3 not in kept  # guaranteed collisions
    assert {5, 6, 7} <= kept


def test_simhash_near_for_near_dups(spark):
    sh = {r.doc_id: r.simhash for r in dedup.simhash(_df(spark)).collect()}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert sh[1] == sh[3]  # identical text -> identical simhash
    assert hamming(sh[1], sh[4]) < hamming(sh[1], sh[5])  # near < far


def test_minhash_estimates_jaccard(spark):
    sig = dedup.minhash_signatures(_df(spark)).collect()
    by_id = {r.doc_id: [r[f"mh{i}"] for i in range(dedup.N_HASHES)] for r in sig}
    agree_14 = sum(a == b for a, b in zip(by_id[1], by_id[4])) / dedup.N_HASHES
    agree_15 = sum(a == b for a, b in zip(by_id[1], by_id[5])) / dedup.N_HASHES
    assert by_id[1] == by_id[3]
    assert agree_14 > agree_15  # signature agreement tracks similarity


def test_connected_components_vs_union_find(spark):
    from flink_log_analysis_spark.operators.graph import connected_components

    edges = [(1, 2), (2, 3), (5, 6), (8, 9), (9, 1)]  # {1,2,3,8,9}, {5,6}
    df = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    got = {r.vertex: r.component for r in connected_components(df).collect()}

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    exp = {v: find(v) for v in parent}
    assert got == exp
    assert got[8] == 1 and got[5] == 5


def test_near_dup_clusters_transitive(spark):
    from flink_log_analysis_spark.operators.graph import near_dup_clusters

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta eta"),   # ~ 1
        (3, "alpha beta gamma delta epsilon zeta eta theta"),  # ~ 2 (maybe not ~1)
        (4, "completely different words entirely here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.cluster_id for r in
           near_dup_clusters(df, threshold=0.5).collect()}
    # 1,2,3 form one transitive cluster rooted at 1; 4 is a singleton
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == 4


def test_connected_components_distributed_path(spark):
    """Force the label-propagation path (local_threshold=0) and check
    it agrees with the driver-side union-find path."""
    from flink_log_analysis_spark.operators.graph import connected_components

    edges = [(1, 2), (2, 3), (5, 6), (8, 9), (9, 1), (10, 11), (11, 12)]
    df = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    local = {r.vertex: r.component for r in connected_components(df).collect()}
    dist = {r.vertex: r.component
            for r in connected_components(df, local_threshold=0).collect()}
    assert local == dist


def test_connected_components_chain_torture(spark):
    """A 600-link path graph (diameter 600) through the distributed
    path: the two-phase large-star/small-star algorithm converges in
    O(log^2 n) rounds well under max_iter=20, where the previous
    hash-min label propagation needed one round PER HOP (600 rounds —
    an unconditional RuntimeError at any practical max_iter). Also
    interleaves two chains to check components don't bleed."""
    from flink_log_analysis_spark.operators.graph import connected_components

    n = 600
    edges = [(i, i + 2) for i in range(0, 2 * n, 2)]          # evens chain
    edges += [(i, i + 2) for i in range(1, 2 * n, 2)]         # odds chain
    df = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    got = {
        r.vertex: r.component
        for r in connected_components(df, local_threshold=0).collect()
    }
    assert len(got) == 2 * n + 2
    assert all(c == 0 for v, c in got.items() if v % 2 == 0)
    assert all(c == 1 for v, c in got.items() if v % 2 == 1)


def test_connected_components_distributed_random(spark):
    """Pseudo-random graph: distributed two-phase == driver union-find."""
    import random

    from flink_log_analysis_spark.operators.graph import connected_components

    rng = random.Random(1405)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    local = {r.vertex: r.component for r in connected_components(df).collect()}
    dist = {
        r.vertex: r.component
        for r in connected_components(df, local_threshold=0).collect()
    }
    assert local == dist


def test_connected_components_distributed_string_ids(spark):
    """Two-phase path on non-numeric ids (greatest/least order on
    strings) agrees with the union-find path."""
    from flink_log_analysis_spark.operators.graph import connected_components

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("q", "q")],
        "doc_a string, doc_b string",
    )
    got = {
        r.vertex: r.component
        for r in connected_components(df, local_threshold=0).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "q": "q"}


def test_update_components_matches_full_recompute(spark):
    """Folding a batch into standing labels == CC over the full edge
    set: merges across standing components, brand-new vertices,
    untouched singletons, and a batch self-loop all covered."""
    from flink_log_analysis_spark.operators.graph import (
        connected_components,
        update_components,
    )

    old_edges = [(1, 2), (2, 3), (10, 11), (20, 21), (30, 30)]
    new_edges = [(3, 10), (40, 41), (21, 21), (11, 50)]
    old_df = spark.createDataFrame(old_edges, "doc_a bigint, doc_b bigint")
    new_df = spark.createDataFrame(new_edges, "doc_a bigint, doc_b bigint")
    standing = connected_components(old_df)
    inc = {
        r.vertex: r.component
        for r in update_components(standing, new_df).collect()
    }
    full = {
        r.vertex: r.component
        for r in connected_components(old_df.union(new_df)).collect()
    }
    assert inc == full
    assert inc[50] == 1          # new vertex joined the merged 1..3+10,11
    assert inc[30] == 30         # untouched singleton survives
    assert inc[40] == 40 and inc[41] == 40  # brand-new component


def test_update_components_distributed_path(spark):
    from flink_log_analysis_spark.operators.graph import (
        connected_components,
        update_components,
    )

    old_df = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 50)], "doc_a bigint, doc_b bigint"
    )
    new_df = spark.createDataFrame(
        [(50, 51), (51, 52), (7, 100)], "doc_a bigint, doc_b bigint"
    )
    standing = connected_components(old_df)
    inc = {
        r.vertex: r.component
        for r in update_components(
            standing, new_df, local_threshold=0
        ).collect()
    }
    full = {
        r.vertex: r.component
        for r in connected_components(old_df.union(new_df)).collect()
    }
    assert inc == full


def test_leakage_free_splits_properties(spark):
    """After repair: the fixed split is constant within every cluster
    (no near-dup pair can straddle splits), singletons never move,
    and cluster members take the cluster-min doc's split."""
    from flink_log_analysis_spark.plans.llm_dedup import (
        leakage_free_splits,
        split_leakage_pairs,
    )

    sf = "/root/testdata/sf0.001"
    rows = leakage_free_splits(spark, sf).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split_fixed)
    assert all(len(v) == 1 for v in by_cluster.values())
    singles = [r for r in rows if r.cluster_id == r.doc_id]
    assert all(not r.moved for r in singles)
    # the detection row must find leaks on the ORIGINAL assignment for
    # the repair to be non-vacuous at this sf; if this ever goes dry,
    # regenerate with a corpus that actually leaks
    assert split_leakage_pairs(spark, sf).count() > 0
    moved = [r for r in rows if r.moved]
    assert moved, "repair moved nothing despite detected leaks"


def test_connected_components_string_ids(spark):
    from flink_log_analysis_spark.operators.graph import connected_components

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "doc_a string, doc_b string"
    )
    got = {r.vertex: r.component for r in connected_components(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_near_dup_against_corpus_incremental(spark):
    """Batch-vs-corpus matching finds cross-split near-dups and never
    reports batch x batch or corpus x corpus pairs."""
    from pyspark.sql import Row

    from flink_log_analysis_spark.operators import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "completely different set of words in this one here today"
    rows = [
        Row(doc_id=0, text=base),                      # corpus
        Row(doc_id=1, text=other),                     # corpus
        Row(doc_id=10, text=base + " tail"),           # batch: dup of 0
        Row(doc_id=11, text="novel text with entirely fresh tokens now"),
        Row(doc_id=12, text=base + " tail"),           # batch: dup of 0 AND 10
    ]
    df = spark.createDataFrame(rows)
    new = df.filter("doc_id >= 10")
    corpus = df.filter("doc_id < 10")
    got = {
        (r.new_id, r.corpus_id): r.jaccard
        for r in dedup.near_dup_against_corpus(new, corpus, threshold=0.6).collect()
    }
    assert (10, 0) in got and (12, 0) in got
    assert all(n >= 10 and c < 10 for n, c in got)  # never intra-side
    assert (10, 12) not in got and (12, 10) not in got
    assert 11 not in {n for n, _ in got}  # novel doc absent


def test_simhash_near_dups_pigeonhole_exact(spark):
    """The chunk join must find exactly the pairs a brute-force
    Hamming scan finds (pigeonhole candidates are lossless)."""
    from itertools import combinations

    from pyspark.sql import Row, functions as F

    from flink_log_analysis_spark.operators import dedup

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    texts = [base, base + " extra", base.replace("beta", "betb"),
             "wholly different content with other words present here now",
             base]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    sigs = {r.doc_id: r.simhash for r in dedup.simhash(df).collect()}
    expected = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for a, b in combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.simhash_near_dups(df, max_dist=3).collect()
    }
    assert got == expected
    assert (0, 4) in got and got[(0, 4)] == 0  # identical docs


def test_fuzzy_key_pairs_complete_vs_bruteforce(spark):
    """1-deletion-neighborhood blocking has ZERO false negatives at
    lev <= 1: compare against the all-pairs brute force over a key set
    covering equality, substitution, insertion, deletion, repeated
    chars, and far-apart keys."""
    import itertools

    from pyspark.sql import Row

    from flink_log_analysis_spark.operators.dedup import fuzzy_key_pairs

    keys = [
        "alpha", "alpha", "alpja",  # equal + substitution
        "alphax", "lpha",           # insertion + deletion
        "aaa", "aa", "ab",          # repeats / short keys
        "omega", "omeka", "zzzz",   # substitution + far
        "a", "b", "",               # single chars + empty
    ]
    df = spark.createDataFrame(
        [Row(k=i, name=s) for i, s in enumerate(keys)]
    )
    got = {
        (r["id_a"], r["id_b"], r["lev"])
        for r in fuzzy_key_pairs(df, "name", "k", max_dist=1).collect()
    }

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (ca != cb)
                )
        return d[len(b)]

    exp = {
        (i, j, lev(keys[i], keys[j]))
        for i, j in itertools.combinations(range(len(keys)), 2)
        if lev(keys[i], keys[j]) <= 1
    }
    assert got == exp and len(exp) > 5


def test_fuzzy_key_pairs_lev2_complete_vs_bruteforce(spark):
    """2-deletion-neighborhood blocking has ZERO false negatives at
    lev <= 2: all-pairs brute force over keys covering double
    substitution, sub+indel, double insert/delete, transposition
    (lev 2), short keys, and just-outside-the-bound keys."""
    import itertools

    from pyspark.sql import Row

    from flink_log_analysis_spark.operators.dedup import fuzzy_key_pairs

    keys = [
        "alpha", "alpja", "alxja",   # 1-sub chain -> lev 2 ends
        "alphaxy", "lpha",           # +2 inserts / 1 del (lev2 to some)
        "ahpla",                     # transposition-ish (lev 2)
        "aaa", "a", "",              # short: lev 2 via double delete
        "omega", "ameko", "zzzzz",   # 2 subs / far
        "abcdef", "abdcef", "abcfed",  # adjacent swaps = lev 2
    ]
    df = spark.createDataFrame(
        [Row(k=i, name=s) for i, s in enumerate(keys)]
    )
    got = {
        (r["id_a"], r["id_b"], r["lev"])
        for r in fuzzy_key_pairs(df, "name", "k", max_dist=2).collect()
    }

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (ca != cb)
                )
        return d[len(b)]

    exp = {
        (i, j, lev(keys[i], keys[j]))
        for i, j in itertools.combinations(range(len(keys)), 2)
        if lev(keys[i], keys[j]) <= 2
    }
    assert got == exp and any(v == 2 for _, _, v in exp)
    # the wider bound is a strict superset of the lev-1 tier
    lev1 = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_key_pairs(df, "name", "k", max_dist=1).collect()
    }
    assert lev1 <= {(i, j) for i, j, _ in got}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_dist"):
        fuzzy_key_pairs(df, "name", "k", max_dist=3)
