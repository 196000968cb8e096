"""SemDeDup — semantic deduplication via embedding clusters (Abbas
et al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication").

Exact near-duplicate detection over embeddings is O(n^2); SemDeDup's
observation is that semantic duplicates land in the same cluster of
any reasonable coarse quantizer, so it clusters the corpus (k-means
in the paper), compares pairs ONLY within a cluster, and keeps one
representative per duplicate group — the member with the LOWEST
cosine similarity to its cluster centroid (the most "interior"
duplicates are removed, retaining the diverse boundary point).

Spark-first shape:

- **Cluster assignment is a projection, not a join.** The centroid
  set travels as ONE broadcast row (the ``cmat`` convention,
  :mod:`.similarity`): each vector computes its rounded cosine to
  every centroid inside a ``transform`` and takes the struct-max —
  no shuffle, no crossJoin beyond the whitelisted 1-row attach. At
  production scale the centroid set MUST be the config-bounded
  ``seeds`` argument (the paper uses 50k k-means centroids for
  LAION — e.g. :func:`.similarity.ivf_fit` output) so the broadcast
  never scales with the corpus; the ``seed_mod`` default instead
  pins every seed_mod-th corpus row — closed-form for the oracle
  contract, but its count grows as n/seed_mod, a test-scale shape.
- **The quadratic work is fenced per cell, and a hot cell no longer
  serializes.** Candidate pairs come from a self-equi-join on
  ``cell`` — pair count bounded by sum of per-cell occupancy squared,
  the quantity the cluster count controls (the paper's own scaling
  argument). Cells whose occupancy exceeds :data:`HOT_CELL_BOUND`
  dispatch (one count agg, driver scalar) into a **grid-salted
  triangle self-join**: rows hash into g groups and the join keys on
  (cell, g_lo, g_hi), so the occupancy^2/2 candidate work spreads
  over g(g+1)/2 tasks instead of ONE (measured 2.01x wall on a
  50%-hot cell before the fix, tools/semdedup_skew_probe.py). The
  emitted pair SET is construction-identical to the plain join, so
  the dispatch can never move the oracle hash — on ANY input, not
  just contract-scale ones. (An in-cell banded-LSH fallback was
  considered and rejected: a hot cell is hot because its members
  share a direction, which puts them in the SAME hyperplane sign
  bucket — the join re-serializes and recall silently drops; the
  salted grid parallelizes regardless of cell geometry and loses
  nothing. The quadratic MASS itself remains the paper's config
  knob: raise the centroid count so occupancy stays bounded.)
- **Duplicate groups are transitive-closure components** over the
  threshold graph (:mod:`.graph` — driver union-find under the edge
  threshold, distributed hash-min label propagation above it), so
  a~b, b~c collapses to ONE kept representative even when a!~c.

Determinism contract: centroids are pinned rows of the corpus itself
(every ``seed_mod``-th vector, collected in id order — bounded by
construction at contract scale; production passes externally fitted
centroids), cosines round to 6 digits before every comparison (the
certified Spark/DuckDB ``list_cosine_similarity`` pairing), and all
ties break toward the lower id — so a DuckDB oracle replays
assignment, edges, components, and the keep rule exactly.

Reference behavioral parity: the reference engine
(/root/reference/src/main/java/com/jmx/analysis/LogAnalysis.java) has
no embedding surface — this is engine-extension tier (SURVEY.md §2.D).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .graph import connected_components
from .similarity import as_double, cosine_safe

SEED_MOD = 40     # contract centroids = every 40th vector, id order
TAU = 0.3         # rounded-cosine duplicate threshold within a cell
COS_ROUND = 6     # the repo-wide certified cosine rounding
# Occupancy above which a cell's pair generation routes through the
# grid-salted triangle join (value-identical, just parallel). Sized so
# a cold cell's single-task pair work stays ~0.5M cosines and the salt
# never triggers at contract scale (sf0.01 ships 500 vectors total).
HOT_CELL_BOUND = 1024
SALT_GROUP_CAP = 64  # replication factor ceiling for the salted join


def seed_centroids(
    emb: DataFrame,
    seed_mod: int = SEED_MOD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """1-row broadcastable centroid frame (sids array<bigint>, smat
    array<array<double>>), both ordered by seed id. Bounded collect:
    the centroid count is the clustering parameter, not the corpus."""
    rows = (
        emb.filter(F.col(id_col) % seed_mod == 0)
        .select(F.col(id_col), as_double(F.col(vec_col)).alias("sv"))
        .orderBy(id_col)
        .collect()
    )
    sids = [r[0] for r in rows]
    smat = [list(r[1]) for r in rows]
    if not sids:
        # an empty quantizer silently assigns every vector a NULL
        # cell and every downstream join returns 0 rows "green" —
        # caught live when a batch split made seed_mod unsatisfiable
        raise ValueError(
            f"no seed centroids: no {id_col} % {seed_mod} == 0 rows"
        )
    return emb.sparkSession.createDataFrame(
        [(sids, smat)], "sids array<bigint>, smat array<array<double>>"
    )


def assign_to_centroids(
    emb: DataFrame,
    seeds: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, e, cell, cos_centroid): nearest centroid by rounded
    cosine, ties to the lower centroid id — one projection over the
    1-row broadcast centroid row.

    Zero-norm vectors (either side): ``cosine_safe`` returns -1.0 —
    the convention DuckDB's ``list_cosine_similarity`` already applies
    — so a degenerate vector deterministically ties across all
    centroids and lands in the lowest-id cell with cos_centroid =
    -1.0 in BOTH engines (ADVICE r13: raw it was an ANSI
    DIVIDE_BY_ZERO in Spark and engine-sensitive NULL ordering
    otherwise)."""
    e = as_double(F.col(vec_col))
    with_e = emb.select(F.col(id_col), e.alias("e")).crossJoin(
        F.broadcast(seeds)
    )
    cosarr = F.transform(
        F.col("smat"),
        lambda s: F.round(cosine_safe(F.col("e"), s), COS_ROUND),
    )
    best = F.array_max(
        F.zip_with(
            cosarr,
            F.col("sids"),
            lambda c, s: F.struct(c.alias("cos"), (-s).alias("negid")),
        )
    )
    return with_e.select(
        id_col,
        "e",
        (-best["negid"]).alias("cell"),
        best["cos"].alias("cos_centroid"),
    )


def _plain_cell_edges(
    assigned: DataFrame, tau: float, id_col: str
) -> DataFrame:
    """The unsalted within-cell pair join (one shuffle keyed on cell)."""
    a = assigned.select(
        F.col(id_col).alias("vec_a"),
        F.col("e").alias("ea"),
        "cell",
    )
    b = assigned.select(
        F.col(id_col).alias("vec_b"),
        F.col("e").alias("eb"),
        "cell",
    )
    return (
        a.join(b, "cell")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(
            F.round(cosine_safe(F.col("ea"), F.col("eb")), COS_ROUND)
            >= F.lit(tau)
        )
        .select("vec_a", "vec_b")
    )


def _salted_cell_edges(
    hot: DataFrame, tau: float, id_col: str, n_groups: int
) -> DataFrame:
    """Grid-salted triangle self-join over hot cells: value-identical
    to :func:`_plain_cell_edges`, but the occupancy^2/2 candidate work
    of one cell spreads over g(g+1)/2 join keys instead of ONE task.

    Each row hashes into a group r in [0, g). The unordered pair with
    groups (i, j), i <= j, is generated at EXACTLY the key
    (cell, i, j): the left side replicates a group-r row to keys
    (r, j) for j >= r, the right side to (i, r) for i <= r, so a
    cross-group pair meets once at (min, max) and a same-group pair
    meets at (r, r) both ways — normalized by the id inequality. Total
    replication is g+1 copies per row; per-key candidate volume is
    ~(occ/g)^2. The group hash only PLACES work, it never selects
    pairs, so any deterministic hash is fine and the emitted pair set
    is construction-identical to the plain join on every input."""
    g = F.pmod(F.hash(F.col(id_col)), F.lit(n_groups))
    base = hot.select(F.col(id_col), "e", "cell", g.alias("_g"))
    left = base.select(
        F.col(id_col).alias("vec_a"),
        F.col("e").alias("ea"),
        "cell",
        F.col("_g").alias("_g1"),
        F.explode(
            F.sequence(F.col("_g"), F.lit(n_groups - 1))
        ).alias("_g2"),
    )
    right = base.select(
        F.col(id_col).alias("vec_b"),
        F.col("e").alias("eb"),
        "cell",
        F.explode(F.sequence(F.lit(0), F.col("_g"))).alias("_g1"),
        F.col("_g").alias("_g2"),
    )
    return (
        left.join(right, ["cell", "_g1", "_g2"])
        .filter(
            ((F.col("_g1") != F.col("_g2")) | (F.col("vec_a") < F.col("vec_b")))
            & (F.col("vec_a") != F.col("vec_b"))
        )
        .select(
            F.least(F.col("vec_a"), F.col("vec_b")).alias("vec_a"),
            F.greatest(F.col("vec_a"), F.col("vec_b")).alias("vec_b"),
            F.col("ea"),
            F.col("eb"),
        )
        .filter(
            F.round(cosine_safe(F.col("ea"), F.col("eb")), COS_ROUND)
            >= F.lit(tau)
        )
        .select("vec_a", "vec_b")
    )


def cell_dup_edges(
    assigned: DataFrame,
    tau: float = TAU,
    id_col: str = "vec_id",
    hot_cell_bound: int | None = HOT_CELL_BOUND,
) -> DataFrame:
    """(vec_a, vec_b) pairs within one cell whose rounded cosine
    reaches ``tau`` (each pair once, a < b).

    Cells whose occupancy exceeds ``hot_cell_bound`` dispatch into the
    grid-salted triangle join (VERDICT r13 item 3 — the 50%-hot-cell
    probe measured 2.01x wall before this): the dispatch is ONE
    collected count agg (the occupancy table is bounded by the
    quantizer size — broadcastable, hence collectable, by the same
    construction), and the salted branch emits the
    construction-identical pair set — so the verdict, components, and
    oracle hash cannot move on any input. Pass ``hot_cell_bound=None``
    to force the plain single-key join.

    NOTE: the dispatch is an EAGER Spark action at construction time
    (driver-side branching needs the scalar); callers composing this
    frame without executing it still pay one occupancy aggregation
    over ``assigned`` — checkpoint ``assigned`` first when its lineage
    is expensive (semantic_dedup does). The cold path pays EXACTLY
    that one job and nothing else (VERDICT r14 item 2: the earlier
    occ localCheckpoint + separate max agg cost two extra scheduled
    jobs per call — 3.74 s vs the r13 2.56 s driver median); the hot
    path rebuilds the tiny occupancy frame locally from the collected
    rows, so dispatch scan and hot-branch join still consume ONE
    aggregation."""
    if hot_cell_bound is not None:
        occ_rows = (
            assigned.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("_occ"))
            .collect()
        )
        max_occ = max((r["_occ"] for r in occ_rows), default=0)
        if max_occ > hot_cell_bound:
            n_groups = min(
                SALT_GROUP_CAP, -(-max_occ // hot_cell_bound) * 2
            )
            occ = assigned.sparkSession.createDataFrame(
                [(r["cell"], r["_occ"]) for r in occ_rows],
                "cell bigint, _occ bigint",
            )
            tagged = assigned.join(F.broadcast(occ), "cell")
            cold = tagged.filter(
                F.col("_occ") <= hot_cell_bound
            ).drop("_occ")
            hot = tagged.filter(F.col("_occ") > hot_cell_bound).drop(
                "_occ"
            )
            return _plain_cell_edges(cold, tau, id_col).unionByName(
                _salted_cell_edges(hot, tau, id_col, n_groups)
            )
    return _plain_cell_edges(assigned, tau, id_col)


def match_against_cells(
    new: DataFrame,
    corpus: DataFrame,
    seed_mod: int = SEED_MOD,
    tau: float = TAU,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeds: DataFrame | None = None,
    assigned_corpus: DataFrame | None = None,
) -> DataFrame:
    """Arriving-batch semantic matching against the standing corpus:
    verified (new_id, corpus_id, cos) pairs with rounded cosine >=
    ``tau`` — never batch x batch or corpus x corpus (the
    incremental_near_dups contract shape, semantic edition).

    The quantizer is FROZEN ON THE CORPUS (centroids never look at
    the batch — the index-reuse property that makes continuous ingest
    cheap, and the corpus side is exactly what a cell-partitioned
    persisted layout would prune to). Both sides run the same
    1-row-broadcast assignment projection, so batch and corpus can
    never disagree about cell geometry.

    A production ingest loop passes ``seeds`` (the frozen quantizer,
    built once) and ``assigned_corpus`` (the standing assignment,
    e.g. the cell-partitioned layout on disk) so each batch pays only
    batch_size assignments + the per-cell join — with them omitted,
    THIS call derives both from ``corpus`` (the self-contained
    contract shape, which re-scans the corpus and is NOT incremental
    across calls)."""
    if seeds is None:
        seeds = seed_centroids(corpus, seed_mod, id_col, vec_col)
    assigned = (
        assign_to_centroids(corpus, seeds, id_col, vec_col)
        if assigned_corpus is None
        else assigned_corpus
    )
    nc = assigned.select(
        F.col(id_col).alias("corpus_id"), F.col("e").alias("ec"), "cell"
    )
    nb = assign_to_centroids(new, seeds, id_col, vec_col).select(
        F.col(id_col).alias("new_id"), F.col("e").alias("en"), "cell"
    )
    return (
        nb.join(nc, "cell")
        .select(
            "new_id",
            "corpus_id",
            F.round(cosine_safe(F.col("en"), F.col("ec")), COS_ROUND).alias(
                "cos"
            ),
        )
        .filter(F.col("cos") >= F.lit(tau))
    )


def semantic_dedup(
    emb: DataFrame,
    seed_mod: int = SEED_MOD,
    tau: float = TAU,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeds: DataFrame | None = None,
    hot_cell_bound: int | None = HOT_CELL_BOUND,
) -> DataFrame:
    """Per-vector SemDeDup verdict.

    Output: (vec_id, cell, cluster_id, cos_centroid, kept) — every
    vector, its cell, its duplicate component (its own id when it has
    no duplicate), its rounded cosine to the cell centroid, and
    whether it survives: singletons survive; each duplicate component
    keeps exactly its lowest-centroid-similarity member (tie: lowest
    id), the paper's diversity-preserving choice.

    ``seeds`` is the production entry point for EXTERNALLY FITTED
    centroids (the paper's k-means — :func:`..similarity.ivf_fit`
    output reshaped to (sids, smat), or any config-bounded set): pass
    it and ``seed_mod`` is ignored. The ``seed_mod`` default derives
    centroids from pinned corpus rows — right for the closed-form
    contract, but its centroid COUNT grows as n/seed_mod, so it is
    NOT the shape to run at 10^9 vectors (the driver collect and the
    broadcast row both grow with the corpus)."""
    from ..session import ensure_min_partitions

    # Widen first: a single-file local corpus would otherwise run the
    # n x k cosine projection (and the per-cell pair verification) on
    # one core — the expression-heavy single-scan trap.
    emb = ensure_min_partitions(emb)
    if seeds is None:
        seeds = seed_centroids(emb, seed_mod, id_col, vec_col)
    # The n x k cosine assignment feeds FOUR consumers (both sides of
    # the pair join, the verdict join, the keeper agg) — cut the plan
    # here so it computes once (blocks reclaimed by
    # session.release_checkpoints, the repo convention).
    assigned = assign_to_centroids(emb, seeds, id_col, vec_col)
    assigned = assigned.localCheckpoint(eager=True)
    comps = connected_components(
        cell_dup_edges(assigned, tau, id_col, hot_cell_bound),
        src="vec_a",
        dst="vec_b",
    ).withColumnRenamed("vertex", id_col)
    labeled = assigned.join(comps, id_col, "left")
    keepers = (
        labeled.filter(F.col("component").isNotNull())
        .groupBy("component")
        .agg(
            F.min(F.struct(F.col("cos_centroid"), F.col(id_col))).alias(
                "_k"
            )
        )
        .select("component", F.col("_k")[id_col].alias("_keeper"))
    )
    return (
        # keeper table size tracks the duplicate-component count (can
        # grow with the corpus) — no broadcast hint; AQE picks the
        # strategy from the measured size.
        labeled.join(keepers, "component", "left")
        .select(
            id_col,
            "cell",
            F.coalesce(F.col("component"), F.col(id_col)).alias(
                "cluster_id"
            ),
            "cos_centroid",
            (
                F.col("component").isNull()
                | (F.col(id_col) == F.col("_keeper"))
            ).alias("kept"),
        )
    )
