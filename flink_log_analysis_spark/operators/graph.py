"""Iterative graph operators: connected components for dedup clusters.

``near_dedup_keep`` (operators/dedup.py) drops any doc that matches a
lower id — correct one-pass semantics, but transitive duplicate sets
(a~b, b~c, a!~c) need *connected components* so each cluster keeps
exactly one representative. This is the engine's iterative-algorithm
tier: label propagation to fixpoint over the candidate-pair edge list.

Algorithm (standard "hash-min" CC, the Spark idiom for Pregel-style
iteration): every vertex starts labeled with its own id; each round,
every vertex adopts the min label in its neighborhood; stop when no
label changes. Rounds = graph diameter, which for near-dup clusters
is tiny (duplicate families are dense); each round is one shuffle of
the edge list joined to the current labels.

Scale notes: edges come from LSH candidate pairs — already pruned to
~linear in corpus size; labels are (id, label) pairs, far smaller
than documents. Each iteration localCheckpoints the label frame to
truncate lineage (iterative joins otherwise stack exponentially
deep plans). Convergence is data-dependent but bounded by
``max_iter`` with an explicit non-convergence error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


LOCAL_EDGE_THRESHOLD = 500_000


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
    local_threshold: int = LOCAL_EDGE_THRESHOLD,
) -> DataFrame:
    """(vertex, component) with component = min vertex id reachable.

    ``edges`` is an undirected edge list (each pair once, any order).

    Scale-adaptive (the AQE philosophy applied to iteration): LSH
    candidate graphs are usually *tiny* relative to the corpus —
    when the edge list fits comfortably on the driver
    (< ``local_threshold`` edges) a union-find there beats multiple
    distributed rounds of fixed scheduling overhead; past the
    threshold, hash-min label propagation runs fully distributed.
    """
    edges = edges.persist()
    try:
        n_edges = edges.count()
        if n_edges <= local_threshold:
            pairs = edges.select(src, dst).collect()
            parent: dict = {}

            def find(x):
                parent.setdefault(x, x)
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:  # path compression
                    parent[x], x = root, parent[x]
                return root

            for r in pairs:
                ra, rb = find(r[0]), find(r[1])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            rows = [(v, find(v)) for v in parent]
            # Schema follows the edge id type (ids may be strings/UUIDs,
            # not only bigints) — same contract as the distributed path.
            from pyspark.sql.types import StructField, StructType

            id_type = edges.schema[src].dataType
            schema = StructType(
                [
                    StructField("vertex", id_type),
                    StructField("component", id_type),
                ]
            )
            return edges.sparkSession.createDataFrame(rows, schema)
        return _cc_label_propagation(edges, src, dst, max_iter)
    finally:
        edges.unpersist()


def _cc_label_propagation(
    edges: DataFrame, src: str, dst: str, max_iter: int
) -> DataFrame:
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # Min label among each vertex's neighbors (messages), then
        # min(own, neighborhood) per vertex.
        msgs = (
            sym.join(labels, sym.v == labels.vertex)
            .groupBy(F.col("u").alias("vertex"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(msgs, "vertex", "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", "component")
                ).alias("component"),
                (F.coalesce("nbr_min", "component") < F.col("component")).alias(
                    "changed"
                ),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        n_changed = updated.filter("changed").count()
        labels = updated.drop("changed")
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def near_dup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.6,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Every document labeled with its near-duplicate cluster id
    (cluster = min doc_id in the connected component; singletons are
    their own cluster). The complete transitive version of
    ``near_dedup_keep``. ``pairs`` lets callers that already hold the
    verified near-dup pair set (doc_a, doc_b, ...) share it instead of
    re-running the whole MinHash-LSH chain."""
    from .dedup import near_dup_pairs

    if pairs is None:
        pairs = near_dup_pairs(df, text_col, id_col, threshold)
    comp = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("vertex").alias(id_col), F.col("component").alias("cluster_id")
    )
    return (
        df.select(id_col)
        .join(comp, id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
    )
