"""Deterministic sampling operators for training-data pipelines.

``df.sample()`` is seeded per-partition, so its output changes with
partitioning, task retries, and engine — unusable when a sample must
be reproducible across runs (and auditable against an oracle). These
operators decide membership from a *content hash* of a key column
instead: the same row is in or out of the sample everywhere, forever,
independent of physical layout. This is the standard trick for
holdout/eval splits in large corpus pipelines ("hash-mod splits").

Hash = the repo-wide engine-portable md5 bucket
(:mod:`..functions.hashing`), mapped to a bucket in [0, 1e6). A row is
sampled iff bucket < fraction * 1e6.

Scale notes: membership is a pure map-side predicate on already-read
columns — no shuffle, no state, trivially parallel; Catalyst pushes
surrounding filters/projections around it freely. Stratified sampling
adds only a broadcast of the (tiny) per-stratum fraction map, encoded
as a CASE expression — never a join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import token_hash, token_hash_sql

BUCKETS = 1_000_000


def sample_bucket(key: Column, seed: int | str = 0) -> Column:
    """Deterministic bucket in [0, 1e6) for a key column."""
    return token_hash(key.cast("string"), salt=seed) % BUCKETS


def sample_bucket_sql(expr: str, seed: int | str = 0) -> str:
    """DuckDB twin of :func:`sample_bucket` (for oracles)."""
    return f"({token_hash_sql(f'CAST({expr} AS VARCHAR)', salt=seed)} % {BUCKETS})"


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: int | str = 0,
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided by key hash (reproducible
    across runs, partitionings, and engines)."""
    return df.filter(
        sample_bucket(F.col(key_col), seed) < int(fraction * BUCKETS)
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    seed: int | str = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. rebalance languages).

    ``fractions`` maps stratum value -> keep fraction; strata not
    listed keep ``default_fraction``. The fraction lookup compiles to
    a CASE expression — no join, no shuffle.
    """
    threshold = F.lit(int(default_fraction * BUCKETS))
    for value, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(frac * BUCKETS))
        ).otherwise(threshold)
    return df.filter(sample_bucket(F.col(key_col), seed) < threshold)


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    seed: int | str = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (train/val/test...)
    by hash range. ``splits`` fractions must sum to <= 1; rows hashing
    past the last boundary get NULL (excluded-by-design).

    The assignment is stable under data growth: a row's split never
    changes when other rows are added or the frame is repartitioned —
    the property that keeps eval sets uncontaminated across pipeline
    re-runs.
    """
    bucket = sample_bucket(F.col(key_col), seed)
    expr = F.lit(None).cast("string")
    cum = 0.0
    bounds = []
    for name, frac in splits.items():  # preserve caller order
        lo, hi = cum, cum + frac
        bounds.append((name, int(lo * BUCKETS), int(hi * BUCKETS)))
        cum = hi
    if cum > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {cum} > 1")
    for name, lo, hi in reversed(bounds):
        expr = F.when((bucket >= lo) & (bucket < hi), F.lit(name)).otherwise(
            expr
        )
    return df.withColumn(split_col, expr)


def temperature_resample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    tau: float = 2.0,
    seed: int | str = 0,
) -> DataFrame:
    """Temperature-based mixture rebalancing (the multilingual
    training-mix recipe): target share of stratum ``s`` is
    ``p_s ∝ n_s**(1/tau)`` — ``tau=1`` keeps natural proportions,
    ``tau→∞`` approaches uniform — and the output is the LARGEST
    exact-proportion subsample achievable without upsampling:
    ``T = min_s n_s / p_s`` rows total, stratum fraction
    ``p_s * T / n_s`` (the argmin stratum keeps everything).

    Membership is the deterministic hash-bucket predicate, so the
    sample is stable across runs/partitionings/engines. Plan shape at
    100 TB: one per-stratum count agg (map-side partial), two 1-row
    scalar attaches (weight sum, T), a broadcast join of the tiny
    per-stratum fraction table, then a map-side filter — the corpus
    streams through once.

    Fractions are rounded to 6 digits BEFORE the integer bucket
    threshold is derived, the repo-wide pattern that keeps the
    DuckDB oracle's last-ulp pow/sum differences away from the
    membership boundary.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    w = counts.select(
        strata_col,
        "_n",
        F.pow(F.col("_n").cast("double"), 1.0 / tau).alias("_w"),
    )
    wsum = w.agg(F.sum("_w").alias("_wsum"))
    p = w.crossJoin(F.broadcast(wsum)).select(
        strata_col, "_n", (F.col("_w") / F.col("_wsum")).alias("_p")
    )
    tmin = p.agg(F.min(F.col("_n") / F.col("_p")).alias("_t"))
    frac = p.crossJoin(F.broadcast(tmin)).select(
        strata_col,
        F.round(F.col("_p") * F.col("_t") / F.col("_n"), 6).alias("_frac"),
    )
    thresh = frac.select(
        strata_col,
        F.least(
            F.lit(BUCKETS).cast("bigint"),
            F.round(F.col("_frac") * BUCKETS).cast("bigint"),
        ).alias("_thresh"),
    )
    return (
        df.join(F.broadcast(thresh), strata_col)
        .filter(sample_bucket(F.col(key_col), seed) < F.col("_thresh"))
        .drop("_thresh")
    )


def temperature_resample_oracle_sql(
    src: str,
    key_expr: str,
    strata_col: str,
    tau: float = 2.0,
    seed: int | str = 0,
) -> str:
    """DuckDB twin of :func:`temperature_resample` membership (returns
    a WHERE-ready CTE chain + predicate as one SELECT over ``src``)."""
    bucket = sample_bucket_sql(key_expr, seed)
    return f"""
        WITH _n AS (SELECT {strata_col}, COUNT(*) AS n
                    FROM {src} GROUP BY {strata_col}),
        _w AS (SELECT {strata_col}, n, pow(n, 1.0 / {tau}) AS w FROM _n),
        _p AS (SELECT {strata_col}, n, w / (SELECT SUM(w) FROM _w) AS p
               FROM _w),
        _f AS (SELECT {strata_col},
                      ROUND(p * (SELECT MIN(n / p) FROM _p) / n, 6) AS frac
               FROM _p),
        _t AS (SELECT {strata_col},
                      LEAST(CAST({BUCKETS} AS BIGINT),
                            CAST(ROUND(frac * {BUCKETS}) AS BIGINT))
                          AS thresh
               FROM _f)
        SELECT d.* FROM {src} d
        JOIN _t USING ({strata_col})
        WHERE {bucket} < thresh
    """


SHUFFLE_SHARDS = 16


def training_order_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int | str = 0,
    n_shards: int = SHUFFLE_SHARDS,
) -> DataFrame:
    """Deterministic global shuffle for training order: every row gets
    an exact global ``position`` under the pseudorandom total order
    ``md5(seed:id)`` (id tie-break) plus its round-robin ``shard``.

    The op a training exporter runs last: examples must be read in a
    shuffled-but-reproducible order, and "shuffle then shard" must
    give byte-identical shards on every rerun — so the order is a
    content hash (same portability contract as :func:`hash_sample`:
    independent of partitioning, task retries, and engine), never
    ``rand()`` or ``df.sample``. Re-seeding permutes the corpus into a
    fresh epoch order.

    The global position comes from
    :func:`..ranking.distributed_rank` in its partitionless mode —
    never a partitionless ``Window.orderBy`` (the single-task funnel):
    only the narrow (id, key) projection shuffles, the payload stays
    put, and shards are arithmetic on the position. Round-robin on the
    hash order also makes every shard a uniform random sample of the
    corpus — per-shard loss curves are comparable by construction.
    """
    from .ranking import distributed_rank

    key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    t = df.select(F.col(id_col), key.alias("shuffle_key"))
    ranked = distributed_rank(
        t, [], ["shuffle_key", id_col], rank_col="_rank", size_col="_n"
    )
    return ranked.select(
        id_col,
        "shuffle_key",
        (F.col("_rank") - 1).alias("position"),
        ((F.col("_rank") - 1) % n_shards).cast("int").alias("shard"),
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight: Column,
    n: int,
    seed: int | str = 0,
    es_col: str = "es_key",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-ES): each row draws a hash-uniform
    u in (0,1) and the sample is the n smallest ``-ln(u)/w`` — the
    order statistic equivalent of drawing rows one by one with
    probability proportional to ``weight``. The same content-hash
    portability contract as :func:`hash_sample`: independent of
    partitioning, retries, and engine, and re-seedable.

    The ES key is rounded to 6 decimals BEFORE ranking with a
    ``key_col`` tie-break (the repo-wide float-comparison convention),
    so a 1-ulp ln() divergence between engines can never flip a
    boundary row.

    Scale shape: the key is a map-side projection and the selection is
    ``orderBy().limit(n)`` — TakeOrderedAndProject, per-partition
    heaps of n + a driver merge of n rows, never a global sort.
    """
    u = (sample_bucket(F.col(key_col), seed) + F.lit(0.5)) / BUCKETS
    es = F.round(-F.log(u) / weight, 6)
    return (
        df.withColumn(es_col, es)
        .orderBy(es_col, key_col)
        .limit(n)
    )
