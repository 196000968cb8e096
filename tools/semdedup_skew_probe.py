#!/usr/bin/env python
"""Pathological-distribution probe for the r13 curation operators
(the dedup_skew_probe discipline transferred to SemDeDup's cell space
and DSIR's per-document key space).

Two hostile shapes, each against a same-size control:

- **hot_cell** (SemDeDup): 50% of all vectors land in ONE quantizer
  cell (half the corpus points near one centroid direction, each with
  a unique small offset so none cross the duplicate threshold — the
  survivors, components, and verdict volume stay comparable; the
  VARIABLE is cell occupancy). The within-cell self-join is the
  operator's declared quadratic fence: pairs grow as sum over cells
  of occupancy^2, so a 50%-hot cell carries ~n^2/4 pairs where the
  uniform control carries ~n^2/k. r14: cells above
  semdedup.HOT_CELL_BOUND now dispatch into the grid-salted triangle
  join — measured at --n 20000 (top cell 9501; 45.3M skew pairs vs
  0.55M uniform): the hot-cell edge stage fell 208 s -> 43 s (4.8x,
  one task -> g(g+1)/2 tasks across 32 cores; pair set identical).
  The residual skew/uniform ratio (~3x end-to-end) is the candidate
  MASS itself — 83x the uniform arm's pairs, now parallel instead of
  serialized — and shrinking it remains the paper's CONFIG knob:
  raise the cluster count so occupancy stays bounded.

- **giant_doc** (DSIR): one document holds 50% of all corpus grams
  (one 500k-token doc beside n-1 normal ones, vs the same token
  volume spread uniformly). Two bounds compose here: the per-doc
  regroup is capped BY CONSTRUCTION at n_buckets (10k) rows per doc
  no matter the document length — the fold never sees more — but the
  explode+hash featurization of one physical row cannot leave its
  task, so a truly giant single document serializes ITS OWN gram
  hashing on one core (the in-row half of the single-scan trap; same
  bound as the LM filter's per-doc fold, measured in r12). The probe
  states that measured cost; the mitigation (pre-split monster
  documents at ingest, which every real pipeline's chunker already
  does) lives one stage earlier.

Samples are ARM-INTERLEAVED (u, s, u, s, ...) so slow-host drift —
which rides this container's timings up to 3x — cancels in the ratio
instead of landing on whichever arm ran later.

Writes nothing under the repo; replica parquet goes to --out. Usage:

    python tools/semdedup_skew_probe.py [--n 20000] [--out /tmp/...]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 16
SEED_MOD = 40
TAU = 0.95


def build_embeddings(spark, n: int, out: str, skew: bool):
    """(vec_id, embedding) parquet, n rows, DIM dims.

    Control: direction varies with vec_id (hash-spread over the unit
    cube) -> occupancy ~ n/k per cell. Skew arm: every SECOND vector
    points near seed 0's direction plus a vec_id-unique orthogonal
    offset large enough to stay under TAU against its neighbors but
    small enough to keep cell 0 nearest -> ONE cell holds 50% of the
    corpus. Both arms carry n rows x DIM doubles into the same
    assignment projection — the equal-work discipline; cell occupancy
    is the only variable."""
    from pyspark.sql import functions as F

    ids = spark.range(n).select(F.col("id").alias("vec_id"))
    spread = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda d: (
            (F.col("vec_id") * 7919 + d.cast("bigint") * 104729) % 1009
        )
        / F.lit(504.5)
        - F.lit(1.0),
    )
    # near-seed-0 direction: dominant first axis + unique small tail
    hot = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda d: F.when(d == 0, F.lit(10.0)).otherwise(
            ((F.col("vec_id") * 31 + d.cast("bigint") * 17) % 997)
            / F.lit(498.5)
            - F.lit(1.0)
        ),
    )
    # hot membership skips the OTHER seed rows (vec_id % seed_mod == 0,
    # vec_id > 0): if every even seed were also hot-direction, the hot
    # mass would spread across ~seed-count/2 equally-near centroids
    # (measured: top cell 143 of 1000 intended) — pinning seed 0 as
    # the ONLY hot-direction seed concentrates the full 50% in cell 0.
    is_hot = (F.col("vec_id") % 2 == 0) & (
        (F.col("vec_id") % SEED_MOD != 0) | (F.col("vec_id") == 0)
    )
    emb = F.when(is_hot, hot).otherwise(spread) if skew else spread
    par = spark.sparkContext.defaultParallelism
    ids.select(
        "vec_id",
        F.transform(emb, lambda x: x.cast("float")).alias("embedding"),
    ).repartition(par).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def build_docs(spark, n: int, doc_tokens: int, out: str, skew: bool):
    """(doc_id, text) parquet: n docs of ``doc_tokens`` tokens each in
    the control; in the skew arm doc 1 instead carries n/2 *
    doc_tokens tokens and docs (1, n/2] shrink to one token, so BOTH
    arms hold the same total gram volume and differ only in how it
    packs into physical rows."""
    from pyspark.sql import functions as F

    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    word = lambda i: F.concat(  # noqa: E731 — probe-local shorthand
        F.lit("w"),
        ((F.col("doc_id") * 131 + i * 7) % 50021).cast("string"),
    )
    normal = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(1), F.lit(doc_tokens)), word)
    )
    giant = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit((n // 2) * doc_tokens)), word
        ),
    )
    if skew:
        text = (
            F.when(F.col("doc_id") == 1, giant)
            .when(
                (F.col("doc_id") > 1) & (F.col("doc_id") <= n // 2),
                word(F.lit(1)),
            )
            .otherwise(normal)
        )
    else:
        text = normal
    par = spark.sparkContext.defaultParallelism
    ids.select("doc_id", text.alias("text")).repartition(par).write.mode(
        "overwrite"
    ).parquet(out)
    return spark.read.parquet(out)


def interleaved(build_u, build_s, samples: int = 3):
    """Warm both arms, then time u, s alternately; report medians and
    the s/u ratio (drift cancels across the interleave)."""
    build_u().write.format("noop").mode("overwrite").save()
    build_s().write.format("noop").mode("overwrite").save()
    tu, ts = [], []
    for _ in range(samples):
        t0 = time.perf_counter()
        build_u().write.format("noop").mode("overwrite").save()
        tu.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        build_s().write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    mu = round(statistics.median(tu), 3)
    ms = round(statistics.median(ts), 3)
    return {"uniform": mu, "skew": ms, "ratio": round(ms / mu, 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--doc-n", type=int, default=2_000)
    ap.add_argument("--doc-tokens", type=int, default=200)
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--out", default="/tmp/semdedup_skew_probe")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from flink_log_analysis_spark import get_spark
    from flink_log_analysis_spark.operators import dsir, semdedup

    spark = get_spark("semdedup-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    report = {}

    emb_u = build_embeddings(spark, args.n, f"{args.out}/emb_u", False)
    emb_s = build_embeddings(spark, args.n, f"{args.out}/emb_s", True)
    # occupancy evidence: the skew arm's hottest cell holds ~n/2
    for tag, e in (("uniform", emb_u), ("skew", emb_s)):
        seeds = semdedup.seed_centroids(e, SEED_MOD)
        assigned = semdedup.assign_to_centroids(e, seeds)
        top = (
            assigned.groupBy("cell")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        report[f"semdedup_top_cell_{tag}"] = top
        # candidate volume: the within-cell pair count BEFORE the
        # cosine threshold — the quantity occupancy^2 drives
        a = assigned.select(F.col("vec_id").alias("va"), "cell")
        b = assigned.select(F.col("vec_id").alias("vb"), "cell")
        report[f"semdedup_cell_pairs_{tag}"] = (
            a.join(b, "cell").filter(F.col("va") < F.col("vb")).count()
        )
    report["semdedup"] = interleaved(
        lambda: semdedup.semantic_dedup(emb_u, SEED_MOD, TAU),
        lambda: semdedup.semantic_dedup(emb_s, SEED_MOD, TAU),
        args.samples,
    )

    docs_u = build_docs(
        spark, args.doc_n, args.doc_tokens, f"{args.out}/docs_u", False
    )
    docs_s = build_docs(
        spark, args.doc_n, args.doc_tokens, f"{args.out}/docs_s", True
    )
    pred = F.col("doc_id") % 10 == 0
    report["dsir_weights"] = interleaved(
        lambda: dsir.importance_weights(docs_u, pred),
        lambda: dsir.importance_weights(docs_s, pred),
        args.samples,
    )
    print(json.dumps(report))
    spark.stop()
    shutil.rmtree(args.out, ignore_errors=True)


if __name__ == "__main__":
    main()
