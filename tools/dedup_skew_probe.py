#!/usr/bin/env python
"""Pathological-key probe for the first-writer-wins dedup windows
(VERDICT r11 #6 — the session-skew-probe pattern transferred to the
span-dedup / URL-dedup / domain-quota key spaces).

Three hostile distributions, each against a same-size uniform control:

- **span**: one span's text in 50% of all documents — the hot span
  key of span_dedup's first-occurrence selection. Measured BOTH ways:
  the shipped packed-key min shape (first occurrence = the
  (id, pos)-minimal row per key; packing (id, pos) into one bigint
  makes it a plain ``min``, a true HashAggregate whose map-side
  partial collapses the hot key per input partition before the
  shuffle — a struct ``min_by`` would plan as SortAggregate and lose
  exactly that) and the pre-r12 window shape (row_number over the
  key, which funnels every occurrence of the hot span through ONE
  task's sort). The pair is the justification for the rewrite, not
  just a bound.
- **url**: one exact URL on 50% of rows — the hot ``url_norm``
  partition of url_curation's min/count window. The per-row verdict
  (is_canonical, n_same_url on EVERY input row) genuinely needs the
  whole group visible to each row, so the window stays; this probe
  states its measured cost.
- **domain**: one registered domain holding 50% of all canonical
  pages (distinct URLs, shared host) — the hot ``domain`` partition of
  domain_quota's ranked window. Ranks are emitted for every candidate
  (the audit view), so the full per-domain order is semantic; again a
  measured bound.

The reported number is skewed/uniform wall-clock per query: ~1.0 means
the parallel machinery absorbs the skew; >> 1 means the single-task
bound is the operator's cost at that distribution.

Writes nothing under the repo; replica parquet goes to --out. Usage:

    python tools/dedup_skew_probe.py [--reps 100] [--base .../sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_docs_replica(spark, base: str, out: str, skew: bool, reps: int):
    """documents x reps with unique doc_ids. Every SECOND document's
    text is replaced by a synthetic 48-token string — IDENTICAL across
    all of them in the skew arm (one hot span key holding 50% of all
    span rows) and doc_id-unique in the control arm — so the two
    replicas carry byte-comparable tokenize/hash work and differ ONLY
    in the key distribution (the r11 session-probe discipline: pin the
    key, keep the rows; a text-derived key forces pinning via
    equal-length synthesis instead)."""
    from pyspark.sql import functions as F

    from flink_log_analysis_spark.session import read_table

    df = read_table(spark, base, "documents")
    max_id = df.agg(F.max("doc_id")).first()[0]
    big = (
        df.withColumn(
            "_rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1)))
        )
        .withColumn(
            "doc_id", F.col("doc_id") + F.col("_rep") * (max_id + 1)
        )
        .drop("_rep")
    )
    filler = " ".join(f"tok{i:04d}" for i in range(47))
    head = (
        F.lit("hotspan")
        if skew
        else F.concat(F.lit("u"), F.col("doc_id").cast("string"))
    )
    big = big.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(head, F.lit(" " + filler)),
        ).otherwise(F.col("text")),
    )
    par = spark.sparkContext.defaultParallelism
    big.repartition(par).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def build_url_frame(spark, n: int, out: str, mode: str):
    """(doc_id, url) parquet. The url_curation pair: 'uniform' spreads
    rows over ~n/10 domains with a 3-ids-per-page dedup arm vs
    'hot_url' pinning ONE exact URL on 50% of rows (same row volume
    into the per-row-verdict window; group sizes are the variable).
    The domain_quota pair: 'uniform_pages' vs 'hot_domain' — BOTH are
    all-distinct canonical pages (one page per row, so the exact same
    n rows survive curation into the quota window in both arms — the
    equal-work discipline; an earlier shape let the hot arm carry ~2x
    the canonical pages and measured volume, not skew), differing only
    in whether pages spread over ~n/10 domains or 50% pile into one."""
    from pyspark.sql import functions as F

    base = spark.range(n).select(F.col("id").alias("doc_id"))
    uniform = F.concat(
        F.lit("https://site"),
        ((F.col("doc_id") / 3).cast("long") % (n // 10)).cast("string"),
        F.lit(".com/a/"),
        (F.col("doc_id") / 3).cast("long").cast("string"),
    )
    spread_page = F.concat(
        F.lit("https://site"),
        (F.col("doc_id") % (n // 10)).cast("string"),
        F.lit(".com/a/"),
        F.col("doc_id").cast("string"),
    )
    hot_page = F.concat(
        F.lit("https://hot.com/a/"), F.col("doc_id").cast("string")
    )
    if mode == "uniform":
        url = uniform
    elif mode == "hot_url":
        url = F.when(
            F.col("doc_id") % 2 == 0, F.lit("https://hot.com/a/1")
        ).otherwise(uniform)
    elif mode == "uniform_pages":
        url = spread_page
    else:  # hot_domain
        url = F.when(
            F.col("doc_id") % 2 == 0, hot_page
        ).otherwise(spread_page)
    par = spark.sparkContext.defaultParallelism
    base.select("doc_id", url.alias("url")).repartition(par).write.mode(
        "overwrite"
    ).parquet(out)
    return spark.read.parquet(out)


def timed(df, samples: int = 3) -> float:
    """Warm pass (JIT/codegen), then median of ``samples`` timed
    passes — host-contention spikes ride single passes hard enough to
    flip a ratio (observed 3x run-to-run on an unchanged arm), and
    the median is the bench retry discipline's estimator."""
    import statistics

    df.write.format("noop").mode("overwrite").save()  # warm
    times = []
    for _ in range(samples):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 3)


def _span_rows(df, span: int):
    from pyspark.sql import functions as F

    from flink_log_analysis_spark.operators.textstats import tokens

    toks = tokens(F.col("text"))
    base = df.select(
        "doc_id", toks.alias("_toks"), F.size(toks).alias("_n")
    ).filter(F.col("_n") > 0)
    n_spans = F.ceil(F.col("_n") / span).cast("int")
    return base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_spans - 1),
                lambda i: F.concat_ws(
                    " ", F.slice("_toks", i * span + 1, span)
                ),
            )
        ).alias("pos", "span_text"),
    )


def span_first_hashagg(df, span: int):
    """First-occurrence selection exactly as shipped (packed-key min
    HashAggregate — operators/quality.span_dedup), isolated from the
    rebuild stages so the two arms time the SAME surrounding work."""
    from pyspark.sql import functions as F

    from flink_log_analysis_spark.operators.quality import SPAN_POS_BITS

    return (
        _span_rows(df, span)
        .groupBy("span_text")
        .agg(
            F.min(
                F.shiftleft(F.col("doc_id"), SPAN_POS_BITS)
                + F.col("pos")
            ).alias("_packed")
        )
        .select(
            F.shiftright("_packed", SPAN_POS_BITS).alias("doc_id"),
            F.col("_packed")
            .bitwiseAND(F.lit((1 << SPAN_POS_BITS) - 1))
            .cast("int")
            .alias("pos"),
            "span_text",
        )
    )


def span_first_window(df, span: int):
    """The pre-r12 first-occurrence shape (row_number window) kept
    here ONLY as the probe's comparison arm."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(F.md5("span_text")).orderBy("doc_id", "pos")
    return (
        _span_rows(df, span)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "pos", "span_text")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/dedup_skew_probe")
    args = ap.parse_args()

    from flink_log_analysis_spark import get_spark
    from flink_log_analysis_spark.operators import quality, urls
    from flink_log_analysis_spark.session import release_checkpoints

    spark = get_spark("dedup-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {}
    try:
        # --- span axis ---
        uni = build_docs_replica(
            spark, args.base, f"{args.out}/docs_uni", False, args.reps
        )
        skw = build_docs_replica(
            spark, args.base, f"{args.out}/docs_skew", True, args.reps
        )
        n_rows = uni.count()
        for name, fn in (
            ("span_first_hashagg", lambda d: span_first_hashagg(
                d, quality.SPAN_TOKENS)),
            ("span_first_window", lambda d: span_first_window(
                d, quality.SPAN_TOKENS)),
        ):
            t_u, t_s = timed(fn(uni)), timed(fn(skw))
            release_checkpoints(spark)
            results[name] = {
                "uniform_sec": t_u,
                "skewed_sec": t_s,
                "skew_ratio": round(t_s / t_u, 2) if t_u > 0 else None,
            }
        # --- url / domain axes ---
        u_uni = build_url_frame(spark, n_rows, f"{args.out}/u_uni",
                                "uniform")
        u_hot = build_url_frame(spark, n_rows, f"{args.out}/u_hot",
                                "hot_url")
        p_uni = build_url_frame(spark, n_rows, f"{args.out}/p_uni",
                                "uniform_pages")
        d_hot = build_url_frame(spark, n_rows, f"{args.out}/d_hot",
                                "hot_domain")
        t_u = timed(urls.url_curation(u_uni))
        t_s = timed(urls.url_curation(u_hot))
        results["url_curation_window"] = {
            "uniform_sec": t_u,
            "skewed_sec": t_s,
            "skew_ratio": round(t_s / t_u, 2) if t_u > 0 else None,
        }
        t_u = timed(urls.domain_quota(urls.url_curation(p_uni)))
        t_s = timed(urls.domain_quota(urls.url_curation(d_hot)))
        results["domain_quota_window"] = {
            "uniform_sec": t_u,
            "skewed_sec": t_s,
            "skew_ratio": round(t_s / t_u, 2) if t_u > 0 else None,
        }
        # the survivors-only mitigation: salted two-pass top-cap —
        # every window group bounded regardless of key distribution
        t_u = timed(urls.domain_quota_survivors(urls.url_curation(p_uni)))
        t_s = timed(urls.domain_quota_survivors(urls.url_curation(d_hot)))
        results["domain_quota_survivors_salted"] = {
            "uniform_sec": t_u,
            "skewed_sec": t_s,
            "skew_ratio": round(t_s / t_u, 2) if t_u > 0 else None,
        }
        print(
            json.dumps(
                {
                    "metric": "dedup_family_skew_probe",
                    "reps": args.reps,
                    "rows": n_rows,
                    "skew_frac": 0.5,
                    "results": results,
                }
            )
        )
    finally:
        shutil.rmtree(args.out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
