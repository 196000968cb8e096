#!/usr/bin/env python
"""Pathological-document probe for the 3-gram LM scorer's per-doc
regroup (VERDICT r12 #6 — the dedup_skew_probe pattern on the
lmfilter axis).

The 3-gram scorer (operators/lmfilter.py score_perplexity_3gram)
explodes transitions and attaches model counts via broadcast hash
joins — a corpus where one TRIGRAM dominates concentrates nothing
(map-side, no keyed shuffle on the trigram). The one keyed stage is
the per-document regroup (groupBy(doc_id) + collect_list +
array_sort + fold), whose group size is the document's own transition
count — so the hostile distribution is a single DOCUMENT holding 50%
of the corpus's tokens: all of its transitions serialize into one
task's group build.

Equal-work discipline (the r11/r12 probe rules): both arms carry the
IDENTICAL global token stream (token at global position p is a pure
function of p), so tokenize/explode/join volumes are byte-comparable
and the arms differ ONLY in how the stream is cut into documents —
uniform: T/L docs of L tokens; skewed: document 0 holds T/2 tokens,
the rest L each. The same reference slice (drawn from the uniform
cut) fits ONE model consumed by both arms. Median-of-3 timed passes
after a warm pass.

The reported number is skewed/uniform wall-clock: ~1.0 means the
hash-agg machinery absorbs the hot group; >> 1 is the single-task
bound a 100 TB deployment must know. r14 adds the CONTRACTED kill
(score_perplexity_3gram_chunked, VERDICT r13 item 4): chunk first, so
the regroup group is the window, not the document — measured at 2M
tokens: whole-doc hostile ratio 15.4x vs chunked 3.98x (uniform arm
unchanged, 1.09 s vs 1.13 s). The residual ~4x is the OTHER half of
the trap: the giant document is ONE physical row, so its tokenize +
explode cannot leave its task — that half only splits upstream, at
ingest (pre-split monster rows before they ever become one row).

Writes nothing under the repo; replica parquet goes to --out. Usage:

    python tools/lm_skew_probe.py [--tokens 2000000] [--doc-len 100]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = 997  # prime; trigram table stays reference-bounded


def build_corpus(spark, out: str, n_tokens: int, doc_len: int, skew: bool):
    """One shared token stream cut into documents two ways. Token at
    global position p = 'w' + ((p*7919 + 17) % VOCAB) — identical
    content both arms; only doc boundaries move."""
    from pyspark.sql import functions as F

    if skew:
        # doc 0: positions [0, T/2); the rest: doc_len each
        half = n_tokens // 2
        rest = (n_tokens - half) // doc_len
        bounds = [(0, 0, half)] + [
            (i + 1, half + i * doc_len, doc_len) for i in range(rest)
        ]
    else:
        bounds = [
            (i, i * doc_len, doc_len) for i in range(n_tokens // doc_len)
        ]
    df = spark.createDataFrame(
        bounds, "doc_id bigint, start bigint, n int"
    ).repartition(32)
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.col("start"), F.col("start") + F.col("n") - 1),
            lambda p: F.concat(
                F.lit("w"), ((p * 7919 + 17) % VOCAB).cast("string")
            ),
        ),
    )
    shutil.rmtree(out, ignore_errors=True)
    df.select("doc_id", text.alias("text")).write.parquet(out)
    return spark.read.parquet(out)


def timed(df, samples: int = 3) -> float:
    import statistics

    df.write.format("noop").mode("overwrite").save()  # warm
    times = []
    for _ in range(samples):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=2_000_000)
    ap.add_argument("--doc-len", type=int, default=100)
    ap.add_argument("--out", default="/tmp/lm_skew_probe")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from flink_log_analysis_spark import get_spark
    from flink_log_analysis_spark.operators import lmfilter

    spark = get_spark("lm-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        uni = build_corpus(
            spark, f"{args.out}/uni", args.tokens, args.doc_len, False
        )
        skw = build_corpus(
            spark, f"{args.out}/skew", args.tokens, args.doc_len, True
        )
        # ONE model for both arms (identical token content): fit on
        # the uniform cut's doc_id % 10 slice, distributed frames
        ref = uni.filter(F.col("doc_id") % 10 == 0)
        u, b, t, v, n = lmfilter.fit_trigram_frames(ref)
        results = {}
        for name, frame in (("uniform", uni), ("skewed_halfdoc", skw)):
            results[name] = timed(
                lmfilter.score_perplexity_3gram(
                    frame, u, b, t, v, n, threshold=99.0
                )
            )
            # r14 (VERDICT r13 item 4): the chunked scorer caps the
            # regroup group at the window, so the half-corpus doc's
            # fold parallelizes — the hostile ratio should flatten.
            results[name + "_chunked"] = timed(
                lmfilter.score_perplexity_3gram_chunked(
                    frame, u, b, t, v, n, threshold=99.0
                )
            )
        ratio = (
            round(results["skewed_halfdoc"] / results["uniform"], 2)
            if results["uniform"] > 0
            else None
        )
        ratio_chunked = (
            round(
                results["skewed_halfdoc_chunked"]
                / results["uniform_chunked"],
                2,
            )
            if results["uniform_chunked"] > 0
            else None
        )
        print(
            json.dumps(
                {
                    "metric": "lm_scorer_skew_probe",
                    "tokens": args.tokens,
                    "doc_len": args.doc_len,
                    "vocab": VOCAB,
                    "skew_frac": 0.5,
                    "uniform_sec": results["uniform"],
                    "skewed_sec": results["skewed_halfdoc"],
                    "skew_ratio": ratio,
                    "uniform_chunked_sec": results["uniform_chunked"],
                    "skewed_chunked_sec": results[
                        "skewed_halfdoc_chunked"
                    ],
                    "skew_ratio_chunked": ratio_chunked,
                }
            )
        )
    finally:
        shutil.rmtree(args.out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
