#!/usr/bin/env python
"""Pathological-key probe for the gap-session family (VERDICT r10 #5).

Gap sessionization is inherently per-key order-dependent: every hit of
a session key must be SORTED by time within one task (batch window) or
one state group (streaming), so the engine's generic salting tier
cannot compose with it. This probe measures what that bound costs when
the key distribution turns hostile: an events replica at ``--reps``
times sf0.1 where ONE client network (`10.0.42`) holds
``--skew-frac`` (default 50%) of all hits — the single-NAT worst case
the round-10 verdict flagged — against a same-size UNIFORM replica as
the control. The reported number is skewed/uniform wall-clock per
query: ~1.0 means the parallel machinery absorbs the skew (the hot
key's serial sort is not yet the critical path); >> 1 means the
single-task bound has become the operator's cost and the documented
mitigation (time-range two-pass: sessionize per key within coarse time
slices, then merge boundary sessions — an order-preserving split,
unlike salting) is the scale answer.

Writes nothing under the repo; replica parquet goes to --out. Usage:

    python tools/session_skew_probe.py [--reps 10] [--skew-frac 0.5]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ("log_sessions", "log_sessions_stream", "stateful_sessions")


def build_events_replica(
    spark, base: str, out: str, reps: int, skew_frac: float
) -> float:
    """events x reps with unique event_ids; ~``skew_frac`` of rows get
    user_id pinned so their /24 client_net collapses to ONE hot key
    (10.0.42). skew_frac=0 is the uniform control. The deterministic
    event_id-modulus split keeps the two replicas row-identical except
    for the key column under test. The modulus can only realize
    fractions of the form 1/n, so the REALIZED fraction is returned
    and reported beside the request (a --skew-frac 0.4 run actually
    measures 0.5 — r11 review)."""
    from pyspark.sql import functions as F

    from flink_log_analysis_spark.session import read_table

    df = read_table(spark, base, "events")
    max_id = df.agg(F.max("event_id")).first()[0]
    big = (
        df.withColumn(
            "_rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1)))
        )
        .withColumn(
            "event_id", F.col("event_id") + F.col("_rep") * (max_id + 1)
        )
        .drop("_rep")
    )
    realized = 0.0
    if skew_frac > 0:
        mod = max(1, round(1 / skew_frac))
        realized = 1.0 / mod
        big = big.withColumn(
            "user_id",
            F.when(F.col("event_id") % mod == 0, F.lit(42)).otherwise(
                F.col("user_id")
            ),
        )
    par = spark.sparkContext.defaultParallelism
    os.makedirs(out, exist_ok=True)
    big.repartition(par).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )
    return realized


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--skew-frac", type=float, default=0.5)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/session_skew_probe")
    args = ap.parse_args()

    from flink_log_analysis_spark import get_spark
    from tools.scale_probe import time_queries

    spark = get_spark("session-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    uniform, skewed = f"{args.out}/uniform", f"{args.out}/skewed"
    try:
        build_events_replica(spark, args.base, uniform, args.reps, 0.0)
        realized = build_events_replica(
            spark, args.base, skewed, args.reps, args.skew_frac
        )
        t_uni = time_queries(spark, uniform, QUERIES)
        t_skew = time_queries(spark, skewed, QUERIES)
        print(
            json.dumps(
                {
                    "metric": "session_family_skew_probe",
                    "reps": args.reps,
                    "skew_frac_requested": args.skew_frac,
                    "skew_frac_realized": realized,
                    "uniform_sec": t_uni,
                    "skewed_sec": t_skew,
                    "skew_ratio": {
                        k: (
                            round(t_skew[k] / t_uni[k], 2)
                            if t_uni[k] > 0
                            else None
                        )
                        for k in t_uni
                    },
                }
            )
        )
    finally:
        shutil.rmtree(args.out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
