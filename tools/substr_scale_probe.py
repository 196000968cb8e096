#!/usr/bin/env python
"""Measured scale evidence for exact substring dedup (VERDICT r14
item 6): the window explode emits one ~40-byte md5 key per corpus
token at EVERY window size N, so shuffle volume is N-independent —
but smaller N means more duplicate-window hits (more verdict-join
rows, fatter per-doc interval merges), and the probe measures where
that bites. Runs substring_dedup at the base SF and a --reps replica
for each N in --windows and reports the wall-clock curve; ~linear
growth per N (ratio ≈ reps on fixed cores, modulo constants) is the
pass signal.

Usage: python tools/substr_scale_probe.py [--reps 10]
           [--base /root/testdata/sf0.1] [--windows 10,25,50]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (the package)
sys.path.insert(0, _HERE)                   # sibling tools

from scale_probe import build_replica  # noqa: E402  (sibling tool)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/substr_probe_replica")
    ap.add_argument("--windows", default="10,25,50")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()
    windows = [int(w) for w in args.windows.split(",")]

    from flink_log_analysis_spark import get_spark
    from flink_log_analysis_spark.operators.quality import substring_dedup
    from flink_log_analysis_spark.session import (
        read_table,
        release_checkpoints,
    )

    spark = get_spark("substr-probe")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        build_replica(spark, args.base, args.out, args.reps)
        report: dict = {
            "metric": "substring_dedup_scale_probe",
            "reps": args.reps,
            "base": {},
            "scaled": {},
            "ratio": {},
        }
        for sf_dir, key in ((args.base, "base"), (args.out, "scaled")):
            docs = read_table(spark, sf_dir, "documents")
            for n in windows:
                # untimed warm pass (JIT/codegen), then MIN of two
                # timed passes: a ratio probe wants the steady-state
                # floor, and host-contention contamination is
                # one-sided (a loaded-host sample only ever reads
                # HIGH — the first cut of this probe recorded 54 s
                # for a query whose uncontended floor is 7 s)
                times = []
                for timed in (False, True, True):
                    t0 = time.perf_counter()
                    substring_dedup(docs, min_tokens=n).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    if timed:
                        times.append(time.perf_counter() - t0)
                    release_checkpoints(spark)
                report[key][f"N={n}"] = round(min(times), 3)
        for n in windows:
            k = f"N={n}"
            base = report["base"][k]
            report["ratio"][k] = (
                round(report["scaled"][k] / base, 2) if base > 0 else None
            )
        print(json.dumps(report))
    finally:
        spark.stop()
        if not args.keep:
            shutil.rmtree(args.out, ignore_errors=True)


if __name__ == "__main__":
    main()
