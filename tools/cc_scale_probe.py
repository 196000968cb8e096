"""Measure the two-phase CC round count against graph diameter.

The claim `operators/graph.py` makes — round count is O(log^2 n) on
ANY topology, independent of diameter — is what justified replacing
hash-min label propagation (rounds = diameter). This probe measures
it on the hostile shape: PATH graphs (diameter = n-1) at doubling
sizes, forced down the distributed path, reporting converged rounds
and wall-clock per size. Pass signal: rounds grow ~logarithmically
(single digits into the tens of thousands of vertices) while hash-min
would need n-1 rounds and error out at max_iter long before.

A dense star graph is probed as the contrast case (converges in 1-2
rounds under either algorithm).

Writes nothing under the repo. Usage:

    python tools/cc_scale_probe.py [--sizes 500,2000,8000,32000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_log_analysis_spark import get_spark  # noqa: E402
from flink_log_analysis_spark.operators.graph import (  # noqa: E402
    connected_components,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="500,2000,8000,32000")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    spark = get_spark("cc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "cc_two_phase_rounds_probe", "paths": {}}
    for n in sizes:
        edges = spark.range(n - 1).select(
            F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
        )
        stats: dict = {}
        t0 = time.perf_counter()
        labels = connected_components(
            edges, local_threshold=0, max_iter=40, stats=stats
        )
        ok = (
            labels.filter(F.col("component") != 0).count() == 0
            and labels.count() == n
        )
        out["paths"][str(n)] = {
            "diameter": n - 1,
            "rounds": stats.get("rounds"),
            "wall_s": round(time.perf_counter() - t0, 2),
            "correct": bool(ok),
        }
    # contrast case: a star (diameter 2) at the largest size
    n = sizes[-1]
    edges = spark.range(n - 1).select(
        F.lit(0).alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    stats = {}
    t0 = time.perf_counter()
    labels = connected_components(
        edges, local_threshold=0, max_iter=40, stats=stats
    )
    ok = labels.filter(F.col("component") != 0).count() == 0
    out["star"] = {
        "n": n,
        "rounds": stats.get("rounds"),
        "wall_s": round(time.perf_counter() - t0, 2),
        "correct": bool(ok),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
