#!/usr/bin/env python
"""Dump ``.explain("formatted")`` for named queries into plans/r<N>/.

Optimization-round evidence artifacts: the judge checks plan-shape
claims (Exchange counts, join strategies, PushedFilters, Python
stages) against these files without running Spark.

Usage:
    python tools/dump_plans.py --tag before [--sf DIR] [--round 16] name...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _explain(df) -> str:
    # Public API (ADVICE r16): df.explain prints to stdout; capture it
    # rather than reaching into PythonSQLUtils/df._jdf internals that
    # break across Spark versions.
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--tag", required=True, help="before|after")
    ap.add_argument("--round", default="16")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from flink_log_analysis_spark import get_spark
    from flink_log_analysis_spark.session import release_checkpoints

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        f"r{args.round}",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in args.names:
        df = qs[name](spark, args.sf)
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(_explain(df))
        release_checkpoints(spark)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
