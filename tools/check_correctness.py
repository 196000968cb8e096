#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` and compares it
against the matching ``oracle_sql()`` in DuckDB: row count, schema
(column names, sorted), and an order-insensitive value hash (rows
stringified with rounded floats, sorted). Usage:

    python tools/check_correctness.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from flink_log_analysis_spark import get_spark

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)
    failures = 0
    for name in names:
        t0 = time.time()
        sdf = qs[name](spark, args.sf)
        srows = sdf.collect()
        scols = sdf.columns
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name:28s} rows={len(srows):7d}  (no oracle: rows-only check)"
                  f"  [{t_spark:.1f}s]")
            continue
        rel = con.sql(oracles[name])
        orows = rel.fetchall()
        ocols = rel.columns
        ok_cnt = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        sh = value_hash([tuple(r) for r in srows], scols)
        oh = value_hash(orows, ocols)
        ok_hash = sh == oh
        status = "OK " if (ok_cnt and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name:28s} {status} rows={len(srows)}/{len(orows)} "
            f"schema={'=' if ok_schema else f'{sorted(scols)} vs {sorted(ocols)}'} "
            f"hash={'=' if ok_hash else f'{sh} vs {oh}'}  [{t_spark:.1f}s]"
        )
        if status == "FAIL" and len(srows) <= 20 and len(orows) <= 20:
            print("  spark :", sorted(tuple(r) for r in srows)[:12])
            print("  oracle:", sorted(orows)[:12])
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
