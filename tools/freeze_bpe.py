"""Regenerate ``operators/bpe.py``'s frozen BPE merge table.

Runs the deterministic fit (top-10k pieces by count desc / piece asc,
48 merges, classic pair-count loop with the documented tie-break) on
the sf0.01 documents table and prints the ``BPE_MERGES_V1`` literal to
paste into ``flink_log_analysis_spark/operators/bpe.py``.

Usage: ``python tools/freeze_bpe.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_log_analysis_spark import get_spark  # noqa: E402
from flink_log_analysis_spark.operators import bpe  # noqa: E402
from flink_log_analysis_spark.session import read_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("freeze-bpe", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        merges = bpe.fit_bpe(
            read_table(spark, sf_dir, "documents"),
            n_merges=48,
            sample_pieces=10_000,
        )
    finally:
        spark.stop()
    print("BPE_MERGES_V1: list[tuple[str, str]] = [")
    for a, b in merges:
        print(f"    ({a!r}, {b!r}),")
    print("]")


if __name__ == "__main__":
    main()
