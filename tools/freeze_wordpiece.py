"""Regenerate ``operators/wordpiece.py``'s frozen vocabulary.

Runs the deterministic likelihood-scored fit (top-10k words by count
desc / word asc, 32 merges, integer cross-multiplied score compare)
on the sf0.01 documents table, truncates single-char symbols below
min_char_count=40 (the published rare-char truncation — what makes
[UNK] reachable under the frozen contract), and prints the
``WORDPIECE_VOCAB_V1`` literal to paste into
``flink_log_analysis_spark/operators/wordpiece.py``.

Usage: ``python tools/freeze_wordpiece.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_log_analysis_spark import get_spark  # noqa: E402
from flink_log_analysis_spark.operators import wordpiece  # noqa: E402
from flink_log_analysis_spark.session import read_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("freeze-wp", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        merges, vocab = wordpiece.fit_wordpiece(
            read_table(spark, sf_dir, "documents"),
            n_merges=32,
            sample_pieces=10_000,
            min_char_count=40,
        )
    finally:
        spark.stop()
    print(f"# merges learned: {len(merges)}")
    print("WORDPIECE_VOCAB_V1: list[str] = [")
    for p in vocab:
        print(f"    {p!r},")
    print("]")


if __name__ == "__main__":
    main()


