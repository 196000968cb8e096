"""Regenerate ``operators/unigram.py``'s frozen scored vocabulary.

Runs the deterministic fit (top-10k words by count desc / word asc;
substring seed; 4 EM rounds with the halfway prune to all chars with
count >= 40 plus the top-48 multi-char pieces by expected count) on
the sf0.01 documents table and prints the ``UNIGRAM_VOCAB_V1`` literal
to paste into ``flink_log_analysis_spark/operators/unigram.py``.

Usage: ``python tools/freeze_unigram.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_log_analysis_spark import get_spark  # noqa: E402
from flink_log_analysis_spark.operators import unigram  # noqa: E402
from flink_log_analysis_spark.session import read_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("freeze-ug", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        vocab = unigram.fit_unigram(
            read_table(spark, sf_dir, "documents"),
            lmax=6,
            seed_size=120,
            n_multi=48,
            em_rounds=4,
            sample_pieces=10_000,
            min_char_count=40,
        )
    finally:
        spark.stop()
    print(f"# pieces: {len(vocab)}")
    print("UNIGRAM_VOCAB_V1: list[tuple[str, float]] = [")
    for p, lp in vocab:
        print(f"    ({p!r}, {lp!r}),")
    print("]")


if __name__ == "__main__":
    main()
