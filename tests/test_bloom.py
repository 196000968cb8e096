"""Behavioral tests for the distributed Bloom filter
(operators/bloom.py): the no-false-negative guarantee (the property
that makes the decontam prefilter a pure physical rewrite), real
pruning on non-members, and the fixed-size table bound.
"""

from pyspark.sql import functions as F

from flink_log_analysis_spark.operators import bloom


def _keys(spark, prefix, n):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("key")
    )


def test_no_false_negatives_and_pruning(spark):
    members = _keys(spark, "in", 500)
    filt = bloom.bloom_build(members, "key")
    # every true member passes
    passed = bloom.bloom_might_contain(members, "key", filt).count()
    assert passed == 500
    # non-members overwhelmingly pruned (FP rate ~(kn/m)^k ~ 1e-4 at
    # these sizes; allow generous slack)
    others = _keys(spark, "out", 2000)
    fp = bloom.bloom_might_contain(others, "key", filt).count()
    assert fp < 50, fp


def test_table_size_is_config_bounded(spark):
    # 50k keys -> the table still holds at most m/64 rows
    big = _keys(spark, "k", 50_000)
    filt = bloom.bloom_build(big, "key")
    assert filt.count() <= bloom.M_BITS // 64
    # words and masks are well-formed
    row = filt.agg(
        F.min("word"), F.max("word"), F.min(F.col("bits") == 0)
    ).first()
    assert row[0] >= 0 and row[1] < bloom.M_BITS // 64
    assert row[2] is False  # no empty words stored


def test_prefiltered_contamination_equals_plain(spark, sf_dir):
    from flink_log_analysis_spark.operators import quality
    from flink_log_analysis_spark.plans.llm_quality import BENCH_MOD
    from flink_log_analysis_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % BENCH_MOD == 0)
    plain = quality.benchmark_contamination(docs, bench).collect()
    pre = quality.benchmark_contamination(
        docs, bench, bloom_prefilter=True
    ).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, pre))
    assert len(plain) > 0  # discriminating, not trivially empty


def test_sized_m_bits_tracks_key_count():
    """ADVICE r13: the filter must be sized to the key count — the
    fixed default saturates past ~25k keys. Check the floor, the ~19n
    growth at k=2/1% FP, and that the sized filter actually holds the
    FP rate where the default would saturate."""
    import math

    assert bloom.sized_m_bits(0) == bloom.M_BITS
    assert bloom.sized_m_bits(1000) == bloom.M_BITS  # floor
    m8 = bloom.sized_m_bits(100_000_000)
    assert m8 >= 19 * 100_000_000 and (m8 & (m8 - 1)) == 0
    # predicted FP at the sized m stays under target; at the default
    # m it would be ~1 (saturated)
    k, n = bloom.K_HASHES, 100_000_000
    fp_sized = (1 - math.exp(-k * n / m8)) ** k
    fp_default = (1 - math.exp(-k * n / bloom.M_BITS)) ** k
    assert fp_sized <= 0.01 < 0.99 < fp_default


def test_contamination_sized_filter_equals_plain(spark):
    """The keys-derived sizing threads through benchmark_contamination
    without moving the result (no false negatives at any m)."""
    from flink_log_analysis_spark.operators import quality

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3} shared word here")
         for i in range(40)],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "tok5 tok6 tok7 tok8 shared word here")],
        "doc_id bigint, text string",
    )
    plain = quality.benchmark_contamination(docs, bench, n=3)
    sized = quality.benchmark_contamination(
        docs, bench, n=3, bloom_prefilter=True
    )
    tiny = quality.benchmark_contamination(
        docs, bench, n=3, bloom_prefilter=True, bloom_m_bits=64, bloom_k=1
    )
    p = sorted(map(tuple, plain.collect()))
    assert p == sorted(map(tuple, sized.collect()))
    # even a deliberately saturated 64-bit filter keeps exactness
    assert p == sorted(map(tuple, tiny.collect()))


def test_positions_exceed_32_bits(spark):
    """r14 review: sized filters past ~2.3e8 keys need m > 2^32, so
    positions must draw from more than 32 bits — membership must stay
    exact (no false negatives) at m = 2^34, and at least one set bit
    must land beyond the 2^32 word range (proving the width)."""
    members = _keys(spark, "wide", 300)
    m = 1 << 34
    filt = bloom.bloom_build(members, "key", m_bits=m)
    assert bloom.bloom_might_contain(
        members, "key", filt, m_bits=m
    ).count() == 300
    max_word = filt.agg(F.max("word")).first()[0]
    assert max_word is not None and max_word > (1 << 32) // 64
    # sizing clamps at the position width instead of outrunning it
    assert bloom.sized_m_bits(10**17) == 1 << bloom.POSITION_BITS
