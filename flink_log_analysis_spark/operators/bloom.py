"""Distributed Bloom filter as a broadcastable (word, bits) table —
semi-join reduction for decontamination/membership at 100 TB.

The exact-overlap decontamination join (operators/quality.py
benchmark_contamination) broadcasts the benchmark's distinct shingles.
That is right while eval sets are thousands of documents; a standing
exclusion list of EVERY benchmark suite's n-grams reaches 10^8+ keys
(gigabytes raw) and stops broadcasting. The classic fix is a Bloom
filter: m bits, k hashes, NO false negatives — so it can PRUNE the
corpus side before the exact join without changing the result, while
its size is a CONFIG constant (m/64 longs) independent of how many
keys went in. Spark uses the same idea internally for runtime
row-group filtering; this module states it as a first-class,
engine-portable operator:

- **Build** is one explode + hash-aggregation: every key sets k bit
  positions (the repo-wide md5 bucket under k salts, so a DuckDB
  oracle could replay even the bitmap); positions group into 64-bit
  words and OR together map-side — the filter arrives as at most
  ``m/64`` rows regardless of key count, broadcastable BY
  CONSTRUCTION (the DSIR-table property, transplanted to membership).
- **Probe** is k broadcast hash joins against that table plus a bit
  test — map-side work only; rows failing any bit are discarded
  before the exact membership join ever shuffles.
- **The logical result is untouched.** Bloom passes every true
  member (no false negatives); false positives only ride into the
  exact join and are eliminated there — the salted-twin framing: a
  physical rewrite whose whole contract is bit-identical results,
  which is why the contract row's oracle is the PLAIN exact-join SQL
  and never sees the filter.

Sizing: false-positive rate ~ (1 - e^(-k·n/m))^k; the defaults
(m = 2^17 bits, k = 2) hold FP under ~1% up to ~25k keys and degrade
gracefully (more candidates, never wrong results). Callers that know
the key count should size through :func:`sized_m_bits` — at the
motivating 10^8-key exclusion list the default m saturates (FP ~ 1,
the prefilter prunes nothing) while the sized filter stays at the
target rate for ~240 MB of broadcast (ADVICE r13).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M_BITS = 1 << 17
K_HASHES = 2


def sized_m_bits(
    n_keys: int, k: int = K_HASHES, target_fp: float = 0.01
) -> int:
    """Smallest power-of-two bit count keeping the FP rate under
    ``target_fp`` for ``n_keys`` keys with ``k`` hashes, floored at
    :data:`M_BITS`. From FP = (1 - e^(-k n/m))^k: m >= k·n /
    -ln(1 - fp^(1/k)) — ~19n bits at k=2, fp=1%. Power-of-two keeps
    the growth schedule deterministic; the table is m/64 longs
    however many keys went in, so the broadcast cost is the caller's
    explicit, computed choice rather than a silent saturation."""
    import math

    if n_keys <= 0:
        return M_BITS
    need = k * n_keys / -math.log1p(-(target_fp ** (1.0 / k)))
    m = M_BITS
    while m < need and m < (1 << POSITION_BITS):
        m <<= 1
    return m


# Positions draw from 52 bits of the salted md5 (13 hex chars), NOT
# the repo's 32-bit token_hash: a sized filter for >= ~2.3e8 keys
# needs m > 2^32, and a 32-bit position source would silently saturate
# the effective m at 2^32 regardless of what sized_m_bits computed —
# the exact silent-saturation failure the sizing exists to remove
# (r14 review). 52 bits keeps the value double-exact and covers any
# practical filter (2^52 bits = 512 TiB).
POSITION_BITS = 52


def _position(key: Column, j: int, m_bits: int) -> Column:
    """Bit position of hash j for a key (salted 52-bit md5 bucket)."""
    salted = F.concat(F.lit(f"bloom{j}|"), key)
    wide = F.conv(F.substring(F.md5(salted), 1, 13), 16, 10).cast(
        "bigint"
    )
    return wide % m_bits


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = M_BITS,
    k: int = K_HASHES,
) -> DataFrame:
    """(word bigint, bits bigint) Bloom table from a key frame —
    at most ``m_bits/64`` rows whatever the key count."""
    pos = keys.select(
        F.explode(
            F.array(
                *[_position(F.col(key_col), j, m_bits) for j in range(k)]
            )
        ).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / 64).cast("bigint").alias("word"),
            # python F.shiftleft takes only a literal shift count;
            # the SQL function accepts a column
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = M_BITS,
    k: int = K_HASHES,
) -> DataFrame:
    """Rows of ``df`` whose key passes all k bit tests (true members
    always pass; non-members pass only at the FP rate). k broadcast
    joins against the <= m/64-row table, then a map-side bit test."""
    out = df
    for j in range(k):
        pos = _position(F.col(key_col), j, m_bits)
        b = bloom.select(
            F.col("word").alias(f"_w{j}"), F.col("bits").alias(f"_b{j}")
        )
        out = (
            out.withColumn(f"_p{j}", pos)
            .withColumn(f"_w{j}", (F.col(f"_p{j}") / 64).cast("bigint"))
            .withColumn(
                f"_m{j}",
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT),"
                    f" CAST(_p{j} % 64 AS INT))"
                ),
            )
            .join(F.broadcast(b), f"_w{j}", "left")
            .filter(
                F.col(f"_b{j}").isNotNull()
                & (F.col(f"_b{j}").bitwiseAND(F.col(f"_m{j}")) != 0)
            )
            .drop(f"_p{j}", f"_w{j}", f"_m{j}", f"_b{j}")
        )
    return out
