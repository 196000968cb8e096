"""Skew-mitigation utilities: salted joins and salted aggregation.

AQE's skew-join splitting (enabled session-wide in session.py) covers
most hot-key cases at runtime; these operators are the *explicit*
tools for the pathological ones a 100 TB pipeline hits — a join key
where one value holds 10% of the fact table, which no post-hoc split
of a single already-built hash partition can fix as cheaply.

- :func:`salted_join`: fact side gets a deterministic salt in
  [0, n_salts); the (smaller, but not broadcastable) dim side is
  replicated n_salts times; the join key becomes (key, salt), fanning
  each hot key across n_salts reducers. Cost: dim side x n_salts —
  use only when dim is too big to broadcast but far smaller than the
  fact side.
- :func:`salted_count`: two-phase aggregation — count by (key, salt)
  (spreads a hot group across reducers), then sum by key. Spark's
  partial aggregation already does this *per input partition*; the
  explicit salt handles the case where a single *shuffle* partition
  would still receive one giant group.

Both are pure DataFrame transforms — deterministic salts (pmod of a
row hash), no RNG state, so results stay oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, cols: list[str] | None = None) -> DataFrame:
    """Deterministic salt column in [0, n_salts) from a row hash."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn("_salt", F.pmod(F.hash(*basis), F.lit(n_salts)))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted and the dim side replicated.

    Output columns = fact columns + dim columns (minus the helper
    salt columns). Semantics identical to
    ``fact.join(dim, fact[fact_key] == dim[dim_key], how)`` for the
    fact-preserving join types. Right/full outer are rejected: an
    unmatched dim row would surface once per salt replica (n_salts
    null-extended copies) — salt the other side instead.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "cross",
               "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join supports fact-preserving joins only, not {how!r}; "
            "for right/full outer, salt the other side"
        )
    f = with_salt(fact, n_salts)
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = f.join(d, (f[fact_key] == d[dim_key]) & (f["_salt"] == d["_salt"]), how)
    return joined.drop("_salt")


def salted_count(
    df: DataFrame, key_cols: list[str], n_salts: int = 8
) -> DataFrame:
    """Two-phase count: (key, salt) partial counts -> per-key total.

    Equivalent to ``df.groupBy(key).count()`` with hot keys spread
    over ``n_salts`` reducers in the first shuffle.
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias("cnt"))
