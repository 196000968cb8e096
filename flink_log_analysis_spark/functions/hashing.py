"""Deterministic, engine-portable hashing primitives.

All dedup/sketch operators hash tokens with md5 (not Spark's xxhash64 /
murmur) because md5 is byte-identical in every engine — the DuckDB
oracle re-derives the exact same MinHash/SimHash values, so even our
probabilistic operators are hash-comparable, not just "plausible".

Hash value = first 8 hex chars of md5 -> unsigned 32-bit int carried in
a BIGINT (never negative, safe to min/compare across engines).

DuckDB twin of :func:`token_hash`:
    ('0x' || substr(md5('<salt>|' || tok), 1, 8))::BIGINT
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def token_hash(col: Column, salt: int | str = 0) -> Column:
    """Salted 32-bit token hash as BIGINT (see module doc for twin)."""
    salted = F.concat(F.lit(f"{salt}|"), col)
    return F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("bigint")


def token_hash_sql(expr: str, salt: int | str = 0) -> str:
    """The DuckDB-SQL twin of :func:`token_hash` (used by oracles)."""
    return f"('0x' || substr(md5('{salt}|' || {expr}), 1, 8))::BIGINT"


def normalized_text(col: Column) -> Column:
    """Canonical text form for exact-dup hashing: lowercase, trimmed,
    whitespace collapsed. DuckDB twin:
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def content_fingerprint(col: Column) -> Column:
    """md5 fingerprint of the normalized text (exact-dup key).

    At 100 TB, group-by on a 16-byte digest instead of the full text
    keeps the dedup shuffle narrow (shuffle bytes ~ rows x 16B, not
    rows x doc-length)."""
    return F.md5(normalized_text(col))
