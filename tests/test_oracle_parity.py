"""Oracle-parity tests: every queries() entry with an oracle must
hash-match DuckDB at sf0.001 (the driver does the same at sf0.01),
under the driver's observed canon (pandas conversion + str cells —
see tools/check_correctness.py)."""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_correctness import TABLES, value_hash


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


ORACLES = entrymod.oracle_sql()
ALL_QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_matches_oracle(spark, sf_dir, con, name):
    sdf = ALL_QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        assert len(sdf.collect()) >= 0  # rows-only (non-SQL-expressible op)
        return
    spdf = sdf.toPandas()
    opdf = con.sql(ORACLES[name]).df()
    assert len(spdf) == len(opdf), f"row count {len(spdf)} != {len(opdf)}"
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert value_hash(spdf) == value_hash(opdf)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["section_id", "name", "section_pv"]
