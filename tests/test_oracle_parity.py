"""Oracle-parity tests: every queries() entry with an oracle must
hash-match DuckDB at sf0.001 (the driver does the same at sf0.01)."""

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
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        assert len(srows) >= 0  # rows-only check (non-SQL-expressible op)
        return
    rel = con.sql(ORACLES[name])
    orows = rel.fetchall()
    assert len(srows) == len(orows), f"row count {len(srows)} != {len(orows)}"
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert value_hash(srows, sdf.columns) == value_hash(orows, rel.columns)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["section_id", "name", "section_pv"]
