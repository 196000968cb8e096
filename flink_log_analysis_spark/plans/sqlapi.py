"""Literal Spark-SQL entry points (the ``spark.sql`` surface).

The reference drives everything through SQL strings
(``tEnv.executeSql``, LogAnalysis.java:86-90); this module proves the
engine exposes the same interaction style: tables registered as temp
views, queries written as plain SQL, executed by Catalyst. The SQL
here is deliberately dialect-neutral — the *same string* runs in
DuckDB as its own oracle, so the check certifies Spark's SQL parser/
optimizer path end-to-end, not just the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import load_tables

SQL = {
    # The reference's Q1 shape in pure SQL (lookup join + group count
    # + ranked top-10), on the declared.py role mapping.
    "sql_hot_section": """
        SELECT section_id, name, section_pv FROM (
            SELECT TRY_CAST(regexp_extract(e.props, '"k": ([0-9]+)', 1) AS INTEGER) % 25
                       AS section_id,
                   n.n_name AS name,
                   COUNT(*) AS section_pv
            FROM events e
            JOIN nation n
              ON TRY_CAST(regexp_extract(e.props, '"k": ([0-9]+)', 1) AS INTEGER) % 25
                 = n.n_nationkey
            WHERE e.event_type IN ('view', 'click')
              AND TRY_CAST(regexp_extract(e.props, '"k": ([0-9]+)', 1) AS INTEGER) % 25
                  <> 0
            GROUP BY 1, 2
        ) ranked
        ORDER BY section_pv DESC, section_id ASC LIMIT 10
    """,
    "sql_order_value_buckets": """
        SELECT o_orderstatus,
               CAST(SUM(CASE WHEN o_totalprice < 50000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS small_orders,
               CAST(SUM(CASE WHEN o_totalprice >= 50000
                              AND o_totalprice < 200000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS mid_orders,
               CAST(SUM(CASE WHEN o_totalprice >= 200000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS large_orders,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_orderstatus
    """,
    "sql_supplier_balance_rank": """
        SELECT s_suppkey, s_name, n_name AS nation,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY n_name
                   ORDER BY s_acctbal DESC, s_suppkey ASC) AS INTEGER) AS rnk
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        QUALIFY rnk <= 3
    """,
}

# Spark has no QUALIFY; rewrite that one for Spark while DuckDB keeps
# the original — the one deliberate dialect divergence, documented.
SPARK_SQL = dict(SQL)
SPARK_SQL["sql_supplier_balance_rank"] = """
    SELECT s_suppkey, s_name, nation, rnk FROM (
        SELECT s_suppkey, s_name, n_name AS nation,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY n_name
                   ORDER BY s_acctbal DESC, s_suppkey ASC) AS INTEGER) AS rnk
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
    ) WHERE rnk <= 3
"""


def _run_sql(name: str):
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_tables(spark, sf_dir, register_views=True)
        return spark.sql(SPARK_SQL[name])

    runner.__name__ = name
    return runner


QUERIES = {name: _run_sql(name) for name in SQL}
ORACLE = dict(SQL)
