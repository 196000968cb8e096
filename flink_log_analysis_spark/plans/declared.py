"""The reference's three declared queries, mapped onto driver testdata.

Reference query surface (SURVEY §2.B; ``LogAnalysis.java:117-131,
173-187, 242-258``): filter -> lookup-join to a small dim -> unbounded
group count -> (top-10 for Q1/Q2) -> keyed upsert. Our batch twins run
over the driver's synthetic star schema with the FIXTURES.md §6 role
mapping:

- fact ``events``  plays the parsed ``logs`` stream
  (``section_id`` = the payload key ``k`` from ``props`` modulo 25,
  extracted with the same regex-parse idiom as the log pipeline;
  ``article_id`` = ``user_id``; ``client_ip`` = ``'u' || user_id``)
- dims ``nation`` / ``customer`` play ``pre_forum_forum`` /
  ``pre_forum_post``

Scale notes (100 TB posture):
- dims are broadcast (`F.broadcast`) — the reference's MySQL lookup
  join is a point-lookup against a tiny table; broadcast-hash is the
  cluster-correct physical strategy, no shuffle of the fact side;
- the group-count is a partial (map-side) + final hash aggregate on the
  group key — the only shuffle in the plan, on a low-cardinality key;
- top-10 is a per-partition TakeOrdered then a driver-side merge of
  10-row heaps (Spark's TakeOrderedAndProject), not a global sort.

``statistic_time`` (wall-clock in the reference, SURVEY §2.E.4) is
injectable via ``clock`` and excluded from the oracle-checked outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import read_table

K_REGEX = r'"k": (\d+)'
N_SECTIONS = 25  # payload key folded onto nation's 25 keys


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "events")


def _section_id(props=None):
    if props is None:
        props = F.col("props")
    return (F.regexp_extract(props, K_REGEX, 1).try_cast("int") % N_SECTIONS).alias(
        "section_id"
    )


def _with_stat_time(df: DataFrame, clock: str | None) -> DataFrame:
    """Append the reference's statistic_time column when a pinned clock
    is supplied (prod uses from_unixtime(unix_timestamp()))."""
    if clock is None:
        return df
    return df.withColumn("statistic_time", F.lit(clock))


def hot_section(
    spark: SparkSession,
    sf_dir: str,
    clock: str | None = None,
    nation: DataFrame | None = None,
) -> DataFrame:
    """Q1 ``hot_section``: section pv top-10.

    Shape parity with ``LogAnalysis.java:242-258``: WHERE key <> 0,
    inner join dim, GROUP BY key+name, count(1), ORDER BY pv DESC
    LIMIT 10 (tie-break section_id ASC for determinism).

    ``nation`` optionally injects the dimension snapshot (any source:
    the parquet default, ``io.read_jdbc_dim``'s JDBC or DB-API path, a
    ``DimCache.get()``) — the B1 evidence test drives this query with
    the dim read from stdlib sqlite3 and asserts the identical result.
    """
    ev = _events(spark, sf_dir)
    if nation is None:
        nation = read_table(spark, sf_dir, "nation")
    hits = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .select(_section_id())
        .filter(F.col("section_id") != 0)
    )
    agg = (
        hits.join(F.broadcast(nation), hits.section_id == nation.n_nationkey, "inner")
        .groupBy("section_id", F.col("n_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("section_pv"))
    )
    top = agg.orderBy(F.desc("section_pv"), F.asc("section_id")).limit(10)
    return _with_stat_time(top, clock)


def hot_article(spark: SparkSession, sf_dir: str, clock: str | None = None) -> DataFrame:
    """Q2 ``hot_article``: article pv top-10 (dim = customer)."""
    ev = _events(spark, sf_dir)
    customer = read_table(spark, sf_dir, "customer")
    hits = (
        ev.select(F.col("user_id").alias("article_id"))
        .filter(F.col("article_id") != 0)
    )
    agg = (
        hits.join(F.broadcast(customer), hits.article_id == customer.c_custkey, "inner")
        .groupBy("article_id", F.col("c_name").alias("subject"))
        .agg(F.count(F.lit(1)).alias("article_pv"))
    )
    top = agg.orderBy(F.desc("article_pv"), F.asc("article_id")).limit(10)
    return _with_stat_time(top, clock)


def client_ip_access(
    spark: SparkSession, sf_dir: str, clock: str | None = None
) -> DataFrame:
    """Q3 ``client_ip_access``: per-client hit count (no top-k).

    Reference filter: ``articleId <> 0 OR sectionId <> 0``
    (LogAnalysis.java:125-127).
    """
    ev = _events(spark, sf_dir)
    df = (
        ev.select(
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("client_ip"),
            F.col("user_id"),
            _section_id(),
        )
        .filter((F.col("user_id") != 0) | (F.col("section_id") != 0))
        .groupBy("client_ip")
        .agg(F.count(F.lit(1)).alias("client_access_cnt"))
    )
    return _with_stat_time(df, clock)


# DuckDB-SQL twin of _section_id over an events alias `e` — shared by
# the logpipe/streamed oracles so the derivation exists exactly once.
# TRY_CAST, not CAST: a props blob without a "k" key extracts '' and
# plain CAST('' AS INTEGER) aborts the whole oracle in DuckDB, while
# the Spark side degrades to NULL via try_cast — the oracle must make
# the same data-contract assumption as the engine.
SECTION_ID_SQL = (
    f"(TRY_CAST(regexp_extract(e.props, '{K_REGEX}', 1) AS INTEGER)"
    f" % {N_SECTIONS})"
)
_SID = SECTION_ID_SQL

ORACLE: dict[str, str] = {
    "hot_section": f"""
        SELECT section_id, name, section_pv FROM (
            SELECT {_SID} AS section_id, n.n_name AS name,
                   COUNT(*) AS section_pv
            FROM events e
            JOIN nation n ON {_SID} = n.n_nationkey
            WHERE e.event_type IN ('view', 'click') AND {_SID} <> 0
            GROUP BY 1, 2
        ) ORDER BY section_pv DESC, section_id ASC LIMIT 10
    """,
    "hot_article": """
        SELECT article_id, subject, article_pv FROM (
            SELECT e.user_id AS article_id, c.c_name AS subject,
                   COUNT(*) AS article_pv
            FROM events e
            JOIN customer c ON e.user_id = c.c_custkey
            WHERE e.user_id <> 0
            GROUP BY 1, 2
        ) ORDER BY article_pv DESC, article_id ASC LIMIT 10
    """,
    "client_ip_access": f"""
        SELECT 'u' || CAST(e.user_id AS VARCHAR) AS client_ip,
               COUNT(*) AS client_access_cnt
        FROM events e
        WHERE e.user_id <> 0 OR {_SID} <> 0
        GROUP BY 1
    """,
}

QUERIES = {
    "hot_section": hot_section,
    "hot_article": hot_article,
    "client_ip_access": client_ip_access,
}
