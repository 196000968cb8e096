"""End-to-end log pipeline over driver testdata: format -> parse -> project.

The driver testdata has no raw Apache log lines, so this plan
*manufactures* them deterministically from ``events`` (pure column
expressions), then runs the real parser chain
(:mod:`flink_log_analysis_spark.logparse`, the engine's A2-A8 surface)
over the manufactured lines. The DuckDB oracle derives the expected
parse output *independently* (it never sees the parser) — so a hash
match certifies the full regex-parse -> status-filter -> date-normalize
-> id-extract -> sentinel pipeline against an independent
implementation, at every scale factor.

Line construction (mirrored exactly in the oracle SQL):
  ip     = '10.0.' || (event_id % 250) || '.' || (event_id % 199)
  time   = strftime(ts) as 'dd/MMM/yyyy:HH:mm:ss +0800'  (zone dropped
           by the parser — SURVEY §2.E.3)
  uri    = forumdisplay&fid=k%25 for views / viewthread&tid=user_id for
           clicks / plain page otherwise
  status = 500 for error events (parser's ==200 filter drops them),
           200 otherwise
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import logparse
from ..session import ensure_min_partitions, read_table
from .declared import K_REGEX, N_SECTIONS, SECTION_ID_SQL


def _log_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The 9-group parse regex downstream is CPU-bound per line; widen
    # the single-row-group local parquet so it runs on all cores.
    ev = ensure_min_partitions(read_table(spark, sf_dir, "events"))
    k = F.regexp_extract("props", K_REGEX, 1).try_cast("int")
    ip = F.concat(
        F.lit("10.0."),
        (F.col("event_id") % 250).cast("string"),
        F.lit("."),
        (F.col("event_id") % 199).cast("string"),
    )
    apache_time = F.concat(
        F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss"), F.lit(" +0800")
    )
    uri = (
        F.when(
            F.col("event_type") == "view",
            F.concat(
                F.lit("/forum.php?mod=forumdisplay&fid="),
                (k % N_SECTIONS).cast("string"),
            ),
        )
        .when(
            F.col("event_type") == "click",
            F.concat(
                F.lit("/forum.php?mod=viewthread&tid="),
                F.col("user_id").cast("string"),
                F.lit("&extra=page%3D1"),
            ),
        )
        .otherwise(F.lit("/index.php"))
    )
    status = F.when(F.col("event_type") == "error", F.lit("500")).otherwise(F.lit("200"))
    line = F.concat(
        ip,
        F.lit(" - - ["),
        apache_time,
        F.lit('] "GET '),
        uri,
        F.lit(' HTTP/1.1" '),
        status,
        F.lit(" "),
        (F.col("value") * 100).cast("long").cast("string"),
        F.lit(' "-" "Mozilla/5.0 (synthetic)"'),
    )
    return ev.select(line.alias("line"))


# Manufactured-lines directories shared per session: the two roundtrip
# queries and all four streamed queries consume the same deterministic
# input, so manufacture (parquet read + repartition + concat) runs once
# per sf_dir and everyone else does a plain wide text scan.
_LINES_CACHE: dict[str, str] = {}


def lines_dir(spark: SparkSession, sf_dir: str) -> str:
    path = _LINES_CACHE.get(sf_dir)
    if path is None:
        from ..session import shared_tmp_dir

        path = shared_tmp_dir("loganalysis_lines_")
        _log_lines(spark, sf_dir).write.mode("overwrite").text(f"{path}/lines")
        _LINES_CACHE[sf_dir] = path
    return path


def _roundtrip(spark: SparkSession, sf_dir: str, keep_non_200: bool) -> DataFrame:
    lines = spark.read.text(f"{lines_dir(spark, sf_dir)}/lines").withColumnRenamed(
        "value", "line"
    )
    parsed = logparse.parse_access_logs(lines, keep_non_200=keep_non_200)
    return parsed.select(
        F.col("clientIP").alias("client_ip"),
        F.col("accessDate").alias("access_date"),
        F.col("sectionId").alias("section_id"),
        F.col("articleId").alias("article_id"),
    )


def log_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manufactured lines through the REAL parser -> projected log view."""
    return _roundtrip(spark, sf_dir, keep_non_200=False)


def log_roundtrip_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's LITERAL (inverted) status filter — SURVEY §2.E.1.

    ``LogAnalysis.java:318`` keeps status != 200 despite the documented
    intent; the engine exposes that behavior behind ``keep_non_200``
    for byte-parity experiments, and this query oracle-checks it: only
    the error events (status 500 lines) survive."""
    return _roundtrip(spark, sf_dir, keep_non_200=True)


def log_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling windows over the PARSED pipeline's
    ``accessDate`` — the A6 timestamp finally drives windowing. The
    reference parses and carries this timestamp but never windows it
    (SURVEY §2.C: all its aggregation is unbounded over proctime);
    this ties the parse tier to the engine's windowing tier: per
    (hour, section) page views and distinct client IPs. The oracle is
    the same independent re-derivation from events the roundtrip
    queries use — it never runs the parser."""
    parsed = log_roundtrip(spark, sf_dir)
    ts = F.to_timestamp("access_date")
    return (
        parsed.groupBy(
            F.window(ts, "1 hour").alias("w"), F.col("section_id")
        )
        .agg(
            F.count(F.lit(1)).alias("pv"),
            F.countDistinct("client_ip").alias("n_client_ips"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "section_id",
            "pv",
            "n_client_ips",
        )
    )


# The oracle computes the EXPECTED parser output straight from events —
# an independent re-derivation, not a re-run of the parser.
_K = SECTION_ID_SQL

ORACLE = {
    "log_roundtrip": f"""
        SELECT
            '10.0.' || CAST(e.event_id % 250 AS VARCHAR) || '.'
                    || CAST(e.event_id % 199 AS VARCHAR)      AS client_ip,
            strftime(e.ts, '%Y-%m-%d %H:%M:%S')               AS access_date,
            CASE WHEN e.event_type = 'view' THEN {_K} ELSE 0 END
                ::INTEGER                                     AS section_id,
            CASE WHEN e.event_type = 'click' THEN e.user_id ELSE 0 END
                ::INTEGER                                     AS article_id
        FROM events e
        WHERE e.event_type <> 'error'
    """,
    # Literal reference-bug twin: status != 200 keeps ONLY the error
    # lines; error events carry the plain /index.php uri -> ids 0.
    "log_roundtrip_literal": """
        SELECT
            '10.0.' || CAST(e.event_id % 250 AS VARCHAR) || '.'
                    || CAST(e.event_id % 199 AS VARCHAR)      AS client_ip,
            strftime(e.ts, '%Y-%m-%d %H:%M:%S')               AS access_date,
            0::INTEGER                                        AS section_id,
            0::INTEGER                                        AS article_id
        FROM events e
        WHERE e.event_type = 'error'
    """,
}

ORACLE["log_hourly_windows"] = f"""
    SELECT date_trunc('hour', e.ts) AS window_start,
           CASE WHEN e.event_type = 'view' THEN {_K} ELSE 0 END
               ::INTEGER AS section_id,
           COUNT(*) AS pv,
           COUNT(DISTINCT '10.0.' || CAST(e.event_id % 250 AS VARCHAR)
                 || '.' || CAST(e.event_id % 199 AS VARCHAR))
               AS n_client_ips
    FROM events e
    WHERE e.event_type <> 'error'
    GROUP BY 1, 2
"""

QUERIES = {
    "log_roundtrip": log_roundtrip,
    "log_roundtrip_literal": log_roundtrip_literal,
    "log_hourly_windows": log_hourly_windows,
}
