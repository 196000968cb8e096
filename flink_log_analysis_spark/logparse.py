"""Apache combined-log parsing as vectorized Catalyst expressions.

Reproduces the observable semantics of the reference's parser layer
(``/root/reference/src/main/java/com/jmx/analysis/LogParse.java:25-132``
and the map/filter operators in ``LogAnalysis.java:264-322``) with zero
per-row Python: every step is a built-in column expression, so the whole
parse stage stays inside whole-stage codegen and scales linearly on a
cluster — a 100 TB log scan is just a text scan + projections.

Pipeline (SURVEY §2.A):

  raw line (STRING)
    -> parse_combined_log:    9-field struct (A2), null-out on regex miss
    -> drop unparseable (A3)
    -> status filter (A4; the reference's *documented intent* is
       status == 200 — its code has an inverted comparison, which we
       expose via ``keep_non_200`` for literal parity; SURVEY §2.E.1)
    -> project_log_fields:    (clientIP, accessDate, sectionId,
       articleId) with the sentinel row on date-parse failure (A5-A8)

Semantics notes implemented exactly (SURVEY §2.E):
  - request split requires exactly 3 tokens (method, uri, proto);
  - date normalize drops the timezone offset (naive local time);
  - fid/tid extracted only from the request URI (never the referer),
    anchored on ``?mod=forumdisplay&fid=`` / ``?mod=viewthread&tid=``;
  - sentinel row ('0.0.0.0', '0000-00-00 00:00:00', 0, 0) iff the
    date fails to parse; otherwise missing fid/tid default to 0.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Apache *combined* log format: 9 space-delimited fields, with the
# request / referer / user-agent quoted and the timestamp bracketed.
# Public format spec: https://httpd.apache.org/docs/2.4/logs.html
COMBINED_LOG_REGEX = (
    r'^(\S+) (\S+) (\S+) \[([^\]]*)\] "([^"]*)" (\d{3}) (\S+) "([^"]*)" "([^"]*)"\s*$'
)

# Field names mirror the reference's AccessLogRecord POJO
# (AccessLogRecord.java:17-27) so a reference user finds the same names.
LOG_FIELDS = (
    "clientIpAddress",
    "clientIdentity",
    "remoteUser",
    "dateTime",
    "request",
    "httpStatusCode",
    "bytesSent",
    "referer",
    "userAgent",
)

SECTION_ID_REGEX = r"\?mod=forumdisplay&fid=(\d+)"
ARTICLE_ID_REGEX = r"\?mod=viewthread&tid=(\d+)"

SENTINEL_IP = "0.0.0.0"
SENTINEL_DATE = "0000-00-00 00:00:00"


def parse_combined_log(df: DataFrame, line_col: str = "line") -> DataFrame:
    """A2: raw line -> 9 string columns; regex miss -> all-null fields.

    One pass of ``regexp_extract`` per field. Catalyst evaluates the
    shared regex per row inside codegen; no Python crosses the boundary.
    """
    line = F.col(line_col)
    matched = line.rlike(COMBINED_LOG_REGEX)
    cols = [
        F.when(matched, F.regexp_extract(line, COMBINED_LOG_REGEX, i + 1)).alias(name)
        for i, name in enumerate(LOG_FIELDS)
    ]
    return df.select(line.alias(line_col), *cols)


def drop_unparseable(df: DataFrame) -> DataFrame:
    """A3: drop lines the combined-log regex rejected (null struct)."""
    return df.filter(F.col("clientIpAddress").isNotNull())


def filter_status(df: DataFrame, keep_non_200: bool = False) -> DataFrame:
    """A4: status filter.

    Default = the documented intent (keep HTTP 200). ``keep_non_200``
    mirrors the reference code's literal (inverted) comparison at
    ``LogAnalysis.java:318`` for byte-parity experiments.
    """
    if keep_non_200:
        return df.filter(F.col("httpStatusCode") != "200")
    return df.filter(F.col("httpStatusCode") == "200")


def request_uri(request: Column) -> Column:
    """A5: '"GET /uri HTTP/1.1"' -> uri; null unless exactly 3 tokens."""
    parts = F.split(request, " ")
    return F.when(F.size(parts) == 3, parts.getItem(1))


def normalized_date(date_time: Column) -> Column:
    """A6: '21/Jul/2009:02:48:13 -0700' -> timestamp, zone DISCARDED.

    The reference keeps only the pre-space part of the bracketed field
    and parses it as naive local time (LogParse.java:79-101). We return
    a real TimestampType; callers needing the reference's string format
    apply :func:`formatted_date`.
    """
    naive = F.regexp_extract(date_time, r"^([^ ]+)", 1)
    # try_to_timestamp: null (not ANSI error) on unparseable input —
    # the parser's contract is "sentinel row on bad date", never a crash.
    return F.try_to_timestamp(naive, F.lit("dd/MMM/yyyy:HH:mm:ss"))


def formatted_date(ts: Column) -> Column:
    """The reference's output format: 'yyyy-MM-dd HH:mm:ss' string."""
    return F.date_format(ts, "yyyy-MM-dd HH:mm:ss")


def section_id(uri: Column) -> Column:
    """A7: section id from the URI query string; 0 when absent."""
    return _id_from_uri(uri, SECTION_ID_REGEX)


def article_id(uri: Column) -> Column:
    """A7: article id from the URI query string; 0 when absent."""
    return _id_from_uri(uri, ARTICLE_ID_REGEX)


def _id_from_uri(uri: Column, pattern: str) -> Column:
    # try_cast: a hostile URI with an overlong id (> INT_MAX digits)
    # must degrade to 0 ("not a hit"), never ANSI-abort a 100 TB scan.
    extracted = F.regexp_extract(uri, pattern, 1)
    return F.coalesce(
        F.when(extracted != "", extracted).try_cast("int"), F.lit(0)
    )


def project_log_fields(df: DataFrame) -> DataFrame:
    """A8: 9-field record -> (clientIP, accessDate, accessTs, sectionId,
    articleId) with the reference's sentinel semantics.

    Sentinel row iff the date fails to parse (SURVEY §2.E.2 — the
    reference's tuple-equality branch is dead code; only the date check
    is live). ``accessDate`` keeps the reference's string format for
    output parity; ``accessTs`` is the typed timestamp twin used for
    event-time operations.
    """
    uri = request_uri(F.col("request"))
    ts = normalized_date(F.col("dateTime"))
    bad_date = ts.isNull()
    return df.select(
        F.when(bad_date, F.lit(SENTINEL_IP))
        .otherwise(F.col("clientIpAddress"))
        .alias("clientIP"),
        F.when(bad_date, F.lit(SENTINEL_DATE))
        .otherwise(formatted_date(ts))
        .alias("accessDate"),
        F.when(bad_date, F.lit(None).cast("timestamp")).otherwise(ts).alias("accessTs"),
        F.when(bad_date, F.lit(0)).otherwise(section_id(uri)).alias("sectionId"),
        F.when(bad_date, F.lit(0)).otherwise(article_id(uri)).alias("articleId"),
    )


def parse_access_logs(
    df: DataFrame, line_col: str = "line", keep_non_200: bool = False
) -> DataFrame:
    """Full A2-A8 chain: raw lines -> the reference's ``logs`` view shape.

    Works identically on batch DataFrames and streaming DataFrames
    (all expressions are stateless projections/filters), which is what
    makes the engine's batch/stream dual-mode possible.
    """
    parsed = drop_unparseable(parse_combined_log(df, line_col))
    filtered = filter_status(parsed, keep_non_200=keep_non_200)
    return project_log_fields(filtered)


def with_proctime(df: DataFrame) -> DataFrame:
    """A9: processing-time attribute ≈ current_timestamp per micro-batch.

    Spark evaluates ``current_timestamp()`` once per micro-batch plan,
    which matches the reference's PROCTIME() use: it exists only to
    select the dim-table snapshot for the lookup join (stream-static
    joins already re-evaluate the static side per micro-batch).
    """
    return df.withColumn("proctime", F.current_timestamp())
