"""Multi-format ingest round-trips: JSONL and CSV sources.

LLM corpora interchange as JSON-lines; log archives as CSV/text. The
driver testdata is parquet-only, so these plans *manufacture* the
other format once per corpus (same shared-input convention as
logpipe.lines_dir), read it back through the real
``spark.read.schema(...).json/csv`` source, and project a per-row
fidelity digest (md5 of the payload text) that the DuckDB oracle
derives from the original parquet — a hash match certifies the whole
write -> escape -> split -> parse -> type-cast round-trip.

Scale posture: both reads declare an EXPLICIT schema — schema
inference is a full extra pass over 100 TB and is the classic
accidental-2x-scan. Uncompressed JSON/CSV is line-splittable, so the
scan parallelizes like text; unlike parquet there is no column
pruning or predicate pushdown, which is exactly why these are ingest
formats — the first thing a pipeline does is convert to parquet
(documents_jsonl_roundtrip's projection is that conversion's read
side). Timestamps round-trip through an explicit microsecond format:
the CSV writer's default millisecond form would silently truncate
micros and shift every downstream event-time window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import read_table

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
EVENT_CSV_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, ts timestamp, "
    "props string"
)
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

_JSONL_CACHE: dict[str, str] = {}
_CSV_CACHE: dict[str, str] = {}


def jsonl_dir(spark: SparkSession, sf_dir: str) -> str:
    """Manufacture ``documents`` as JSON-lines once per corpus."""
    from ..session import manufactured_input

    return manufactured_input(
        _JSONL_CACHE,
        sf_dir,
        "loganalysis_docs_jsonl_",
        "docs",
        lambda path: read_table(spark, sf_dir, "documents")
        .write.mode("overwrite")
        .json(f"{path}/docs"),
    )


def csv_dir(spark: SparkSession, sf_dir: str) -> str:
    """Manufacture ``events`` as quoted CSV once per corpus."""
    from ..session import manufactured_input

    def _build(path: str) -> None:
        read_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "ts", "props"
        ).write.mode("overwrite").option("header", "true").option(
            "timestampFormat", _TS_FMT
        ).csv(f"{path}/events")

    return manufactured_input(
        _CSV_CACHE, sf_dir, "loganalysis_events_csv_", "events", _build
    )


def documents_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> JSONL -> explicit-schema read -> fidelity digest."""
    docs = spark.read.schema(DOC_SCHEMA).json(
        f"{jsonl_dir(spark, sf_dir)}/docs"
    )
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").cast("int").alias("n_chars_read"),
        F.md5("text").alias("text_md5"),
    )


def events_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> CSV -> explicit-schema read -> fidelity digest.

    ``props`` carries arbitrary key=value text (commas included), so
    the round-trip also certifies quoting/escape handling; ``ts``
    certifies the microsecond timestamp format.
    """
    ev = (
        spark.read.schema(EVENT_CSV_SCHEMA)
        .option("header", "true")
        .option("timestampFormat", _TS_FMT)
        .csv(f"{csv_dir(spark, sf_dir)}/events")
    )
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.md5(F.coalesce("props", F.lit(""))).alias("props_md5"),
    )


_ORC_CACHE: dict[str, str] = {}


def orc_dir(spark: SparkSession, sf_dir: str) -> str:
    """Manufacture ``lineitem`` as ORC once per corpus (ORC is the
    other columnar interchange format warehouses hand over; Spark's
    reader/writer are built in — no external jars)."""
    from ..session import manufactured_input

    return manufactured_input(
        _ORC_CACHE,
        sf_dir,
        "loganalysis_lineitem_orc_",
        "lineitem",
        lambda path: read_table(spark, sf_dir, "lineitem")
        .write.mode("overwrite")
        .orc(f"{path}/lineitem"),
    )


def lineitem_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem -> ORC -> pruned/filtered read -> fidelity aggregate.

    Unlike the JSONL/CSV ingest formats, ORC is columnar: the read
    projects 4 of the table's columns and pushes the quantity filter
    into the scan (same pruning/pushdown posture as parquet —
    `.explain` shows the pruned ReadSchema), so this also certifies
    that a columnar interchange handoff keeps its scan economics.
    """
    li = spark.read.orc(f"{orc_dir(spark, sf_dir)}/lineitem")
    return (
        li.filter(F.col("l_quantity") > 25)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.min("l_orderkey"),
                    F.max("l_orderkey"),
                    F.count(F.lit(1)),
                )
            ).alias("range_md5"),
        )
    )


ORACLE = {
    "lineitem_orc_roundtrip": """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_qty,
               md5(CAST(MIN(l_orderkey) AS VARCHAR) || '|'
                   || CAST(MAX(l_orderkey) AS VARCHAR) || '|'
                   || CAST(COUNT(*) AS VARCHAR)) AS range_md5
        FROM lineitem WHERE l_quantity > 25
        GROUP BY l_returnflag
    """,
    "documents_jsonl_roundtrip": """
        SELECT doc_id, lang, source,
               CAST(length(text) AS INTEGER) AS n_chars_read,
               md5(text) AS text_md5
        FROM documents
    """,
    "events_csv_roundtrip": """
        SELECT event_id, user_id, event_type, ts,
               md5(COALESCE(props, '')) AS props_md5
        FROM events
    """,
}

QUERIES = {
    "documents_jsonl_roundtrip": documents_jsonl_roundtrip,
    "events_csv_roundtrip": events_csv_roundtrip,
    "lineitem_orc_roundtrip": lineitem_orc_roundtrip,
}
