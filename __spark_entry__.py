"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` maps every implemented operator (SURVEY.md §2) to a
callable ``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the
DuckDB-equivalent SQL the driver compares against at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q1 hot_section) on /root/testdata/sf0.001."""
    from flink_log_analysis_spark.plans import declared

    return declared.hot_section(spark, "/root/testdata/sf0.001")


def _plan_modules():
    from flink_log_analysis_spark.plans import (
        analytics,
        analytics2,
        declared,
        llm_dedup,
        llm_multimodal,
        llm_similarity,
        llm_text,
        logpipe,
        sqlapi,
        streamed,
    )

    return [
        declared,
        logpipe,
        streamed,
        sqlapi,
        analytics,
        analytics2,
        llm_text,
        llm_dedup,
        llm_similarity,
        llm_multimodal,
    ]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _plan_modules():
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _plan_modules():
        out.update(mod.ORACLE)
    return out
