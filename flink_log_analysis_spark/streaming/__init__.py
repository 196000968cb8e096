"""Structured Streaming layer: sources, keyed upsert sinks, runners.

Maps the reference's streaming architecture (Kafka source -> parse ->
proctime lookup join -> unbounded agg -> JDBC upsert,
``LogAnalysis.java:34-94``) onto Spark Structured Streaming:
micro-batch file/Kafka source -> the same batch-declared plans ->
``foreachBatch`` keyed upsert with checkpointing.
"""

from .upsert import (  # noqa: F401
    BucketedParquetUpsertSink,
    MemoryUpsertSink,
    ParquetUpsertSink,
    jdbc_upsert_statement,
)
from .runner import (  # noqa: F401
    read_log_file_stream,
    read_kafka_stream,
    start_upsert_stream,
    run_log_job,
)
