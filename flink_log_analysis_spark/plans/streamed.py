"""Oracle-checked STREAMING parity queries.

These entries run the reference's actual streaming topology — file
stream of raw log lines -> columnar parse -> stream-static broadcast
join -> unbounded agg -> keyed upsert sink (``streaming.runner``) —
to completion with ``availableNow``, then return the sink's final
keyed state as a DataFrame. Because the reference's aggregations are
unbounded (SURVEY §1.1.4), the stream's final state over a finite
input equals the batch query over the same input, so DuckDB can
oracle-check a genuinely streamed result: the oracle re-derives the
expected sink state straight from ``events`` (it never sees the
parser, the stream, or the sink).

Input manufacture reuses :mod:`.logpipe`'s deterministic
events->log-line mapping; dims reuse :mod:`.declared`'s role mapping
(nation == pre_forum_forum).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import (
    STREAM_STATE_PARTITIONS,
    ensure_min_partitions,
    read_table,
    scoped_conf,
    shared_tmp_dir,
    widen_stream,
)
from ..streaming.runner import (
    client_ip_access_agg,
    hot_article_agg,
    hot_section_agg,
    parsed_log_stream,
    read_log_file_stream,
    start_upsert_stream,
)
from ..streaming.upsert import MemoryUpsertSink
from .declared import SECTION_ID_SQL
from .logpipe import lines_dir


# Stream-input parquet dir shared per (session, sf_dir): the three
# event-stream queries (hourly stats, watermarked windows, stateful
# sessions) all stream the same events table, so the snapshot write
# (read_table + repartition + parquet) runs once and the others do a
# plain file-source scan. Leaked until process exit, like lines_dir.
_EVENTS_CACHE: dict[str, str] = {}


def events_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..session import manufactured_input

    def _build(path: str) -> None:
        ev = ensure_min_partitions(read_table(spark, sf_dir, "events"))
        ev.write.mode("overwrite").parquet(f"{path}/events")

    return manufactured_input(
        _EVENTS_CACHE, sf_dir, "loganalysis_events_", "events", _build
    )


_EVENTS_SCHEMA_CACHE: dict[str, object] = {}


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev_dir = f"{events_stream_dir(spark, sf_dir)}/events"
    # The mirror is written once per (session, sf_dir), so its schema
    # is immutable for the cache key's lifetime — skip the per-call
    # footer-read job (r16 candidate list item 1).
    schema = _EVENTS_SCHEMA_CACHE.get(ev_dir)
    if schema is None:
        schema = spark.read.parquet(ev_dir).schema
        _EVENTS_SCHEMA_CACHE[ev_dir] = schema
    return spark.readStream.schema(schema).parquet(ev_dir)


def _drain(q) -> None:
    """availableNow must fully drain; partial state would silently
    look like wrong data to the oracle."""
    if not q.awaitTermination(timeout=600):
        q.stop()
        raise TimeoutError(
            "streaming query did not drain availableNow input in 600s"
        )


def _sink_schema(agg):
    """Sink schema = agg schema + the stamped statistic_time column, so
    an empty input still yields a well-typed empty result."""
    from pyspark.sql.types import StringType, StructField, StructType

    return StructType(
        list(agg.schema.fields) + [StructField("statistic_time", StringType())]
    )


def _run_stream(spark: SparkSession, sf_dir: str, build_agg, key_cols,
                top_k=None, order_by=None) -> DataFrame:
    work = shared_tmp_dir("loganalysis_stream_")
    try:
        lines = read_log_file_stream(spark, f"{lines_dir(spark, sf_dir)}/lines")
        logs = parsed_log_stream(lines)
        agg = build_agg(logs)
        sink = MemoryUpsertSink(
            key_cols, complete=top_k is not None, schema=_sink_schema(agg)
        )
        with scoped_conf(
            spark, {"spark.sql.shuffle.partitions": STREAM_STATE_PARTITIONS}
        ):
            q = start_upsert_stream(
                agg,
                sink,
                f"{work}/ckpt",
                top_k=top_k,
                order_by=order_by,
                stat_time="1970-01-01 00:00:00",  # pinned; dropped below
                available_now=True,
            )
            _drain(q)
        return sink.to_df(spark).drop("statistic_time")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def hot_section_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 through the real stream: top-10 sections by pv, final state."""
    nation = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("fid"), F.col("n_name").alias("name")
    )
    return _run_stream(
        spark,
        sf_dir,
        lambda logs: hot_section_agg(logs, nation),
        ["section_id"],
        top_k=10,
        order_by=[F.desc("section_pv"), F.asc("section_id")],
    )


def hot_article_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 through the real stream: top-10 articles by pv, final state.

    Dim role mapping: customer == pre_forum_post (tid = c_custkey,
    subject = c_name), as in plans.declared.
    """
    customer = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("tid"), F.col("c_name").alias("subject")
    )
    return _run_stream(
        spark,
        sf_dir,
        lambda logs: hot_article_agg(logs, customer),
        ["article_id"],
        top_k=10,
        order_by=[F.desc("article_pv"), F.asc("article_id")],
    )


def client_ip_access_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 through the real stream: per-client hit counts, final state."""
    return _run_stream(spark, sf_dir, client_ip_access_agg, ["client_ip"])


def hourly_event_stats_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window aggregation through a real parquet
    file stream, update-mode upserted by (hour, event_type); final
    sink state must equal the batch hourly rollup, so the batch oracle
    checks a genuinely streamed windowed aggregate."""
    work = shared_tmp_dir("loganalysis_stream_")
    try:
        stream = read_events_stream(spark, sf_dir)
        agg = stream.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), F.col("event_type")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            # final cast to double: engine-neutral output type (the
            # per-batch sum itself stays exact decimal)
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        sink = MemoryUpsertSink(["hour", "event_type"], schema=_sink_schema(agg))
        with scoped_conf(
            spark, {"spark.sql.shuffle.partitions": STREAM_STATE_PARTITIONS}
        ):
            q = start_upsert_stream(
                agg,
                sink,
                f"{work}/ckpt",
                stat_time="1970-01-01 00:00:00",
                available_now=True,
            )
            _drain(q)
        return sink.to_df(spark).drop("statistic_time")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def windowed_event_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked event-time tumbling window, APPEND mode — the
    bounded-state streaming pattern (the update-mode twin above keeps
    all windows in state forever; this one drops a window's state as
    soon as the 30-min watermark passes its end).

    Append mode only emits *finalized* windows: with availableNow over
    one deterministic file batch, the final watermark is
    max(ts) - 30 min, so the result is every hourly window whose end
    is <= that watermark — exactly what the oracle derives with a
    scalar max(ts) subquery. Trailing windows stay in (discarded)
    state, which is the honest semantic difference between this and
    the unbounded twin, and the reason both belong in the surface.
    """
    work = shared_tmp_dir("loganalysis_stream_")
    try:
        stream = read_events_stream(spark, sf_dir)
        agg = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.col("window.start").alias("window_start"),
                F.col("event_type"),
                F.col("n_events"),
            )
        )
        name = f"windowed_counts_{abs(hash(work)) % 10**9}"
        with scoped_conf(
            spark, {"spark.sql.shuffle.partitions": STREAM_STATE_PARTITIONS}
        ):
            q = (
                agg.writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", f"{work}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            _drain(q)
        # Detach the result from the temp memory sink before cleanup.
        out = spark.createDataFrame(
            spark.table(name).collect(), schema=spark.table(name).schema
        )
        spark.catalog.dropTempView(name)
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def log_hourly_windows_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowed_event_counts_stream's bounded-state pattern over the
    PARSED LOG stream: raw lines -> the real parser -> event-time
    watermark on the parsed ``accessDate`` -> hourly tumbling windows
    per section, APPEND mode (only windows finalized by the watermark
    emit; their state is dropped). This is the event-time query the
    reference never wrote for the timestamp it parses (SURVEY §2.C) —
    A2-A8 feeding the windowing tier end-to-end."""
    work = shared_tmp_dir("loganalysis_stream_")
    try:
        lines = read_log_file_stream(
            spark, f"{lines_dir(spark, sf_dir)}/lines"
        )
        logs = parsed_log_stream(lines)
        agg = (
            logs.withColumn("ts", F.to_timestamp("accessDate"))
            .withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour"), F.col("sectionId"))
            .agg(F.count(F.lit(1)).alias("pv"))
            .select(
                F.col("window.start").alias("window_start"),
                F.col("sectionId").alias("section_id"),
                F.col("pv"),
            )
        )
        name = f"log_windows_{abs(hash(work)) % 10**9}"
        with scoped_conf(
            spark, {"spark.sql.shuffle.partitions": STREAM_STATE_PARTITIONS}
        ):
            q = (
                agg.writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", f"{work}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            _drain(q)
        out = spark.createDataFrame(
            spark.table(name).collect(), schema=spark.table(name).schema
        )
        spark.catalog.dropTempView(name)
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def log_sessions_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``plans.logpipe.log_sessions``'s gap sessions through the REAL
    log stream: raw lines -> the A2-A8 parser -> /24 client network ->
    ``applyInPandasWithState`` sessionizer (the Spark shape of Flink's
    KeyedProcessFunction + timers, SURVEY §2.D). Emits gap-CLOSED
    sessions only — each network's final session is still open when
    the finite stream drains (``use_timeout=False``: pending
    processing-time timers would keep an availableNow query alive
    forever, see ``stateful.py``) — so the oracle is the batch
    session derivation minus each network's last session.

    Sink is parquet via foreachBatch (output stays executor-side;
    session volume at 100 TB is far beyond driver memory), bounds are
    timezone-neutral epoch-ms longs (``emit_epoch_ms``)."""
    import os

    from ..streaming.stateful import sessionize_with_state
    from .logpipe import SESSION_GAP_SECONDS

    work = shared_tmp_dir("loganalysis_stream_")
    try:
        lines = read_log_file_stream(
            spark, f"{lines_dir(spark, sf_dir)}/lines"
        )
        logs = parsed_log_stream(lines)
        keyed = logs.select(
            F.substring_index("clientIP", ".", 3).alias("client_net"),
            F.to_timestamp("accessDate").alias("accessTs"),
        )
        sess = sessionize_with_state(
            keyed,
            key_col="client_net",
            ts_col="accessTs",
            gap_seconds=SESSION_GAP_SECONDS,
            use_timeout=False,
            emit_epoch_ms=True,
        ).select(
            F.col("key").alias("client_net"),
            "session_start_ms",
            "session_end_ms",
            "session_hits",
        )
        out_dir = f"{work}/sessions"
        with scoped_conf(
            spark, {"spark.sql.shuffle.partitions": STREAM_STATE_PARTITIONS}
        ):
            q = (
                sess.writeStream.outputMode("append")
                .foreachBatch(
                    lambda df, bid: df.write.mode("append").parquet(out_dir)
                )
                .option("checkpointLocation", f"{work}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            _drain(q)
        if not os.path.exists(out_dir):
            return spark.createDataFrame([], sess.schema)
        return spark.read.parquet(out_dir).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def deduped_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: ``dropDuplicatesWithinWatermark`` keyed
    on event_id — the ingest-dedup stage of a streaming training-data
    pipeline (at-least-once sources re-deliver; the state store keeps
    one key per id only until the watermark passes, so state is
    bounded by the dedup horizon, not the stream's lifetime).

    The input is manufactured with every event emitted TWICE (explode
    over two copies) so the operator provably removes rows: the sink
    holds each event exactly once, which is what the oracle asserts
    (plain SELECT of the events table). A cross-engine mismatch in
    dedup state handling would double rows and hash-fail loudly.
    """
    work = shared_tmp_dir("loganalysis_stream_")
    try:
        stream = read_events_stream(spark, sf_dir)
        doubled = stream.withColumn(
            "copy", F.explode(F.array(F.lit(0), F.lit(1)))
        )
        deduped = (
            doubled.withWatermark("ts", "30 minutes")
            .dropDuplicatesWithinWatermark(["event_id"])
            .select("event_id", "event_type", "value")
        )
        with scoped_conf(
            spark, {"spark.sql.shuffle.partitions": STREAM_STATE_PARTITIONS}
        ):
            q = (
                deduped.writeStream.outputMode("append")
                .format("parquet")
                .option("path", f"{work}/out")
                .option("checkpointLocation", f"{work}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            _drain(q)
        # File sink (not memory+collect): the deduped stream is row-wide
        # (one row per event), and a memory sink would round-trip every
        # row through the driver twice. localCheckpoint detaches the
        # result from the temp dir before cleanup.
        return spark.read.parquet(f"{work}/out").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def conversion_pairs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM event-time interval join through the real
    topology: the view stream joined to the purchase stream of the
    same user with ``view_ts <= buy_ts <= view_ts + 1 hour`` — the
    attribution/conversion join (streaming.joins.interval_join, the
    engine-extension tier above the reference's stream-static lookup
    joins, SURVEY §2.B B5).

    Both sides are unbounded file streams over the same events
    snapshot; the time bound plus the 2-hour watermark is what lets
    Spark evict join state (rows outside interval + watermark), so
    state is O(events per key per window), not O(stream). Inner-join
    matches emit as soon as both rows arrive (the watermark only
    gates state cleanup), so the availableNow drain yields every
    pair and the oracle is the identical batch interval join.
    """
    from ..streaming.joins import interval_join

    work = shared_tmp_dir("loganalysis_stream_")
    try:
        views = (
            read_events_stream(spark, sf_dir)
            .filter(F.col("event_type") == "view")
            .select(
                "user_id",
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
            )
        )
        buys = (
            read_events_stream(spark, sf_dir)
            .filter(F.col("event_type") == "purchase")
            .select(
                "user_id",
                F.col("event_id").alias("buy_id"),
                F.col("ts").alias("buy_ts"),
                F.col("value").alias("buy_value"),
            )
        )
        pairs = interval_join(
            views, buys, "user_id", "view_ts", "buy_ts",
            upper="1 hour", watermark="2 hours",
        ).select(
            "user_id",
            "view_id",
            "buy_id",
            (F.col("buy_ts").cast("long") - F.col("view_ts").cast("long"))
            .alias("lag_sec"),
            "buy_value",
        )
        with scoped_conf(
            spark, {"spark.sql.shuffle.partitions": STREAM_STATE_PARTITIONS}
        ):
            q = (
                pairs.writeStream.outputMode("append")
                .format("parquet")
                .option("path", f"{work}/out")
                .option("checkpointLocation", f"{work}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            _drain(q)
        return spark.read.parquet(f"{work}/out").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def incremental_near_dups_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of llm_dedup.incremental_near_dups: arriving
    documents stream in file-by-file, and every micro-batch's LSH
    bands broadcast against the PRE-BUILT standing-corpus index
    (llm_dedup._corpus_index — materialized to parquet once per
    session and shared with the batch twin, as a production index
    would be materialized once and appended). Matches
    accumulate in a keyed upsert sink; the final keyed state must
    equal the batch query exactly, which is what the shared oracle
    asserts.

    This is the continuous-ingest dedup shape at 100 TB: per-batch
    cost is O(batch + matched candidates), independent of corpus
    size, and state is bounded by the match count, not the stream.
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from ..operators import dedup
    from ..streaming.upsert import MemoryUpsertSink
    from .llm_dedup import BATCH_MOD, NEAR_DUP_THRESHOLD, _corpus_index

    work = shared_tmp_dir("loganalysis_stream_")
    try:
        docs = read_table(spark, sf_dir, "documents")
        index = _corpus_index(spark, sf_dir)
        # The arriving side lands as two files -> two micro-batches
        # under maxFilesPerTrigger=1 (two is all the incremental
        # contract needs: the >=2 assert below proves per-batch
        # matching; each extra micro-batch re-pays plan build +
        # signature projection for the same evidence).
        new = docs.filter(F.col("doc_id") % BATCH_MOD == 0)
        new.repartition(2).write.parquet(f"{work}/in")
        schema = spark.read.parquet(f"{work}/in").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{work}/in")
        )
        sink = MemoryUpsertSink(
            ["new_id", "corpus_id"],
            schema=StructType(
                [
                    StructField("new_id", LongType()),
                    StructField("corpus_id", LongType()),
                    StructField("jaccard", DoubleType()),
                ]
            ),
        )

        def apply(batch_df, batch_id):
            sink(
                dedup.match_against_index(
                    batch_df, index, threshold=NEAR_DUP_THRESHOLD
                ),
                batch_id,
            )

        with scoped_conf(
            spark, {"spark.sql.shuffle.partitions": STREAM_STATE_PARTITIONS}
        ):
            q = (
                stream.writeStream.foreachBatch(apply)
                .option("checkpointLocation", f"{work}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            _drain(q)
        assert len(sink.applied_batches) >= 2, "expected a multi-batch run"
        return sink.to_df(spark)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def corpus_tokenize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming TOKENIZATION: documents arrive on a JSONL file stream
    and the large-vocab two-tier tokenizer (operators/bpe.py
    token_digests, 1024-merge table -> the Arrow-batched pandas tier)
    runs per micro-batch — the tokenize stage of a streaming training
    pipeline. mapInPandas is a stateless row transform, so append mode
    needs no watermark and the stream-final sink equals the batch
    tokenization — certified by the SAME recursive-CTE oracle as
    bpe_large_vocab (chain-as-data replay; the oracle never sees JSON,
    the stream, or Python)."""
    from ..operators import bpe as bpe_ops
    from .formats import DOC_SCHEMA, jsonl_dir
    from .llm_text import BPE_LARGE_MERGES_N

    work = shared_tmp_dir("loganalysis_stream_")
    try:
        docs = spark.readStream.schema(DOC_SCHEMA).json(
            f"{jsonl_dir(spark, sf_dir)}/docs"
        )
        # widen each micro-batch before the Arrow-batched encode: a
        # file-stream batch is one partition per input file, and
        # mapInPandas inherits it (session.widen_stream)
        out = bpe_ops.token_digests(
            widen_stream(docs), bpe_ops.digit_merges(BPE_LARGE_MERGES_N)
        )
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", f"{work}/out")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        return spark.read.parquet(f"{work}/out").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def unigram_tokens_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming unigram-LM tokenization: documents arrive on the
    JSONL file stream and each micro-batch runs the Viterbi
    segmentation under the FROZEN scored vocabulary
    (operators/unigram.py encode_docs). The per-document stream digest
    needs a per-doc regroup and the distinct-word amortization a
    per-batch distinct, so the encode runs INSIDE foreachBatch as
    plain batch ops — legal because tokenization is a pure per-document
    function and a document never spans micro-batches, so per-batch
    encode == batch encode under a frozen vocabulary (the
    substring_dedup_stream argument, tokenizer edition; idempotent
    replay via per-batch_id directory overwrite). Certified by the
    SAME exhaustive-enumeration oracle as unigram_tokens (it never
    sees JSON, the stream, or the fold)."""
    import os

    from ..operators import unigram as ug_ops
    from .formats import DOC_SCHEMA, jsonl_dir
    from .llm_text import unigram_tokens as _batch_row

    work = shared_tmp_dir("loganalysis_stream_")
    try:
        docs = spark.readStream.schema(DOC_SCHEMA).json(
            f"{jsonl_dir(spark, sf_dir)}/docs"
        )
        out_dir = f"{work}/tokens"

        def encode(batch, bid):
            ug_ops.encode_docs(
                batch.select("doc_id", "text"),
                ug_ops.UNIGRAM_VOCAB_V1,
            ).write.mode("overwrite").parquet(f"{out_dir}/batch_id={bid}")

        q = (
            docs.writeStream.outputMode("append")
            .foreachBatch(encode)
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        if not os.path.exists(out_dir):
            return spark.createDataFrame(
                [], _batch_row(spark, sf_dir).schema
            )
        return (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(out_dir)
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def lm_perplexity_filter_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming LM-perplexity filtering: documents arrive on a JSONL
    file stream and each micro-batch is scored against the FROZEN
    reference bigram model (fit once in batch on the reference slice —
    production fits its reference model offline and ships it to the
    scoring tier as a broadcast artifact; the fit never runs inside
    the stream). Scoring is a stateless per-row projection
    (operators/lmfilter.py score_perplexity — one broadcast attach,
    the fold inside the row), so append mode needs no watermark and
    the stream-final sink equals the batch filter — certified by the
    SAME refit-and-replay oracle as lm_perplexity_filter (the oracle
    never sees JSON, the stream, or the broadcast). At 100 TB this is
    the filter tier's deployment shape: a per-batch widen then map
    tasks, no state
    store, the model a few MB riding each executor once."""
    from ..operators import lmfilter
    from .formats import DOC_SCHEMA, jsonl_dir
    from .llm_quality import LM_PPL_THRESHOLD, _lm_model

    work = shared_tmp_dir("loganalysis_stream_")
    try:
        uni, bi, vocab = _lm_model(spark, sf_dir)
        docs = spark.readStream.schema(DOC_SCHEMA).json(
            f"{jsonl_dir(spark, sf_dir)}/docs"
        )
        # widen each micro-batch BEFORE the expression-heavy scoring
        # (session.widen_stream — measured 25 s -> 2 s at sf0.1; the
        # single-file-scan trap, streaming edition)
        docs = widen_stream(docs)
        out = lmfilter.score_perplexity(
            docs,
            lmfilter.model_row(spark, uni, bi),
            vocab,
            LM_PPL_THRESHOLD,
        )
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", f"{work}/out")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        return spark.read.parquet(f"{work}/out").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def dsir_weights_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DSIR scoring: documents arrive on a JSONL file stream
    and each micro-batch is weighted against the FROZEN hashed-ngram
    importance model (fit once in batch on the full corpus —
    production fits offline and ships the <=10k-row table to the
    scoring tier; the fit never runs inside the stream). Scoring
    needs a per-document regroup (the feature-ordered fold), so it
    runs INSIDE foreachBatch as plain batch ops — legal because a
    document's grams never span micro-batches, making per-batch
    scoring == batch scoring under a frozen model. Certified by the
    SAME refit-and-replay oracle as dsir_weights (it never sees JSON,
    the stream, or the cached model). At 100 TB this is the selection
    tier's deployment shape: broadcast the capped model once, stream
    the pool through, no state store."""
    import os

    from ..operators import dsir
    from .formats import DOC_SCHEMA, jsonl_dir
    from .pipeline_ops import DSIR_TARGET_MOD, _dsir_model

    work = shared_tmp_dir("loganalysis_stream_")
    try:
        model = _dsir_model(spark, sf_dir)
        docs = spark.readStream.schema(DOC_SCHEMA).json(
            f"{jsonl_dir(spark, sf_dir)}/docs"
        )
        out_dir = f"{work}/weights"

        def score(batch, bid):
            # foreachBatch is at-least-once: a retried micro-batch
            # must not duplicate rows, so each batch owns a batch_id
            # directory and retries OVERWRITE it (idempotent replay —
            # the commit-marker idea, directory edition)
            dsir.importance_weights(
                batch.select("doc_id", "text"),
                F.col("doc_id") % DSIR_TARGET_MOD == 0,
                model=model,
            ).write.mode("overwrite").parquet(f"{out_dir}/batch_id={bid}")

        q = (
            docs.writeStream.outputMode("append")
            .foreachBatch(score)
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        if not os.path.exists(out_dir):
            from .pipeline_ops import dsir_weights as _batch

            return spark.createDataFrame(
                [], _batch(spark, sf_dir).schema
            )
        # recursiveFileLookup: the batch_id=N directories are replay
        # units, not a partition column — plain partition discovery
        # would add batch_id to the schema and break the oracle twin
        return (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(out_dir)
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def substring_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-substring dedup against the FROZEN standing
    corpus: arriving documents (the batch slice, doc_id % 7 == 0) flow
    in on the JSONL file stream and every micro-batch is probed
    against the corpus's persisted distinct window-key index (built
    once OUTSIDE the stream — production writes it with
    quality.build_substring_index and refreshes on its own compaction
    schedule). The per-document interval merge needs a per-doc
    regroup, so it runs INSIDE foreachBatch as plain batch ops — legal
    because a document's windows never span micro-batches, making
    per-batch dedup == batch dedup under a frozen index (the
    dsir_weights_stream argument, substring edition; idempotent
    replay via per-batch_id directory overwrite). Certified by the
    SAME oracle string as substring_dedup_incremental (it never sees
    JSON, the stream, or the index)."""
    import os

    from ..operators import quality
    from .formats import DOC_SCHEMA, jsonl_dir
    from .llm_quality import (
        SUBSTR_BATCH_MOD,
        SUBSTR_DEDUP_TOKENS,
        _substr_index,
    )
    from .llm_quality import substring_dedup_incremental as _batch_row

    work = shared_tmp_dir("loganalysis_stream_")
    try:
        # the frozen artifact, parquet-materialized once per
        # (session, sf_dir) and shared with the batch incremental row
        # (production builds it when the corpus is committed); every
        # micro-batch probes it
        index = _substr_index(spark, sf_dir)
        docs = spark.readStream.schema(DOC_SCHEMA).json(
            f"{jsonl_dir(spark, sf_dir)}/docs"
        )
        out_dir = f"{work}/deduped"

        def dedupe(batch, bid):
            quality.substring_dedup_incremental(
                batch.filter(
                    F.col("doc_id") % SUBSTR_BATCH_MOD == 0
                ).select("doc_id", "text"),
                min_tokens=SUBSTR_DEDUP_TOKENS,
                corpus_keys=index,
            ).write.mode("overwrite").parquet(f"{out_dir}/batch_id={bid}")

        q = (
            docs.writeStream.outputMode("append")
            .foreachBatch(dedupe)
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        if not os.path.exists(out_dir):
            return spark.createDataFrame(
                [], _batch_row(spark, sf_dir).schema
            )
        return (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(out_dir)
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def corpus_ingest_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming JSONL corpus ingestion with hygiene: a file stream of
    JSON-lines documents (the interchange format an LLM pipeline
    actually receives) -> C4/Gopher keep filter -> deterministic PII
    augmentation + scrub -> parquet sink.

    Every stage is a stateless projection/filter, so append mode needs
    no watermark, nothing shuffles, and the sink's final content
    equals the batch hygiene pass the oracle derives straight from the
    parquet ``documents`` table (the oracle never sees JSON, the
    stream, or the scrubber). At 100 TB this is the shape of the
    ingest tier: a per-batch widen (session.widen_stream) then map
    tasks, no state store, sink-partitioned
    output ready for the dedup/packing stages.
    """
    from ..operators import quality
    from .formats import DOC_SCHEMA, jsonl_dir
    from .llm_quality import _augmented

    work = shared_tmp_dir("loganalysis_stream_")
    try:
        docs = spark.readStream.schema(DOC_SCHEMA).json(
            f"{jsonl_dir(spark, sf_dir)}/docs"
        )
        # widen before the regex-heavy keep/scrub chain (same
        # single-file-batch trap as the LM-filter stream)
        docs = widen_stream(docs)
        kept = _augmented(docs.filter(quality.keep_predicate(F.col("text"))))
        out = quality.pii_scrub(kept, text_col="aug")
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", f"{work}/out")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        return spark.read.parquet(f"{work}/out").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# Oracles re-derive expected sink state from events (see logpipe's
# line-construction contract): views carry fid = k % N_SECTIONS, clicks
# carry tid = user_id, errors get status 500 and are dropped by the
# parser's ==200 filter.
_K = SECTION_ID_SQL
_IP = (
    "'10.0.' || CAST(e.user_id % 250 AS VARCHAR) || '.' || "
    "CAST(e.event_id % 199 AS VARCHAR)"
)

ORACLE = {
    "hot_section_stream": f"""
        SELECT section_id, name, section_pv FROM (
            SELECT {_K} AS section_id, n.n_name AS name, COUNT(*) AS section_pv
            FROM events e
            JOIN nation n ON {_K} = n.n_nationkey
            WHERE e.event_type = 'view' AND {_K} <> 0
            GROUP BY 1, 2
        ) ORDER BY section_pv DESC, section_id ASC LIMIT 10
    """,
    "hot_article_stream": """
        SELECT article_id, subject, article_pv FROM (
            SELECT e.user_id AS article_id, c.c_name AS subject,
                   COUNT(*) AS article_pv
            FROM events e
            JOIN customer c ON e.user_id = c.c_custkey
            WHERE e.event_type = 'click' AND e.user_id <> 0
            GROUP BY 1, 2
        ) ORDER BY article_pv DESC, article_id ASC LIMIT 10
    """,
    "client_ip_access_stream": f"""
        SELECT {_IP} AS client_ip, COUNT(*) AS client_access_cnt
        FROM events e
        WHERE (CASE WHEN e.event_type = 'click' THEN e.user_id ELSE 0 END) <> 0
           OR (CASE WHEN e.event_type = 'view' THEN {_K} ELSE 0 END) <> 0
        GROUP BY 1
    """,
    "hourly_event_stats_stream": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
    """,
    # Append mode emits a window iff window_end <= final watermark
    # (= max event time - 30 min over the single availableNow batch).
    "windowed_event_counts_stream": """
        WITH mx AS (SELECT max(ts) AS m FROM events)
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n_events
        FROM events, mx
        WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR
              <= m - INTERVAL 30 MINUTE
        GROUP BY 1, 2
    """,
    # Finalized hourly windows over the PARSED log stream: the
    # watermark sees only non-error rows (the parser drops status 500),
    # and floor-to-second accessDate parsing cannot flip the exact-hour
    # finalization boundary (hour ends and the truncated max are both
    # integer-second). Derivation from events, never the parser.
    "log_hourly_windows_stream": """
        WITH mx AS (SELECT max(ts) AS m FROM events
                    WHERE event_type <> 'error')
        SELECT date_trunc('hour', e.ts) AS window_start,
               CASE WHEN e.event_type = 'view' THEN {section_id_sql}
                    ELSE 0 END::INTEGER AS section_id,
               COUNT(*) AS pv
        FROM events e, mx
        WHERE e.event_type <> 'error'
          AND date_trunc('hour', e.ts) + INTERVAL 1 HOUR
              <= m - INTERVAL 30 MINUTE
        GROUP BY 1, 2
    """,
    # The stream doubles every event then dedups on event_id: the sink
    # must hold the events table exactly once.
    "deduped_events_stream": """
        SELECT event_id, event_type, value FROM events
    """,
    # Inner interval join: the stream's append output equals the batch
    # join (date_diff('second') == Spark's floor-second cast diff —
    # both count whole-second boundaries in (view_ts, buy_ts]).
    "conversion_pairs_stream": """
        SELECT v.user_id,
               v.event_id AS view_id,
               b.event_id AS buy_id,
               date_diff('second', v.ts, b.ts) AS lag_sec,
               b.value AS buy_value
        FROM events v
        JOIN events b
          ON v.user_id = b.user_id
         AND b.ts >= v.ts
         AND b.ts <= v.ts + INTERVAL 1 HOUR
        WHERE v.event_type = 'view' AND b.event_type = 'purchase'
    """,
}

# Splice the shared section-id derivation into the parsed-log window
# oracle (single-source convention — same _K every log query uses).
# Streaming tokenization shares the large-vocab recursive-CTE oracle:
# identical output columns, identical merge table, the stream adds no
# semantics (stateless append transform drained to completion).
from .llm_text import ORACLE as _TEXT_ORACLE  # noqa: E402

ORACLE["corpus_tokenize_stream"] = _TEXT_ORACLE["bpe_large_vocab"]

# Streaming unigram tokenization: pure per-document function under a
# frozen vocabulary, so the stream-final union equals the batch row.
ORACLE["unigram_tokens_stream"] = _TEXT_ORACLE["unigram_tokens"]

ORACLE["log_hourly_windows_stream"] = ORACLE[
    "log_hourly_windows_stream"
].replace("{section_id_sql}", SECTION_ID_SQL)

# The stream emits gap-closed sessions only; each network's final
# session is still open at drain end. Sessions are disjoint in time
# per network, so "the open one" == the one with the latest start.
# Wraps the batch oracle verbatim — the two derivations cannot drift.
from .logpipe import ORACLE as _LOGPIPE_ORACLE  # noqa: E402

ORACLE["log_sessions_stream"] = f"""
    WITH base AS ({_LOGPIPE_ORACLE["log_sessions"]})
    SELECT client_net, session_start_ms, session_end_ms, session_hits
    FROM base
    QUALIFY session_start_ms
            < MAX(session_start_ms) OVER (PARTITION BY client_net)
"""

QUERIES = {
    "hot_section_stream": hot_section_stream,
    "hot_article_stream": hot_article_stream,
    "client_ip_access_stream": client_ip_access_stream,
    "hourly_event_stats_stream": hourly_event_stats_stream,
    "windowed_event_counts_stream": windowed_event_counts_stream,
    "log_hourly_windows_stream": log_hourly_windows_stream,
    "log_sessions_stream": log_sessions_stream,
    "deduped_events_stream": deduped_events_stream,
    "conversion_pairs_stream": conversion_pairs_stream,
    "incremental_near_dups_stream": incremental_near_dups_stream,
    "corpus_ingest_stream": corpus_ingest_stream,
    "corpus_tokenize_stream": corpus_tokenize_stream,
    "lm_perplexity_filter_stream": lm_perplexity_filter_stream,
    "dsir_weights_stream": dsir_weights_stream,
    "substring_dedup_stream": substring_dedup_stream,
    "unigram_tokens_stream": unigram_tokens_stream,
    "quality_classifier_stream": None,  # bound below (defined late)
}


def quality_classifier_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming model-based quality filtering: documents arrive on
    the JSONL file stream and each micro-batch is scored under the
    FROZEN fitted weight table (operators/qualityclf.py — fit once in
    batch; the fit never runs inside the stream). Scoring runs the
    BATCH operator inside foreachBatch (broadcast join on feat +
    hash-agg — per-doc scores are independent, so per-batch scoring
    equals corpus scoring; the substring_dedup_stream sink pattern,
    idempotent per batch_id): a first cut used the per-row map-fold
    twin instead, and Spark's MapType element_at is a LINEAR key
    scan, so every gram paid a 10k-entry walk — measured 7.6 s warm
    floor vs ~1.6 s for the join form. The stream-final sink is held
    to the quality_classifier_scores oracle VERBATIM (fit chain +
    scoring replay; it never sees JSON, the stream, or the model)."""
    from ..operators import qualityclf
    from .formats import DOC_SCHEMA, jsonl_dir
    from .llm_quality import _qc_model

    work = shared_tmp_dir("loganalysis_stream_")
    try:
        model = _qc_model(spark, sf_dir)
        docs = spark.readStream.schema(DOC_SCHEMA).json(
            f"{jsonl_dir(spark, sf_dir)}/docs"
        )
        out_dir = f"{work}/scored"

        def score(batch, bid):
            qualityclf.score_docs(
                widen_stream(batch).select("doc_id", "text"), model
            ).write.mode("overwrite").parquet(f"{out_dir}/batch_id={bid}")

        q = (
            docs.writeStream.outputMode("append")
            .foreachBatch(score)
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        return (
            spark.read.parquet(out_dir)
            .drop("batch_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["quality_classifier_stream"] = quality_classifier_stream

# The streamed incremental dedup must converge to the batch query's
# exact result — same oracle, imported so the two can never drift.
from .llm_dedup import ORACLE as _DEDUP_ORACLE  # noqa: E402

ORACLE["incremental_near_dups_stream"] = _DEDUP_ORACLE["incremental_near_dups"]

# The streamed hygiene ingest must equal the batch keep-filter + scrub:
# keep predicate and PII chain come from the same builders the batch
# oracles use, applied to the keep-filtered relation.
from .llm_quality import _KEEP_PRED  # noqa: E402
from .llm_quality import _TOKS as _QTOKS  # noqa: E402
from .llm_quality import _pii_oracle as _pii_oracle_sql  # noqa: E402

ORACLE["corpus_ingest_stream"] = f"""
    WITH qt AS (
        SELECT doc_id, text, {_QTOKS} AS toks FROM documents
    ), k AS (
        SELECT doc_id, text FROM qt WHERE {_KEEP_PRED}
    )
    {_pii_oracle_sql("k")}
"""

# The streamed LM filter must converge to the batch filter's exact
# result — the model is frozen before the stream starts and scoring is
# stateless, so the oracle string is reused verbatim (refit + replay;
# it never sees JSON, the stream, or the broadcast model).
from .llm_quality import ORACLE as _QUALITY_ORACLE  # noqa: E402

ORACLE["lm_perplexity_filter_stream"] = _QUALITY_ORACLE[
    "lm_perplexity_filter"
]

# Same frozen-model stateless-scoring contract for the streaming
# quality classifier: held to the batch scores oracle verbatim (the
# rowwise integer fold is order-independent by construction).
ORACLE["quality_classifier_stream"] = _QUALITY_ORACLE[
    "quality_classifier_scores"
]

# Same contract shape for the streaming DSIR scorer: frozen model +
# stateless-per-document scoring (the regroup stays inside one
# micro-batch), so the batch refit-and-replay oracle is reused
# verbatim.
from .pipeline_ops import ORACLE as _PIPEOPS_ORACLE  # noqa: E402

ORACLE["dsir_weights_stream"] = _PIPEOPS_ORACLE["dsir_weights"]

# Streaming substring dedup: frozen corpus index + per-batch probe
# (the per-doc interval merge stays inside one micro-batch), so the
# incremental row's oracle string is reused verbatim.
ORACLE["substring_dedup_stream"] = _QUALITY_ORACLE[
    "substring_dedup_incremental"
]
