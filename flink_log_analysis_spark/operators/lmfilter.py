"""LM-perplexity quality filtering — the CCNet recipe.

Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data" (LREC 2020) filter web text by perplexity under
a language model FIT ON A CLEAN REFERENCE corpus: documents that the
reference LM finds predictable (low perplexity) read like the
reference; high-perplexity documents are boilerplate, gibberish, or
the wrong register. This module implements the recipe Spark-first at
two depths — a Laplace-smoothed bigram model and an interpolated
3-gram backoff model (the KenLM shape CCNet actually runs, reduced
to fixed Jelinek-Mercer weights) — both deterministic, exactly
replayable cross-engine, and carrying the same decision semantics as
CCNet's KenLM scorer (threshold on per-token cross-entropy):

- **Fit is bounded by design.** The model is fit on the REFERENCE
  slice, never the corpus being filtered (CCNet fits on Wikipedia and
  scores Common Crawl) — so collecting the fitted counts to one
  broadcast row is a bounded-model property, not a scale leak: model
  size tracks the reference vocabulary, not the 100 TB input.
- **Scoring is one projection.** The model travels as a single
  broadcast row of two maps (the ``cmat`` convention); each document
  computes its transition log-probabilities INSIDE one row (a
  ``transform`` over token pairs) and folds them left-associatively —
  no shuffle, no Python, and the per-row fixed-order fold is what
  makes the double arithmetic reproducible in the DuckDB oracle.
- **Transcendental discipline.** ``ln`` is the one non-IEEE-exact
  operation in the engine's oracle surface (libm implementations may
  differ in the last ulp), so each per-transition log-probability is
  rounded to 12 digits BEFORE the fold on BOTH sides, and the
  per-document score to 4 — the same round-before-compare recipe the
  cosine/quantization contracts use, with margin to spare.

Smoothing: P(w2 | w1) = (bigram(w1 w2) + 1) / (unigram(w1) + V),
V = reference vocabulary size (Laplace — chosen over Kneser-Ney
because it is a closed formula an oracle can restate; the filter
semantics are unchanged). Per-document score is the mean negative
log-probability over transitions (= ln-perplexity); documents keep
iff it does not exceed the threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens

LOG_ROUND = 12  # per-transition ln rounding (see module docstring)
PPL_ROUND = 4   # per-document score rounding

# Jelinek-Mercer interpolation weights for the 3-gram model — FIXED
# closed-formula constants (not EM-fit): cross-engine replay needs
# every constant stateable in SQL, and CCNet's decision semantics
# (threshold on per-token cross-entropy under a reference-fit model)
# are insensitive to the exact mixture as long as it is monotone in
# n-gram order. Highest-order evidence dominates; the unigram floor
# is Laplace-smoothed so P > 0 always (ln stays defined).
JM_L3 = 0.5
JM_L2 = 0.3
JM_L1 = 0.2


def _counts_from(
    toks: DataFrame, key_cols: tuple[str, ...] = ()
) -> tuple[DataFrame, DataFrame]:
    """(unigram counts, bigram counts) from a tokenized frame — two
    explode+hash-agg passes, partial aggregation map-side. With
    ``key_cols`` the counts are PER KEY (one model per language):
    the keys just ride the grouping, one construction serving both
    the plain and the per-key fits so they can never drift."""
    keys = list(key_cols)
    uni = (
        toks.select(*keys, F.explode("toks").alias("w"))
        .groupBy(*keys, "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = toks.filter(F.size("toks") >= 2).select(
        *keys,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.struct(
                    F.element_at("toks", i).alias("w1"),
                    F.element_at("toks", i + 1).alias("w2"),
                ),
            )
        ).alias("p"),
    )
    bi = (
        pairs.select(*keys, "p.w1", "p.w2")
        .groupBy(*keys, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return uni, bi


def fit_bigram_counts(
    ref: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Distributed bigram-LM fit over the reference corpus: returns
    (unigram counts (w, c), bigram counts (w1, w2, c)) as lazy
    frames. The input is widened first: a single-file local reference
    would otherwise serialize the explode onto one core (the
    expression-heavy single-scan trap)."""
    from ..session import ensure_min_partitions

    toks = ensure_min_partitions(ref).select(
        tokens(F.col(text_col)).alias("toks")
    )
    return _counts_from(toks)


# Hard ceiling on any ONE collected model table (uni/bi/tri). The
# session-cache fits pull the reference model into driver dicts — fine
# for a bounded reference slice (the CCNet recipe: the reference is
# curated and small), catastrophic if a misconfigured "reference"
# points at the corpus itself: the collect would OOM the driver
# silently. 2M rows ≈ low hundreds of MB of dict — loud failure well
# before the JVM driver heap is at risk.
MAX_COLLECTED_MODEL_ROWS = 2_000_000


def _collect_model_rows(df: DataFrame, what: str) -> list:
    """Collect one model-count table with a row-count guard: transfers
    at most MAX+1 rows (limit pushes into the exchange), returns the
    complete table when in-range, raises loudly when over — pointing
    at the distributed path that has no such bound."""
    rows = df.limit(MAX_COLLECTED_MODEL_ROWS + 1).collect()
    if len(rows) > MAX_COLLECTED_MODEL_ROWS:
        raise ValueError(
            f"{what} model table exceeds MAX_COLLECTED_MODEL_ROWS="
            f"{MAX_COLLECTED_MODEL_ROWS}: the session-cache fit collects "
            "the reference model into driver dicts and is only safe for "
            "bounded reference slices — fit this reference with "
            "fit_trigram_frames/fit_bigram_counts (the distributed model "
            "path) instead, or shrink the reference"
        )
    return rows


def fit_bigram_model(
    ref: DataFrame, text_col: str = "text"
) -> tuple[dict, dict, int]:
    """Fit + collect: (uni map, bi map keyed 'w1 w2', vocabulary
    size). The collect is bounded by the REFERENCE model size (see
    module docstring), the same bounded-fit pattern as ivf_fit/pq_fit;
    the vocabulary size falls out of the collected map — no extra
    count job. The tokenized reference is persisted across the two
    collect jobs (they would otherwise re-run the scan + widen +
    tokenize twice — r11 review) and released before returning. Plain
    Python dicts, so callers fit ONCE per reference and reuse across
    every scoring pass (build once, score many)."""
    from ..session import ensure_min_partitions

    toks = (
        ensure_min_partitions(ref)
        .select(tokens(F.col(text_col)).alias("toks"))
        .persist()
    )
    try:
        uni, bi = _counts_from(toks)
        u = {r["w"]: r["c"] for r in _collect_model_rows(uni, "unigram")}
        b = {
            f"{r['w1']} {r['w2']}": r["c"]
            for r in _collect_model_rows(bi, "bigram")
        }
    finally:
        toks.unpersist()
    return u, b, len(u)


def model_row(spark, uni_map: dict, bi_map: dict) -> DataFrame:
    """The fitted maps as ONE broadcast row (the cmat convention)."""
    return spark.createDataFrame(
        [(uni_map, bi_map)], "uni map<string,bigint>, bi map<string,bigint>"
    )


def _trigram_counts(toks: DataFrame) -> DataFrame:
    """Trigram counts (w1, w2, w3, c) — one explode + hash-agg pass,
    partial aggregation map-side, same shape as :func:`_counts_from`."""
    triples = toks.filter(F.size("toks") >= 3).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 2),
                lambda i: F.struct(
                    F.element_at("toks", i).alias("w1"),
                    F.element_at("toks", i + 1).alias("w2"),
                    F.element_at("toks", i + 2).alias("w3"),
                ),
            )
        ).alias("t")
    )
    return (
        triples.select("t.w1", "t.w2", "t.w3")
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def fit_trigram_model(
    ref: DataFrame, text_col: str = "text"
) -> tuple[dict, dict, dict, int, int]:
    """Fit + collect the interpolated-3-gram model's counts: (uni map,
    bi map keyed 'w1 w2', tri map keyed 'w1 w2 w3', vocabulary size,
    total reference token count). Bounded exactly like
    :func:`fit_bigram_model` — every map tracks the REFERENCE
    vocabulary, never the scored corpus — and the tokenized reference
    is persisted across the three collect jobs."""
    from ..session import ensure_min_partitions

    toks = (
        ensure_min_partitions(ref)
        .select(tokens(F.col(text_col)).alias("toks"))
        .persist()
    )
    try:
        uni, bi = _counts_from(toks)
        tri = _trigram_counts(toks)
        u = {r["w"]: r["c"] for r in _collect_model_rows(uni, "unigram")}
        b = {
            f"{r['w1']} {r['w2']}": r["c"]
            for r in _collect_model_rows(bi, "bigram")
        }
        t = {
            f"{r['w1']} {r['w2']} {r['w3']}": r["c"]
            for r in _collect_model_rows(tri, "trigram")
        }
    finally:
        toks.unpersist()
    return u, b, t, len(u), sum(u.values())


def fit_trigram_frames(
    ref: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame, int, int]:
    """The PRODUCTION 3-gram fit: (uni frame, bi frame, tri frame,
    vocab size, total tokens) with the count frames staying
    DISTRIBUTED — the model never round-trips through the driver, so
    this path scales to reference corpora whose trigram table would
    not fit (or belong) in driver memory. Only two scalars collect
    (vocab size + token total, one tiny agg). The dict-based
    :func:`fit_trigram_model` + :func:`trigram_model_frames` pair
    remains for session-cached contract runs, where plain-Python maps
    are what survives safely across queries; this is the path a
    deployment wires."""
    from ..session import ensure_min_partitions

    toks = (
        ensure_min_partitions(ref)
        .select(tokens(F.col(text_col)).alias("toks"))
        .persist()
    )
    try:
        uni, bi = _counts_from(toks)
        tri = _trigram_counts(toks)
        uni = uni.localCheckpoint(eager=True)
        bi = bi.localCheckpoint(eager=True)
        tri = tri.localCheckpoint(eager=True)
        stats = uni.agg(
            F.count(F.lit(1)).alias("v"), F.sum("c").alias("n")
        ).first()
    finally:
        toks.unpersist()
    return uni, bi, tri, int(stats["v"]), int(stats["n"])


def trigram_model_frames(
    spark, uni_map: dict, bi_map: dict, tri_map: dict
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The session-cached dicts of :func:`fit_trigram_model` as three
    JOIN-side frames — (w, c), (w1, w2, c), (w1, w2, w3, c). The
    3-gram model does NOT ride a broadcast map row like the bigram's:
    Spark evaluates map ``element_at`` by LINEARLY SCANNING the map's
    backing array, so a reference-scale trigram table (tens of
    thousands of entries at sf0.1, millions for a real reference
    corpus) costs O(|model|) per lookup inside the row — measured
    25 s vs the bigram's 1.6 s at sf0.1, entirely the scan. Broadcast
    HASH joins over exploded transitions are the engine's
    O(1)-lookup shape. Note the dict round-trip through the driver is
    the SESSION-CACHE convenience (bounded by the reference
    vocabulary, same argument as the bigram maps); a deployment whose
    model outgrows that uses :func:`fit_trigram_frames`, which keeps
    the frames distributed end-to-end."""
    uni = spark.createDataFrame(
        list(uni_map.items()), "w string, c bigint"
    )
    bi = spark.createDataFrame(
        [(k.split(" ")[0], k.split(" ")[1], v) for k, v in bi_map.items()],
        "w1 string, w2 string, c bigint",
    )
    tri = spark.createDataFrame(
        [tuple(k.split(" ")) + (v,) for k, v in tri_map.items()],
        "w1 string, w2 string, w3 string, c bigint",
    )
    return uni, bi, tri


# Absolute discount for the interpolated Kneser-Ney bigram model — a
# FIXED closed-formula constant (KenLM estimates D from the count-of-
# counts; a fixed 0.75 is the textbook default and keeps every model
# constant stateable in SQL — the JM-weights argument, restated).
KN_DISCOUNT = 0.75


def fit_kn_bigram_model(
    ref: DataFrame, text_col: str = "text"
) -> tuple[dict, dict, dict, dict, int, int]:
    """Fit the interpolated Kneser-Ney bigram model's count tables:
    (hist map — c(w1 ·) = Σ_w2 c(w1 w2), the HISTORY count; bi map
    keyed 'w1 w2'; follower map N1+(w1 ·) — distinct continuations
    per history; predecessor map N1+(· w2) — distinct histories per
    word; B = N1+(· ·) total distinct bigrams; V = vocabulary size).
    Chen & Goodman (1998) §2.7: KN replaces the lower-order raw
    frequency with the CONTINUATION count — how many distinct
    contexts a word follows — which is the smoothing KenLM ships.

    The interpolation denominator is the HISTORY count, not the raw
    unigram count — the distinction matters beyond normalization: a
    word that appears only document-finally has c(w) > 0 but zero
    bigram mass as a history, and a unigram denominator would assign
    its transitions probability EXACTLY ZERO (ln undefined — caught
    by the sf0.01 oracle refusing ln(0) in round 13). With history
    counts, c(w1 ·) > 0 implies N1+(w1 ·) ≥ 1, so λ > 0 and every
    transition has positive mass; c(w1 ·) = 0 backs off to the
    continuation distribution. Every table derives from the same two
    explode+hash-agg passes as :func:`fit_bigram_model`, bounded by
    the REFERENCE corpus exactly like the other fits."""
    from ..session import ensure_min_partitions

    toks = (
        ensure_min_partitions(ref)
        .select(tokens(F.col(text_col)).alias("toks"))
        .persist()
    )
    try:
        uni, bi = _counts_from(toks)
        n_vocab = uni.count()
        bi_rows = bi.collect()
    finally:
        toks.unpersist()
    b = {f"{r['w1']} {r['w2']}": r["c"] for r in bi_rows}
    hist: dict = {}
    foll: dict = {}
    pred: dict = {}
    for r in bi_rows:  # distinct (w1, w2) rows
        hist[r["w1"]] = hist.get(r["w1"], 0) + r["c"]
        foll[r["w1"]] = foll.get(r["w1"], 0) + 1
        pred[r["w2"]] = pred.get(r["w2"], 0) + 1
    return hist, b, foll, pred, len(bi_rows), int(n_vocab)


def kn_model_row(
    spark, hist_map: dict, bi_map: dict, foll_map: dict, pred_map: dict
) -> DataFrame:
    """The KN count tables as ONE broadcast row of four maps (the
    bigram model_row convention — at bigram-model scale the map
    lookups stay cheap; a trigram-scale KN model would take the
    exploded-join path like score_perplexity_3gram)."""
    return spark.createDataFrame(
        [(hist_map, bi_map, foll_map, pred_map)],
        "hist map<string,bigint>, bi map<string,bigint>, "
        "foll map<string,bigint>, pred map<string,bigint>",
    )


def _kn_transition_score(
    w1: Column, w2: Column, n_bigrams: int, vocab_size: int
) -> Column:
    """struct(lp, oov) per transition under interpolated Kneser-Ney —
    THE smoothing expression, one site (restated verbatim by the
    oracle), operation order pinned left-associatively:

        Pc(w2)    = (N1+(· w2) + 1) / (B + V)      [Laplace-floored
                     continuation: P > 0 even for OOV w2, ln defined]
        P(w2|w1)  = max(c(w1 w2) − D, 0)/c(w1 ·)
                  + ((D · N1+(w1 ·))/c(w1 ·)) · Pc(w2)  if c(w1 ·) > 0
                  = Pc(w2)                               otherwise

    with c(w1 ·) the HISTORY count (see :func:`fit_kn_bigram_model` —
    a unigram denominator would zero out document-final-only
    histories; with history counts c(w1 ·) > 0 forces N1+(w1 ·) ≥ 1,
    so P > 0 always and ln stays defined). ``oov`` counts transitions
    whose BIGRAM is unseen, matching the other scorers' diagnostic."""
    key = F.concat_ws(" ", w1, w2)
    cb = F.coalesce(F.try_element_at("bi", key), F.lit(0)).cast("double")
    cu = F.coalesce(F.try_element_at("hist", w1), F.lit(0)).cast("double")
    f1 = F.coalesce(F.try_element_at("foll", w1), F.lit(0)).cast("double")
    p2 = F.coalesce(F.try_element_at("pred", w2), F.lit(0)).cast("double")
    pc = (p2 + 1) / F.lit(float(n_bigrams + vocab_size))
    d = F.lit(KN_DISCOUNT)
    interp = (
        F.greatest(cb - d, F.lit(0.0)) / cu + ((d * f1) / cu) * pc
    )
    p = F.when(cu > 0, interp).otherwise(pc)
    lp = F.round(F.log(p), LOG_ROUND)
    return F.struct(lp.alias("lp"), (cb == 0).cast("int").alias("oov"))


def score_perplexity_kn(
    docs: DataFrame,
    model: DataFrame,
    n_bigrams: int,
    vocab_size: int,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document ln-perplexity under the interpolated Kneser-Ney
    bigram reference model, with the keep verdict: (id, n_trans,
    n_oov, ppl, kept) — the same output contract, execution shape
    (one broadcast attach + the same stacked widened projections, no
    shuffle), and round-before-fold discipline as
    :func:`score_perplexity` (including the r17 materialize-scored-
    once split — the KN transition tree is even wider, four map
    lookups per transition); only the smoothing expression differs
    (see :func:`_kn_transition_score`)."""
    from ..session import ensure_min_partitions

    toks = tokens(F.col(text_col))
    d = ensure_min_partitions(docs).select(
        F.col(id_col), toks.alias("toks")
    ).filter(F.size("toks") >= 2)
    j = d.crossJoin(F.broadcast(model))
    scored = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: _kn_transition_score(
            F.element_at("toks", i),
            F.element_at("toks", i + 1),
            n_bigrams,
            vocab_size,
        ),
    )
    mid = j.select(
        F.col(id_col),
        (F.size("toks") - 1).cast("int").alias("n_trans"),
        scored.alias("_scored"),
    )
    s = F.aggregate(
        F.col("_scored"), F.lit(0.0), lambda a, t: a + t.getField("lp")
    )
    ppl = F.round(-s / F.col("n_trans"), PPL_ROUND)
    return mid.select(
        F.col(id_col),
        F.col("n_trans"),
        F.aggregate(
            F.col("_scored"), F.lit(0), lambda a, t: a + t.getField("oov")
        )
        .cast("int")
        .alias("n_oov"),
        ppl.alias("ppl"),
        (ppl <= F.lit(threshold)).alias("kept"),
    )


def _transition_score(w1: Column, w2: Column, vocab_size: int) -> Column:
    """struct(lp, oov) per transition: lp = round(ln((bi + 1) /
    (uni_w1 + V)), 12) against the broadcast model maps — THE
    smoothing expression, one site (restated verbatim by the oracle)
    — and oov = the bigram lookup missing. One struct so the bi-map
    lookup runs ONCE per transition: Catalyst does not eliminate
    common subexpressions across separate lambda bodies (r11 review;
    the dedup.py precedent)."""
    cb = F.coalesce(
        F.try_element_at("bi", F.concat_ws(" ", w1, w2)), F.lit(0)
    )
    cu = F.coalesce(F.try_element_at("uni", w1), F.lit(0))
    lp = F.round(
        F.log((cb + 1).cast("double") / (cu + F.lit(vocab_size))),
        LOG_ROUND,
    )
    return F.struct(
        lp.alias("lp"), (cb == 0).cast("int").alias("oov")
    )


def _interpolated3(
    ct: Column, cb12: Column, cb23: Column, cu2: Column, cu3: Column,
    vocab_size: int, n_tokens: int,
) -> Column:
    """The interpolated-backoff log-probability — THE smoothing
    expression, one site (restated verbatim by the oracle):

        P(w3 | w1 w2) = L3 * c(w1w2w3)/c(w1w2)   [0 if c(w1w2) = 0]
                      + L2 * c(w2w3)/c(w2)        [0 if c(w2)   = 0]
                      + L1 * (c(w3)+1)/(N+V)      [Laplace floor > 0]

    Operation order is pinned left-associatively on BOTH sides
    ((L*num)/den per term; (t3+t2)+t1 for the mixture) so the one
    transcendental — ln, rounded to 12 digits — is the only place
    cross-engine variance can enter."""
    t3 = F.when(cb12 > 0, (F.lit(JM_L3) * ct) / cb12).otherwise(F.lit(0.0))
    t2 = F.when(cu2 > 0, (F.lit(JM_L2) * cb23) / cu2).otherwise(F.lit(0.0))
    t1 = (F.lit(JM_L1) * (cu3 + 1)) / F.lit(n_tokens + vocab_size)
    return F.round(F.log((t3 + t2) + t1), LOG_ROUND)


def score_perplexity_3gram(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    tri: DataFrame,
    vocab_size: int,
    n_tokens: int,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document ln-perplexity under the interpolated 3-gram
    reference model (the KenLM-shaped depth CCNet actually runs,
    reduced to a closed formula an oracle can restate), with the keep
    verdict: (id, n_trans, n_oov, ppl, kept), one row per document
    with at least one trigram transition. ``oov`` counts transitions
    whose TRIGRAM is unseen (model coverage at the full order).

    Execution shape — deliberately NOT the bigram scorer's
    map-on-a-broadcast-row: a trigram table is orders of magnitude
    larger than a bigram's, and Spark's map ``element_at`` linearly
    scans the map per lookup (measured 25 s vs 1.6 s at sf0.1 — the
    scan, not the math). Instead transitions are exploded to rows and
    the counts attach via five BROADCAST HASH joins (:func:`
    trigram_model_frames` — O(1) lookups, model size bounded by the
    reference corpus), then one per-document aggregation restores the
    position-ordered left-assoc fold by sorting the collected
    (position, lp) pairs — bounded by the doc's own length, the same
    in-group-sort shape as span_dedup's rebuild. Costs one shuffle
    (the regroup) that the bigram path avoids; at reference-model
    scale the hash lookups repay it thousands of times over.

    Skew posture (tools/lm_skew_probe.py, VERDICT r12 #6): a dominant
    TRIGRAM concentrates nothing — the count joins are broadcast,
    map-side. The keyed stage is the per-document regroup, whose
    group size is the document's own transition count, so the hostile
    shape is one DOCUMENT holding half the corpus: its transitions
    serialize into one task's group build. Measured with the
    equal-work probe (identical global token stream, only doc
    boundaries move; median-of-3): skewed/uniform wall-clock
    2.6-8.3x across runs at 2M tokens (hot arm 3.1-9.4 s vs uniform
    1.1-1.2 s — the lone hot task is hypersensitive to host
    contention while 31 cores idle), 3.6x at 6M. The bound is
    SEMANTIC — the per-document fold needs the whole document in one
    group, in position order — and the production mitigation is
    upstream: cap document length before scoring (doc_chunks;
    CCNet itself scores paragraph-level units, Wenzek et al. §3.3),
    after which group size is the chunk bound, not the document.

    ``broadcast_model`` (r12 advisory): True pins the five model
    joins as broadcast hash joins — right for any model that fits an
    executor (it collects each count frame to the driver and ships it
    whole). When the reference model outgrows driver memory — the
    very case :func:`fit_trigram_frames` keeps the fit distributed
    for — pass False: no hint is planted, the joins stay plain
    equi-joins, and the planner (AQE included) picks broadcast only
    when the runtime sizes actually allow it, shuffle-hash/sort-merge
    otherwise. Scoring semantics are identical either way; only the
    physical join strategy moves."""
    from ..session import ensure_min_partitions

    hint = F.broadcast if broadcast_model else (lambda d: d)

    toks = tokens(F.col(text_col))
    d = ensure_min_partitions(docs).select(
        F.col(id_col), toks.alias("toks")
    ).filter(F.size("toks") >= 3)
    pos = F.posexplode(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 2),
            lambda i: F.struct(
                F.element_at("toks", i).alias("w1"),
                F.element_at("toks", i + 1).alias("w2"),
                F.element_at("toks", i + 2).alias("w3"),
            ),
        )
    )
    trans = d.select(F.col(id_col), pos.alias("i", "t")).select(
        id_col, "i", "t.w1", "t.w2", "t.w3"
    )
    j = (
        trans.join(
            hint(tri.withColumnRenamed("c", "_ct")),
            ["w1", "w2", "w3"],
            "left",
        )
        .join(
            hint(
                bi.select(
                    F.col("w1"), F.col("w2"), F.col("c").alias("_cb12")
                )
            ),
            ["w1", "w2"],
            "left",
        )
        .join(
            hint(
                bi.select(
                    F.col("w1").alias("w2"),
                    F.col("w2").alias("w3"),
                    F.col("c").alias("_cb23"),
                )
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            hint(
                uni.select(F.col("w").alias("w2"), F.col("c").alias("_cu2"))
            ),
            "w2",
            "left",
        )
        .join(
            hint(
                uni.select(F.col("w").alias("w3"), F.col("c").alias("_cu3"))
            ),
            "w3",
            "left",
        )
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0))  # noqa: E731
    scored = j.select(
        id_col,
        "i",
        _interpolated3(
            z("_ct"), z("_cb12"), z("_cb23"), z("_cu2"), z("_cu3"),
            vocab_size, n_tokens,
        ).alias("lp"),
        F.col("_ct").isNull().cast("int").alias("oov"),
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_trans"),
        F.sum("oov").cast("int").alias("n_oov"),
        F.array_sort(F.collect_list(F.struct("i", "lp"))).alias("_lps"),
    )
    s = F.aggregate(
        "_lps", F.lit(0.0), lambda a, t: a + t.getField("lp")
    )
    ppl = F.round(-s / F.col("n_trans"), PPL_ROUND)
    return agg.select(
        id_col,
        "n_trans",
        "n_oov",
        ppl.alias("ppl"),
        (ppl <= F.lit(threshold)).alias("kept"),
    )


# Chunked-scoring unit: the token window each chunk scores over.
# CCNet's own scoring unit is the paragraph (~100 words); 32 keeps the
# synthetic contract docs multi-chunk so the recombine arithmetic is
# exercised, and at production scale it is the knob that BOUNDS the
# per-group regroup below.
CHUNK_SCORE_WINDOW = 32


def score_perplexity_3gram_chunked(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    tri: DataFrame,
    vocab_size: int,
    n_tokens: int,
    threshold: float,
    window: int = CHUNK_SCORE_WINDOW,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """The 3-gram LM filter with CHUNKED scoring — the production
    answer to the per-document regroup bound (VERDICT r13 item 4):
    :func:`score_perplexity_3gram`'s one semantic skew exposure is
    that a document's fold needs the WHOLE document in one group
    (measured 2.6-8.3x hostile in tools/lm_skew_probe.py when one doc
    holds half the corpus). CCNet itself never scores whole documents
    — it scores paragraph units (Wenzek et al. §3.3) — so this
    operator cuts each document into non-overlapping ``window``-token
    chunks FIRST, scores each chunk with the UNCHANGED certified
    scorer (the regroup key becomes the chunk: group size <= window-2
    by construction, whatever the document length), and recombines
    per document from chunk AGGREGATES (that group is n/window rows,
    not n).

    Semantics (pinned for the oracle): transitions never cross a
    chunk boundary (the documented cost of unit-wise scoring — 2
    trigrams lost per boundary); a chunk scores only if it has >= 3
    tokens; the document score is the transition-count-weighted mean
    of the ROUNDED chunk scores, folded in chunk order:
    ppl_doc = round(sum_c(ppl_c * n_trans_c) / sum_c(n_trans_c),
    PPL_ROUND), left-associatively over chunk_idx. Output:
    (id, n_chunks, n_trans, n_oov, ppl, kept), one row per document
    with at least one scored chunk.

    (doc_id, chunk_idx) rides the scorer as ONE packed bigint
    (quality._pack_id_pos — same guarded injective pack as
    span_dedup), so the scorer's id column stays scalar; 2^24 chunks
    per doc = 2^24 * 32 ≈ 5.4e8 tokens at window 32 before the guard
    trips."""
    from .quality import SPAN_POS_BITS, _pack_id_pos

    if window < 3:
        # every chunk would hold < 3 tokens and the inner scorer would
        # drop ALL of them — a silent 100%-filter, the opposite of the
        # loud-guard convention (_pack_id_pos, _collect_model_rows)
        raise ValueError(
            f"score_perplexity_3gram_chunked: window={window} < 3 "
            "cannot hold a trigram transition — every document would "
            "silently vanish"
        )
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n")
    ).filter(F.col("_n") >= 3)
    n_chunks = F.ceil(F.col("_n") / window).cast("int")
    chunks = base.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda c: F.concat_ws(
                    " ", F.slice("_toks", c * window + 1, window)
                ),
            )
        ).alias("chunk_idx", "chunk_text"),
    ).select(
        _pack_id_pos(id_col, "chunk_idx", "score_perplexity_3gram_chunked")
        .alias("chunk_uid"),
        "chunk_text",
    )
    per_chunk = score_perplexity_3gram(
        chunks,
        uni,
        bi,
        tri,
        vocab_size,
        n_tokens,
        threshold,
        text_col="chunk_text",
        id_col="chunk_uid",
        broadcast_model=broadcast_model,
    )
    unpacked = per_chunk.select(
        F.shiftright("chunk_uid", SPAN_POS_BITS).alias(id_col),
        F.col("chunk_uid")
        .bitwiseAND(F.lit((1 << SPAN_POS_BITS) - 1))
        .cast("int")
        .alias("chunk_idx"),
        "n_trans",
        "n_oov",
        "ppl",
    )
    agg = unpacked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_chunks"),
        F.sum("n_trans").cast("int").alias("n_trans"),
        F.sum("n_oov").cast("int").alias("n_oov"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("chunk_idx"),
                    (F.col("ppl") * F.col("n_trans")).alias("w"),
                )
            )
        ).alias("_ws"),
    )
    num = F.aggregate("_ws", F.lit(0.0), lambda a, t: a + t.getField("w"))
    ppl = F.round(num / F.col("n_trans"), PPL_ROUND)
    return agg.select(
        id_col,
        "n_chunks",
        "n_trans",
        "n_oov",
        ppl.alias("ppl"),
        (ppl <= F.lit(threshold)).alias("kept"),
    )


def score_perplexity(
    docs: DataFrame,
    model: DataFrame,
    vocab_size: int,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document ln-perplexity under the reference bigram model,
    with the keep verdict: (id, n_trans, n_oov, ppl, kept), one row
    per document with at least one transition (singleton/empty docs
    carry no bigram evidence and are out of the filter's scope).
    ``n_oov`` counts transitions unseen in the reference — the
    model-coverage diagnostic a curation team reads next to the
    score. One broadcast attach + two stacked projections; no
    shuffle. The scan is widened first: the per-row expression (a
    token-pair transform with two map lookups per transition) is
    exactly the expression-heavy shape that serializes on a
    single-file local scan (measured 23.0 s -> 3.2 s at sf0.1 on
    local[32]).

    The scored-transitions array is materialized ONCE in its own
    projection and the aggregates/verdict read the named column (r17,
    guide §1/§4): inlining ``scored`` into all three output
    expressions tripled the higher-order expression tree, and the
    JVM's first execution of that tree cost 10-22 s (fresh-JVM A/B;
    ~3.7 s with the split, steady state 1.9 -> 1.4 s). CollapseProject
    keeps the stacked selects apart because the shared column is
    non-cheap and multiply referenced — verified in the plan dump
    (two Project nodes, the transform evaluated once)."""
    from ..session import ensure_min_partitions

    toks = tokens(F.col(text_col))
    d = ensure_min_partitions(docs).select(
        F.col(id_col), toks.alias("toks")
    ).filter(F.size("toks") >= 2)
    j = d.crossJoin(F.broadcast(model))
    scored = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: _transition_score(
            F.element_at("toks", i),
            F.element_at("toks", i + 1),
            vocab_size,
        ),
    )
    mid = j.select(
        F.col(id_col),
        (F.size("toks") - 1).cast("int").alias("n_trans"),
        scored.alias("_scored"),
    )
    s = F.aggregate(
        F.col("_scored"), F.lit(0.0), lambda a, t: a + t.getField("lp")
    )
    ppl = F.round(-s / F.col("n_trans"), PPL_ROUND)
    return mid.select(
        F.col(id_col),
        F.col("n_trans"),
        F.aggregate(
            F.col("_scored"), F.lit(0), lambda a, t: a + t.getField("oov")
        )
        .cast("int")
        .alias("n_oov"),
        ppl.alias("ppl"),
        (ppl <= F.lit(threshold)).alias("kept"),
    )


def fit_bigram_frames_per_key(
    ref: DataFrame, key_col: str = "lang", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Per-KEY bigram fit — CCNet proper fits ONE reference model per
    LANGUAGE (Wenzek et al. §4.3: a Wikipedia LM per language scores
    that language's pages; a shared model would punish every non-
    majority language as "unlike the reference").

    Returns lazy distributed frames (uni (key, w, c), bi (key, w1,
    w2, c), vocab (key, vs)) — the per-key twin of
    :func:`fit_trigram_frames`'s posture: the union of per-language
    vocabularies can outgrow one driver dict, but each count row is
    just another aggregation key, so the fit stays one explode +
    hash-agg pass with the key column riding along."""
    from ..session import ensure_min_partitions

    toked = ensure_min_partitions(ref).select(
        F.col(key_col), tokens(F.col(text_col)).alias("toks")
    )
    uni, bi = _counts_from(toked, key_cols=(key_col,))
    # vocabulary size per key = distinct unigrams = uni's row count
    vocab = uni.groupBy(key_col).agg(F.count(F.lit(1)).alias("vs"))
    return uni, bi, vocab


def score_perplexity_per_key(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    vocab: DataFrame,
    threshold: float,
    key_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document ln-perplexity under the document's OWN key's
    (language's) reference model, Laplace smoothing and rounding
    identical to :func:`score_perplexity`. Output: (id, key, n_trans,
    n_oov, ppl, kept), one row per document with >= 1 transition
    WHOSE KEY HAS A MODEL (no model, no score — an inner join on
    ``vocab``; scoring an unmodeled language against some other
    language's model would be a silent wrong answer, not a default).

    Execution shape: the 3-gram scorer's explode + broadcast-hash-
    join + position-ordered regroup (the map-lookup linear-scan trap
    measured there applies to any large model table), with the key
    column added to every join — each language's counts only ever
    meet that language's transitions.

    ``broadcast_model`` follows its 3-gram sibling's contract: True
    pins broadcast hash joins (right while the UNION of per-language
    models fits an executor); when that union is the thing that
    outgrows the driver — the very case the distributed per-key fit
    exists for — pass False and the joins stay plain equi-joins for
    the planner (AQE) to size. Identical results either way."""
    from ..session import ensure_min_partitions

    hint = F.broadcast if broadcast_model else (lambda d: d)

    toks = tokens(F.col(text_col))
    d = (
        ensure_min_partitions(docs)
        .select(F.col(id_col), F.col(key_col), toks.alias("toks"))
        .filter(F.size("toks") >= 2)
    )
    pos = F.posexplode(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.struct(
                F.element_at("toks", i).alias("w1"),
                F.element_at("toks", i + 1).alias("w2"),
            ),
        )
    )
    trans = d.select(F.col(id_col), F.col(key_col), pos.alias("i", "t")).select(
        id_col, key_col, "i", "t.w1", "t.w2"
    )
    j = (
        trans.join(
            hint(bi.withColumnRenamed("c", "_cb")),
            [key_col, "w1", "w2"],
            "left",
        )
        .join(
            hint(
                uni.select(
                    key_col, F.col("w").alias("w1"), F.col("c").alias("_cu")
                )
            ),
            [key_col, "w1"],
            "left",
        )
        .join(hint(vocab), key_col)  # inner: no model, no score
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0))  # noqa: E731
    lp = F.round(
        F.log((z("_cb") + F.lit(1)) * F.lit(1.0) / (z("_cu") + F.col("vs"))),
        LOG_ROUND,
    )
    scored = j.select(
        id_col,
        key_col,
        "i",
        lp.alias("lp"),
        F.col("_cb").isNull().cast("int").alias("oov"),
    )
    agg = scored.groupBy(id_col, key_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_trans"),
        F.sum("oov").cast("int").alias("n_oov"),
        F.array_sort(F.collect_list(F.struct("i", "lp"))).alias("_lps"),
    )
    s = F.aggregate("_lps", F.lit(0.0), lambda a, t: a + t.getField("lp"))
    ppl = F.round(-s / F.col("n_trans"), PPL_ROUND)
    return agg.select(
        id_col,
        key_col,
        "n_trans",
        "n_oov",
        ppl.alias("ppl"),
        (ppl <= F.lit(threshold)).alias("kept"),
    )
