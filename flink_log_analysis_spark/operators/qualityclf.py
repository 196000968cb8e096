"""Model-based quality classifier — the GPT-3/LLaMA "reference-like
page" filter (Brown et al. 2020, Appendix A; Touvron et al. 2023):
train a linear classifier to separate reference-quality pages from
the raw pool, score every pool document, keep by threshold. GPT-3
itself used "Spark's standard tokenizer and HashingTF" for exactly
this — the feature space here IS that recipe (the DSIR hashed
unigram+bigram space, :mod:`.dsir`, 10k buckets), so the classifier
shares its featurization with the importance-resampling tier and the
two selection methods are directly comparable on one corpus.

The fit is full-batch logistic regression by gradient descent — and
it is EXACT, in the sense that every number it produces is an
integer deterministically derived from the corpus:

- **Fixed-point arithmetic end-to-end.** Weights and per-document
  residuals live at scale 10^:data:`QC_SCALE` as BIGINTs. The one
  transcendental per step (the sigmoid) is rounded straight into the
  fixed-point grid — ``CAST(ROUND((sigmoid - y) * 10^s, 0) AS
  BIGINT)`` — so every distributed SUM (the per-document dot product
  AND the per-feature gradient) adds exact integers: associative,
  partition-order-independent, bit-identical on any cluster and in
  DuckDB. No float fold-ordering discipline is needed anywhere.
- **The oracle replays the WHOLE FIT**, not just the scoring: each
  gradient step is one CTE block (score -> residual -> gradient ->
  weight update), chained :data:`QC_STEPS` times — an independent
  relational derivation of the final weight vector, feature by
  feature, value-exact.
- **Distributed shape.** Featurization is the DSIR projection (one
  explode+hash pass, map-side partials); each step is one broadcast
  join (the <= n_buckets weight table) + two hash-aggs; the only
  collects are the bounded 10k-row gradient/weight tables. At 100 TB
  the per-step cost is two scans of the (doc, feat, cnt) frame,
  which the fit checkpoints once.

Overflow envelope (documented, same style as graph._seal's 2^42
bound): a per-feature gradient accumulates |residual_fp| * cnt <=
10^QC_SCALE * cnt per document-feature; BIGINT holds ~9.2e18, so
with QC_SCALE = 6 the sum stays exact below ~9e12 total occurrences
of one hashed feature — beyond that, shard the feature space wider
(raise n_buckets) or accumulate per-partition subtotals first.

Reference behavioral parity: the reference engine
(/root/reference/src/main/java/com/jmx/analysis/LogAnalysis.java)
has no classifier surface — engine-extension tier (SURVEY.md §2.D).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dsir import N_BUCKETS, feature_counts

QC_STEPS = 4      # full-batch gradient steps (each SQL-replayable)
QC_LR = 0.5       # learning rate (literal in both engines)
QC_SCALE = 6      # fixed-point decimal digits for weights/residuals
QC_ROUND = 6      # final score rounding (the repo W_ROUND convention)
# Keep-threshold on the sigmoid score: documents at least this
# reference-like survive. Corpus-calibrated the way the LM filter's
# thresholds are (LM_PPL_THRESHOLD sits just above ITS median): the
# 4-step fit is deliberately early-stopped (more steps let the 10%
# class prior swamp the per-gram signal — measured: 8 steps drive
# every score to ~0), so absolute calibration is low and the
# boundary sits just above the sf0.01 median score (0.00554;
# reference-slice median 0.0144 vs pool 0.0050, ~3x separation) —
# the verdict splits the corpus non-trivially at every scale.
# GPT-3's Pareto noise rule is a sampling refinement on top of the
# same score.
QC_THRESHOLD = 0.0056


def _fp(x: Column) -> Column:
    """Round a double straight into the fixed-point integer grid."""
    return F.round(x * F.lit(float(10 ** QC_SCALE)), 0).cast("bigint")


def _sigmoid(s: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-s))


# The intercept rides the feature table as the reserved id -1 (the
# md5 bucket space is non-negative, so it can never collide): one
# (feat=-1, cnt=1) row per scorable document, giving the model a
# proper bias term — without it the 10%-positive class prior leaks
# into every feature weight and the sigmoid is uncalibrated.
BIAS_FEAT = -1


def _with_bias(fc: DataFrame, id_col: str, extra: list[str]) -> DataFrame:
    return fc.unionByName(
        fc.select(id_col, *extra)
        .distinct()
        .withColumns(
            {"feat": F.lit(BIAS_FEAT), "cnt": F.lit(1).cast("long")}
        )
    )


def labeled_feature_counts(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(id, y, feat, cnt): the DSIR featurization with the binary
    label riding along, plus the intercept row per document.
    Zero-gram documents carry no rows — they are unscorable, the
    same exclusion DSIR and the LM filter apply."""
    from ..session import ensure_min_partitions

    base = ensure_min_partitions(docs).select(
        F.col(id_col),
        F.col(text_col),
        target_pred.cast("int").alias("y"),
    )
    fc = feature_counts(base, text_col, id_col, n_buckets)
    return _with_bias(fc.join(base.select(id_col, "y"), id_col), id_col, ["y"])


def fit_logreg(
    fc: DataFrame,
    id_col: str = "doc_id",
    n_steps: int = QC_STEPS,
    lr: float = QC_LR,
) -> list[tuple[int, int]]:
    """Full-batch logistic regression over (id, y, feat, cnt) rows.

    Returns the fitted weight table [(feat, w_fp)], one row per
    feature observed in the corpus, weights at scale 10^QC_SCALE —
    bounded at ``n_buckets`` rows by construction (the HashingTF
    argument). Each step:

        s_fp(d)  = SUM_f cnt * w_fp[f]            (exact BIGINT)
        r_fp(d)  = ROUND((sigmoid(s_fp/10^s) - y) * 10^s)
        g(f)     = SUM_d r_fp(d) * cnt            (exact BIGINT)
        w_fp'[f] = w_fp[f] - ROUND(lr * g / n_docs)

    with n_docs = documents holding >= 1 gram. Every SUM adds exact
    integers; the two ROUNDs are the engine-certified ROUND(x, 0)
    both engines share — the oracle replays the chain CTE-for-CTE.

    Scale envelope (``tools/scale_probe.py
    quality_classifier_fit_build``, cache-bypassing): 4.78x wall at
    10x rows (sf0.01 replicas) — sublinear; each of the 4 steps is
    one broadcast join + two hash-aggs over the checkpointed feature
    frame, so cost is per-step scans amortized against fixed fit
    overhead. Scoring separately probed at 1.3x (r15).
    """
    spark = fc.sparkSession
    # The featurized frame feeds 2 aggregation passes per step —
    # cut the plan once (blocks reclaimed by release_checkpoints).
    fc = fc.localCheckpoint(eager=True)
    n_docs = fc.select(id_col).distinct().count()
    feats = [r["feat"] for r in fc.select("feat").distinct().collect()]
    w: dict[int, int] = {int(f): 0 for f in feats}
    for _ in range(n_steps):
        wdf = spark.createDataFrame(
            list(w.items()), "feat bigint, w bigint"
        )
        scored = (
            fc.join(F.broadcast(wdf), "feat")
            .groupBy(id_col, "y")
            .agg(F.sum(F.col("cnt") * F.col("w")).alias("s_fp"))
        )
        resid = scored.select(
            id_col,
            _fp(
                _sigmoid(
                    F.col("s_fp").cast("double")
                    / F.lit(float(10 ** QC_SCALE))
                )
                - F.col("y")
            ).alias("r_fp"),
        )
        grad = (
            fc.join(resid, id_col)
            .groupBy("feat")
            .agg(F.sum(F.col("r_fp") * F.col("cnt")).alias("g"))
            .select(
                "feat",
                F.round(
                    F.lit(lr) * F.col("g").cast("double")
                    / F.lit(float(n_docs)),
                    0,
                ).cast("bigint").alias("delta"),
            )
        )
        for r in grad.collect():
            w[int(r["feat"])] -= int(r["delta"])
    return sorted(w.items())


def score_docs(
    docs: DataFrame,
    weights: list[tuple[int, int]],
    threshold: float = QC_THRESHOLD,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Per-document classifier verdict under a fitted weight table:
    (id, n_feats, n_grams, score, kept). The dot product is an exact
    BIGINT sum (no fold-ordering discipline needed); the sigmoid is
    taken once on the exact total and rounded to QC_ROUND. Documents
    without grams are excluded (unscorable), matching the fit."""
    from ..session import ensure_min_partitions

    spark = docs.sparkSession
    wdf = spark.createDataFrame(weights, "feat bigint, w bigint")
    fc = _with_bias(
        feature_counts(
            ensure_min_partitions(docs), text_col, id_col, n_buckets
        ),
        id_col,
        [],
    )
    folded = (
        fc.join(F.broadcast(wdf), "feat", "left")
        .groupBy(id_col)
        .agg(
            # n_feats/n_grams count REAL features; the intercept row
            # is model plumbing, not corpus content
            F.sum(
                F.when(F.col("feat") != BIAS_FEAT, 1).otherwise(0)
            ).cast("int").alias("n_feats"),
            F.sum(
                F.when(F.col("feat") != BIAS_FEAT, F.col("cnt"))
                .otherwise(0)
            ).alias("n_grams"),
            F.sum(F.col("cnt") * F.coalesce(F.col("w"), F.lit(0))).alias(
                "_s_fp"
            ),
        )
    )
    score = F.round(
        _sigmoid(
            F.col("_s_fp").cast("double") / F.lit(float(10 ** QC_SCALE))
        ),
        QC_ROUND,
    )
    return folded.select(
        id_col,
        "n_feats",
        "n_grams",
        score.alias("score"),
        (score >= F.lit(threshold)).alias("kept"),
    )


def model_row(spark, weights: list[tuple[int, int]]) -> DataFrame:
    """1-row broadcastable weight frame (wmap map<bigint,bigint>) —
    the lmfilter.model_row convention: the fitted table rides each
    executor once and scoring becomes a stateless per-row
    projection."""
    ks = [int(k) for k, _ in weights]
    vs = [int(v) for _, v in weights]
    return spark.createDataFrame(
        [(ks, vs)], "wk array<bigint>, wv array<bigint>"
    ).select(F.map_from_arrays("wk", "wv").alias("wmap"))


def score_docs_rowwise(
    docs: DataFrame,
    wrow: DataFrame,
    threshold: float = QC_THRESHOLD,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Row-folded scoring: identical output contract to
    :func:`score_docs`, but the dot product folds INSIDE the row
    (exact BIGINT adds over the hashed gram array against the 1-row
    broadcast weight map) — no groupBy, no state store, so it runs
    unchanged on a Structured Streaming micro-batch in append mode.
    Value-identity with the batch path is algebraic: the batch sums
    cnt*w over distinct features; this sums w per occurrence — the
    same integer total in any order (equality test-pinned).

    COST CAVEAT (measured, r15): Spark's MapType ``element_at`` is a
    LINEAR key scan, so each gram lookup walks the whole weight map —
    ~10k comparisons per gram at the default bucket count (7.6 s warm
    vs ~1.6 s for the broadcast-join form on the sf0.1 stream). Use
    this form only when a map-sized model (hundreds of entries — the
    LM filter's regime) or a strict no-shuffle constraint justifies
    it; the streaming plan row runs :func:`score_docs` inside
    foreachBatch instead."""
    from ..functions.hashing import token_hash
    from .dsir import HASH_SALT, _grams
    from .textstats import tokens

    toked = docs.select(
        F.col(id_col),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_toks"),
    )
    with_g = toked.select(
        id_col,
        F.transform(
            _grams(F.col("_toks")),
            lambda g: token_hash(g, salt=HASH_SALT) % n_buckets,
        ).alias("_h"),
    ).filter(F.size("_h") > 0)
    joined = with_g.crossJoin(F.broadcast(wrow))
    s_fp = F.aggregate(
        F.col("_h"),
        F.coalesce(
            F.element_at(F.col("wmap"), F.lit(BIAS_FEAT)),
            F.lit(0).cast("bigint"),
        ),
        lambda acc, h: acc
        + F.coalesce(
            F.element_at(F.col("wmap"), h), F.lit(0).cast("bigint")
        ),
    )
    score = F.round(
        _sigmoid(s_fp.cast("double") / F.lit(float(10 ** QC_SCALE))),
        QC_ROUND,
    )
    return joined.select(
        id_col,
        F.size(F.array_distinct("_h")).alias("n_feats"),
        F.size("_h").cast("bigint").alias("n_grams"),
        score.alias("score"),
        (score >= F.lit(threshold)).alias("kept"),
    )


# GPT-3's actual keep rule (Brown et al. 2020, Appendix A): a
# document is kept iff  np.random.pareto(alpha) > 1 - score  with
# alpha = 9 — mostly-high-scoring docs survive, but every document
# keeps a heavy-tailed chance, so the filtered corpus is not a hard
# threshold cut (the paper's stated reason: keep some distributional
# breadth). The draw is the deterministic content-hash uniform
# (the Gumbel-top-k convention): pareto = u^(-1/alpha) - 1, which is
# the numpy inverse-CDF with 1-u replaced by the equally-uniform u.
QC_PARETO_ALPHA = 9.0
QC_SELECT_SEED = "qcsel"


def pareto_select(
    scored: DataFrame,
    alpha: float = QC_PARETO_ALPHA,
    seed: int | str = QC_SELECT_SEED,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, score, pareto_draw, kept_sel) — the Pareto-noise keep
    verdict over classifier scores. ``pareto_draw`` rounds to
    QC_ROUND before the comparison (pow is the one transcendental —
    the established ln/exp rounding discipline), and the verdict
    compares rounded-vs-rounded, so the oracle replays it exactly."""
    from .sampling import BUCKETS, sample_bucket

    u = (sample_bucket(F.col(id_col), seed) + F.lit(0.5)) / F.lit(
        float(BUCKETS)
    )
    draw = F.round(
        F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0), QC_ROUND
    )
    return scored.select(
        id_col,
        "score",
        draw.alias("pareto_draw"),
        (draw > (F.lit(1.0) - F.col("score"))).alias("kept_sel"),
    )


def pareto_select_sql(
    scored_cte: str,
    alpha: float = QC_PARETO_ALPHA,
    seed: int | str = QC_SELECT_SEED,
) -> str:
    """DuckDB twin of :func:`pareto_select` over a CTE exposing
    (doc_id, score)."""
    from .sampling import BUCKETS, sample_bucket_sql

    u = f"(({sample_bucket_sql('doc_id', seed)} + 0.5) / {float(BUCKETS)!r})"
    draw = f"ROUND(POWER({u}, {-1.0 / alpha!r}) - 1.0, {QC_ROUND})"
    return f"""
        SELECT doc_id, score,
               {draw} AS pareto_draw,
               {draw} > (1.0 - score) AS kept_sel
        FROM {scored_cte}
    """


# ------------------------------------------------------------ oracle

def fit_sql(
    src: str = "documents",
    label_expr: str = "CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END",
    n_steps: int = QC_STEPS,
    lr: float = QC_LR,
    n_buckets: int = N_BUCKETS,
) -> str:
    """DuckDB CTE chain replaying the fit: returns SQL whose final
    CTE ``w{n_steps}`` holds (feat, w) — the complete fitted weight
    table, derived independently step by step. Callers append their
    own SELECT."""
    from .dsir import feature_occ_sql

    s = 10 ** QC_SCALE
    blocks = [
        f"""occ AS ({feature_occ_sql(src, "doc_id", n_buckets)}),
        fc0 AS (
            SELECT o.doc_id, {label_expr} AS y, o.feat,
                   COUNT(*) AS cnt
            FROM occ o GROUP BY o.doc_id, y, o.feat
        ),
        fc AS (
            SELECT * FROM fc0
            UNION ALL
            SELECT DISTINCT doc_id, y, {BIAS_FEAT} AS feat,
                   CAST(1 AS BIGINT) AS cnt
            FROM fc0
        ),
        nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM fc),
        w0 AS (SELECT DISTINCT feat, CAST(0 AS BIGINT) AS w FROM fc)"""
    ]
    for i in range(1, n_steps + 1):
        p = i - 1
        blocks.append(f"""sc{i} AS (
            SELECT fc.doc_id, fc.y,
                   SUM(fc.cnt * w{p}.w) AS s_fp
            FROM fc JOIN w{p} USING (feat)
            GROUP BY fc.doc_id, fc.y
        ),
        r{i} AS (
            SELECT doc_id,
                   CAST(ROUND((1.0 / (1.0 + exp(-(CAST(s_fp AS DOUBLE)
                        / {float(s)!r}))) - y) * {float(s)!r}, 0)
                        AS BIGINT) AS r_fp
            FROM sc{i}
        ),
        g{i} AS (
            SELECT fc.feat, SUM(r{i}.r_fp * fc.cnt) AS g
            FROM fc JOIN r{i} USING (doc_id)
            GROUP BY fc.feat
        ),
        w{i} AS (
            SELECT w{p}.feat,
                   w{p}.w - CAST(ROUND({lr!r} * CAST(g{i}.g AS DOUBLE)
                        / CAST(nd.n AS DOUBLE), 0) AS BIGINT) AS w
            FROM w{p} JOIN g{i} USING (feat) CROSS JOIN nd
        )""")
    return ",\n        ".join(blocks)


def score_sql(
    weights_cte: str,
    src: str = "documents",
    threshold: float = QC_THRESHOLD,
    n_buckets: int = N_BUCKETS,
) -> str:
    """Scoring block over a (feat, w) CTE: SELECT producing
    (doc_id, n_feats, n_grams, score, kept)."""
    s = 10 ** QC_SCALE
    sig = (
        f"ROUND(1.0 / (1.0 + exp(-(CAST(SUM(fc.cnt"
        f" * COALESCE({weights_cte}.w, 0)) AS DOUBLE)"
        f" / {float(s)!r}))), {QC_ROUND})"
    )
    return f"""
        SELECT fc.doc_id,
               CAST(SUM(CASE WHEN fc.feat <> {BIAS_FEAT} THEN 1
                        ELSE 0 END) AS INTEGER) AS n_feats,
               CAST(SUM(CASE WHEN fc.feat <> {BIAS_FEAT} THEN fc.cnt
                        ELSE 0 END) AS BIGINT) AS n_grams,
               {sig} AS score,
               {sig} >= {threshold!r} AS kept
        FROM fc LEFT JOIN {weights_cte} USING (feat)
        GROUP BY fc.doc_id
    """
