"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, "Data Selection for Language Models via Importance
Resampling").

The published recipe for picking pretraining documents that *look
like* a target corpus without training a model: featurize every
document as a bag of HASHED n-grams (word unigrams + bigrams hashed
into a fixed bucket space), fit two smoothed bag-of-features unigram
models — p over the target (clean/reference) slice and q over the raw
pool — and weight every pool document by its log importance ratio

    log w(x) = sum_f  c_f(x) * ( log p_f  -  log q_f )

then resample WITHOUT replacement by the Gumbel-top-k trick: select
the k largest  log w(x) + g(x)  where g(x) is standard Gumbel noise —
the order-statistics equivalent of sampling documents with
probability proportional to w(x) (the same A-ES idea
:mod:`.sampling` uses for weighted sampling, applied to softmax
weights).

Spark-first shape (this is the part the paper leaves to the reader):

- **Featurization is one pass, no Python.** unigrams ++ bigrams are
  built per-row with ``transform``/``concat_ws``, exploded, hashed
  with the engine-portable md5 bucket (:mod:`..functions.hashing`)
  and hash-aggregated to (doc, feat, cnt) — map-side partials do the
  heavy lifting and the shuffle carries at most
  ``min(doc_feats, n_buckets)`` rows per document.
- **The model is broadcastable BY CONSTRUCTION.** Hashing caps the
  feature space at ``n_buckets`` (paper: 10k), so the fitted
  log-ratio table can never outgrow a broadcast join no matter how
  many exabytes the pool holds — the property that makes DSIR the
  *scalable* selection method (contrast: a vocabulary LM's table
  grows with the reference corpus).
- **Selection is a TakeOrderedAndProject**, never a global sort: the
  Gumbel key is a deterministic content-hash draw, so the sample is
  reproducible across runs, partitionings, and engines — and
  auditable by a DuckDB oracle.

Transcendental discipline (the repo-wide LM-filter convention,
operators/lmfilter.py): every per-feature log-ratio casts its four
integer factors to double (IEEE-exact below 2^53; never 64-bit
wrapping at exabyte gram totals), does one multiply-divide chain
inside ONE ``ln``, and rounds to :data:`LR_ROUND` digits BEFORE any
further arithmetic; per-document sums fold left-associatively in
feature order; final scores round to :data:`W_ROUND`.

Reference behavioral parity: the reference engine
(/root/reference/src/main/java/com/jmx/analysis/LogAnalysis.java) has
no data-selection surface — this module is part of the
engine-extension tier SURVEY.md §2.D tracks for LLM-corpus curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import token_hash, token_hash_sql
from .sampling import BUCKETS as U_BUCKETS
from .sampling import sample_bucket, sample_bucket_sql
from .textstats import tokens

N_BUCKETS = 10_000  # hashed feature space (the paper's 10k)
LR_ROUND = 12       # per-feature ln rounding (lmfilter.LOG_ROUND)
W_ROUND = 6         # per-document score rounding
HASH_SALT = "dsir"  # feature-hash salt (namespaces the md5 space)


def _grams(toks: Column) -> Column:
    """array<string> of word unigrams ++ bigrams ("w1 w2").

    ``toks`` MUST be a bound column (a real attribute), never the
    inline ``tokens(text)`` expression tree: higher-order lambdas are
    interpreted and do NOT share subexpressions, so an inline split
    re-tokenizes the document for EVERY ``element_at`` — O(tokens^2)
    re-splitting per doc (caught by the giant-doc skew probe: one
    200k-token document pinned a core for >15 min; bound-column form
    finishes in seconds). Same discipline as lmfilter._counts_from.
    Catalyst's CollapseProject keeps the tokenizing projection intact
    because the alias is non-cheap and multiply-referenced."""
    bi = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bi)


def feature_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(id, feat, cnt): hashed n-gram occurrence counts per document.

    Hash collisions MERGE here (group after hashing) — that is the
    model, not an approximation of it: DSIR's p and q are defined over
    the hashed space, so the oracle reproduces collisions exactly.
    """
    return (
        occurrence_rows(df, text_col, id_col, n_buckets)
        .groupBy(id_col, "feat")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def log_ratio(cp: Column, cq: Column, tp: Column, tq: Column, b: int) -> Column:
    """Rounded smoothed log importance ratio of one hashed feature.

    = ln( p_f / q_f ) with add-1 smoothing over ``b`` buckets:
      p_f = (cp+1)/(tp+b), q_f = (cq+1)/(tq+b)
    restated as ln( (cp+1)*(tq+b) / ((tp+b)*(cq+1)) ) with each factor
    cast to DOUBLE **before** multiplying. Integer (BIGINT) products
    would silently wrap past 2^63 — at exabyte pool scale the gram
    totals tp/tq run ~1e13 and every product overflows, turning each
    weight into garbage without an error in non-ANSI Spark (and into a
    hard error in DuckDB, so the engines would also diverge). Double
    products are IEEE-exact below 2^53 (every contract-scale input) and
    carry ~1e-16 relative error beyond, which LR_ROUND=12 rounding
    discards; both engines do bit-identical IEEE double multiply, so
    the oracle stays value-exact at every scale.
    """
    num = (cp + F.lit(1)).cast("double") * (tq + F.lit(b)).cast("double")
    den = (tp + F.lit(b)).cast("double") * (cq + F.lit(1)).cast("double")
    return F.round(F.log(num / den), LR_ROUND)


def occurrence_rows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """One row per hashed n-gram occurrence (id, [extras...], feat) —
    THE featurization projection, stated once and consumed by both
    the fit and the scoring paths so they can never hash differently."""
    extras = list(extra_cols or [])
    toked = df.select(
        F.col(id_col), *extras, tokens(F.col(text_col)).alias("_toks")
    )
    occ = toked.select(
        F.col(id_col),
        *extras,
        F.explode(_grams(F.col("_toks"))).alias("gram"),
    )
    return occ.select(
        id_col,
        *extras,
        (token_hash(F.col("gram"), salt=HASH_SALT) % n_buckets).alias(
            "feat"
        ),
    )


def fit_feature_model(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> tuple[list[tuple], int, int]:
    """Fit both hashed-ngram models and collect them.

    Returns ([(feat, cp, cq), ...], tp, tq). The collect is bounded
    BY CONSTRUCTION at ``n_buckets`` rows (the whole point of hashed
    features), so like the LM filter's reference-fit maps this is a
    bounded-model property, not a scale leak — and it lets one fit
    serve many scoring batches without re-aggregating the corpus.
    Totals are summed driver-side from the collected counts (exact
    integer arithmetic, no second pass)."""
    from ..session import ensure_min_partitions

    tagged = ensure_min_partitions(docs).select(
        F.col(id_col), F.col(text_col), target_pred.alias("_t")
    )
    occ = occurrence_rows(tagged, text_col, id_col, n_buckets, ["_t"])
    fit = occ.groupBy("feat").agg(
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("cp"),
        F.sum(F.when(~F.col("_t"), 1).otherwise(0)).alias("cq"),
    )
    rows = [(r["feat"], r["cp"], r["cq"]) for r in fit.collect()]
    tp = sum(r[1] for r in rows)
    tq = sum(r[2] for r in rows)
    return rows, tp, tq


def importance_weights(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    model: tuple[list[tuple], int, int] | None = None,
) -> DataFrame:
    """Per-pool-document DSIR log importance weight.

    Output: (id, n_feats int, n_grams bigint, logw double), one row
    per pool document WITH AT LEAST ONE GRAM (documents failing
    ``target_pred``; DSIR scores the pool against the target, never
    the target slice itself). Empty/whitespace-only documents carry
    no features and are EXCLUDED rather than given logw = 0 — a
    zero-feature doc's "weight" says nothing about target likeness,
    and letting it outrank real (negative-logw) documents in the
    Gumbel resample would select garbage; drop-empty-first is the
    same contract the LM filter applies to <2-token docs. ``logw``
    is the feature-ordered left-associative fold of
    ``cnt * log_ratio(feat)``, rounded to :data:`W_ROUND`.

    Plan shape: ONE bounded fit (featurize+agg, table capped at
    ``n_buckets`` rows, collected once per model — session-cacheable
    across scoring calls) -> featurize the POOL only (widened; the
    single-file trap is measured) -> broadcast hash join to the fit
    rows -> per-doc regroup. Nothing leaves the JVM on the scoring
    path, and no stage re-aggregates the corpus twice.
    """
    from ..session import ensure_min_partitions

    if model is None:
        model = fit_feature_model(
            docs, target_pred, text_col, id_col, n_buckets
        )
    fit_rows, tp, tq = model
    fitdf = docs.sparkSession.createDataFrame(
        fit_rows, "feat bigint, cp bigint, cq bigint"
    )
    # Widen first: a single-file local corpus would otherwise
    # serialize the explode+hash featurization onto one core (the
    # expression-heavy single-scan trap; no-op on a real cluster
    # whose scan already splits).
    pool_docs = ensure_min_partitions(docs.filter(~target_pred)).select(
        F.col(id_col), F.col(text_col)
    )
    pool = feature_counts(pool_docs, text_col, id_col, n_buckets)
    scored = pool.join(F.broadcast(fitdf), "feat", "left").select(
        id_col,
        "feat",
        "cnt",
        (
            F.col("cnt")
            * log_ratio(
                F.coalesce(F.col("cp"), F.lit(0)),
                # pool features always hold cq >= 1 when the model was
                # fit on this corpus, but stay total: a doc scored
                # against a foreign fit may miss the table entirely.
                F.coalesce(F.col("cq"), F.lit(0)),
                F.lit(int(tp)),
                F.lit(int(tq)),
                n_buckets,
            )
        ).alias("contrib"),
    )
    folded = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_feats"),
        F.sum("cnt").alias("n_grams"),
        F.round(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("feat", "contrib"))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ),
            W_ROUND,
        ).alias("logw"),
    )
    return folded


def gumbel_key(id_col: Column, logw: Column, seed: int | str = 0) -> Column:
    """Rounded Gumbel-perturbed selection key: logw + g, g drawn from
    the deterministic content-hash uniform (same portability contract
    as :func:`.sampling.hash_sample`)."""
    u = (sample_bucket(id_col, seed) + F.lit(0.5)) / F.lit(
        float(U_BUCKETS)
    )
    g = F.round(-F.log(-F.log(u)), W_ROUND)
    return F.round(logw + g, W_ROUND)


def gumbel_key_sql(id_expr: str, logw_expr: str, seed: int | str = 0) -> str:
    """DuckDB twin of :func:`gumbel_key`."""
    u = f"(({sample_bucket_sql(id_expr, seed)} + 0.5) / {float(U_BUCKETS)})"
    return (
        f"ROUND({logw_expr} + ROUND(-ln(-ln({u})), {W_ROUND}), {W_ROUND})"
    )


def select_top_k(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    seed: int | str = 0,
) -> DataFrame:
    """Gumbel-top-k resample: the k pool documents with the largest
    perturbed weight (deterministic tie-break on id). orderBy+limit
    compiles to TakeOrderedAndProject — per-partition heaps, no
    global sort, no driver collect."""
    keyed = weights.withColumn(
        "gkey", gumbel_key(F.col(id_col), F.col("logw"), seed)
    )
    return keyed.orderBy(
        F.col("gkey").desc(), F.col(id_col).asc()
    ).limit(k)


def log_ratio_sql(cp: str, cq: str, tp: str, tq: str, b: int) -> str:
    """DuckDB twin of :func:`log_ratio` (same double-first shape —
    factors cast to DOUBLE before multiplying, so neither engine can
    overflow 64-bit integers at large gram totals)."""
    return (
        f"ROUND(ln((CAST({cp} + 1 AS DOUBLE) * CAST({tq} + {b} AS DOUBLE))"
        f" / (CAST({tp} + {b} AS DOUBLE) * CAST({cq} + 1 AS DOUBLE)))"
        f", {LR_ROUND})"
    )


def feature_occ_sql(src: str, id_expr: str, n_buckets: int = N_BUCKETS) -> str:
    """DuckDB twin of the featurize step: one row per hashed n-gram
    occurrence over ``src`` (which must expose ``text``)."""
    toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    return f"""
        SELECT {id_expr} AS doc_id,
               ({token_hash_sql("gram", salt=HASH_SALT)} % {n_buckets})
                   AS feat
        FROM (
            SELECT {id_expr}, unnest(
                toks || CASE WHEN len(toks) >= 2
                    THEN list_transform(
                        generate_series(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i + 1])
                    ELSE [] END) AS gram
            FROM (SELECT {id_expr}, {toks} AS toks FROM {src})
        )
    """
