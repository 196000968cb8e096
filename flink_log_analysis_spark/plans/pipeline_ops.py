"""Contract queries for the pipeline-curation operators: BM25/TF-IDF
relevance, deterministic hash sampling/splits, the bucketed range
join, and the explicit skew-mitigation operators. Every query here is
exactly oracle-checked — the sampling predicates and score formulas
are reproduced in DuckDB from the same md5 bucket scheme and
repr-injected float constants, and the salted operators' oracles are
the *plain* join/GROUP BY formulations: salting is a physical rewrite
whose whole contract is bit-identical logical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, dsir, relevance, sampling, skew, urls
from ..operators.rangejoin import bucketed_range_join
from ..session import read_table
from .analytics import _dec

QUERY_TERMS = ["data", "join", "spark"]

STRATA_FRACTIONS = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.1}
SPLITS = {"train": 0.8, "val": 0.1, "test": 0.05}  # 5% held out entirely
SAMPLE_SEED = 7


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return relevance.bm25(docs, QUERY_TERMS)


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return relevance.tfidf_top_terms(docs, k=3)


def stratified_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing sample: per-lang keep fractions, decided by
    doc_id hash (zh unlisted -> dropped entirely)."""
    docs = read_table(spark, sf_dir, "documents")
    out = sampling.stratified_sample(
        docs, "doc_id", "lang", STRATA_FRACTIONS, seed=SAMPLE_SEED
    )
    return out.select("doc_id", "lang", "source")


MIX_TAU = 2.0


def lang_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-2 language rebalancing: target share per lang
    ∝ sqrt(count), realized as the largest exact-proportion subsample
    with no upsampling — the standard multilingual training-mix
    recipe, fully deterministic via hash-bucket membership."""
    docs = read_table(spark, sf_dir, "documents")
    out = sampling.temperature_resample(
        docs, "doc_id", "lang", tau=MIX_TAU, seed=SAMPLE_SEED
    )
    return out.select("doc_id", "lang", "source")


def train_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable train/val/test assignment by doc_id hash range; rows past
    the split boundaries get a NULL split (held out by design)."""
    docs = read_table(spark, sf_dir, "documents")
    out = sampling.split_assign(docs, "doc_id", SPLITS, seed=SAMPLE_SEED)
    return out.select("doc_id", "split")


WEIGHTED_SAMPLE_N = 200


def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted selection primitive: Efraimidis-Spirakis A-ES
    sample of 200 docs with probability proportional to length
    (n_chars) — deterministic, partitioning/engine-independent, and
    selected via TakeOrderedAndProject (never a global sort)."""
    docs = read_table(spark, sf_dir, "documents")
    out = sampling.weighted_sample(
        docs,
        "doc_id",
        F.greatest(F.col("n_chars"), F.lit(1)).cast("double"),
        n=WEIGHTED_SAMPLE_N,
        seed=SAMPLE_SEED,
    )
    return out.select("doc_id", "lang", "n_chars", "es_key")


def training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle + round-robin sharding of the
    corpus: exact global position under the md5(seed:id) pseudorandom
    order via the distributed rank (partitionless mode), reproducible
    across runs/partitionings/engines."""
    docs = read_table(spark, sf_dir, "documents")
    return sampling.training_order_shuffle(docs, seed=SAMPLE_SEED)


# --- DSIR importance resampling (Xie et al. 2023) ------------------
#
# Target slice: every 10th document plays the clean reference (the
# LM-filter convention, plans/llm_quality.py) — DSIR fits p on it,
# q on the raw pool (the rest), and scores/selects POOL docs only.
DSIR_TARGET_MOD = 10
DSIR_K = 100
DSIR_SEED = 11

# One DSIR fit per corpus per session (the _LM_MODELS convention,
# plans/llm_quality.py): a production selector fits its hashed-ngram
# models once and scores many batches; the collected table is capped
# at dsir.N_BUCKETS rows BY CONSTRUCTION, so caching it is a
# bounded-model property, not a scale leak.
_DSIR_MODELS: dict[str, tuple[list, int, int]] = {}


def _dsir_model(spark: SparkSession, sf_dir: str) -> tuple[list, int, int]:
    m = _DSIR_MODELS.get(sf_dir)
    if m is None:
        docs = read_table(spark, sf_dir, "documents")
        m = dsir.fit_feature_model(
            docs, F.col("doc_id") % DSIR_TARGET_MOD == 0
        )
        _DSIR_MODELS[sf_dir] = m
    return m


def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pool-document hashed-ngram log importance ratio
    (operators/dsir.py). The oracle refits both smoothed feature
    models from the same slices and replays the integer-first
    log-ratio, the feature-ordered left-assoc fold, and the final
    rounding — fit and score both certified."""
    docs = read_table(spark, sf_dir, "documents")
    return dsir.importance_weights(
        docs,
        F.col("doc_id") % DSIR_TARGET_MOD == 0,
        model=_dsir_model(spark, sf_dir),
    )


def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel-top-k DSIR resample: the DSIR_K pool documents with the
    largest content-hash-Gumbel-perturbed importance weight — the
    paper's sample-without-replacement step, deterministic and
    engine-portable."""
    return dsir.select_top_k(
        dsir_weights(spark, sf_dir), DSIR_K, seed=DSIR_SEED
    )


def _synth_url():
    """Deterministic messy URL per doc (the injected-input pattern the
    PII plan established): host case, www., http vs https, tracking
    params, fragments, and trailing slashes all vary by doc_id, and
    every 3 consecutive ids share a canonical page so the dedup arm is
    always exercised. The oracle never parses this URL — it evaluates
    the CANONICAL closed form directly, so the regex normalizer is
    certified by independent derivation (the codec-oracle pattern)."""
    g = F.expr("doc_id div 3")
    h = F.when(g % 11 == 0, F.lit("spamfarm3.com")).otherwise(
        F.concat(F.lit("site"), (g % 7).cast("string"), F.lit(".com"))
    )
    host = F.when(
        F.col("doc_id") % 4 == 0, F.concat(F.lit("www."), h)
    ).otherwise(h)
    host = F.when(F.col("doc_id") % 2 == 0, F.upper(host)).otherwise(host)
    scheme = F.when(
        F.col("doc_id") % 2 == 0, F.lit("https://")
    ).otherwise(F.lit("http://"))
    path = F.concat(F.lit("/a/"), g.cast("string"))
    path = F.when(
        F.col("doc_id") % 5 == 0, F.concat(path, F.lit("/"))
    ).otherwise(path)
    q = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed&page=2"))
        .when(F.col("doc_id") % 3 == 1, F.lit("?page=2"))
        .otherwise(F.lit(""))
    )
    frag = F.when(F.col("doc_id") % 7 == 1, F.lit("#top")).otherwise(
        F.lit("")
    )
    return F.concat(scheme, host, path, q, frag)


def _curated(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return urls.url_curation(docs.select("doc_id", _synth_url().alias("url")))


def url_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + first-tier (URL-level) dedup: the regex
    normalizer untangles the synthesized mess; the oracle states the
    canonical form from the closed formula without parsing anything."""
    return _curated(spark, sf_dir)


def domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain crawl rollup over the curation output."""
    return urls.domain_stats(_curated(spark, sf_dir))


def supplier_fuzzy_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance entity resolution over supplier names: every pair
    within Levenshtein distance 1, via the complete 1-deletion-
    neighborhood blocking (operators/dedup.fuzzy_key_pairs) — the typo
    dedup tier between exact hashing and MinHash. The oracle computes
    the ALL-PAIRS truth directly (DuckDB levenshtein), so the hash
    match certifies the blocking has zero false negatives."""
    sup = read_table(spark, sf_dir, "supplier")
    return dedup.fuzzy_key_pairs(sup, "s_name", "s_suppkey", max_dist=1)


# At 500 docs / ~8 domains the synth yields ~20 canonical pages per
# domain; an 8-page cap makes both verdicts well-populated.
DOMAIN_QUOTA_CAP = 8


def domain_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota curation over the synthesized URL mess: at most
    DOMAIN_QUOTA_CAP canonical non-blocked pages per registered
    domain, deterministic keep order, every candidate emitted with its
    rank + verdict (operators/urls.domain_quota). The oracle wraps the
    url_curation closed-formula derivation and windows it the same
    way."""
    return urls.domain_quota(_curated(spark, sf_dir), cap=DOMAIN_QUOTA_CAP)


def domain_quota_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivors-only per-domain quota via the salted two-pass top-cap
    (operators/urls.domain_quota_survivors) — the skew-robust
    mitigation the audit-view quota's measured hostile-key bound
    points at. Must keep EXACTLY the rows domain_quota marks kept:
    the oracle wraps the same url_curation derivation, windows it the
    same way, and filters to rank <= cap — any salting error (a salt
    discarding a global survivor, a rank drifting) breaks the hash."""
    return urls.domain_quota_survivors(
        _curated(spark, sf_dir), cap=DOMAIN_QUOTA_CAP
    )


def supplier_fuzzy_dups_lev2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lev <= 2 entity-resolution tier: 2-deletion-neighborhood
    blocking (~len^2/2 variants per key, complete — an optimal
    alignment yields a common string reachable by <= 2 deletions from
    each side), JVM levenshtein verify on deduped candidates only.
    The oracle is again the exact all-pairs truth, so the hash match
    certifies zero false negatives at the wider bound."""
    sup = read_table(spark, sf_dir, "supplier")
    return dedup.fuzzy_key_pairs(sup, "s_name", "s_suppkey", max_dist=2)


def promo_window_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders falling in overlapping 90-day promo windows (one window
    per nation, staggered by 60 days from 1995-06-01), via the
    bucketed range join — per-window order count + revenue."""
    nation = read_table(spark, sf_dir, "nation")
    orders = read_table(spark, sf_dir, "orders")
    base = F.datediff(F.lit("1995-06-01").cast("date"),
                      F.lit("1970-01-01").cast("date"))
    windows = nation.select(
        F.col("n_nationkey").alias("window_id"),
        (base + F.col("n_nationkey") * 60).alias("lo"),
        (base + F.col("n_nationkey") * 60 + 90).alias("hi"),
    )
    points = orders.select(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).alias("day"),
        _dec("o_totalprice").alias("price"),
    )
    joined = bucketed_range_join(
        points, windows, point="day", lo="lo", hi="hi", bucket_width=64
    )
    return (
        joined.groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price").cast("double").alias("revenue"),
        )
    )


def salted_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type counts through the two-phase salted aggregation.

    ``event_type`` has a handful of distinct values over the whole
    events table — the exact shape where one shuffle partition would
    receive one giant group. The salt spreads each group over 16
    reducers; the oracle is the plain GROUP BY, because the operator's
    contract is identical results (operators/skew.py).
    """
    ev = read_table(spark, sf_dir, "events")
    return skew.salted_count(ev, ["event_type"], n_salts=16)


def salted_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand quantity/revenue via the salted fact-dim join.

    lineitem (fact) is salted, part (dim, ~5x smaller but modeled as
    too big to broadcast) is replicated across the 8 salt values —
    the explicit rewrite for a hot part key that AQE's post-hoc skew
    split can't fan out. Oracle = the plain equi-join + GROUP BY.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", _dec("l_quantity").alias("qty"),
        _dec("l_extendedprice").alias("price"),
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = skew.salted_join(li, part, "l_partkey", "p_partkey", n_salts=8)
    return joined.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("qty").cast("double").alias("total_qty"),
        F.sum("price").cast("double").alias("total_price"),
    )


def _bucket(expr: str) -> str:
    return sampling.sample_bucket_sql(expr, seed=SAMPLE_SEED)


def _strata_case() -> str:
    whens = " ".join(
        f"WHEN lang = '{v}' THEN {int(f * sampling.BUCKETS)}"
        for v, f in sorted(STRATA_FRACTIONS.items())
    )
    return f"(CASE {whens} ELSE 0 END)"


def _split_case() -> str:
    cum = 0.0
    arms = []
    for name, frac in SPLITS.items():
        lo, hi = int(cum * sampling.BUCKETS), int((cum + frac) * sampling.BUCKETS)
        arms.append(f"WHEN b >= {lo} AND b < {hi} THEN '{name}'")
        cum += frac
    return "CASE " + " ".join(arms) + " ELSE NULL END"


ORACLE = {
    "supplier_fuzzy_dups": """
        SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
               a.s_name AS key_a, b.s_name AS key_b,
               CAST(levenshtein(a.s_name, b.s_name) AS INTEGER) AS lev
        FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        WHERE levenshtein(a.s_name, b.s_name) <= 1
    """,
    "supplier_fuzzy_dups_lev2": """
        SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
               a.s_name AS key_a, b.s_name AS key_b,
               CAST(levenshtein(a.s_name, b.s_name) AS INTEGER) AS lev
        FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        WHERE levenshtein(a.s_name, b.s_name) <= 2
    """,
    # Plain formulations on purpose: the salted rewrites must be
    # logically invisible (see operators/skew.py docstring).
    "salted_event_counts": """
        SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type
    """,
    "salted_brand_revenue": """
        SELECT p.p_brand AS brand, COUNT(*) AS n_items,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_qty,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1
    """,
    "bm25_scores": relevance.bm25_oracle_sql(QUERY_TERMS),
    "tfidf_top_terms": relevance.tfidf_top_terms_oracle_sql(k=3),
    "stratified_doc_sample": f"""
        SELECT doc_id, lang, source FROM documents
        WHERE {_bucket("doc_id")} < {_strata_case()}
    """,
    "train_split_assign": f"""
        WITH b AS (
            SELECT doc_id, {_bucket("doc_id")} AS b FROM documents
        )
        SELECT doc_id, {_split_case()} AS split FROM b
    """,
    "lang_mixture_resample": f"""
        SELECT doc_id, lang, source FROM (
            {sampling.temperature_resample_oracle_sql(
                "documents", "doc_id", "lang",
                tau=MIX_TAU, seed=SAMPLE_SEED,
            )}
        )
    """,
    # Independent derivation: the oracle builds the CANONICAL url from
    # the synth's closed form (group/host/query rules) and never sees
    # the messy URL the Spark side actually regex-normalizes — a hash
    # match certifies scheme/case/www/tracking/fragment/slash handling.
    "url_curation": """
        WITH c AS (
            SELECT doc_id,
                   CASE WHEN (doc_id // 3) % 11 = 0 THEN 'spamfarm3.com'
                        ELSE 'site' || CAST((doc_id // 3) % 7 AS VARCHAR)
                             || '.com' END AS domain,
                   '/a/' || CAST(doc_id // 3 AS VARCHAR) AS path,
                   CASE WHEN doc_id % 3 IN (0, 1) THEN '?page=2'
                        ELSE '' END AS q
            FROM documents
        ), n AS (
            SELECT doc_id, domain,
                   'https://' || domain || path || q AS url_norm,
                   domain IN {blocklist} AS blocked
            FROM c
        )
        SELECT doc_id, url_norm, domain, blocked,
               doc_id = MIN(doc_id) OVER (PARTITION BY url_norm)
                   AS is_canonical,
               CAST(COUNT(*) OVER (PARTITION BY url_norm) AS INTEGER)
                   AS n_same_url
        FROM n
    """,
    "domain_stats": """
        WITH c AS (
            SELECT doc_id,
                   CASE WHEN (doc_id // 3) % 11 = 0 THEN 'spamfarm3.com'
                        ELSE 'site' || CAST((doc_id // 3) % 7 AS VARCHAR)
                             || '.com' END AS domain,
                   'https://'
                   || CASE WHEN (doc_id // 3) % 11 = 0 THEN 'spamfarm3.com'
                           ELSE 'site' || CAST((doc_id // 3) % 7 AS VARCHAR)
                                || '.com' END
                   || '/a/' || CAST(doc_id // 3 AS VARCHAR)
                   || CASE WHEN doc_id % 3 IN (0, 1) THEN '?page=2'
                           ELSE '' END AS url_norm
            FROM documents
        ), n AS (
            SELECT doc_id, domain, url_norm,
                   doc_id = MIN(doc_id) OVER (PARTITION BY url_norm)
                       AS is_canonical
            FROM c
        )
        SELECT domain,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN is_canonical THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pages,
               MAX(domain IN {blocklist}) AS blocked
        FROM n GROUP BY domain
    """,
    "weighted_doc_sample": f"""
        WITH k AS (
            SELECT doc_id, lang, n_chars,
                   ROUND(-ln(({sampling.sample_bucket_sql("doc_id", SAMPLE_SEED)}
                              + 0.5) / {sampling.BUCKETS})
                         / GREATEST(n_chars, 1), 6) AS es_key
            FROM documents
        )
        SELECT doc_id, lang, n_chars, es_key
        FROM k ORDER BY es_key, doc_id LIMIT {WEIGHTED_SAMPLE_N}
    """,
    "training_order_shuffle": f"""
        WITH k AS (
            SELECT doc_id,
                   md5('{SAMPLE_SEED}:' || CAST(doc_id AS VARCHAR))
                       AS shuffle_key
            FROM documents
        ), r AS (
            SELECT doc_id, shuffle_key,
                   ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) - 1
                       AS position
            FROM k
        )
        SELECT doc_id, shuffle_key,
               CAST(position AS BIGINT) AS position,
               CAST(position % {sampling.SHUFFLE_SHARDS} AS INTEGER) AS shard
        FROM r
    """,
    "promo_window_orders": """
        WITH w AS (
            SELECT n_nationkey AS window_id,
                   (DATE '1995-06-01' - DATE '1970-01-01')
                       + n_nationkey * 60 AS lo,
                   (DATE '1995-06-01' - DATE '1970-01-01')
                       + n_nationkey * 60 + 90 AS hi
            FROM nation
        ), o AS (
            SELECT (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS day,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price
            FROM orders
        )
        SELECT w.window_id, COUNT(*) AS n_orders,
               CAST(SUM(o.price) AS DOUBLE) AS revenue
        FROM o JOIN w ON o.day >= w.lo AND o.day < w.hi
        GROUP BY 1
    """,
}

# Splice the blocklist from its single source (operators.urls) so the
# oracles can never drift from the operator's constant.
_BLOCKLIST_SQL = "(" + ", ".join(f"'{d}'" for d in urls.BLOCKED_DOMAINS) + ")"
for _k in ("url_curation", "domain_stats"):
    ORACLE[_k] = ORACLE[_k].replace("{blocklist}", _BLOCKLIST_SQL)

# Derived oracle: wrap the url_curation derivation verbatim (CTE
# nesting convention) and window it per domain.
ORACLE["domain_quota_sample"] = f"""
    WITH curated AS ({ORACLE["url_curation"]}
    ), pages AS (
        SELECT * FROM curated WHERE is_canonical AND NOT blocked
    ), r AS (
        SELECT doc_id, domain, url_norm,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY domain ORDER BY doc_id) AS INTEGER)
                   AS domain_rank
        FROM pages
    )
    SELECT doc_id, domain, url_norm, domain_rank,
           domain_rank <= {DOMAIN_QUOTA_CAP} AS kept
    FROM r
"""

# The survivors-only variant must keep exactly the kept rows of the
# audit view — same wrapped derivation, filtered to the cap.
ORACLE["domain_quota_survivors"] = f"""
    WITH curated AS ({ORACLE["url_curation"]}
    ), pages AS (
        SELECT * FROM curated WHERE is_canonical AND NOT blocked
    ), r AS (
        SELECT doc_id, domain, url_norm,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY domain ORDER BY doc_id) AS INTEGER)
                   AS domain_rank
        FROM pages
    )
    SELECT doc_id, domain, url_norm, domain_rank
    FROM r WHERE domain_rank <= {DOMAIN_QUOTA_CAP}
"""

QUERIES = {
    "salted_event_counts": salted_event_counts,
    "salted_brand_revenue": salted_brand_revenue,
    "bm25_scores": bm25_scores,
    "tfidf_top_terms": tfidf_top_terms,
    "stratified_doc_sample": stratified_doc_sample,
    "train_split_assign": train_split_assign,
    "lang_mixture_resample": lang_mixture_resample,
    "training_order_shuffle": training_order_shuffle,
    "weighted_doc_sample": weighted_doc_sample,
    "url_curation": url_curation,
    "domain_stats": domain_stats,
    "supplier_fuzzy_dups": supplier_fuzzy_dups,
    "supplier_fuzzy_dups_lev2": supplier_fuzzy_dups_lev2,
    "domain_quota_sample": domain_quota_sample,
    "domain_quota_survivors": domain_quota_survivors,
    "promo_window_orders": promo_window_orders,
    "dsir_weights": dsir_weights,
    "dsir_select": dsir_select,
}

# DSIR oracle: refit both hashed-ngram models and replay the scoring
# fold. The hash, bucket count, smoothing shape, rounding digits, and
# fold order are all injected from operators/dsir.py so the twin can
# never drift from the implementation's constants.
_DSIR_AGG = f"""
    WITH occ AS ({dsir.feature_occ_sql("documents", "doc_id")}),
    cnts AS (SELECT doc_id, feat, COUNT(*) AS cnt
             FROM occ GROUP BY doc_id, feat),
    fit AS (SELECT feat,
             CAST(SUM(CASE WHEN doc_id % {DSIR_TARGET_MOD} = 0
                           THEN cnt ELSE 0 END) AS BIGINT) AS cp,
             CAST(SUM(CASE WHEN doc_id % {DSIR_TARGET_MOD} <> 0
                           THEN cnt ELSE 0 END) AS BIGINT) AS cq
            FROM cnts GROUP BY feat),
    tot AS (SELECT CAST(SUM(cp) AS BIGINT) AS tp,
                   CAST(SUM(cq) AS BIGINT) AS tq FROM fit),
    contrib AS (
        SELECT c.doc_id, c.feat, c.cnt,
               c.cnt * {dsir.log_ratio_sql(
                   "COALESCE(f.cp, 0)", "COALESCE(f.cq, 0)",
                   "t.tp", "t.tq", dsir.N_BUCKETS)} AS x
        FROM cnts c LEFT JOIN fit f USING (feat) CROSS JOIN tot t
        WHERE c.doc_id % {DSIR_TARGET_MOD} <> 0),
    agg AS (SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_feats,
                   CAST(SUM(cnt) AS BIGINT) AS n_grams,
                   ROUND(list_reduce([0.0] || list(x ORDER BY feat),
                                     (a, b) -> a + b),
                         {dsir.W_ROUND}) AS logw
            FROM contrib GROUP BY doc_id)
"""

ORACLE["dsir_weights"] = f"""
    {_DSIR_AGG}
    SELECT doc_id, n_feats, n_grams, logw FROM agg
"""

ORACLE["dsir_select"] = f"""
    {_DSIR_AGG},
    sel AS (SELECT doc_id, n_feats, n_grams, logw,
                   {dsir.gumbel_key_sql("doc_id", "logw", DSIR_SEED)}
                       AS gkey
            FROM agg)
    SELECT * FROM sel ORDER BY gkey DESC, doc_id LIMIT {DSIR_K}
"""
