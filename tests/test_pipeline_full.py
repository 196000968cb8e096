"""corpus_prep: the four hygiene stages must compose correctly — each
stage's effect is visible in the survivor set, and the packed output
is consistent. Oracle parity at the corpus level is covered by
tools/check_correctness (plans/pipeline_full.py)."""

from pyspark.sql import functions as F

from flink_log_analysis_spark.plans.pipeline_full import corpus_prep


def test_corpus_prep_stages_all_discriminate(spark, sf_dir):
    from flink_log_analysis_spark.operators import dedup, quality
    from flink_log_analysis_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    out = corpus_prep(spark, sf_dir)
    rows = sorted(out.collect(), key=lambda r: r.doc_id)

    n_docs = docs.count()
    kept = docs.filter(quality.keep_predicate(F.col("text")))
    n_kept = kept.count()
    n_exact = dedup.exact_dedup_keep(kept).count()
    assert 0 < len(rows) <= n_exact <= n_kept <= n_docs
    assert n_kept < n_docs  # quality filter dropped something

    # Packing invariants over the survivor set.
    cum = 0
    for r in rows:
        cum += r.n_tokens
        assert r.cum_tokens == cum
        assert r.chunk_first == (r.cum_tokens - r.n_tokens) // quality.PACK_BLOCK_TOKENS
        assert r.chunk_last == (r.cum_tokens - 1) // quality.PACK_BLOCK_TOKENS

    # Survivors pass the quality bar and are exact-unique.
    ids = {r.doc_id for r in rows}
    keep_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert ids <= keep_ids


def test_corpus_prep_plan_has_no_funnel(spark, sf_dir):
    import sys as _sys

    root = __file__.rsplit("/tests/", 1)[0]
    if root not in _sys.path:
        _sys.path.insert(0, root)
    from tools.explain_audit import audit

    props, _ = audit("corpus_prep", corpus_prep(spark, sf_dir))
    assert props["sp_funnels"] == 0
    assert props["python_udf"] == 0


def test_pretrain_corpus_prep_composition(spark, sf_dir):
    """VERDICT r13 item 5: the pretraining tier composes with survivor
    cardinality flowing through — selection is a strict subset of the
    dedup survivors, K bounds the output, packing is a monotone cumsum
    over doc_id order, and every selected doc carries a DSIR weight."""
    from pyspark.sql import functions as F

    from flink_log_analysis_spark.operators import dedup, quality
    from flink_log_analysis_spark.plans import pipeline_full
    from flink_log_analysis_spark.plans.llm_dedup import NEAR_DUP_THRESHOLD
    from flink_log_analysis_spark.plans.llm_quality import (
        lm_perplexity_filter,
    )
    from flink_log_analysis_spark.session import read_table

    out = pipeline_full.pretrain_corpus_prep(spark, sf_dir).collect()
    assert 0 < len(out) <= pipeline_full.PRETRAIN_DSIR_K
    rows = sorted(out, key=lambda r: r["doc_id"])
    # monotone cumsum in id order, each step = that doc's n_tokens
    cum = 0
    for r in rows:
        cum += r["n_tokens"]
        assert r["cum_tokens"] == cum
        assert r["chunk_first"] <= r["chunk_last"]
        assert r["logw"] is not None
    # selected ids are survivors of the upstream chain
    docs = read_table(spark, sf_dir, "documents")
    qkept = docs.filter(quality.keep_predicate(F.col("text")))
    lmq = (
        lm_perplexity_filter(spark, sf_dir)
        .filter(F.col("kept"))
        .select("doc_id")
    )
    survivors = dedup.near_dedup_keep(
        dedup.exact_dedup_keep(qkept.join(lmq, "doc_id")),
        threshold=NEAR_DUP_THRESHOLD,
    )
    surv_ids = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    sel_ids = {r["doc_id"] for r in rows}
    assert sel_ids <= surv_ids and len(sel_ids) < len(surv_ids)
