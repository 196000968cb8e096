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
