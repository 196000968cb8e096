"""Unit tests for the corpus-hygiene operators (operators/quality.py):
quality filtering, PII scrubbing, decontamination, sequence packing.
Oracle parity at the corpus level is covered by test_oracle_parity; the
tests here pin the operator semantics on crafted inputs."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_log_analysis_spark.operators import quality


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_quality_signals_keep_and_drop(spark):
    # 60 distinct words + stopwords sprinkled in: inside every band
    # (length, mean word length, low duplication, stopword floor).
    good = " ".join(
        f"word{i:02d}" + (" the" if i % 10 == 0 else "") for i in range(60)
    )
    repetitive = "spam " * 80
    short = "too short"
    out = {
        r.doc_id: r
        for r in quality.quality_signals(
            _docs(spark, [good, repetitive, short])
        ).collect()
    }
    assert out[0].keep is True
    assert out[1].keep is False  # dup_token_ratio ~ 1
    assert out[1].dup_token_ratio > quality.MAX_DUP_TOKEN_RATIO
    assert out[2].keep is False  # below MIN_TOKENS
    assert out[2].n_tokens < quality.MIN_TOKENS


def test_pii_scrub_redacts_and_counts(spark):
    txt = (
        "mail alice@example.org or bob.smith@corp.co, "
        "server 192.168.1.250, order 123456789, keep 12345 visible"
    )
    df = _docs(spark, [txt])
    scrubbed, counts = quality.scrub_pii(F.col("text"))
    [row] = df.select(
        scrubbed.alias("s"), *[counts[n].alias(n) for n, _, _ in quality.PII_PATTERNS]
    ).collect()
    assert row.email == 2
    assert row.ipv4 == 1
    assert row.longnum == 1  # 123456789 only; 12345 is under 6 digits
    assert "<EMAIL>" in row.s and "<IP>" in row.s and "<NUM>" in row.s
    assert "alice@example.org" not in row.s
    assert "192.168.1.250" not in row.s
    assert "12345 visible" in row.s


def test_contamination_flags_copied_doc(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(
        spark,
        [base, "totally different words entirely here now ok fine yes sir",
         "unrelated content again with other tokens present here too",
         base + " plus a small tail"],
    )
    bench = docs.filter(F.col("doc_id") == 0)
    out = {r.doc_id: r for r in quality.benchmark_contamination(docs, bench).collect()}
    assert 3 in out            # shares the 8-gram run with doc 0
    assert out[3].n_bench_docs == 1
    assert 1 not in out and 2 not in out
    assert 0 not in out        # self-match excluded


def test_pack_chunks_boundaries(spark):
    # 3 docs x 100 tokens, block=256: doc0 [0,0], doc1 [0,0], doc2
    # crosses the 256 boundary -> [0,1].
    txt = " ".join(["tok"] * 100)
    out = {
        r.doc_id: r
        for r in quality.pack_chunks(_docs(spark, [txt] * 3), block=256).collect()
    }
    assert (out[0].chunk_first, out[0].chunk_last) == (0, 0)
    assert (out[1].chunk_first, out[1].chunk_last) == (0, 0)
    assert (out[2].chunk_first, out[2].chunk_last) == (0, 1)
    assert out[2].cum_tokens == 300


def test_pii_scrub_idempotent(spark):
    """Scrubbing already-scrubbed text changes nothing: replacement
    tokens contain no scrubbable spans."""
    txt = "x@y.io at 1.2.3.4 ref 9876543 and x@y.io again"
    df = _docs(spark, [txt])
    once, _ = quality.scrub_pii(F.col("text"))
    twice, counts2 = quality.scrub_pii(once)
    [row] = df.select(
        once.alias("once"), twice.alias("twice"),
        *[counts2[n].alias(n) for n, _, _ in quality.PII_PATTERNS],
    ).collect()
    assert row.once == row.twice
    assert row.email == 0 and row.ipv4 == 0 and row.longnum == 0


def test_pack_chunks_invariants(spark):
    """Property-style invariants over varied doc lengths: cum_tokens is
    the prefix sum in id order, chunk ranges are consistent, and every
    block boundary crossed by a doc is within its [first, last] range."""
    import random

    rng = random.Random(11)
    texts = [" ".join(["w"] * rng.randint(1, 700)) for _ in range(40)]
    rows = sorted(
        quality.pack_chunks(_docs(spark, texts), block=128).collect(),
        key=lambda r: r.doc_id,
    )
    cum = 0
    for r in rows:
        cum += r.n_tokens
        assert r.cum_tokens == cum
        assert r.chunk_first == (r.cum_tokens - r.n_tokens) // 128
        assert r.chunk_last == (r.cum_tokens - 1) // 128
        assert r.chunk_first <= r.chunk_last


def test_pack_chunks_plan_is_not_single_partition(spark):
    """The packing cumsum must be a distributed prefix-sum, never a
    partitionless Window (which funnels every row through one task:
    WindowExec requires SinglePartition when partitionBy is empty).
    Also proves tools/explain_audit's detector catches a deliberately
    planted global window."""
    import sys as _sys

    sys_path_root = __file__.rsplit("/tests/", 1)[0]
    if sys_path_root not in _sys.path:
        _sys.path.insert(0, sys_path_root)
    from tools.explain_audit import audit

    texts = [" ".join(["w"] * 10)] * 8
    good_props, _ = audit("pack_chunks", quality.pack_chunks(_docs(spark, texts)))
    assert good_props["single_part"] == 0
    assert "SINGLE-PARTITION-EXCHANGE" not in good_props["flags"]

    # Planted anti-pattern: the global window the operator must avoid.
    from pyspark.sql.window import Window

    planted = _docs(spark, texts).select(
        "doc_id",
        F.sum(F.length("text")).over(
            Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
    )
    bad_props, _ = audit("planted_global_window", planted)
    assert bad_props["single_part"] >= 1
    assert bad_props["sp_funnels"] >= 1
    assert "SINGLE-PARTITION-EXCHANGE" in bad_props["flags"]


def test_quality_signals_null_and_whitespace(spark):
    """Hostile inputs degrade to keep=false/null rows, never throw."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    df = spark.createDataFrame([(0, None), (1, ""), (2, "   ")], schema)
    out = quality.quality_signals(df).collect()
    assert len(out) == 3
    assert all(not r.keep for r in out if r.keep is not None)


def test_pack_chunks_empty_input(spark):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    assert quality.pack_chunks(spark.createDataFrame([], schema)).count() == 0


def test_repetition_signals_crafted(spark):
    # doc 0: "a b" repeated 10x -> the top 2-gram ("a b" or "b a")
    # covers nearly all characters, every 5-gram occurs repeatedly.
    # doc 1: all-distinct words -> top-2-gram coverage is one gram's
    # chars, zero duplicated 5-grams. doc 2: shorter than 5 words ->
    # dup5 undefined (0), top2 still computed. doc 3: shorter than 2
    # words -> both 0.
    looped = "a b " * 10
    distinct = " ".join(f"w{i:02d}" for i in range(40))
    out = {
        r.doc_id: r
        for r in quality.repetition_signals(
            _docs(spark, [looped.strip(), distinct, "x y z", "solo"])
        ).collect()
    }
    r0 = out[0]
    # 20 tokens of 1 char each; top 2-gram "a b" occurs 10x, 3 chars.
    assert r0.total_token_chars == 20
    assert r0.top2_char_frac == 1.0  # 30/20 capped
    assert r0.dup5_char_frac == 1.0
    assert r0.rep_keep is False

    r1 = out[1]
    # 40 distinct 3-char words -> every 2-gram unique: max cov = 7.
    assert r1.total_token_chars == 120
    assert r1.top2_char_frac == round(7 / 120, 4)
    assert r1.dup5_char_frac == 0.0
    assert r1.rep_keep is True

    r2 = out[2]
    assert r2.dup5_char_frac == 0.0
    assert r2.top2_char_frac == round(3 / 3, 4)  # "x y" covers 3/3

    r3 = out[3]
    assert r3.top2_char_frac == 0.0
    assert r3.dup5_char_frac == 0.0
    assert r3.rep_keep is True


def test_repetition_signals_overlap_double_counts_capped(spark):
    # "t t t t t t" -> 2-gram "t t" occurs 5x (overlapping), coverage
    # 5*3=15 > 6 total chars -> capped at 1.0.
    out = quality.repetition_signals(_docs(spark, ["t t t t t t"])).collect()
    assert out[0].top2_char_frac == 1.0


def test_boilerplate_signals_crafted(spark):
    # Docs 0 and 1 share the same 6-word template prefix (two shared
    # 5-gram positions each, DF=2 >= MIN_DF); doc 2 is all-unique
    # content; doc 3 is shorter than n (0 positions -> keep).
    template = "all rights reserved by example site"
    d0 = template + " alpha beta gamma"
    d1 = template + " delta epsilon zeta"
    d2 = " ".join(f"u{i:02d}" for i in range(20))
    out = {
        r.doc_id: r
        for r in quality.boilerplate_signals(
            _docs(spark, [d0, d1, d2, "too short"])
        ).collect()
    }
    # 9 tokens -> 5 gram positions; the 2 positions fully inside the
    # template are shared (DF=2), positions crossing into the unique
    # tail are not.
    assert out[0].n_grams == 5 and out[0].n_boiler == 2
    assert out[0].boiler_frac == 0.4 and out[0].bp_keep is True
    assert out[1].n_grams == 5 and out[1].n_boiler == 2
    assert out[2].n_boiler == 0 and out[2].bp_keep is True
    assert out[3].n_grams == 0 and out[3].boiler_frac == 0.0
    assert out[3].bp_keep is True


def test_boilerplate_flags_template_dominated_doc(spark):
    # Doc 1 is a pure copy of doc 0: every gram position is shared ->
    # boiler_frac 1.0 -> flagged.
    text = " ".join(f"w{i}" for i in range(10))
    out = {
        r.doc_id: r
        for r in quality.boilerplate_signals(_docs(spark, [text, text])).collect()
    }
    assert out[0].boiler_frac == 1.0 and out[0].bp_keep is False
    assert out[1].boiler_frac == 1.0 and out[1].bp_keep is False


def test_select_token_budget_greedy_order(spark):
    # Distinct-token counts: doc 0 -> 4, doc 1 -> 3, doc 2 -> 2, doc 3 -> 1.
    # Token counts:          doc 0 -> 4, doc 1 -> 4, doc 2 -> 4, doc 3 -> 4.
    # Budget = floor(16 * 0.5) = 8 -> docs 0 and 1 fit, 2 and 3 do not.
    texts = [
        "a b c d",
        "e f g g",
        "h h i i",
        "j j j j",
    ]
    out = {
        r.doc_id: r
        for r in quality.select_token_budget(_docs(spark, texts)).collect()
    }
    assert [out[i].n_distinct_tokens for i in range(4)] == [4, 3, 2, 1]
    assert out[0].cum_tokens == 4 and out[0].selected
    assert out[1].cum_tokens == 8 and out[1].selected
    assert out[2].cum_tokens == 12 and not out[2].selected
    assert not out[3].selected


def test_select_token_budget_tie_break_and_partial_fit(spark):
    # Equal diversity -> doc_id ascending decides who gets the budget;
    # a doc that only PARTIALLY fits is not selected (cum > budget).
    texts = ["a b c", "x y z", "p q r s t u"]  # 3 + 3 + 6 = 12 tokens
    out = {
        r.doc_id: r
        for r in quality.select_token_budget(
            _docs(spark, texts), budget_frac=0.5
        ).collect()
    }
    # order: doc 2 (6 distinct) first, then docs 0, 1 (3 each, id order);
    # budget = 6 -> doc 2 exactly fits, doc 0 would reach 9 > 6.
    assert out[2].cum_tokens == 6 and out[2].selected
    assert out[0].cum_tokens == 9 and not out[0].selected
    assert not out[1].selected


def test_select_token_budget_plan_has_no_funnel(spark):
    import sys as _sys

    sys_path_root = __file__.rsplit("/tests/", 1)[0]
    if sys_path_root not in _sys.path:
        _sys.path.insert(0, sys_path_root)
    from tools.explain_audit import audit

    texts = [" ".join(f"w{i}{j}" for j in range(5)) for i in range(8)]
    props, _ = audit(
        "token_budget_select", quality.select_token_budget(_docs(spark, texts))
    )
    # The 1-row budget aggregate legitimately exchanges to
    # SinglePartition (one row per partition); what must NOT appear is
    # a funnel: raw rows serialized through one task into Sort/Window.
    assert props["sp_funnels"] == 0
    assert "SINGLE-PARTITION-EXCHANGE" not in props["flags"]


def test_corpus_shards_boundaries(spark):
    # 10 docs, 4 per shard -> shards of 4, 4, 2 in doc_id order.
    texts = [" ".join(["w"] * (i + 1)) for i in range(10)]
    rows = sorted(
        quality.corpus_shards(_docs(spark, texts), docs_per_shard=4).collect(),
        key=lambda r: r.shard_id,
    )
    assert [(r.shard_id, r.n_docs) for r in rows] == [(0, 4), (1, 4), (2, 2)]
    assert (rows[0].first_doc, rows[0].last_doc) == (0, 3)
    assert (rows[1].first_doc, rows[1].last_doc) == (4, 7)
    assert (rows[2].first_doc, rows[2].last_doc) == (8, 9)
    # tokens: doc i has i+1 tokens
    assert rows[0].shard_tokens == 1 + 2 + 3 + 4
    assert rows[2].shard_tokens == 9 + 10


def test_chunk_documents_boundaries(spark):
    """Window/stride arithmetic at the edges: n == W -> one chunk,
    n == W+1 -> two (second is short), empty text -> one empty chunk;
    spans tile the doc with exactly (W - S)-token overlaps."""
    import hashlib

    from pyspark.sql import Row

    from flink_log_analysis_spark.operators import quality

    W, S = 10, 7
    texts = {
        1: " ".join(f"t{i}" for i in range(10)),   # n == W
        2: " ".join(f"u{i}" for i in range(11)),   # n == W + 1
        3: "",                                     # empty
        4: " ".join(f"v{i}" for i in range(25)),   # 3 chunks
    }
    df = spark.createDataFrame(
        [Row(doc_id=k, text=v) for k, v in texts.items()]
    )
    out = quality.chunk_documents(df, window=W, stride=S)
    rows = sorted(
        ((r.doc_id, r.chunk_idx, r.chunk_start, r.chunk_len, r.chunk_md5)
         for r in out.collect())
    )
    by_doc = {}
    for did, ci, cs, cl, md in rows:
        by_doc.setdefault(did, []).append((ci, cs, cl, md))
    assert [t[:3] for t in by_doc[1]] == [(0, 0, 10)]
    assert [t[:3] for t in by_doc[2]] == [(0, 0, 10), (1, 7, 4)]
    assert [t[:3] for t in by_doc[3]] == [(0, 0, 0)]
    # ceil((25-10)/7)+1 = 4 chunks; the last covers the 4-token tail
    assert [t[:3] for t in by_doc[4]] == [
        (0, 0, 10), (1, 7, 10), (2, 14, 10), (3, 21, 4)
    ]
    # md5 certifies the exact token slice
    toks4 = texts[4].split()
    for ci, cs, cl, md in by_doc[4]:
        want = hashlib.md5(" ".join(toks4[cs:cs + cl]).encode()).hexdigest()
        assert md == want
    assert by_doc[3][0][3] == hashlib.md5(b"").hexdigest()


def test_chunk_documents_is_mapside(spark):
    """Chunking must stay a shuffle-free projection (explode included)."""
    from pyspark.sql import Row

    from flink_log_analysis_spark.operators import quality
    from tools.explain_audit import audit

    df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    props, plan = audit("doc_chunks", quality.chunk_documents(df))
    assert props["exchanges"] == 0, plan
    assert props["python_udf"] == 0


def test_span_dedup_first_occurrence_wins(spark):
    """Cross-doc span dedup keeps exactly the lexicographically-first
    (doc_id, pos) occurrence of every span; an all-duplicate doc
    survives with zero kept spans and the empty digest."""
    import hashlib

    from pyspark.sql import Row

    from flink_log_analysis_spark.operators import quality

    s = 3  # span size for the test
    a = "x1 x2 x3 y1 y2 y3"        # spans: [x1 x2 x3], [y1 y2 y3]
    b = "y1 y2 y3 z1 z2"           # [y1 y2 y3] dup of a's, [z1 z2] short
    c = "x1 x2 x3 y1 y2 y3"        # both spans already seen -> 0 kept
    df = spark.createDataFrame(
        [Row(doc_id=1, text=a), Row(doc_id=2, text=b), Row(doc_id=3, text=c)]
    )
    out = {r.doc_id: r for r in quality.span_dedup(df, span=s).collect()}
    md5 = lambda t: hashlib.md5(t.encode()).hexdigest()  # noqa: E731
    assert (out[1].n_spans, out[1].n_kept_spans) == (2, 2)
    assert out[1].kept_md5 == md5("x1 x2 x3 y1 y2 y3")
    assert (out[2].n_spans, out[2].n_kept_spans) == (2, 1)
    assert out[2].kept_md5 == md5("z1 z2")  # dup span removed, tail kept
    assert (out[3].n_spans, out[3].n_kept_spans) == (2, 0)
    assert out[3].kept_md5 == md5("")


def test_ablation_report_consistency(spark, sf_dir):
    """The ablation report's cross-signal arithmetic: unique rejections
    never exceed total rejections, every rejected doc fails >= 1
    signal, and n_kept equals the filter verdict's keep count — the
    report and the filter cannot disagree."""
    from flink_log_analysis_spark.operators import quality
    from flink_log_analysis_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    rows = quality.ablation_report(docs).collect()
    assert {r["signal"] for r in rows} == set(quality.ABLATION_SIGNALS)
    n_docs = rows[0]["n_docs"]
    n_kept = rows[0]["n_kept"]
    assert all(r["n_docs"] == n_docs and r["n_kept"] == n_kept for r in rows)
    for r in rows:
        assert 0 <= r["n_fail_alone"] <= r["n_fail"] <= n_docs - n_kept or (
            r["n_fail"] == 0 and r["n_fail_alone"] == 0
        )
    rejected = n_docs - n_kept
    assert sum(r["n_fail"] for r in rows) >= rejected
    assert sum(r["n_fail_alone"] for r in rows) <= rejected
    kept_direct = (
        quality.quality_signals(docs).filter("keep").count()
    )
    assert n_kept == kept_direct


def test_span_dedup_packing_bounds_enforced(spark):
    """The (id << 24) + pos pack's bounds are ENFORCED (r12 advisory):
    a negative or >= 2^39 doc_id raises from inside the packing
    expression instead of silently corrupting which span survives.
    In-range ids are untouched by the guard."""
    import pytest

    bad = spark.createDataFrame(
        [Row(doc_id=-1, text="a b c"), Row(doc_id=2, text="a b c")]
    )
    with pytest.raises(Exception, match="packing"):
        quality.span_dedup(bad, span=2).collect()
    huge = spark.createDataFrame(
        [Row(doc_id=1 << 39, text="x y"), Row(doc_id=3, text="x y")]
    )
    with pytest.raises(Exception, match="packing"):
        quality.span_dedup(huge, span=2).collect()
    ok = spark.createDataFrame(
        [Row(doc_id=(1 << 39) - 1, text="x y"), Row(doc_id=3, text="x y")]
    )
    rows = {r["doc_id"]: r["n_kept_spans"] for r in
            quality.span_dedup(ok, span=2).collect()}
    # first occurrence = the lexicographically smaller (id, pos)
    assert rows[3] == 1 and rows[(1 << 39) - 1] == 0


def test_ccnet_buckets_properties(spark, sf_dir):
    """CCNet head/middle/tail (plans/llm_quality.ccnet_buckets):
    per-language tercile sizes differ by at most 1 (NTILE contract)
    and bucket order tracks perplexity — max(head) <= min(middle) <=
    ... per language (ties can straddle only via the doc_id
    tie-break, which NTILE also respects)."""
    from flink_log_analysis_spark.plans.llm_quality import ccnet_buckets

    rows = ccnet_buckets(spark, sf_dir).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    order = {"head": 0, "middle": 1, "tail": 2}
    for lang, rs in by_lang.items():
        sizes = {"head": 0, "middle": 0, "tail": 0}
        for r in rs:
            sizes[r["bucket"]] += 1
        assert max(sizes.values()) - min(sizes.values()) <= 1, (lang, sizes)
        ranked = sorted(rs, key=lambda r: (r["ppl"], r["doc_id"]))
        labels = [order[r["bucket"]] for r in ranked]
        assert labels == sorted(labels), lang  # monotone in ppl order


def test_substring_dedup_arbitrary_alignment(spark):
    """VERDICT r13 item 2 (Lee et al. 2022): any repeated run of >= N
    tokens is removed at any alignment, keeping the first corpus
    occurrence; overlapping hits merge to maximal ranges."""
    from flink_log_analysis_spark.operators import quality

    rows = [
        (0, "a b c d e f g h i j"),          # source of the run
        (1, "x y c d e f g h zz"),           # run at offset 2
        (2, "c d e f g h q c d e f g h"),    # run twice -> 2 ranges
        (3, "p q r s t u v w"),              # clean
        (4, "m n c d e f mm nn oo pp"),      # 4-token overlap < N
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r
        for r in quality.substring_dedup(df, min_tokens=5).collect()
    }
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    # first occurrence untouched
    assert out[0]["n_removed_tokens"] == 0
    assert out[0]["kept_md5"] == md5("a b c d e f g h i j")
    # doc 1: windows at pos 2 and 3 duplicate -> union [2, 8), 1 range
    assert (
        out[1]["n_dup_windows"],
        out[1]["n_removed_tokens"],
        out[1]["n_ranges"],
    ) == (2, 6, 1)
    assert out[1]["kept_md5"] == md5("x y zz")
    # doc 2: the run appears twice -> both removed, 2 merged ranges
    assert (out[2]["n_removed_tokens"], out[2]["n_ranges"]) == (12, 2)
    assert out[2]["kept_md5"] == md5("q")
    # clean doc and sub-threshold overlap untouched
    assert out[3]["n_removed_tokens"] == 0
    assert out[4]["n_removed_tokens"] == 0


def test_substring_dedup_within_doc_and_invariance(spark):
    """A repeat WITHIN one document keeps its first position; results
    are invariant to physical partitioning; docs shorter than N pass
    through with zero windows."""
    from flink_log_analysis_spark.operators import quality

    rows = [
        (7, "r s t u v 1 2 r s t u v"),  # internal repeat of 5-run
        (8, "tiny doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r
        for r in quality.substring_dedup(df, min_tokens=5).collect()
    }
    assert (out[7]["n_removed_tokens"], out[7]["n_ranges"]) == (5, 1)
    assert out[8] and out[8]["n_removed_tokens"] == 0
    a = quality.substring_dedup(df, min_tokens=5).collect()
    b = quality.substring_dedup(
        df.repartition(7, "text"), min_tokens=5
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_substring_dedup_incremental_semantics(spark):
    """The substring member of the incremental family: batch windows
    are removed iff present in the FROZEN corpus; batch-internal
    repeats are untouched (never batch x batch); the persisted-index
    entry point returns exactly the self-contained result."""
    import pytest

    from flink_log_analysis_spark.operators import quality

    corpus = spark.createDataFrame(
        [(0, "a b c d e f"), (2, "z y x w v u")],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "q q a b c d e qq"),          # corpus run at offset 2
            (3, "m n o p r s m n o p r s"),    # batch-INTERNAL repeat only
            (5, "totally novel tokens here five"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r
        for r in quality.substring_dedup_incremental(
            new, corpus, min_tokens=5
        ).collect()
    }
    # doc 1: windows at pos 2 ("a b c d e") hit the corpus -> [2, 7)
    assert (out[1]["n_dup_windows"], out[1]["n_removed_tokens"]) == (1, 5)
    # doc 3's internal repeat is NOT in the corpus -> untouched here
    assert out[3]["n_removed_tokens"] == 0
    assert out[5]["n_removed_tokens"] == 0
    # production entry point: frozen persisted index == self-contained
    idx = quality.build_substring_index(corpus, min_tokens=5)
    alt = quality.substring_dedup_incremental(
        new, corpus_keys=idx, min_tokens=5
    ).collect()
    assert sorted(map(tuple, alt)) == sorted(
        map(tuple, quality.substring_dedup_incremental(
            new, corpus, min_tokens=5).collect())
    )
    # neither corpus nor corpus_keys -> loud
    with pytest.raises(ValueError, match="corpus or corpus_keys"):
        quality.substring_dedup_incremental(new, min_tokens=5)
