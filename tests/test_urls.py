"""URL canonicalization / URL-level dedup unit tests."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row  # noqa: E402

from flink_log_analysis_spark.operators import urls  # noqa: E402


def test_normalize_url_rules(spark):
    cases = {
        # host case + www + fragment + tracking param + kept param
        "HTTP://WWW.Site1.COM/a/9?utm_source=x&page=2#top":
            "https://site1.com/a/9?page=2",
        # https kept, trailing slash trimmed, tracking-only query drops
        "https://site1.com/a/9/?utm_medium=y":
            "https://site1.com/a/9",
        # no query/fragment, already canonical
        "https://other.net/p": "https://other.net/p",
        # gclid/fbclid stripped, order of kept params preserved
        "http://a.org/x?b=1&gclid=z&c=2": "https://a.org/x?b=1&c=2",
        # root path (empty) stays empty
        "https://www.a.org?ref=h": "https://a.org",
    }
    df = spark.createDataFrame(
        [Row(doc_id=i, url=u) for i, u in enumerate(cases)]
    )
    got = {
        r.url: r.n for r in df.select(
            "url", urls.normalize_url(df.url).alias("n")
        ).collect()
    }
    assert got == cases


def test_url_curation_dedup_and_blocklist(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, url="https://site1.com/a?utm_source=x"),
            Row(doc_id=2, url="HTTP://WWW.SITE1.COM/a"),   # same page as 1
            Row(doc_id=3, url="https://site1.com/b"),
            Row(doc_id=4, url="https://www.spamfarm3.com/z"),
        ]
    )
    out = {r.doc_id: r for r in urls.url_curation(df).collect()}
    assert out[1].url_norm == out[2].url_norm == "https://site1.com/a"
    assert out[1].is_canonical and not out[2].is_canonical
    assert out[1].n_same_url == out[2].n_same_url == 2
    assert out[3].is_canonical and out[3].n_same_url == 1
    assert out[4].blocked and out[4].domain == "spamfarm3.com"
    assert not out[1].blocked

    stats = {r.domain: r for r in urls.domain_stats(
        urls.url_curation(df)
    ).collect()}
    assert stats["site1.com"].n_docs == 3
    assert stats["site1.com"].n_pages == 2   # /a deduped, /b
    assert not stats["site1.com"].blocked
    assert stats["spamfarm3.com"].blocked


def test_domain_quota_cap_and_determinism(spark):
    from pyspark.sql import Row

    from flink_log_analysis_spark.operators.urls import (
        domain_quota,
        url_curation,
    )

    rows = [
        Row(doc_id=i, url=f"https://site{i % 2}.com/p/{i}") for i in range(10)
    ]
    curated = url_curation(spark.createDataFrame(rows))
    out = domain_quota(curated, cap=3).collect()
    by_domain = {}
    for r in out:
        by_domain.setdefault(r["domain"], []).append(r)
    for dom, rs in by_domain.items():
        rs.sort(key=lambda r: r["domain_rank"])
        # ranks dense from 1, keep order = ascending doc_id
        assert [r["domain_rank"] for r in rs] == list(range(1, len(rs) + 1))
        ids = [r["doc_id"] for r in rs]
        assert ids == sorted(ids)
        kept = [r for r in rs if r["kept"]]
        assert len(kept) == min(3, len(rs))


def test_domain_quota_survivors_equals_kept_under_skew(spark):
    """The salted two-pass survivors variant keeps EXACTLY the rows
    the audit-view quota marks kept — including under a hostile key
    (one domain holding most pages) and across salt boundaries (ids
    deliberately not aligned with the salt modulus)."""
    from pyspark.sql import functions as F

    n = 500
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(F.lit("https://hot.com/a/"), F.col("id")),
        )
        .otherwise(
            F.concat(
                F.lit("https://site"),
                (F.col("id") % 7).cast("string"),
                F.lit(".com/a/"),
                F.col("id"),
            )
        )
        .alias("url"),
    )
    curated = urls.url_curation(df)
    audit = urls.domain_quota(curated, cap=8)
    survivors = urls.domain_quota_survivors(curated, cap=8, n_salts=4)
    kept = audit.filter("kept").select(
        "doc_id", "domain", "url_norm", "domain_rank"
    )
    assert survivors.exceptAll(kept).count() == 0
    assert kept.exceptAll(survivors).count() == 0
    assert survivors.count() == 8 * 8  # hot.com + site0..6 at cap
