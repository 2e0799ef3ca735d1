"""Web-hygiene operators: URL canonicalization, URL-level dedup, per-domain
caps, within-doc line dedup (operators/web.py) — hand fixtures + invariants."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from longqc_spark.operators.web import (
    canonical_url_expr,
    dedup_lines_expr,
    domain_cap,
    domain_expr,
    url_dedup,
)


CASES = [
    # fragment stripped
    ("https://a.com/page#frag", "https://a.com/page"),
    # tracking-first query: param removed, seam repaired
    ("https://a.com/p?utm_source=x&id=3", "https://a.com/p?id=3"),
    # tracking-last query
    ("https://a.com/p?id=3&utm_source=x", "https://a.com/p?id=3"),
    # query emptied entirely → no dangling '?'
    ("https://a.com/p?utm_campaign=only", "https://a.com/p"),
    # scheme+host lowercased, path case preserved
    ("HTTPS://WWW.Example.COM/CaseSensitive/Path", "https://www.example.com/CaseSensitive/Path"),
    # trailing slash dropped
    ("https://a.com/dir/", "https://a.com/dir"),
    # gclid + fbclid both stripped, real params kept in order
    ("https://a.com/p?a=1&gclid=g&b=2&fbclid=f", "https://a.com/p?a=1&b=2"),
    # no scheme/host → untouched apart from generic steps
    ("not a url", "not a url"),
]


def test_canonical_url_hand_cases(spark):
    df = spark.createDataFrame(pd.DataFrame({"url": [c[0] for c in CASES]}))
    got = [r["c"] for r in df.select(canonical_url_expr("url").alias("c")).collect()]
    assert got == [c[1] for c in CASES]


def test_domain_expr(spark):
    urls = [
        ("https://www.example.com/x", "example.com"),
        ("HTTP://News.Site.ORG:8080/a", "news.site.org"),
        ("https://sub.dom.co/p?q=1", "sub.dom.co"),
    ]
    df = spark.createDataFrame(pd.DataFrame({"url": [u for u, _ in urls]}))
    got = [r["d"] for r in df.select(domain_expr("url").alias("d")).collect()]
    assert got == [d for _, d in urls]


def test_url_dedup_collapses_aliases(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "url": [
                    "https://a.com/p?utm_source=x",
                    "HTTPS://A.COM/p",
                    "https://a.com/p#frag",
                    "https://a.com/other",
                ],
            }
        )
    )
    kept = url_dedup(df, url_col="url", key_col="doc_id").collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 4]  # min-key winner per canonical
    assert all(r["canonical_url"].startswith("https://a.com/") for r in kept)


def test_domain_cap_enforces_quota_deterministically(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(100),
            "url": [f"https://site{i % 3}.com/p{i}" for i in range(100)],
        }
    )
    df = spark.createDataFrame(pdf)
    kept = domain_cap(df, cap=5, url_col="url", key_col="doc_id").toPandas()
    counts = kept.groupby("domain").size()
    assert set(counts.index) == {"site0.com", "site1.com", "site2.com"}
    assert (counts == 5).all()
    # deterministic under different parallelism
    again = domain_cap(df.repartition(7), cap=5).toPandas()
    assert sorted(again.doc_id) == sorted(kept.doc_id)
    with pytest.raises(ValueError, match="cap"):
        domain_cap(df, cap=0)


def test_dedup_lines_first_occurrence_wins(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["b\na\nb\nc\na", "x", ""]})
    )
    got = [r["t"] for r in df.select(dedup_lines_expr("text").alias("t")).collect()]
    assert got == ["b\na\nc", "x", ""]
