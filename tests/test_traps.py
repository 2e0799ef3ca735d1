"""Crawler-trap detection: URL-template skeletons, explosion counts,
and the frontier gate.

Covers: digit folding + query-param name sort/value drop + fragment
strip in the skeleton, NULL/hostless input, the min_urls floor, the
content-ratio trap rule at its boundary, duplicate-fetch collapse, and
trap_filter drop/audit/NULL-passthrough semantics.
"""

import pytest
from pyspark.sql import functions as F

from longqc_spark.operators.web import crawler_traps, trap_filter, url_skeleton_expr


def _skel(spark, url):
    return (
        spark.createDataFrame([(url,)], "url string")
        .select(url_skeleton_expr().alias("s"))
        .first()["s"]
    )


def test_skeleton_normalization(spark):
    assert _skel(spark, "https://ex.com/cal/2024/05?b=2&a=1#frag") == "ex.com/cal/N/N?a&b"
    assert _skel(spark, "https://EX.com/cal/2025/11?a=9&b=x") == "ex.com/cal/N/N?a&b"
    assert _skel(spark, "https://ex.com/plain") == "ex.com/plain"
    assert _skel(spark, "not a url") is None
    assert _skel(spark, None) is None


@pytest.fixture(scope="module")
def fetches(spark):
    rows = []
    # trap: 12 distinct session URLs, ONE payload
    for i in range(12):
        rows.append((f"https://t.com/page?sid={i}", "same"))
    # legit archive: 12 distinct article URLs, distinct payloads
    for i in range(12):
        rows.append((f"https://t.com/art/{i}", f"v{i}"))
    # below the min_urls floor: 3 URLs, one payload — not reported at all
    for i in range(3):
        rows.append((f"https://t.com/tiny?x={i}", "same"))
    # duplicate fetches of one URL must not inflate n_urls
    rows.append(("https://t.com/page?sid=0", "same"))
    return spark.createDataFrame(rows, "url string, digest string")


def test_trap_detection(spark, fetches):
    out = {r["skeleton"]: r for r in crawler_traps(fetches, min_urls=10).collect()}
    assert set(out) == {"t.com/page?sid", "t.com/art/N"}
    trap = out["t.com/page?sid"]
    assert trap["n_urls"] == 12 and trap["n_digests"] == 1 and trap["is_trap"]
    legit = out["t.com/art/N"]
    assert legit["n_urls"] == 12 and legit["n_digests"] == 12
    assert not legit["is_trap"] and legit["content_ratio"] == 1.0


def test_ratio_boundary(spark):
    # 10 urls, 2 digests -> ratio 0.2 == max_content_ratio: trap (<=)
    rows = [(f"https://b.com/p?k={i}", f"d{i % 2}") for i in range(10)]
    df = spark.createDataFrame(rows, "url string, digest string")
    r = crawler_traps(df, min_urls=10, max_content_ratio=0.2).first()
    assert r["content_ratio"] == 0.2 and r["is_trap"]
    r = crawler_traps(df, min_urls=10, max_content_ratio=0.19).first()
    assert not r["is_trap"]


def test_trap_filter(spark, fetches):
    traps = crawler_traps(fetches, min_urls=10)
    probe = spark.createDataFrame(
        [
            ("https://t.com/page?sid=999",),  # fresh URL, trapped pattern
            ("https://t.com/art/999",),       # legit pattern survives
            ("hostless",),                    # NULL skeleton passes through
        ],
        "url string",
    )
    kept = {r["url"] for r in trap_filter(probe, traps).collect()}
    assert kept == {"https://t.com/art/999", "hostless"}
    flagged = {r["url"] for r in trap_filter(probe, traps, keep_trapped=True).collect()}
    assert flagged == {"https://t.com/page?sid=999"}
    assert trap_filter(probe, traps).columns == ["url"]
