"""Sitemap parsing + crawl coverage (operators/sitemap.py): entry
extraction incl. entities/defaults/torn tail, the index parser, and
the coverage/staleness join."""

import datetime as dt

from pyspark.sql import functions as F

from longqc_spark.operators.sitemap import (
    parse_sitemap_entries,
    parse_sitemap_index,
    sitemap_coverage,
)

_XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://ex.com/a?x=1&amp;y=2</loc>
    <lastmod>2024-03-01T12:00:00+00:00</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc> https://ex.com/b </loc><lastmod>2024-03-05</lastmod></url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url><loc>https://ex.com/torn</loc><lastmod>2024-0"""


def test_parse_entries(spark):
    df = spark.createDataFrame([("ex.com", _XML)], "host string, xml string")
    rows = parse_sitemap_entries(df).orderBy("loc").collect()
    # torn tail: the unterminated 4th block is dropped, not fatal
    assert len(rows) == 3
    by_loc = {r["loc"]: r for r in rows}
    a = by_loc["https://ex.com/a?x=1&y=2"]  # entity-unescaped
    assert a["changefreq"] == "daily" and a["priority"] == 0.8
    assert a["lastmod"] == dt.datetime(2024, 3, 1, 12, 0, 0)
    b = by_loc["https://ex.com/b"]  # trimmed loc, date-only lastmod
    assert b["lastmod"] == dt.datetime(2024, 3, 5, 0, 0, 0)
    assert b["priority"] == 0.5  # protocol default
    assert None in by_loc  # loc-less block -> NULL loc row


def test_parse_index(spark):
    xml = (
        "<sitemapindex>"
        "<sitemap><loc>https://ex.com/s1.xml</loc></sitemap>"
        "<sitemap><loc>https://ex.com/s2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame([("ex.com", xml)], "host string, xml string")
    locs = [r["loc"] for r in parse_sitemap_index(df).orderBy("loc").collect()]
    assert locs == ["https://ex.com/s1.xml", "https://ex.com/s2.xml"]


def test_coverage_join(spark):
    entries = spark.createDataFrame(
        [
            ("h1", "https://h1/a", dt.datetime(2024, 3, 1)),
            ("h1", "https://h1/b", dt.datetime(2024, 3, 1)),
            ("h1", "https://h1/c", None),            # never crawled
            ("h1", "https://h1/a", dt.datetime(2024, 3, 1)),  # dup loc
            ("h2", "https://h2/x", None),
        ],
        "host string, loc string, lastmod timestamp",
    )
    crawled = spark.createDataFrame(
        [
            ("https://h1/a", dt.datetime(2024, 2, 1)),  # stale (< lastmod)
            ("https://h1/b", dt.datetime(2024, 4, 1)),  # fresh
            ("https://h9/zz", dt.datetime(2024, 4, 1)),  # not listed
        ],
        "url string, warc_ts timestamp",
    )
    rows = sitemap_coverage(entries, crawled).collect()
    got = {r["host"]: r for r in rows}
    h1 = got["h1"]
    assert (h1["n_listed"], h1["n_crawled"], h1["n_stale"]) == (3, 2, 1)
    assert abs(h1["coverage"] - 2 / 3) < 1e-6
    h2 = got["h2"]
    assert (h2["n_listed"], h2["n_crawled"], h2["coverage"]) == (1, 0, 0.0)


def test_entries_compose_with_coverage(spark):
    df = spark.createDataFrame([("ex.com", _XML)], "host string, xml string")
    entries = parse_sitemap_entries(df)
    crawled = spark.createDataFrame(
        [("https://ex.com/b", dt.datetime(2024, 3, 10))],
        "url string, warc_ts timestamp",
    )
    (row,) = sitemap_coverage(entries, crawled).collect()
    # 3 parsed entries, 1 NULL loc excluded -> 2 listed, 1 crawled fresh
    assert (row["n_listed"], row["n_crawled"], row["n_stale"]) == (2, 1, 0)
