"""CDX(J) crawl-index support (operators/cdx.py): SURT key edge cases,
line format round-trip, torn-tail tolerance, and the text-source scan."""

from pyspark.sql import functions as F

from longqc_spark.operators.cdx import (
    format_cdx_line,
    parse_cdx_lines,
    scan_cdx,
    surt_key_expr,
)


def _surt(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["k"] for r in df.select(surt_key_expr().alias("k")).collect()]


def test_surt_key_cases(spark):
    cases = {
        # lowercase + www-strip + default port + query sort
        "HTTP://WWW.Example.COM:80/A/B?b=2&a=1": "com,example)/a/b?a=1&b=2",
        "https://www2.Example.com/x": "com,example)/x",
        # non-default port kept; subdomains reverse fully
        "https://a.b.example.org:8080/p": "org,example,b,a:8080)/p",
        # empty path -> '/', fragment dropped, userinfo dropped
        "https://Example.net": "net,example)/",
        "https://u:p@example.net/q#frag": "net,example)/q",
        # :443 stripped, single-param query kept, trailing ? dropped
        "https://example.com:443/p?": "com,example)/p",
        # www is only stripped as a LEADING label
        "https://notwww.example.com/": "com,example,notwww)/",
    }
    got = _surt(spark, list(cases))
    assert got == list(cases.values())


def test_surt_null_and_hostless(spark):
    assert _surt(spark, [None, "not a url", ""]) == [None, None, None]


def test_cdx_line_roundtrip(spark):
    df = spark.createDataFrame(
        [
            (
                "https://WWW.Ex.COM/A?b=2&a=1",
                1700000000,
                "text/html",
                200,
                "d41d8cd9",
                1234,
            )
        ],
        "url string, ts_epoch bigint, mime string, status int, digest string, length bigint",
    )
    lines = df.select(format_cdx_line().alias("value"))
    (line,) = [r["value"] for r in lines.collect()]
    assert line.startswith("com,ex)/a?a=1&b=2 20231114221320 {")
    out = parse_cdx_lines(lines).collect()[0]
    assert out["urlkey"] == "com,ex)/a?a=1&b=2"
    assert int(out["ts"].timestamp()) == 1700000000  # UTC session tz
    assert (out["url"], out["mime"], out["status"], out["digest"], out["length"]) == (
        "https://WWW.Ex.COM/A?b=2&a=1",
        "text/html",
        200,
        "d41d8cd9",
        1234,
    )
    assert out["offset"] is None and out["filename"] is None  # absent keys


def test_cdx_torn_tail_tolerated(spark):
    lines = spark.createDataFrame(
        [
            ('com,ex)/a 20231114221320 {"url": "https://ex.com/a", "status": 200}',),
            ("com,ex)/b 20231114221321 {\"url\": \"https://ex.c",),  # torn
        ],
        "value string",
    )
    rows = parse_cdx_lines(lines).orderBy("urlkey").collect()
    assert rows[0]["url"] == "https://ex.com/a"
    assert rows[1]["urlkey"] == "com,ex)/b"
    assert rows[1]["url"] is None  # NULL payload, scan survives


def test_scan_cdx_text_and_gz(spark, tmp_path):
    import gzip

    body = (
        'com,ex)/a 20231114221320 {"url": "https://ex.com/a", "status": 200, "length": 5}\n'
        'com,ex)/b 20231114221321 {"url": "https://ex.com/b", "status": 404, "length": 7}\n'
    )
    (tmp_path / "idx-0.cdx").write_text(body)
    with gzip.open(tmp_path / "idx-1.cdx.gz", "wt") as fh:
        fh.write(body.replace("ex.com", "ex.org").replace("com,ex", "org,ex"))
    df = scan_cdx(spark, str(tmp_path))
    assert df.count() == 4
    assert df.filter(F.col("status") == 404).count() == 2
    keys = {r["urlkey"] for r in df.select("urlkey").collect()}
    assert keys == {"com,ex)/a", "com,ex)/b", "org,ex)/a", "org,ex)/b"}
