"""RFC 9309 robots.txt gate (operators/robots.py): group selection and
merging, longest-match precedence with the Allow tie-break, wildcard/
anchor patterns, and the page-gate end to end."""

import pytest

from longqc_spark.operators.robots import (
    _parse_one,
    _pattern_to_java_regex,
    parse_robots_rules,
    robots_gate,
)

BODY = """\
# global comment
User-agent: ccbot
Disallow: /

User-agent: googlebot
User-agent: *
Disallow: /d/1   # comment after value
Allow: /d/12
Disallow: /*9$
Disallow:
Sitemap: https://x.example/sitemap.xml

User-agent: CCBot
Allow: /open
"""


def test_parse_group_selection_and_merge():
    # '*' caller: the shared googlebot/* group only
    assert _parse_one(BODY, "*") == [
        (False, "/d/1"),
        (True, "/d/12"),
        (False, "/*9$"),
    ]
    # specific caller: BOTH ccbot groups merge, case-insensitively,
    # and the '*' group is NOT included once a specific group matches
    assert _parse_one(BODY, "CcBot") == [(False, "/"), (True, "/open")]
    # googlebot shares the '*' group's rules by membership
    assert _parse_one(BODY, "googlebot") == _parse_one(BODY, "*")
    # unknown agent falls back to '*'
    assert _parse_one(BODY, "bingbot") == _parse_one(BODY, "*")
    # rules before any User-agent line are invalid and dropped
    assert _parse_one("Disallow: /x\nUser-agent: *\nAllow: /y", "*") == [(True, "/y")]


def test_pattern_regex():
    assert _pattern_to_java_regex("/d/1") == "^/d/1"
    assert _pattern_to_java_regex("/*9$") == "^/.*9$"
    assert _pattern_to_java_regex("/a.b") == r"^/a\.b"
    import re

    assert re.match(_pattern_to_java_regex("/*9$"), "/d/19")
    assert not re.match(_pattern_to_java_regex("/*9$"), "/d/190")


def _rules(spark, ua="*"):
    robots = spark.createDataFrame(
        [("h.example", BODY), ("empty.example", "User-agent: *\nDisallow:\n"), ("null.example", None)],
        "host string, robots_txt string",
    )
    return parse_robots_rules(robots, user_agent=ua)


def test_parse_robots_rules_spark(spark):
    rows = sorted(
        (r["host"], r["allow"], r["pattern"], r["spec_len"])
        for r in _rules(spark).collect()
    )
    # empty-Disallow host and NULL-body host emit no rules at all
    assert rows == [
        ("h.example", False, "/*9$", 4),
        ("h.example", False, "/d/1", 4),
        ("h.example", True, "/d/12", 5),
    ]


def test_robots_gate_precedence(spark):
    pages = spark.createDataFrame(
        [
            ("https://h.example/d/10",),  # Disallow /d/1 → denied
            ("https://h.example/d/12",),  # Allow /d/12 (len 5) wins → allowed
            ("https://h.example/d/129",),  # Allow /d/12 beats /*9$ tie-up → allowed
            ("https://h.example/d/39",),  # /*9$ only → denied
            ("https://h.example/d/390",),  # $ anchor: not a match → allowed
            ("https://h.example/ok",),  # no rule matches → allowed
            ("https://h.example/",),  # root: no match → allowed
            ("https://other.example/d/19",),  # host w/o robots → allowed
        ],
        "url string",
    )
    rules = _rules(spark)
    allowed = {r["url"] for r in robots_gate(pages, rules).collect()}
    assert allowed == {
        "https://h.example/d/12",
        "https://h.example/d/129",
        "https://h.example/d/390",
        "https://h.example/ok",
        "https://h.example/",
        "https://other.example/d/19",
    }
    denied = {r["url"] for r in robots_gate(pages, rules, keep="denied").collect()}
    assert denied == {"https://h.example/d/10", "https://h.example/d/39"}
    both = robots_gate(pages, rules, keep="both").collect()
    assert len(both) == pages.count()
    assert {r["url"]: r["robots_allowed"] for r in both}[
        "https://h.example/d/39"
    ] is False


def test_robots_gate_specific_agent(spark):
    pages = spark.createDataFrame(
        [("https://h.example/open",), ("https://h.example/d/5",)], "url string"
    )
    # as ccbot: Disallow / blocks everything except the merged Allow /open
    allowed = {
        r["url"]
        for r in robots_gate(pages, _rules(spark, ua="ccbot")).collect()
    }
    assert allowed == {"https://h.example/open"}


def test_robots_gate_matches_path_and_query(spark):
    rules = parse_robots_rules(
        spark.createDataFrame(
            [("h.example", "User-agent: *\nDisallow: /s?q=\n")],
            "host string, robots_txt string",
        )
    )
    pages = spark.createDataFrame(
        [("https://h.example/s?q=x",), ("https://h.example/s",)], "url string"
    )
    allowed = {r["url"] for r in robots_gate(pages, rules).collect()}
    assert allowed == {"https://h.example/s"}  # query string participates


def test_robots_gate_keep_validation(spark):
    pages = spark.createDataFrame([("https://h.example/",)], "url string")
    with pytest.raises(ValueError, match="keep"):
        robots_gate(pages, _rules(spark), keep="nope")


def test_robots_sitemaps_extract(spark):
    from longqc_spark.operators.robots import robots_sitemaps

    body = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: https://ex.com/s1.xml\n"
        "SITEMAP:https://ex.com/s2.xml  # comment tail\n"
        "sitemap: https://ex.com/s1.xml\n"   # duplicate
        "Sitemap:\n"                          # blank value dropped
        "NotASitemap: https://ex.com/no.xml\n"
    )
    df = spark.createDataFrame(
        [("ex.com", body), ("empty.com", "User-agent: *\nDisallow:\n")],
        "host string, robots_txt string",
    )
    rows = robots_sitemaps(df).orderBy("sitemap_url").collect()
    assert [(r["host"], r["sitemap_url"]) for r in rows] == [
        ("ex.com", "https://ex.com/s1.xml"),
        ("ex.com", "https://ex.com/s2.xml"),
    ]
