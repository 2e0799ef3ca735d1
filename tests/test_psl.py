"""Public-suffix eTLD+1 extraction (operators/psl.py): the PSL
algorithm's pinned cases (longest match, wildcard, exception, implicit
*), NULL/host-is-suffix edges, and the broadcast plan shape."""

from pyspark.sql import functions as F

from longqc_spark.operators.psl import (
    PSL_MINI,
    host_expr,
    parse_psl_rules,
    public_suffix_map,
    with_registrable_domain,
)


def _map(spark, hosts):
    rules = parse_psl_rules(spark, PSL_MINI)
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    rows = public_suffix_map(df, rules).collect()
    return {r["host"]: (r["public_suffix"], r["registrable_domain"]) for r in rows}


def test_psl_algorithm_cases(spark):
    got = _map(
        spark,
        [
            "a.b.site.com",      # plain TLD rule
            "x.site.co.uk",      # longest match beats 'uk'
            "site.co.uk",        # exactly eTLD+1
            "co.uk",             # host IS a public suffix
            "bar.foo.ck",        # wildcard *.ck -> foo.ck is the suffix
            "foo.ck",            # wildcard: host IS a public suffix
            "sub.www.ck",        # exception !www.ck beats *.ck
            "www.ck",            # exception: www.ck is registrable
            "thing.example",     # unlisted TLD -> implicit * rule
            "example",           # single unlisted label
            "user.github.io",    # private-section style rule
        ],
    )
    assert got["a.b.site.com"] == ("com", "site.com")
    assert got["x.site.co.uk"] == ("co.uk", "site.co.uk")
    assert got["site.co.uk"] == ("co.uk", "site.co.uk")
    assert got["co.uk"] == ("co.uk", None)
    assert got["bar.foo.ck"] == ("foo.ck", "bar.foo.ck")
    assert got["foo.ck"] == ("foo.ck", None)
    assert got["sub.www.ck"] == ("ck", "www.ck")
    assert got["www.ck"] == ("ck", "www.ck")
    assert got["thing.example"] == ("example", "thing.example")
    assert got["example"] == ("example", None)
    assert got["user.github.io"] == ("github.io", "user.github.io")


def test_host_expr_edges(spark):
    df = spark.createDataFrame(
        [
            ("HTTPS://User:p@WWW.Ex.COM:8443/a?b#c",),
            ("http://ex.org",),
            ("not a url",),
            (None,),
        ],
        "url string",
    )
    got = [r["h"] for r in df.select(host_expr().alias("h")).collect()]
    assert got == ["www.ex.com", "ex.org", None, None]


def test_with_registrable_domain_corpus(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.shop.co.uk/p"),
            (2, "https://b.shop.co.uk/q"),
            (3, "https://other.com/"),
            (4, None),
        ],
        "doc_id bigint, url string",
    )
    rules = parse_psl_rules(spark, PSL_MINI)
    out = with_registrable_domain(df, rules).orderBy("doc_id").collect()
    assert [r["registrable_domain"] for r in out] == [
        "shop.co.uk",
        "shop.co.uk",
        "other.com",
        None,
    ]
    assert out[3]["host"] is None  # NULL url passes through
    # same site, two hosts: the eTLD+1 grain groups them
    assert out[0]["host"] != out[1]["host"]


def test_psl_rules_join_is_broadcast(spark):
    rules = parse_psl_rules(spark, PSL_MINI)
    hosts = spark.createDataFrame([("a.b.com",)], "host string")
    plan = public_suffix_map(hosts, rules)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
