"""Soft-404 detection (operators/soft404.py): phrase heuristic edges,
the short-body gate, per-host template grouping, and the filter/audit
views."""

from pyspark.sql import functions as F

from longqc_spark.operators.soft404 import (
    host_error_templates,
    soft404_expr,
    soft404_filter,
)


def _flag(spark, rows):
    df = spark.createDataFrame(rows, "title string, text string")
    return [r["f"] for r in df.select(soft404_expr().alias("f")).collect()]


def test_content_heuristic(spark):
    long_body = "word " * 300  # > 512 chars
    assert _flag(
        spark,
        [
            ("404 Not Found", "anything at all " * 100),  # title: any length
            ("Error 404", ""),
            ("Oops", "The page you requested was not found. Error 404."),
            ("Guide to HTTP", "What does Page Not Found mean? " + long_body),
            ("My 404 war story", long_body),  # number alone isn't a phrase
            ("Home", "Welcome to our shop"),
            (None, None),
        ],
    ) == [True, True, True, False, False, False, False]


def test_body_match_only_in_lead(spark):
    # phrase beyond the first 200 chars of a short doc: not a self-label
    filler = "x" * 210
    assert _flag(spark, [("T", filler + " page not found")]) == [False]


def _corpus(spark):
    rows = []
    # h1: error template "tpl" on 6 urls + 3 real pages
    for i in range(6):
        rows.append(("h1", f"https://h1/missing{i}", "tpl", "Some Title", "body"))
    for i in range(3):
        rows.append(("h1", f"https://h1/real{i}", f"r{i}", "Article", "real body"))
    # h2: same digest "tpl" but only on 2 urls -> below min_urls
    rows += [
        ("h2", "https://h2/a", "tpl", "Hi", "b"),
        ("h2", "https://h2/b", "tpl", "Hi", "b"),
        # h2 content soft404
        ("h2", "https://h2/gone", "g", "404 Not Found", "gone"),
    ]
    return spark.createDataFrame(
        rows, "host string, url string, digest string, title string, text string"
    )


def test_templates_are_per_host(spark):
    t = host_error_templates(_corpus(spark), min_urls=5).collect()
    assert [(r["host"], r["digest"], r["n_urls"]) for r in t] == [("h1", "tpl", 6)]


def test_filter_and_audit(spark):
    df = _corpus(spark)
    kept = soft404_filter(df, min_urls=5)
    urls = sorted(r["url"] for r in kept.collect())
    # h1 loses the 6 template urls; h2 keeps its 2 tpl pages, loses /gone
    assert urls == [
        "https://h1/real0",
        "https://h1/real1",
        "https://h1/real2",
        "https://h2/a",
        "https://h2/b",
    ]
    audit = soft404_filter(df, min_urls=5, keep_flagged=True)
    assert audit.count() == df.count()
    by_url = {r["url"]: r for r in audit.collect()}
    assert by_url["https://h1/missing0"]["soft404_template"] is True
    assert by_url["https://h1/missing0"]["soft404_content"] is False
    assert by_url["https://h2/gone"]["soft404_content"] is True
    assert by_url["https://h2/gone"]["soft404_template"] is False


def test_filter_plan_broadcasts_templates(spark):
    plan = (
        soft404_filter(_corpus(spark), min_urls=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
