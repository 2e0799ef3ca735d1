"""Crawl-frontier scheduling (operators/frontier.py): seen-set
anti-join, best-score-per-url, budget cap, deterministic ordering,
and hostless/NULL handling."""

from longqc_spark.operators.frontier import frontier_next


def test_frontier_selection(spark):
    cands = spark.createDataFrame(
        [
            ("https://a.com/1", 0.9),
            ("https://a.com/1", 0.1),   # dup link, lower score -> max wins
            ("https://a.com/2", 0.5),
            ("https://a.com/3", 0.7),
            ("https://b.com/x", None),  # NULL score -> 0.0
            ("not a url", 1.0),         # hostless -> dropped
            (None, 1.0),
        ],
        "url string, s double",
    )
    crawled = spark.createDataFrame([("https://a.com/2",)], "url string")
    out = frontier_next(cands, crawled, score_col="s", per_host_budget=2)
    rows = {(r["host"], r["url"]): r for r in out.collect()}
    assert set(rows) == {
        ("a.com", "https://a.com/1"),
        ("a.com", "https://a.com/3"),
        ("b.com", "https://b.com/x"),
    }
    a1 = rows[("a.com", "https://a.com/1")]
    assert a1["priority"] == 0.9 and a1["fetch_rank"] == 1
    assert rows[("a.com", "https://a.com/3")]["fetch_rank"] == 2
    assert rows[("b.com", "https://b.com/x")]["priority"] == 0.0


def test_budget_caps_mega_host(spark):
    cands = spark.createDataFrame(
        [(f"https://big.com/p{i}",) for i in range(100)]
        + [("https://small.com/only",)],
        "url string",
    )
    out = frontier_next(cands, None, per_host_budget=5).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    assert len(by_host["big.com"]) == 5
    assert len(by_host["small.com"]) == 1


def test_deterministic_batch(spark):
    cands = spark.createDataFrame(
        [(f"https://h.com/p{i}", float(i % 3)) for i in range(30)],
        "url string, s double",
    )
    a = frontier_next(cands, None, score_col="s", per_host_budget=7).collect()
    b = frontier_next(cands, None, score_col="s", per_host_budget=7).collect()
    key = lambda r: (r["host"], r["fetch_rank"])
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # budget is filled by priority first
    assert all(r["priority"] == 2.0 for r in a if r["fetch_rank"] <= 3)


def test_cold_start_no_crawled(spark):
    cands = spark.createDataFrame([("https://x.io/a",)], "url string")
    assert frontier_next(cands, None).count() == 1


def test_host_budget_overrides(spark):
    cands = spark.createDataFrame(
        [(f"https://slow.com/p{i}",) for i in range(10)]
        + [(f"https://normal.com/p{i}",) for i in range(10)]
        + [(f"https://banned.com/p{i}",) for i in range(3)],
        "url string",
    )
    budgets = spark.createDataFrame(
        [("slow.com", 2), ("banned.com", 0)], "host string, budget int"
    )
    out = frontier_next(
        cands, None, per_host_budget=5, host_budgets=budgets
    ).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    assert len(by_host["slow.com"]) == 2
    assert len(by_host["normal.com"]) == 5  # default budget
    assert "banned.com" not in by_host


def test_crawl_delay_to_budget_chain(spark):
    from pyspark.sql import functions as F

    from longqc_spark.operators.robots import robots_crawl_delays

    robots = spark.createDataFrame(
        [
            ("slow.com", "User-agent: *\nCrawl-delay: 30\n"
                         "User-agent: x\nCrawl-delay: 10  # max wins\n"),
            ("bad.com", "Crawl-delay: soon\n"),  # non-numeric ignored
        ],
        "host string, robots_txt string",
    )
    delays = robots_crawl_delays(robots)
    assert {(r["host"], r["crawl_delay_s"]) for r in delays.collect()} == {
        ("slow.com", 30.0)
    }
    budgets = delays.select(
        "host", F.floor(F.lit(60.0) / F.col("crawl_delay_s")).cast("int").alias("budget")
    )
    cands = spark.createDataFrame(
        [(f"https://slow.com/p{i}",) for i in range(10)], "url string"
    )
    out = frontier_next(cands, None, per_host_budget=9, host_budgets=budgets)
    assert out.count() == 2  # 60s cycle / 30s delay
