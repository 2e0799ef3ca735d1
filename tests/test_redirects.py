"""Redirect-chain resolution: pointer-doubling semantics vs a hand walk.

Covers: straight chains (every prefix length), terminal hop counts,
cycles and self-loops (resolved=false, never hangs), the max_hops budget
(chain longer than budget is unresolved even though a terminal exists),
non-3xx / NULL-location rows ignored, duplicate fetch rows collapsing to
a single deterministic successor, and apply_redirects identity fallback.
"""

import pytest
from pyspark.sql import functions as F

from longqc_spark.operators.redirects import (
    apply_redirects,
    redirect_edges,
    resolve_redirects,
)


def _fetches(spark, rows):
    return spark.createDataFrame(rows, "url string, status int, location string")


@pytest.fixture(scope="module")
def chainy(spark):
    # a -> b -> c -> d (terminal), plus x -> y -> x (cycle), s -> s
    # (self-loop), and noise: a 200 with a location, a 301 with NULL.
    return _fetches(
        spark,
        [
            ("a", 301, "b"),
            ("b", 302, "c"),
            ("c", 307, "d"),
            ("x", 301, "y"),
            ("y", 301, "x"),
            ("s", 308, "s"),
            ("ok", 200, "ignored"),
            ("broken", 301, None),
        ],
    )


def test_edges_filter_and_dedup(spark):
    f = _fetches(
        spark,
        [
            ("a", 301, "b"),
            ("a", 302, "a2"),  # re-crawl: min(location) wins -> "a2"
            ("n", 404, "z"),
            ("m", 301, None),
        ],
    )
    got = {(r["src"], r["dst"]) for r in redirect_edges(f).collect()}
    assert got == {("a", "a2")}


def test_chain_resolution_all_prefixes(spark, chainy):
    res = {r["url"]: r for r in resolve_redirects(chainy).collect()}
    assert res["a"]["terminal_url"] == "d" and res["a"]["hops"] == 3
    assert res["b"]["terminal_url"] == "d" and res["b"]["hops"] == 2
    assert res["c"]["terminal_url"] == "d" and res["c"]["hops"] == 1
    assert all(res[u]["resolved"] for u in "abc")
    # only redirect sources appear; terminal "d" and the noise rows don't
    assert set(res) == {"a", "b", "c", "x", "y", "s"}


def test_cycles_unresolved_not_hanging(spark, chainy):
    res = {r["url"]: r for r in resolve_redirects(chainy).collect()}
    for u in ("x", "y", "s"):
        assert not res[u]["resolved"]
        assert res[u]["terminal_url"] is None and res[u]["hops"] is None


def test_max_hops_budget(spark):
    # chain of 5 hops: u0->u1->...->u5 (terminal)
    f = _fetches(spark, [(f"u{i}", 301, f"u{i+1}") for i in range(5)])
    tight = {r["url"]: r for r in resolve_redirects(f, max_hops=4).collect()}
    assert not tight["u0"]["resolved"]  # needs 5 > 4
    assert tight["u1"]["resolved"] and tight["u1"]["hops"] == 4
    loose = {r["url"]: r for r in resolve_redirects(f, max_hops=5).collect()}
    assert loose["u0"]["resolved"] and loose["u0"]["hops"] == 5
    assert loose["u0"]["terminal_url"] == "u5"


def test_long_chain_log_rounds(spark):
    # 16 hops resolves with max_hops=16 (exactly 2**4 doubling rounds)
    f = _fetches(spark, [(f"c{i}", 301, f"c{i+1}") for i in range(16)])
    res = {r["url"]: r for r in resolve_redirects(f, max_hops=16).collect()}
    assert res["c0"]["resolved"] and res["c0"]["hops"] == 16
    assert res["c0"]["terminal_url"] == "c16"


def test_bad_max_hops(spark, chainy):
    with pytest.raises(ValueError):
        resolve_redirects(chainy, max_hops=0)


def test_apply_redirects_identity_fallback(spark, chainy):
    docs = spark.createDataFrame(
        [("a",), ("d",), ("x",), ("fresh",)], "url string"
    )
    res = resolve_redirects(chainy)
    got = {
        r["url"]: r["final_url"]
        for r in apply_redirects(docs, res).collect()
    }
    # resolved source collapses; terminal, unresolved cycle, and
    # never-redirected URLs keep their own identity
    assert got == {"a": "d", "d": "d", "x": "x", "fresh": "fresh"}


def test_empty_input(spark):
    f = _fetches(spark, []).where(F.lit(False))
    assert resolve_redirects(f).count() == 0
