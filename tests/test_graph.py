"""Host link graph + PageRank (operators/graph.py): edge extraction with
href resolution, and the power iteration vs an independent numpy
implementation — dangling, weighted, and plain variants."""

import numpy as np
import pytest

from longqc_spark.operators.graph import host_link_edges, pagerank


def _pages(spark):
    rows = [
        (
            "https://a.example/p1",
            b"<html><head><script>var x=\"<a href=https://evil.example/x>no</a>\";"
            b"</script></head><body>"
            b'<a href="https://b.example/t">to b</a>'
            b'<a href="//c.example/t">to c proto-rel</a>'
            b'<a href="/local">self</a>'
            b'<a href="https://b.example/u">to b again</a>'
            b"<a>no href</a>"
            b"</body></html>",
        ),
        (
            "https://b.example/p2",
            b'<body><a href="https://A.EXAMPLE/z">case</a></body>',
        ),
        ("https://c.example/p3", None),  # NULL html: no edges
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def test_host_link_edges(spark):
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_link_edges(_pages(spark)).collect()
    }
    # script decoy absent, no-href absent, self dropped, hosts lowercased
    assert got == {
        ("a.example", "b.example"): 2,
        ("a.example", "c.example"): 1,
        ("b.example", "a.example"): 1,
    }
    with_self = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_link_edges(_pages(spark), drop_self=False).collect()
    }
    assert with_self[("a.example", "a.example")] == 1  # the /local anchor


def _np_pagerank(nodes, edges, iters, damping=0.85, weights=None):
    idx = {h: i for i, h in enumerate(nodes)}
    n = len(nodes)
    w = weights or [1.0] * len(edges)
    outd = np.zeros(n)
    for (s, _), ww in zip(edges, w):
        outd[idx[s]] += ww
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nr = np.full(n, (1 - damping) / n)
        dang = sum(r[i] for i in range(n) if outd[i] == 0)
        nr += damping * dang / n
        for (s, d), ww in zip(edges, w):
            nr[idx[d]] += damping * r[idx[s]] * ww / outd[idx[s]]
        r = nr
    return {h: r[idx[h]] for h in nodes}


def test_pagerank_matches_numpy(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "c")]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {r["host"]: r["rank"] for r in pagerank(df, iters=8).collect()}
    exp = _np_pagerank(["a", "b", "c"], edges, iters=8)
    assert got.keys() == exp.keys()
    for h in exp:
        assert got[h] == pytest.approx(exp[h], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_pagerank_dangling_conserves_mass(spark):
    # d has in-edges only: its mass must redistribute, total stays 1
    edges = [("a", "b"), ("b", "d"), ("a", "d"), ("b", "a")]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {r["host"]: r["rank"] for r in pagerank(df, iters=7).collect()}
    exp = _np_pagerank(["a", "b", "d"], edges, iters=7)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    for h in exp:
        assert got[h] == pytest.approx(exp[h], abs=1e-12)


def test_pagerank_weighted(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")]
    weights = [3.0, 1.0, 1.0, 2.0]
    df = spark.createDataFrame(
        [(s, d, w) for (s, d), w in zip(edges, weights)],
        "src_host string, dst_host string, w double",
    )
    got = {
        r["host"]: r["rank"]
        for r in pagerank(df, weight_col="w", iters=6).collect()
    }
    exp = _np_pagerank(["a", "b", "c"], edges, iters=6, weights=weights)
    for h in exp:
        assert got[h] == pytest.approx(exp[h], abs=1e-12)


def test_pagerank_duplicate_rows_equal_weights(spark):
    dup = [("a", "b"), ("a", "b"), ("b", "a")]
    uniq = [("a", "b"), ("b", "a")]
    d1 = spark.createDataFrame(dup, "src_host string, dst_host string")
    d2 = spark.createDataFrame(
        [("a", "b", 2.0), ("b", "a", 1.0)], "src_host string, dst_host string, w double"
    )
    r1 = {r["host"]: r["rank"] for r in pagerank(d1, iters=5).collect()}
    r2 = {r["host"]: r["rank"] for r in pagerank(d2, weight_col="w", iters=5).collect()}
    for h in r1:
        assert r1[h] == pytest.approx(r2[h], abs=1e-12)
    del uniq


def test_pagerank_iters_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src_host string, dst_host string")
    with pytest.raises(ValueError, match="iters"):
        pagerank(df, iters=0)


def _np_hits(nodes, edges, iters):
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in edges:
        A[idx[s], idx[d]] = 1.0
    h = np.ones(len(nodes))
    a = np.ones(len(nodes))
    for _ in range(iters):
        a = A.T @ h
        a = a / a.sum() if a.sum() else a * 0.0
        h = A @ a
        h = h / h.sum() if h.sum() else h * 0.0
    return {n: (h[idx[n]], a[idx[n]]) for n in nodes}


def test_hits_matches_numpy(spark):
    from longqc_spark.operators.graph import hits

    edges = [("a", "b"), ("a", "c"), ("d", "b"), ("c", "d"), ("b", "b")]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {
        r["host"]: (r["hub"], r["authority"]) for r in hits(df, iters=8).collect()
    }
    exp = _np_hits(["a", "b", "c", "d"], edges, iters=8)
    assert got.keys() == exp.keys()
    for n in exp:
        assert got[n][0] == pytest.approx(exp[n][0], abs=1e-12)
        assert got[n][1] == pytest.approx(exp[n][1], abs=1e-12)
    assert sum(v[0] for v in got.values()) == pytest.approx(1.0, abs=1e-12)
    assert sum(v[1] for v in got.values()) == pytest.approx(1.0, abs=1e-12)


def test_hits_directory_host_is_top_hub(spark):
    from longqc_spark.operators.graph import hits

    # "dir" links to every content host but receives nothing: pure hub;
    # content hosts interlink weakly
    edges = [("dir", f"c{i}") for i in range(4)] + [("c0", "c1"), ("c1", "c0")]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {r["host"]: r for r in hits(df, iters=8).collect()}
    top_hub = max(got.values(), key=lambda r: r["hub"])["host"]
    assert top_hub == "dir"
    assert got["dir"]["authority"] == pytest.approx(0.0, abs=1e-12)


def test_hits_iters_validation(spark):
    from longqc_spark.operators.graph import hits

    df = spark.createDataFrame([("a", "b")], "src_host string, dst_host string")
    with pytest.raises(ValueError, match="iters"):
        hits(df, iters=0)


def test_hits_weighted_equals_duplicated_rows(spark):
    from longqc_spark.operators.graph import hits

    dup = [("a", "b"), ("a", "b"), ("b", "a"), ("a", "c")]
    d1 = spark.createDataFrame(dup, "src_host string, dst_host string")
    d2 = spark.createDataFrame(
        [("a", "b", 2.0), ("b", "a", 1.0), ("a", "c", 1.0)],
        "src_host string, dst_host string, w double",
    )
    r1 = {r["host"]: (r["hub"], r["authority"]) for r in hits(d1, iters=5).collect()}
    r2 = {
        r["host"]: (r["hub"], r["authority"])
        for r in hits(d2, weight_col="w", iters=5).collect()
    }
    assert r1.keys() == r2.keys()
    for h in r1:
        assert r1[h][0] == pytest.approx(r2[h][0], abs=1e-12)
        assert r1[h][1] == pytest.approx(r2[h][1], abs=1e-12)


def test_pagerank_small_graph_paths_agree(spark):
    """The driver-side solver (small-graph fast path) and the distributed
    power iteration are the same recurrence: identical ranks to 12 dp on
    a weighted graph with a dangling node."""
    edges = [("a", "b", 2.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "d", 3.0)]
    df = spark.createDataFrame(edges, "src_host string, dst_host string, w double")
    fast = {
        r["host"]: r["rank"]
        for r in pagerank(df, weight_col="w", iters=6).collect()
    }
    dist = {
        r["host"]: r["rank"]
        for r in pagerank(
            df, weight_col="w", iters=6, driver_solve_max_nodes=0
        ).collect()
    }
    assert set(fast) == set(dist)
    for h in fast:
        assert fast[h] == pytest.approx(dist[h], abs=1e-12)
