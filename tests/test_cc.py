"""Alternating-star connected components (operators.cc) vs the
label-propagation twin and a Python union-find reference — identical
(node, component) output, logarithmic convergence on paths (the case
where label propagation needs diameter rounds), string keys, edge cases."""

import random

import pytest
from pyspark.sql import Row

from longqc_spark.operators.cc import connected_components_star
from longqc_spark.operators.dedup import connected_components


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _pairs_df(spark, edges):
    return spark.createDataFrame([Row(key_a=a, key_b=b) for a, b in edges])


def test_matches_union_find_random(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(_pairs_df(spark, edges)).collect()
    }
    assert got == _uf_components([(a, b) for a, b in edges if a != b])


def test_matches_label_propagation_twin(spark):
    rng = random.Random(11)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(40)]
    df = _pairs_df(spark, edges)
    star = {(r["node"], r["component"]) for r in connected_components_star(df).collect()}
    lp = {(r["node"], r["component"]) for r in connected_components(df).collect()}
    assert star == lp


def test_long_path_converges_logarithmically(spark):
    # a 200-node path has diameter 199: label propagation needs ~200
    # rounds, the star alternation must finish in O(log n) — 12 is ample
    edges = [(i, i + 1) for i in range(199)]
    out = connected_components_star(_pairs_df(spark, edges), max_iter=12).collect()
    assert len(out) == 200 and all(r["component"] == 0 for r in out)


def test_string_keys(spark):
    edges = [("b", "a"), ("c", "b"), ("x", "y")]
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(_pairs_df(spark, edges)).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_self_loops_and_empty(spark):
    only_loops = _pairs_df(spark, [(3, 3), (4, 4)])
    assert connected_components_star(only_loops).collect() == []
    mixed = _pairs_df(spark, [(3, 3), (4, 3)])
    got = {r["node"]: r["component"] for r in connected_components_star(mixed).collect()}
    assert got == {3: 3, 4: 3}


def test_nonconvergence_raises(spark):
    # the max_iter guard belongs to the distributed loop — disable the
    # driver union-find fast path so the loop actually runs
    edges = [(i, i + 1) for i in range(63)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(
            _pairs_df(spark, edges), max_iter=1, driver_solve_max_edges=0
        )


def test_partitioning_invariance(spark):
    rng = random.Random(23)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(60)]
    df1 = _pairs_df(spark, edges).repartition(1)
    df8 = _pairs_df(spark, edges).repartition(8)
    r1 = sorted(map(tuple, connected_components_star(df1).collect()))
    r8 = sorted(map(tuple, connected_components_star(df8).collect()))
    assert r1 == r8


def test_star_driver_and_distributed_agree(spark):
    """The driver union-find fast path and the distributed star
    alternation produce the identical (node, component) set."""
    edges = [(5, 4), (4, 3), (9, 8), (1, 7), (7, 2), (2, 1)]
    df = _pairs_df(spark, edges)
    fast = {
        (r["node"], r["component"])
        for r in connected_components_star(df).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in connected_components_star(df, driver_solve_max_edges=0).collect()
    }
    assert fast == dist
