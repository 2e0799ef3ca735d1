"""Count-Min Sketch (operators.sketches): the CMS guarantees — never
underestimates, exact under no collisions, total-mass estimate under full
collision, cell-wise mergeability — plus weights and python-md5 parity."""

import hashlib
import random

import pytest
from pyspark.sql import Row, functions as F

from longqc_spark.operators.sketches import cms_build, cms_estimate


def _tok_df(spark, tokens):
    return spark.createDataFrame([Row(token=t) for t in tokens])


def _py_bucket(token: str, row: int, width: int) -> int:
    return int(hashlib.md5(f"{token}#{row}".encode()).hexdigest()[:8], 16) % width


def test_never_underestimates_and_mostly_exact(spark):
    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(300)]
    stream = [rng.choice(vocab) for _ in range(3000)]
    exact = {t: stream.count(t) for t in set(stream)}
    df = _tok_df(spark, stream)
    sketch = cms_build(df, depth=4, width=1024)
    qs = spark.createDataFrame([Row(token=t) for t in exact])
    got = {
        r["token"]: r["cms_count"]
        for r in cms_estimate(qs, sketch, depth=4, width=1024).collect()
    }
    assert all(got[t] >= exact[t] for t in exact)
    # 300 tokens in 4x1024 cells: the min-over-rows estimate is exact for
    # the overwhelming majority (a fully colliding token needs a partner
    # in all 4 rows)
    assert sum(got[t] == exact[t] for t in exact) >= 0.95 * len(exact)


def test_full_collision_estimates_total_mass(spark):
    df = _tok_df(spark, ["a"] * 5 + ["b"] * 3)
    sketch = cms_build(df, depth=1, width=1)
    qs = _tok_df(spark, ["a", "b", "never-seen"])
    got = {
        r["token"]: r["cms_count"]
        for r in cms_estimate(qs, sketch, depth=1, width=1).collect()
    }
    assert got == {"a": 8, "b": 8, "never-seen": 8}


def test_unseen_token_without_collision_is_zero(spark):
    sketch = cms_build(_tok_df(spark, ["x"]), depth=4, width=1024)
    got = cms_estimate(
        _tok_df(spark, ["definitely-not-x"]), sketch, depth=4, width=1024
    ).first()
    assert got["cms_count"] == 0


def test_merge_is_cellwise_sum(spark):
    a = ["a", "b", "a", "c"]
    b = ["b", "b", "d"]
    s_ab = cms_build(_tok_df(spark, a + b), depth=4, width=64)
    merged = (
        cms_build(_tok_df(spark, a), depth=4, width=64)
        .unionByName(cms_build(_tok_df(spark, b), depth=4, width=64))
        .groupBy("row", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    assert {tuple(r) for r in s_ab.collect()} == {tuple(r) for r in merged.collect()}


def test_weight_col_feeds_preaggregated_counts(spark):
    pre = spark.createDataFrame([Row(token="a", n=5), Row(token="b", n=3)])
    s1 = cms_build(pre, weight_col="n", depth=2, width=64)
    s2 = cms_build(_tok_df(spark, ["a"] * 5 + ["b"] * 3), depth=2, width=64)
    assert {tuple(r) for r in s1.collect()} == {tuple(r) for r in s2.collect()}


def test_bucket_matches_python_md5(spark):
    df = _tok_df(spark, ["hello"])
    sketch = cms_build(df, depth=3, width=512)
    got = {(r["row"], r["bucket"]) for r in sketch.collect()}
    assert got == {(r, _py_bucket("hello", r, 512)) for r in range(3)}


def test_bad_args(spark):
    with pytest.raises(ValueError):
        cms_build(_tok_df(spark, ["a"]), depth=0)


def test_partitioning_invariance(spark):
    toks = [f"t{i % 37}" for i in range(500)]
    s1 = cms_build(_tok_df(spark, toks).repartition(1), depth=3, width=128)
    s9 = cms_build(_tok_df(spark, toks).repartition(9), depth=3, width=128)
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s9.collect()))
