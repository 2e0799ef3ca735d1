"""Distributed k-means (operators.kmeans) vs a serial integer twin —
EXACT equality of assignments, centroids, and inertia (the micro-quantized
recurrence is order-free), plus tie-break/empty-cluster semantics and the
shuffle-free assignment plan."""

import math

import pytest
from pyspark.sql import Row, functions as F

from longqc_spark.operators.kmeans import (
    kmeans_fit,
    kmeans_report,
    quantize_vec,
)

MICRO = 1_000_000


def _serial_kmeans(vecs: dict[int, list[float]], k: int, iters: int):
    """Reference Lloyd's on micro-quantized ints: same init (k smallest
    ids), same argmin tie-break (lowest cluster), same floor-div update,
    empty clusters keep their centroid."""
    q = {
        i: [math.floor(float(x) * MICRO + 0.5) for x in v] for i, v in vecs.items()
    }
    cent = [list(q[i]) for i in sorted(q)[:k]]

    def assign():
        out = {}
        for i, v in q.items():
            dists = [
                (sum((a - b) * (a - b) for a, b in zip(v, c)), ci)
                for ci, c in enumerate(cent)
            ]
            d, c = min(dists)
            out[i] = (c, d)
        return out

    for _ in range(iters):
        asg = assign()
        for ci in range(k):
            members = [q[i] for i, (c, _) in asg.items() if c == ci]
            if members:
                cent[ci] = [
                    sum(col) // len(members) for col in zip(*members)
                ]
    return assign(), cent


@pytest.fixture(scope="module")
def emb(spark, sf001):
    return spark.read.parquet(f"{sf001}/embeddings.parquet")


def test_exact_vs_serial_twin(spark, emb):
    pdf = emb.toPandas()
    vecs = {int(r.vec_id): list(r.embedding) for r in pdf.itertuples()}
    want_asg, want_cent = _serial_kmeans(vecs, k=3, iters=2)

    asg, cent = kmeans_fit(emb, k=3, iters=2)
    assert cent == want_cent
    got = {int(r["vec_id"]): (r["cluster"], r["dist"]) for r in asg.collect()}
    assert got == want_asg


def test_report_matches_serial(spark, emb):
    pdf = emb.toPandas()
    vecs = {int(r.vec_id): list(r.embedding) for r in pdf.itertuples()}
    want_asg, _ = _serial_kmeans(vecs, k=4, iters=3)
    asg, _ = kmeans_fit(emb, k=4, iters=3)
    rows = kmeans_report(asg).collect()
    by_c = {}
    for i, (c, d) in want_asg.items():
        n, inertia, mn = by_c.get(c, (0, 0, 10**18))
        by_c[c] = (n + 1, inertia + d, min(mn, i))
    got = {r["cluster"]: (r["n_vecs"], r["inertia"], r["min_id"]) for r in rows}
    assert got == by_c


def test_tie_breaks_to_lowest_cluster(spark):
    # two identical seed points → identical centroids; every vector is
    # equidistant from both → all land in cluster 0
    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=[5.0, 5.0]), Row(vec_id=1, embedding=[5.0, 5.0])]
        + [Row(vec_id=i, embedding=[float(i), 0.0]) for i in range(2, 6)]
    )
    asg, _ = kmeans_fit(df, k=2, iters=0)
    assert {r["cluster"] for r in asg.collect()} == {0}


def test_empty_cluster_keeps_centroid(spark):
    # all points identical → duplicate seeds → the tie-break sends every
    # point to cluster 0 in every iteration, so cluster 1 is permanently
    # EMPTY — its centroid must stay the seed value (not NaN/zero),
    # mirrored by the SQL oracle's coalesce
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[5.0, 5.0]) for i in range(6)]
    )
    asg, cent = kmeans_fit(df, k=2, iters=3)
    assert cent[1] == [5_000_000, 5_000_000]  # the untouched seed, micro
    assert {r["cluster"] for r in asg.collect()} == {0}


def test_null_vectors_excluded(spark, emb):
    with_null = emb.unionByName(
        spark.createDataFrame(
            [Row(vec_id=10**9, embedding=None, label=0)], schema=emb.schema
        )
    )
    a1, c1 = kmeans_fit(emb, k=2, iters=1)
    a2, c2 = kmeans_fit(with_null, k=2, iters=1)
    assert c1 == c2 and a1.count() == a2.count()


def test_assignment_plan_is_shuffle_free(spark, emb):
    asg, _ = kmeans_fit(emb, k=4, iters=1)
    plan = asg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow map over the checkpointed scan


def test_quantize_vec_matches_python(spark):
    df = spark.createDataFrame([Row(v=[0.1234567, -0.9999999, 0.0])])
    got = df.select(quantize_vec(F.col("v")).alias("q")).first()["q"]
    want = [math.floor(x * MICRO + 0.5) for x in [0.1234567, -0.9999999, 0.0]]
    assert got == want


def test_bad_args(spark, emb):
    with pytest.raises(ValueError):
        kmeans_fit(emb, k=0)
    with pytest.raises(ValueError):
        kmeans_fit(emb, iters=-1)
    with pytest.raises(ValueError):
        kmeans_fit(emb.filter(F.col("vec_id") < 2), k=5)


def test_partitioning_invariance(spark, emb):
    # the integer contract's point: any partitioning, same fit
    a1, c1 = kmeans_fit(emb.repartition(1), k=3, iters=2)
    a7, c7 = kmeans_fit(emb.repartition(7), k=3, iters=2)
    assert c1 == c7
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a7.collect()))


def test_null_component_and_ragged_rows_dropped(spark, emb):
    """ADVICE r4: a NULL vector component or a ragged (wrong-length)
    vector must be dropped up front — not silently misassigned via
    array_min over structs with NULL dist, nor TypeError at the 2^53
    guard."""
    dirty = emb.unionByName(
        spark.createDataFrame(
            [
                Row(vec_id=10**9, embedding=[1.0, None, 1.0, 1.0], label=0),
                Row(vec_id=10**9 + 1, embedding=[1.0, 2.0], label=0),  # ragged
            ],
            schema=emb.schema,
        )
    )
    a1, c1 = kmeans_fit(emb, k=2, iters=2)
    a2, c2 = kmeans_fit(dirty, k=2, iters=2)
    assert c1 == c2 and a1.count() == a2.count()


def test_ragged_seed_raises(spark):
    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0, 2.0]), Row(vec_id=1, embedding=[3.0])]
    )
    with pytest.raises(ValueError, match="ragged"):
        kmeans_fit(df, k=2, iters=1)
