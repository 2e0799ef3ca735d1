"""Feature hashing + TF-IDF (operators.features) vs hand-computed
references — bucket hash parity with Python md5, exact tf/idf/product
values, dense zero-fill, and the chain into the k-means fit."""

import hashlib
import math

import pytest
from pyspark.sql import Row, functions as F

from longqc_spark.operators.features import (
    bucket_idf,
    hash_bucket,
    hash_vectors,
    hashed_tf,
    hashed_tfidf,
)

MICRO = 1_000_000


def _py_bucket(token: str, dim: int) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % dim


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, text="aa bb aa"),
            Row(doc_id=1, text="bb cc"),
            Row(doc_id=2, text=None),
            Row(doc_id=3, text="   "),  # token-free, still counts in N
        ]
    )


def test_bucket_matches_python_md5(spark):
    toks = ["hello", "wörld", "aa", "x" * 50]
    df = spark.createDataFrame([Row(t=t) for t in toks])
    got = {
        r["t"]: r["b"]
        for r in df.select("t", hash_bucket(F.col("t"), 1024).alias("b")).collect()
    }
    assert got == {t: _py_bucket(t, 1024) for t in toks}


def test_hashed_tf_exact(spark, tiny):
    rows = hashed_tf(tiny, dim=1024).collect()
    want = {
        (0, _py_bucket("aa", 1024)): 2,
        (0, _py_bucket("bb", 1024)): 1,
        (1, _py_bucket("bb", 1024)): 1,
        (1, _py_bucket("cc", 1024)): 1,
    }
    assert {(r["doc_id"], r["bucket"]): r["tf"] for r in rows} == want


def test_idf_counts_docs_not_tokens(spark, tiny):
    tf = hashed_tf(tiny, dim=1024)
    # N = 3 docs with non-NULL text (token-free doc 3 included)
    idf = {r["bucket"]: (r["df_docs"], r["idf_micro"]) for r in bucket_idf(tf, 3).collect()}
    b_aa, b_bb, b_cc = (_py_bucket(t, 1024) for t in ("aa", "bb", "cc"))
    assert idf[b_aa][0] == 1 and idf[b_bb][0] == 2 and idf[b_cc][0] == 1
    assert idf[b_bb][1] == math.floor(math.log(3 / 2) * MICRO + 0.5)
    assert idf[b_aa][1] == math.floor(math.log(3 / 1) * MICRO + 0.5)


def test_tfidf_products(spark, tiny):
    out = {
        (r["doc_id"], r["bucket"]): r["tfidf_micro"]
        for r in hashed_tfidf(tiny, dim=1024).collect()
    }
    ln3 = math.floor(math.log(3.0) * MICRO + 0.5)
    ln32 = math.floor(math.log(1.5) * MICRO + 0.5)
    assert out[(0, _py_bucket("aa", 1024))] == 2 * ln3
    assert out[(0, _py_bucket("bb", 1024))] == 1 * ln32
    assert out[(1, _py_bucket("cc", 1024))] == 1 * ln3


def test_dense_zero_fill_and_grain(spark, tiny):
    sparse = hashed_tfidf(tiny, dim=8)
    vecs = {r["doc_id"]: r["vec"] for r in hash_vectors(sparse, dim=8).collect()}
    # only docs with >= 1 token materialize; vectors are length-8, and the
    # sparse entries land at their hashed positions with zeros elsewhere
    assert set(vecs) == {0, 1}
    assert all(len(v) == 8 for v in vecs.values())
    sp = {
        (r["doc_id"], r["bucket"]): r["tfidf_micro"] for r in sparse.collect()
    }
    for d, v in vecs.items():
        for pos, val in enumerate(v):
            assert val == sp.get((d, pos), 0)


def test_collision_merges_counts(spark):
    # dim=1 forces every token into bucket 0: tf = token count per doc
    df = spark.createDataFrame([Row(doc_id=7, text="a b c d")])
    rows = hashed_tf(df, dim=1).collect()
    assert [(r["bucket"], r["tf"]) for r in rows] == [(0, 4)]


def test_chains_into_kmeans(spark, sf001):
    # the advertised composition: hashed text vectors -> full-corpus k-means
    from longqc_spark.operators.kmeans import kmeans_fit, kmeans_report

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    # rescale micro-int tfidf to ~unit range first: kmeans' int64 headroom
    # is sized for unit-scale embeddings (see its module docstring)
    vecs = hash_vectors(hashed_tfidf(docs, dim=8), dim=8).select(
        "doc_id",
        F.transform("vec", lambda x: x.cast("double") / F.lit(1e8)).alias(
            "embedding"
        ),
    )
    asg, cent = kmeans_fit(vecs, id_col="doc_id", k=2, iters=2)
    rep = kmeans_report(asg, id_col="doc_id").collect()
    assert sum(r["n_vecs"] for r in rep) == vecs.count()
    assert len(cent) == 2 and all(len(c) == 8 for c in cent)


def test_bad_dim(spark, tiny):
    with pytest.raises(ValueError):
        hashed_tf(tiny, dim=0)
