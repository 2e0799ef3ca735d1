"""In-plan multinomial Naive Bayes (operators.nbayes) vs a serial
pure-python reference — exact micro-LLR/score equality (integer
quantization ⇒ order-free sums) — plus actual learnability on a planted
separable corpus, UNK semantics, and repartition stability.
"""

import collections
import math

import pytest
from pyspark.sql import functions as F

from longqc_spark.operators.nbayes import MICRO, nb_predict, nb_train


def _qz(x):
    return math.floor(x * MICRO + 0.5)


def _serial_train(rows):
    """rows: (label, text)."""
    np_ = collections.Counter()
    nn = collections.Counter()
    dp = dn = 0
    for y, t in rows:
        if t is None:
            continue
        dp, dn = dp + (1 if y else 0), dn + (0 if y else 1)
        for w in t.lower().split():
            (np_ if y else nn)[w] += 1
    vocab = set(np_) | set(nn)
    tp, tn, v = sum(np_.values()), sum(nn.values()), len(vocab)
    zp, zn = tp + v + 1.0, tn + v + 1.0
    llr = {
        w: _qz(math.log((np_[w] + 1.0) / zp) - math.log((nn[w] + 1.0) / zn))
        for w in vocab
    }
    prior = _qz(math.log(dp / dn))
    unk = _qz(math.log(zn / zp))
    return llr, prior, unk


def _serial_predict(rows, llr, prior, unk):
    out = {}
    for doc_id, t in rows:
        if t is None:
            continue
        toks = t.lower().split()
        s, oov = prior, 0
        for w in toks:
            m = llr.get(w)
            if m is None:
                oov += 1
                s += unk
            else:
                s += m
        out[doc_id] = (len(toks), oov, s, s > 0)
    return out


@pytest.fixture(scope="module")
def docs(spark, sf001):
    return spark.read.parquet(f"{sf001}/documents.parquet")


def test_nb_matches_serial_reference(spark, docs):
    train = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "y", F.col("lang") == "en"
    )
    rows = [(r["y"], r["text"]) for r in train.select("y", "text").collect()]
    rl, rp, ru = _serial_train(rows)
    llr, consts = nb_train(train, "y")
    got = {r["token"]: r["llr_micro"] for r in llr.collect()}
    assert got == rl
    c = consts.collect()[0]
    assert (c["prior_micro"], c["unk_llr_micro"]) == (rp, ru)
    # score EVERY doc (odd half has out-of-train tokens → UNK path)
    scored = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["score_micro"], r["pred"])
        for r in nb_predict(docs, llr, consts).collect()
    }
    ref = _serial_predict(
        [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()],
        rl, rp, ru,
    )
    assert scored == ref
    # repartition-stable (integer sufficient statistics)
    llr2, consts2 = nb_train(train.repartition(7), "y")
    assert {r["token"]: r["llr_micro"] for r in llr2.collect()} == rl


def test_nb_learns_separable_corpus(spark):
    """Planted signal: class-true docs carry 'aardvark', class-false docs
    carry 'zyzzyva'; a held-out probe with the same markers classifies
    100% correctly, and a marker-free doc falls back to the prior."""
    rows = [
        (i, f"common filler text aardvark item {i % 3}", True) for i in range(30)
    ] + [
        (i + 100, f"common filler text zyzzyva item {i % 3}", False)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    llr, consts = nb_train(df, "y")
    probe = spark.createDataFrame(
        [
            (1, "fresh words aardvark here"),
            (2, "fresh words zyzzyva here"),
            (3, "only common filler text"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred"] for r in nb_predict(probe, llr, consts).collect()}
    assert got[1] is True and got[2] is False
    # marker-free doc: balanced evidence + positive prior (30 vs 20 docs)
    assert got[3] is True
    oov = {r["doc_id"]: r["n_oov"] for r in nb_predict(probe, llr, consts).collect()}
    # training vocab = {common, filler, text, aardvark, zyzzyva, item, 0,1,2}
    # → probe OOVs: {fresh, words, here} / {fresh, words, here} / {only}
    assert oov == {1: 3, 2: 3, 3: 1}


def test_nb_null_text_excluded(spark):
    df = spark.createDataFrame(
        [(1, "a b", True), (2, "a c", False), (3, None, True)],
        "doc_id long, text string, y boolean",
    )
    llr, consts = nb_train(df, "y")
    # NULL doc contributes to neither counts nor priors: prior = ln(1/1) = 0
    assert consts.collect()[0]["prior_micro"] == 0
    assert nb_predict(df, llr, consts).count() == 2