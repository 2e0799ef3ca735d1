"""Interpolated Kneser-Ney bigram LM (operators.knlm) vs a serial
pure-python reference — EXACT micro-logprob equality on every model row
and every scored document (integer quantization makes the distributed
estimation order-free) — plus the normalization property (probabilities
over the full continuation space sum to 1), backoff semantics, and
repartition stability.
"""

import collections
import math

import pytest
from pyspark.sql import functions as F

from longqc_spark.operators.knlm import (
    BOS,
    EOS,
    MICRO,
    doc_bigrams,
    kn_bigram_lm,
    kn_score,
)


def _toks(text):
    return [BOS] + [w for w in text.lower().split() if w] + [EOS]


def _qz(x):
    return math.floor(x * MICRO + 0.5)


def _serial_kn(texts):
    """Serial reference: same formulas, dict arithmetic."""
    c = collections.Counter()
    for t in texts:
        if t is None:
            continue
        ts = _toks(t)
        for a, b in zip(ts, ts[1:]):
            c[(a, b)] += 1
    c1 = collections.Counter()
    n1plus = collections.Counter()
    n_left = collections.Counter()
    for (a, b), k in c.items():
        c1[a] += k
        n1plus[a] += 1
        n_left[b] += 1
    n1 = sum(1 for k in c.values() if k == 1)
    n2 = sum(1 for k in c.values() if k == 2)
    d = n1 / (n1 + 2 * n2) if n1 + 2 * n2 > 0 else 0.5
    z = len(c) + len(n_left) + 1.0
    pair = {
        (a, b): _qz(
            math.log(
                (k - d) / c1[a]
                + d * n1plus[a] / c1[a] * (n_left[b] + 1.0) / z
            )
        )
        for (a, b), k in c.items()
    }
    lam = {a: _qz(math.log(d * n1plus[a] / c1[a])) for a in c1}
    cont = {b: _qz(math.log((n_left[b] + 1.0) / z)) for b in n_left}
    unk = _qz(math.log(1.0 / z))
    return pair, lam, cont, unk


def _serial_score(texts_with_id, pair, lam, cont, unk):
    out = {}
    for doc_id, t in texts_with_id:
        if t is None:
            continue
        ts = _toks(t)
        n = s = nb = 0
        for a, b in zip(ts, ts[1:]):
            n += 1
            lp = pair.get((a, b))
            if lp is None:
                nb += 1
                pc = cont.get(b, unk)
                lp = lam[a] + pc if a in lam else pc
            s += lp
        out[doc_id] = (n, s, nb)
    return out


@pytest.fixture(scope="module")
def docs(spark, sf001):
    return spark.read.parquet(f"{sf001}/documents.parquet")


def test_kn_matches_serial_reference(spark, docs):
    train = docs.filter(F.col("doc_id") % 2 == 0)
    texts = [r["text"] for r in train.select("text").collect()]
    rp, rl, rc, ru = _serial_kn(texts)
    pair, ctx, cont, consts = kn_bigram_lm(train)
    got_pair = {(r["w1"], r["w2"]): r["logp_micro"] for r in pair.collect()}
    got_lam = {r["w1"]: r["lambda_micro"] for r in ctx.collect()}
    got_cont = {r["w2"]: r["logpc_micro"] for r in cont.collect()}
    assert got_pair == rp
    assert got_lam == rl
    assert got_cont == rc
    assert consts.collect()[0]["unk_logpc_micro"] == ru
    # scoring: every doc (incl. odd = held-out, exercising all 3 backoff
    # tiers) matches the serial scorer exactly
    scored = {
        r["doc_id"]: (r["n_tokens"], r["sum_logp_micro"], r["n_backoff"])
        for r in kn_score(docs, pair, ctx, cont, consts).collect()
    }
    ref = _serial_score(
        [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()],
        rp, rl, rc, ru,
    )
    assert scored == ref
    assert sum(v[2] for v in scored.values()) > 0  # backoff exercised
    # repartition-stable
    pair2, ctx2, cont2, consts2 = kn_bigram_lm(train.repartition(7))
    assert {
        (r["w1"], r["w2"]): r["logp_micro"] for r in pair2.collect()
    } == rp


def test_kn_probabilities_normalize():
    texts = ["the cat sat on the mat", "the cat ran", "a dog ran fast ran"]
    pair, lam, cont, unk = _serial_kn(texts)
    # for every context w1: Σ_seen P + λ(w1)·(Σ_unseen Pc + Pc_unk) == 1
    by_w1 = collections.defaultdict(dict)
    for (a, b), m in pair.items():
        by_w1[a][b] = m
    for a, seen in by_w1.items():
        tot = sum(math.exp(m / MICRO) for m in seen.values())
        rest = sum(
            math.exp(m / MICRO) for b, m in cont.items() if b not in seen
        ) + math.exp(unk / MICRO)
        tot += math.exp(lam[a] / MICRO) * rest
        assert abs(tot - 1.0) < 1e-4, a


def test_doc_bigrams_boundaries(spark):
    df = spark.createDataFrame(
        [(1, "a  b"), (2, ""), (3, None)], "doc_id long, text string"
    )
    rows = sorted(
        (r["doc_id"], r["w1"], r["w2"])
        for r in doc_bigrams(df, keep_cols=("doc_id",)).collect()
    )
    # doubled whitespace collapses; empty text → single (<s>, </s>);
    # NULL contributes nothing
    assert rows == [
        (1, BOS, "a"),
        (1, "a", "b"),
        (1, "b", EOS),
        (2, BOS, EOS),
    ]


def test_kn_discount_degenerate_corpus(spark):
    # every bigram count ≥ 3 → n1 + 2·n2 = 0 → D pins at 0.5 (no NaN)
    df = spark.createDataFrame(
        [(i, "x y") for i in range(5)], "doc_id long, text string"
    )
    pair, ctx, cont, consts = kn_bigram_lm(df)
    got = {(r["w1"], r["w2"]): r["logp_micro"] for r in pair.collect()}
    rp, _, _, _ = _serial_kn(["x y"] * 5)
    assert got == rp
    assert all(isinstance(v, int) for v in got.values())

def _serial_kn3(texts):
    """Serial modified-KN trigram reference: same formulas over dicts."""
    c3 = collections.Counter()
    for t in texts:
        if t is None:
            continue
        ts = [BOS, BOS] + [w for w in t.lower().split() if w] + [EOS]
        for g in zip(ts, ts[1:], ts[2:]):
            c3[g] += 1
    c3ctx = collections.Counter()
    n3plus = collections.Counter()
    c2 = collections.Counter()  # continuation bigrams ĉ2(v,w) = distinct u
    for (u, v, w), k in c3.items():
        c3ctx[(u, v)] += k
        n3plus[(u, v)] += 1
        c2[(v, w)] += 1
    c2ctx = collections.Counter()
    n2plus = collections.Counter()
    n_left = collections.Counter()
    for (v, w), k in c2.items():
        c2ctx[v] += k
        n2plus[v] += 1
        n_left[w] += 1
    n1_3 = sum(1 for k in c3.values() if k == 1)
    n2_3 = sum(1 for k in c3.values() if k == 2)
    n1_2 = sum(1 for k in c2.values() if k == 1)
    n2_2 = sum(1 for k in c2.values() if k == 2)
    d3 = n1_3 / (n1_3 + 2 * n2_3) if n1_3 + 2 * n2_3 > 0 else 0.5
    d2 = n1_2 / (n1_2 + 2 * n2_2) if n1_2 + 2 * n2_2 > 0 else 0.5
    z = len(c2) + len(n_left) + 1.0
    pc = lambda w: (n_left[w] + 1.0) / z  # noqa: E731
    p2 = {
        (v, w): (k - d2) / c2ctx[v] + d2 * n2plus[v] / c2ctx[v] * pc(w)
        for (v, w), k in c2.items()
    }
    tri = {
        (u, v, w): _qz(
            math.log(
                (k - d3) / c3ctx[(u, v)]
                + d3 * n3plus[(u, v)] / c3ctx[(u, v)] * p2[(v, w)]
            )
        )
        for (u, v, w), k in c3.items()
    }
    ctx3 = {
        uv: _qz(math.log(d3 * n3plus[uv] / c3ctx[uv])) for uv in c3ctx
    }
    bi = {vw: _qz(math.log(p)) for vw, p in p2.items()}
    ctx2 = {v: _qz(math.log(d2 * n2plus[v] / c2ctx[v])) for v in c2ctx}
    cont = {w: _qz(math.log(pc(w))) for w in n_left}
    unk = _qz(math.log(1.0 / z))
    return tri, ctx3, bi, ctx2, cont, unk


def _serial_score3(texts_with_id, tri, ctx3, bi, ctx2, cont, unk):
    out = {}
    for doc_id, t in texts_with_id:
        if t is None:
            continue
        ts = [BOS, BOS] + [w for w in t.lower().split() if w] + [EOS]
        n = s = h3 = h2 = h1 = 0
        for g in zip(ts, ts[1:], ts[2:]):
            n += 1
            u, v, w = g
            lp = tri.get(g)
            if lp is not None:
                h3 += 1
            else:
                p2m = bi.get((v, w))
                if p2m is not None:
                    h2 += 1
                    inner = p2m
                else:
                    h1 += 1
                    pcm = cont.get(w, unk)
                    inner = ctx2[v] + pcm if v in ctx2 else pcm
                lp = ctx3[(u, v)] + inner if (u, v) in ctx3 else inner
            s += lp
        out[doc_id] = (n, s, h3, h2, h1)
    return out


def test_kn_trigram_matches_serial_reference(spark, docs):
    from longqc_spark.operators.knlm import kn_trigram_lm, kn_trigram_score

    train = docs.filter(F.col("doc_id") % 2 == 0)
    texts = [r["text"] for r in train.select("text").collect()]
    rt, rc3, rb, rc2, rcont, runk = _serial_kn3(texts)
    m = kn_trigram_lm(train)
    assert {
        (r["u"], r["v"], r["w"]): r["logp3_micro"] for r in m["tri"].collect()
    } == rt
    assert {
        (r["u"], r["v"]): r["lambda3_micro"] for r in m["ctx3"].collect()
    } == rc3
    assert {(r["v"], r["w"]): r["logp2_micro"] for r in m["bi"].collect()} == rb
    assert {r["v"]: r["lambda2_micro"] for r in m["ctx2"].collect()} == rc2
    assert {r["w"]: r["logpc_micro"] for r in m["cont"].collect()} == rcont
    assert m["consts"].collect()[0]["unk_logpc_micro"] == runk
    scored = {
        r["doc_id"]: (
            r["n_tokens"], r["sum_logp_micro"], r["n_tri_hits"],
            r["n_bi_hits"], r["n_uni_hits"],
        )
        for r in kn_trigram_score(docs, m).collect()
    }
    ref = _serial_score3(
        [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()],
        rt, rc3, rb, rc2, rcont, runk,
    )
    assert scored == ref
    # the held-out half exercises every tier
    assert sum(v[3] for v in scored.values()) > 0  # bigram backoffs
    assert sum(v[4] for v in scored.values()) > 0  # unigram backoffs


def test_kn_trigram_normalizes():
    """Both levels of the recursion are proper distributions: for every
    context v, Σ_w P2(w|v) over the FULL continuation space (seen +
    unseen + UNK) == 1; for every (u,v), Σ_w P3(w|u,v) == 1 where unseen
    w contribute λ3(u,v)·P2(w|v)."""
    texts = ["the cat sat on the mat", "the cat ran", "a dog ran fast ran the"]
    rt, rc3, rb, rc2, rcont, runk = _serial_kn3(texts)

    def p2_of(v):
        """{w: P2(w|v)} over every continuation type + the UNK slot."""
        seen_vw = {w for (vv, w) in rb if vv == v}
        out = {w: math.exp(rb[(v, w)] / 1e6) for w in seen_vw}
        lam2 = math.exp(rc2[v] / 1e6)
        for w, mm in rcont.items():
            if w not in seen_vw:
                out[w] = lam2 * math.exp(mm / 1e6)
        out["<UNK>"] = lam2 * math.exp(runk / 1e6)
        return out

    by_ctx = collections.defaultdict(dict)
    for (u, v, w), mm in rt.items():
        by_ctx[(u, v)][w] = mm
    for (u, v), seen in by_ctx.items():
        p2 = p2_of(v)
        assert abs(sum(p2.values()) - 1.0) < 1e-4, v
        lam3 = math.exp(rc3[(u, v)] / 1e6)
        tot = sum(math.exp(mm / 1e6) for mm in seen.values())
        tot += lam3 * sum(p for w, p in p2.items() if w not in seen)
        assert abs(tot - 1.0) < 1e-4, (u, v)


def test_counts_cache_parity(spark, docs):
    """counts_cache=True (DISK_ONLY persist for multi-action callers)
    must not change any model value."""
    from longqc_spark.operators.knlm import kn_bigram_lm

    base = docs.filter(F.col("doc_id") < 64)
    plain = kn_bigram_lm(base)
    cached = kn_bigram_lm(base, counts_cache=True)
    for a, b in zip(plain, cached):
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
