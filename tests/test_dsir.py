"""DSIR importance resampling (Xie et al. 2023) — hashed-ngram importance
weights against a target-domain sample, integer micro-unit sums, pure-map
scoring. Web analog of the reference's spike-in control filtering
(``longQC.py:553-592``: score every record against a known-good profile)."""

import hashlib
import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from longqc_spark.operators.text import (
    dsir_feature_buckets,
    dsir_select,
    dsir_weights,
)

B = 64  # tiny bucket space so collisions actually happen in the fixture


def _bucket(s: str, n_buckets: int = B) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % n_buckets


def _feats(text: str | None, n_buckets: int = B) -> list[int]:
    toks = [t for t in (text or "").lower().split() if t]
    out = [_bucket(t, n_buckets) for t in toks]
    out += [_bucket(f"{a} {b}", n_buckets) for a, b in zip(toks, toks[1:])]
    return out


def _round_half_up_micro(x: float) -> int:
    return int(Decimal(x * 1e6).quantize(Decimal(1), ROUND_HALF_UP))


def _ref_weights(raw_texts, tgt_texts, n_buckets: int = B) -> dict[int, tuple[int, int]]:
    """Serial reimplementation: {bucket: lr_micro} applied per doc."""
    ct: Counter = Counter()
    cr: Counter = Counter()
    for t in tgt_texts:
        ct.update(_feats(t, n_buckets))
    for t in raw_texts:
        cr.update(_feats(t, n_buckets))
    tot_t, tot_r = sum(ct.values()), sum(cr.values())
    lr = {
        b: _round_half_up_micro(
            math.log((ct.get(b, 0) + 1) / (tot_t + n_buckets))
            - math.log((cr.get(b, 0) + 1) / (tot_r + n_buckets))
        )
        for b in range(n_buckets)
    }
    out = {}
    for i, t in enumerate(raw_texts):
        fs = _feats(t, n_buckets)
        out[i] = (len(fs), sum(lr[b] for b in fs))
    return out


TARGET = [
    "the cat sat on the mat",
    "a cat and a dog sat together",
    "the dog chased the cat around the mat",
]
RAW = [
    "the cat sat on the soft mat",          # target-like
    "a dog sat near the cat",               # target-like
    "quantum flux perturbation tensor",     # off-domain
    "synergy pipeline stakeholder revenue", # off-domain
    "the cat and the dog and the mat",      # target-like
    "zzz qqq www eee rrr ttt",              # off-domain
]


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(
        [(i, t) for i, t in enumerate(RAW)], "doc_id long, text string"
    )
    tgt = spark.createDataFrame([(t,) for t in TARGET], "text string")
    return raw, tgt


def test_weights_match_serial_reference(spark, frames):
    raw, tgt = frames
    got = {
        r["doc_id"]: (r["n_feats"], r["w_micro"])
        for r in dsir_weights(raw, tgt, n_buckets=B).collect()
    }
    assert got == _ref_weights(RAW, TARGET)


def test_target_like_docs_outrank_offdomain(spark, frames):
    raw, tgt = frames
    sel = dsir_select(raw, tgt, k=3, n_buckets=B)
    assert sorted(r["doc_id"] for r in sel.collect()) == [0, 1, 4]


def test_null_and_empty_text_score_zero(spark, frames):
    _, tgt = frames
    raw = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   "), (3, "one")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_feats"], r["w_micro"]) for r in
           dsir_weights(raw, tgt, n_buckets=B).collect()}
    assert got[0] == (0, 0) and got[1] == (0, 0) and got[2] == (0, 0)
    assert got[3][0] == 1  # single token, no bigram


def test_repartition_invariance(spark, frames):
    raw, tgt = frames
    a = sorted(map(tuple, dsir_weights(raw, tgt, n_buckets=B).collect()))
    b = sorted(
        map(tuple, dsir_weights(raw.repartition(5), tgt.repartition(3), n_buckets=B).collect())
    )
    assert a == b


def test_gumbel_selection_deterministic_and_weight_biased(spark, frames):
    raw, tgt = frames
    g1 = sorted(r["doc_id"] for r in dsir_select(raw, tgt, k=3, n_buckets=B, gumbel_seed=5).collect())
    g2 = sorted(
        r["doc_id"]
        for r in dsir_select(raw.repartition(4), tgt, k=3, n_buckets=B, gumbel_seed=5).collect()
    )
    assert g1 == g2
    # across seeds, target-like docs (0,1,4) must be sampled more often than
    # off-domain ones — the resampling property
    hits = Counter()
    for seed in range(8):
        for r in dsir_select(raw, tgt, k=3, n_buckets=B, gumbel_seed=seed).collect():
            hits[r["doc_id"]] += 1
    target_like = hits[0] + hits[1] + hits[4]
    off = hits[2] + hits[3] + hits[5]
    assert target_like > off


def test_scoring_plan_is_pure_map(spark, frames):
    """The per-doc scoring stage must carry the log-ratio table as a literal
    (vocab_coverage pattern): zero corpus-side Exchange in the weights plan."""
    raw, tgt = frames
    plan = dsir_weights(raw, tgt, n_buckets=B)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_feature_buckets_short_docs(spark):
    df = spark.createDataFrame([(0, "solo"), (1, "two words")], "doc_id long, text string")
    rows = df.select(
        F.size(dsir_feature_buckets(n_buckets=B)).alias("n")
    ).collect()
    assert [r["n"] for r in rows] == [1, 3]  # 1 uni; 2 uni + 1 bigram
