"""Zipf rank-frequency fit (text.zipf_fit) — corpus-health slope/r².

Pins the fit against an independent numpy OLS over the same collected
counts (any k, any tie pattern), the deterministic (cnt DESC, token)
tie-break, the two-point r²=1 degenerate case, and the bounded-k plan
posture (no global sort of the vocabulary).
"""

import math

import numpy as np
from pyspark.sql import functions as F

from longqc_spark.operators.text import zipf_fit


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_two_point_line_is_exact(spark):
    # counts: 'a' x4, 'b' x2 → ranks 1,2 → a perfect two-point line:
    # slope = (ln2 - ln4)/(ln2 - ln1) = -1, intercept = ln4, r2 = 1
    df = _docs(spark, ["a a a a b b"])
    row = zipf_fit(df, k=10).first()
    assert row.n_terms == 2
    assert row.slope == round(-1.0, 6)
    assert row.intercept == round(math.log(4.0), 6)
    assert row.r2 == 1.0


def test_matches_numpy_ols_with_ties(spark):
    texts = [
        "the the the the quick quick brown fox fox fox jumps over over",
        "the lazy dog dog and the quick cat cat cat",
    ]
    df = _docs(spark, texts)
    k = 6
    row = zipf_fit(df, k=k).first()
    # independent reference: counts → (cnt DESC, tok) top-k → OLS
    counts: dict[str, int] = {}
    for t in texts:
        for tok in t.lower().split():
            counts[tok] = counts.get(tok, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    x = np.log(np.arange(1, len(top) + 1, dtype=float))
    y = np.log(np.array([c for _, c in top], dtype=float))
    slope = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    intercept = y.mean() - slope * x.mean()
    r2 = np.corrcoef(x, y)[0, 1] ** 2
    assert row.n_terms == len(top)
    assert abs(row.slope - slope) < 1e-6
    assert abs(row.intercept - intercept) < 1e-6
    assert abs(row.r2 - r2) < 1e-6


def test_k_caps_vocab(spark):
    df = _docs(spark, ["a b c d e f g h"])
    assert zipf_fit(df, k=3).first().n_terms == 3


def test_no_global_sort_of_vocab(spark):
    # the rank window must run on the TakeOrdered top-k result, not the
    # vocabulary: the plan carries a TakeOrderedAndProject and NO global
    # Sort over the full counts relation
    df = _docs(spark, ["a b c a b a"])
    plan = zipf_fit(df, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
