"""Monitoring operators: calibration_bins (reliability/ECE) and ks_drift
(two-sample Kolmogorov-Smirnov) — the two standing alarms a production
quality-filter pipeline runs per crawl snapshot (is the scorer honest?
did the metric distribution move?).
"""

import math

import numpy as np
from pyspark.sql import functions as F

from longqc_spark.operators.relational import calibration_bins
from longqc_spark.operators.web import ks_drift


def _scored(spark, rows):
    return spark.createDataFrame(rows, "score double, label boolean")


def test_perfectly_calibrated_scorer_has_zero_ece(spark):
    # bin k gets score k/10 + 0.05 with EXACTLY that fraction positive
    rows = []
    for k in range(10):
        s = k / 10 + 0.05
        pos = k  # k of 10 rows positive -> frac_pos ~ s within 0.05
        rows += [(s, i < pos) for i in range(10)]
    out = calibration_bins(_scored(spark, rows), "score", "label").collect()
    assert [r.bin for r in out] == list(range(10))
    for r in out:
        assert abs(r.gap - 0.05) < 1e-9  # mean_score k/10+0.05 vs k/10
    assert abs(sum(r.ece_term for r in out) - 0.05) < 1e-6


def test_overconfident_scorer_flagged(spark):
    # every row scored 0.95 but only 40% positive -> single bin, gap 0.55
    rows = [(0.95, i < 4) for i in range(10)]
    out = calibration_bins(_scored(spark, rows), "score", "label").collect()
    assert len(out) == 1 and out[0].bin == 9
    assert abs(out[0].gap - 0.55) < 1e-9
    assert abs(out[0].ece_term - 0.55) < 1e-9  # only bin carries all weight


def test_edge_clamping_and_nulls(spark):
    rows = [(-0.2, True), (1.3, False), (None, True), (0.5, None)]
    out = {r.bin: r for r in calibration_bins(_scored(spark, rows), "score", "label").collect()}
    assert set(out) == {0, 5, 9}  # NULL score filtered; out-of-range clamp
    assert out[5].frac_pos == 0.0  # NULL label counts negative


def test_ks_identical_and_disjoint(spark):
    a = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    same = ks_drift(a, a, "v").first()
    assert same.ks == 0.0 and same.n_ref == 100 and same.n_cur == 100
    b = spark.createDataFrame([(float(i + 1000),) for i in range(50)], "v double")
    assert ks_drift(a, b, "v").first().ks == 1.0  # fully separated CDFs


def test_ks_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    xa = rng.normal(0, 1, 400).round(3)
    xb = rng.normal(0.3, 1.2, 300).round(3)
    a = spark.createDataFrame([(float(v),) for v in xa], "v double")
    b = spark.createDataFrame([(float(v),) for v in xb], "v double")
    got = ks_drift(a, b, "v").first().ks
    # independent reference: classic two-sample KS over the pooled grid
    grid = np.unique(np.concatenate([xa, xb]))
    cdfa = np.searchsorted(np.sort(xa), grid, side="right") / len(xa)
    cdfb = np.searchsorted(np.sort(xb), grid, side="right") / len(xb)
    assert abs(got - np.abs(cdfa - cdfb).max()) < 1e-6
    # and the shift IS detectable at alpha=0.05
    crit = 1.358 * math.sqrt((400 + 300) / (400 * 300))
    assert got > crit


def test_ks_quantization_bounds_grid(spark):
    # precision=1 -> at most ~ (range*10 + 1) distinct grid values feed the
    # window, however many input rows there are
    a = spark.createDataFrame(
        [(float(i) / 997,) for i in range(5000)], "v double"
    )
    row = ks_drift(a, a, "v", precision=1).first()
    assert row.ks == 0.0 and row.n_ref == 5000


def _serial_pav(weights, rates):
    """Sequential pool-adjacent-violators on (weight, rate) bins —
    returns one fitted value per input bin."""
    blocks = []  # [pooled_weight, pooled_mass]
    for w, r in zip(weights, rates):
        blocks.append([w, w * r])
        while len(blocks) > 1 and (
            blocks[-2][1] / blocks[-2][0] > blocks[-1][1] / blocks[-1][0]
        ):
            w2, m2 = blocks.pop()
            blocks[-1][0] += w2
            blocks[-1][1] += m2
    res = []
    bi = 0
    for w, m in blocks:  # expand each pooled block back over its bins
        acc = 0
        while acc < w - 1e-9:
            acc += weights[bi]
            res.append(m / w)
            bi += 1
    return res


def test_isotonic_matches_serial_pav(spark):
    from longqc_spark.operators.relational import isotonic_calibration

    rng = np.random.default_rng(5)
    rows = []
    rates = rng.uniform(0, 1, 10)
    counts = rng.integers(5, 30, 10)
    for k in range(10):
        s = k / 10 + 0.05
        pos = round(float(rates[k]) * int(counts[k]))
        rows += [(s, i < pos) for i in range(int(counts[k]))]
    out = isotonic_calibration(_scored(spark, rows), "score", "label").collect()
    want = _serial_pav(
        [int(c) for c in counts],
        [round(float(r) * int(c)) / int(c) for r, c in zip(rates, counts)],
    )
    assert [r.bin for r in out] == list(range(10))
    for r, w in zip(out, want):
        assert abs(r.iso_rate - w) < 5e-7  # 6dp rounding on the operator
    # monotone
    vals = [r.iso_rate for r in out]
    assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:]))


def test_isotonic_monotone_input_unchanged(spark):
    from longqc_spark.operators.relational import isotonic_calibration

    rows = []
    for k in range(5):
        s = k / 5 + 0.1
        rows += [(s, i < 2 * k) for i in range(10)]  # rates 0,.2,.4,.6,.8
    out = isotonic_calibration(_scored(spark, rows), "score", "label", n_bins=5).collect()
    for r in out:
        assert abs(r.iso_rate - r.raw_rate) < 1e-9


def test_isotonic_pools_violation(spark):
    from longqc_spark.operators.relational import isotonic_calibration

    # two bins, equal weight, rates 0.8 then 0.2 -> both pool to 0.5
    rows = [(0.2, i < 8) for i in range(10)] + [(0.7, i < 2) for i in range(10)]
    out = isotonic_calibration(_scored(spark, rows), "score", "label", n_bins=2).collect()
    assert [r.iso_rate for r in out] == [0.5, 0.5]


def test_isotonic_null_handling_and_validation(spark):
    import pytest

    from longqc_spark.operators.relational import isotonic_calibration

    rows = [(0.1, True), (None, True), (0.9, None)]
    out = isotonic_calibration(
        _scored(spark, rows), "score", "label", n_bins=2
    ).collect()
    # NULL score filtered; NULL label counts negative
    assert sum(r.n for r in out) == 2 and sum(r.pos for r in out) == 1
    with pytest.raises(ValueError):
        isotonic_calibration(_scored(spark, rows), "score", "label", n_bins=1)
    with pytest.raises(ValueError):
        isotonic_calibration(_scored(spark, rows), "score", "label", n_bins=1000)
