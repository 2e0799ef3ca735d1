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
