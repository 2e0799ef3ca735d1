"""blocklist_filter (UT1-style domain suffix exclusion) and score_drift
(PSI between crawl snapshots) — the two crawl-monitoring/quality-exclusion
operators of the web-hygiene module."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _crawl(spark):
    rows = [
        (1, "https://spam.com/x"),              # exact entry match
        (2, "https://a.b.spam.com/y"),          # subdomain match
        (3, "https://notspam.com/z"),           # NOT a match (label-aligned)
        (4, "https://www.spam.com/w"),          # www subdomain match
        (5, "https://good.org/"),               # kept
        (6, None),                              # NULL url: pass through
        (7, "not a url"),                       # no host: pass through
        (8, "https://SPAM.com/upper"),          # case-insensitive
        (9, "https://evil.example.net/a"),      # second entry, subdomain
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


def _blocklist(spark):
    return spark.createDataFrame(
        [("spam.com",), ("Example.NET",)], "entry string"
    )


def test_blocklist_suffix_semantics(spark):
    from longqc_spark.operators.web import blocklist_filter

    kept = blocklist_filter(_crawl(spark), _blocklist(spark))
    assert sorted(r["doc_id"] for r in kept.collect()) == [3, 5, 6, 7]
    blocked = blocklist_filter(_crawl(spark), _blocklist(spark), keep_blocked=True)
    assert sorted(r["doc_id"] for r in blocked.collect()) == [1, 2, 4, 8, 9]


def test_blocklist_filter_broadcasts_entries(spark):
    """The blocklist side must arrive at the join as a broadcast — the
    corpus side sees one hash-join probe, no corpus shuffle."""
    from longqc_spark.operators.web import blocklist_filter

    plan = blocklist_filter(
        _crawl(spark), _blocklist(spark)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan[:2000]


def test_blocklist_max_labels_bounds_fanout(spark):
    from longqc_spark.operators.web import blocklist_filter

    deep = spark.createDataFrame(
        [(1, "https://" + ".".join(f"l{i}" for i in range(30)) + ".spam.com/x")],
        "doc_id long, url string",
    )
    # 32 labels but max_labels=3: only the 3 LONGEST suffixes are probed,
    # none of which is 'spam.com' → the row is NOT blocked (documented
    # truncation: entries shorter than host_labels-max_labels are missed)
    kept = blocklist_filter(deep, _blocklist(spark), max_labels=3)
    assert kept.count() == 1
    # with enough labels the suffix reaches the entry and blocks
    assert blocklist_filter(deep, _blocklist(spark), max_labels=32).count() == 0


def test_score_drift_identical_is_zero(spark):
    from longqc_spark.operators.web import score_drift

    df = spark.range(1000).select((F.col("id") % 97).cast("double").alias("s"))
    out = score_drift(df, df, "s", n_bins=8).toPandas()
    assert len(out) == 8
    assert (out.psi_term.abs() < 1e-9).all()
    assert abs(out.share_ref.sum() - 1.0) < 1e-5
    assert (out.share_ref == out.share_cur).all()


def test_score_drift_detects_shift(spark):
    from longqc_spark.operators.web import score_drift

    rng = np.random.default_rng(11)
    a = spark.createDataFrame(
        pd.DataFrame({"s": rng.normal(0.0, 1.0, 4000)})
    )
    b = spark.createDataFrame(
        pd.DataFrame({"s": rng.normal(1.0, 1.0, 4000)})  # mean shift = 1 sd
    )
    psi = score_drift(a, b, "s", n_bins=10).agg(F.sum("psi_term")).collect()[0][0]
    assert psi > 0.25  # "major shift" territory for a 1-sd mean move
    # and the same distribution re-sampled stays "stable"
    c = spark.createDataFrame(pd.DataFrame({"s": rng.normal(0.0, 1.0, 4000)}))
    psi2 = score_drift(a, c, "s", n_bins=10).agg(F.sum("psi_term")).collect()[0][0]
    assert psi2 < 0.1


def test_score_drift_out_of_range_clamps_to_edge_bins(spark):
    from longqc_spark.operators.web import score_drift

    ref = spark.range(100).select((F.col("id").cast("double") / 100).alias("s"))
    cur = spark.createDataFrame(
        pd.DataFrame({"s": [-5.0] * 10 + [99.0] * 10})
    )
    out = score_drift(ref, cur, "s", n_bins=4).toPandas().set_index("bin")
    assert out.loc[0, "share_cur"] == 0.5  # below-range mass lands in bin 0
    assert out.loc[3, "share_cur"] == 0.5  # above-range mass in the top bin
    assert out.loc[1, "share_cur"] == 0.0 and out.loc[2, "share_cur"] == 0.0


def test_score_drift_constant_ref_and_nulls(spark):
    """hi == lo (constant reference score) must not divide by zero; NULL
    scores are filtered from both sides."""
    from longqc_spark.operators.web import score_drift

    ref = spark.createDataFrame(pd.DataFrame({"s": [2.0] * 50}))
    cur = spark.createDataFrame([(2.0,), (None,), (2.0,)], "s double")
    out = score_drift(ref, cur, "s", n_bins=4).toPandas()
    assert out.share_ref.iloc[0] == 1.0  # everything in bin 0
    assert out.share_cur.iloc[0] == 1.0  # NULL filtered, not a bin
    assert abs(out.psi_term.sum()) < 1e-9


def test_score_drift_empty_side_yields_null_not_error(spark):
    from longqc_spark.operators.web import score_drift

    ref = spark.range(100).select(F.col("id").cast("double").alias("s"))
    empty = ref.filter(F.lit(False))
    out = score_drift(ref, empty, "s", n_bins=4).toPandas()
    assert len(out) == 4
    assert out.share_cur.isna().all()  # guarded NULL, not DIVIDE_BY_ZERO

    with pytest.raises(ValueError, match="n_bins"):
        score_drift(ref, ref, "s", n_bins=1)


def test_score_drift_psi_matches_numpy(spark):
    """Cross-check the full PSI pipeline against a straight numpy
    reimplementation on the same data."""
    from longqc_spark.operators.web import score_drift

    rng = np.random.default_rng(3)
    a, b = rng.exponential(2.0, 3000), rng.exponential(2.5, 3000)
    out = (
        score_drift(
            spark.createDataFrame(pd.DataFrame({"s": a})),
            spark.createDataFrame(pd.DataFrame({"s": b})),
            "s",
            n_bins=10,
        )
        .agg(F.sum("psi_term"))
        .collect()[0][0]
    )
    lo, hi = a.min(), a.max()
    edges = lo + (hi - lo) / 10 * np.arange(11)
    ca = np.histogram(a, bins=edges)[0].astype(float)
    cb = np.histogram(np.clip(b, lo, hi - 1e-12), bins=edges)[0].astype(float)
    pa = np.round(np.maximum(ca / ca.sum(), 1e-6), 6)
    pb = np.round(np.maximum(cb / cb.sum(), 1e-6), 6)
    psi = float(np.sum(np.round((pb - pa) * np.log(pb / pa), 6)))
    assert math.isclose(out, psi, rel_tol=0, abs_tol=2e-4)
