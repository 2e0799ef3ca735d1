"""Mirror-site detection (operators/mirror.py): pair math, the
boilerplate document-frequency guard, thresholds, NULL handling, and
the collapse anti-join."""

from pyspark.sql import functions as F

from longqc_spark.operators.mirror import (
    host_page_sets,
    mirror_collapse,
    mirror_pairs,
)


def _corpus(spark):
    # m1/m2: perfect mirrors (4 shared pages). big/part: partial overlap
    # (2 of big's 6 pages = part's whole set -> containment 1.0 for the
    # pair via the smaller side). solo: no overlap. Every host also
    # carries the boilerplate digest "bp" (on 6 hosts > max_hosts=4).
    rows = []
    for i in range(4):
        rows += [("m1", f"p{i}"), ("m2", f"p{i}")]
    for i in range(6):
        rows.append(("big", f"b{i}"))
    rows += [("part", "b0"), ("part", "b1")]
    rows.append(("solo", "s0"))
    for h in ("m1", "m2", "big", "part", "solo", "other"):
        rows.append((h, "bp"))
    df = spark.createDataFrame(rows, "host string, digest string")
    return df.withColumn("doc_id", F.monotonically_increasing_id())


def test_page_sets_guard_and_nulls(spark):
    df = _corpus(spark).unionByName(
        spark.createDataFrame(
            [(None, "x", 900), ("h", None, 901)],
            "host string, digest string, doc_id bigint",
        )
    )
    hd = host_page_sets(df, max_hosts=4)
    digs = {r["digest"] for r in hd.select("digest").distinct().collect()}
    assert "bp" not in digs  # boilerplate cut
    assert None not in digs
    assert hd.where(F.col("host").isNull()).count() == 0


def test_mirror_pairs_values(spark):
    pairs = mirror_pairs(
        _corpus(spark), min_shared=2, min_containment=0.5, max_hosts=4
    ).collect()
    got = {(r["host_a"], r["host_b"]): r for r in pairs}
    assert set(got) == {("m1", "m2"), ("big", "part")}
    m = got[("m1", "m2")]
    assert (m["shared"], m["size_a"], m["size_b"]) == (4, 4, 4)
    assert m["containment"] == 1.0 and m["jaccard"] == 1.0
    p = got[("big", "part")]
    assert (p["shared"], p["size_a"], p["size_b"]) == (2, 6, 2)
    assert p["containment"] == 1.0 and abs(p["jaccard"] - 2 / 6) < 1e-6


def test_thresholds_suppress(spark):
    # min_shared=5 kills both pairs; containment just above 1.0 kills too
    assert mirror_pairs(_corpus(spark), min_shared=5, max_hosts=4).count() == 0
    few = mirror_pairs(
        _corpus(spark), min_shared=2, min_containment=1.01, max_hosts=4
    )
    assert few.count() == 0


def test_mirror_collapse(spark):
    df = _corpus(spark)
    pairs = mirror_pairs(df, min_shared=2, min_containment=0.5, max_hosts=4)
    kept = mirror_collapse(df, pairs)
    hosts = {r["host"] for r in kept.select("host").distinct().collect()}
    # losers: m2 (of m1/m2) and part (of big/part)
    assert hosts == {"m1", "big", "solo", "other"}
    # survivors keep ALL their rows, including boilerplate ones
    assert kept.where(F.col("host") == "m1").count() == 5


def test_web_hygiene_collapse_mirrors(spark):
    from longqc_spark.curation import web_hygiene

    # hosts a/b are mirrors (3 shared texts); c is unrelated
    rows = []
    for i in range(3):
        rows.append((f"https://ma.example/p{i}", f"shared text {i}"))
        rows.append((f"https://mb.example/p{i}", f"shared text {i}"))
    rows.append(("https://c.example/only", "unique text"))
    df = spark.createDataFrame(rows, "url string, text string")
    out = web_hygiene(
        df, collapse_mirrors=True, mirror_min_shared=2, mirror_max_hosts=4
    )
    urls = sorted(r["url"] for r in out.collect())
    assert urls == [
        "https://c.example/only",
        "https://ma.example/p0",
        "https://ma.example/p1",
        "https://ma.example/p2",
    ]
    assert out.columns == df.columns  # helper columns dropped


def test_collapse_plan_broadcasts_losers(spark):
    df = _corpus(spark)
    pairs = mirror_pairs(df, min_shared=2, max_hosts=4)
    plan = (
        mirror_collapse(df, pairs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
