"""The end-to-end curation facade: every stage gates correctly and the
composition equals the stepwise manual pipeline."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from longqc_spark.config import DRIVER_DOCS_CONFIG
from longqc_spark.curation import curate
from longqc_spark.pipeline import qc_pipeline


@pytest.fixture(scope="module")
def docs(spark, sf001):
    return spark.read.parquet(f"{sf001}/documents.parquet")


def test_curate_full_funnel(spark, docs):
    # run-1 store: labels of a third of the corpus (digest column included)
    committed = qc_pipeline(
        docs.filter(F.col("doc_id") % 3 == 0),
        cfg=DRIVER_DOCS_CONFIG,
        key_cols=["doc_id"],
    ).select("doc_id", "payload_md5")
    # eval set: 5 full documents verbatim → guaranteed shingle overlap
    eval_df = (
        docs.filter(F.col("doc_id").isin([1, 7, 11, 13, 17]))
        .select(F.col("doc_id").alias("eval_id"), "text")
    )

    out = curate(
        docs,
        cfg=DRIVER_DOCS_CONFIG,
        key_col="doc_id",
        text_col="text",
        exclude_labels=committed,
        eval_df=eval_df,
        shard_bytes=20_000,
    ).toPandas()

    # stage 1: every excluded payload is gone (doc_id%3==0 had its digests
    # committed; identical payloads elsewhere are rare but legitimate)
    assert not set(out.doc_id) & set(range(0, 500, 3))
    # stage 2: only keepers survive
    assert out.keep.all()
    # stage 3: the verbatim eval docs are decontaminated away
    assert not set(out.doc_id) & {1, 7, 11, 13, 17}
    # stage 4: split is total and deterministic
    assert set(out.split) <= {"train", "val", "test"}
    assert (out.groupby("split").size() > 0).all()
    # stage 5: shards are byte-bounded (target + one max doc)
    sizes = out.groupby("shard").n_chars.sum()
    assert (sizes <= 20_000 + out.n_chars.max()).all()
    assert out.shard.min() == 0

    # composition == stepwise manual pipeline (same operators, same order)
    from longqc_spark.operators.dedup import contamination_check, incremental_dedup
    from longqc_spark.operators.relational import assign_shards
    from longqc_spark.operators.text import dataset_split_expr

    step = incremental_dedup(docs, committed, key_col="doc_id", text_col="text")
    step = qc_pipeline(step, DRIVER_DOCS_CONFIG, key_cols=["doc_id"]).filter("keep")
    bad = contamination_check(docs, eval_df, key_col="doc_id", text_col="text")
    step = step.join(F.broadcast(bad.select("doc_id")), "doc_id", "left_anti")
    step = step.withColumn("split", dataset_split_expr("doc_id"))
    step = assign_shards(step, shard_bytes=20_000, bytes_col="n_chars", key_col="doc_id")
    want = step.toPandas()

    a = out.sort_values("doc_id").reset_index(drop=True)
    b = want.sort_values("doc_id").reset_index(drop=True)
    assert a.doc_id.tolist() == b.doc_id.tolist()
    pd.testing.assert_series_equal(a.split, b.split)
    pd.testing.assert_series_equal(a.shard, b.shard)


def test_curate_dedup_scope_bounds_both_dedup_stages(spark, docs):
    """dedup_scope_col gives the funnel's exact AND near dedup stages a
    per-dump horizon: an exact copy in another dump survives payload_dedup,
    and a near-copy in another dump survives the LSH stage — while same-dump
    duplicates still collapse. The unscoped run collapses both."""
    # a text known to pass the QC rules, so the keep gate doesn't interfere
    keep = qc_pipeline(docs, cfg=DRIVER_DOCS_CONFIG, key_cols=["doc_id"]).filter(
        "keep"
    )
    base = (
        docs.join(keep.select("doc_id"), "doc_id", "left_semi")
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]
        .text
    )
    toks = base.split()
    toks[5] = "changed"
    near = " ".join(toks)
    rows = [
        (1, 0, base),   # dump 0 original
        (2, 0, base),   # dump 0 exact copy → collapses into 1
        (3, 1, base),   # dump 1 exact copy → SURVIVES under scope
        (4, 1, near),   # dump 1 near-copy of doc 3 → collapses into 3
        (5, 2, near),   # dump 2 near-copy → SURVIVES under scope
    ]
    docs = spark.createDataFrame(rows, "doc_id long, dump int, text string")
    kw = dict(
        cfg=DRIVER_DOCS_CONFIG,
        key_col="doc_id",
        payload_dedup=True,
        neardup_threshold=0.5,
    )
    scoped = curate(docs, dedup_scope_col="dump", **kw)
    got = sorted(r.doc_id for r in scoped.select("doc_id").collect())
    assert got == [1, 3, 5]
    unscoped = curate(docs, **kw)
    # globally everything is one near-dup cluster → a single survivor
    assert sorted(r.doc_id for r in unscoped.select("doc_id").collect()) == [1]


def test_curate_stages_optional(spark, docs):
    """With no optional inputs, curate == qc_pipeline keepers + split."""
    out = curate(docs, cfg=DRIVER_DOCS_CONFIG, key_col="doc_id").toPandas()
    want = (
        qc_pipeline(docs, DRIVER_DOCS_CONFIG, key_cols=["doc_id"])
        .filter("keep")
        .toPandas()
    )
    assert sorted(out.doc_id) == sorted(want.doc_id)
    assert "shard" not in out.columns
    assert set(out.split) <= {"train", "val", "test"}


def test_domain_stats_blocklist(spark, corpus_path):
    from longqc_spark.operators.text import domain_stats

    labels = qc_pipeline(spark.read.parquet(corpus_path))
    stats = domain_stats(labels, min_docs=3, max_drop_rate=0.8).toPandas()
    assert len(stats) > 0
    assert (stats.n_docs >= 3).all()
    assert ((stats.keep_rate >= 0) & (stats.keep_rate <= 1)).all()
    # blocklist flag consistent with the rate it derives from
    assert (stats.blocklist_candidate == ((1 - stats.keep_rate) > 0.8)).all()
    # domains parse to real hosts (no scheme, no path)
    assert stats.domain.str.contains("://").sum() == 0
    assert stats.domain.str.contains("/").sum() == 0


def test_mix_sources_quotas_and_stability(spark, docs):
    from longqc_spark.operators.text import mix_sources

    weights = {"src0": 0.5, "src1": 0.25, "src2": 0.25}
    a = mix_sources(docs, weights, n_total=40).toPandas()
    counts = a.source.value_counts()
    assert counts["src0"] == 20 and counts["src1"] == 10 and counts["src2"] == 10
    # absent sources contribute nothing
    assert set(a.source) == {"src0", "src1", "src2"}
    # repartition-stable
    b = mix_sources(docs.repartition(11), weights, n_total=40).toPandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)
    # quota above a source's cardinality caps at the source
    tiny = mix_sources(docs, {"src0": 1.0}, n_total=10**6).toPandas()
    assert len(tiny) == len(docs.filter("source = 'src0'").toPandas())


def test_temperature_quotas_arithmetic():
    from longqc_spark.operators.text import temperature_quotas

    # alpha=1 → proportional (largest remainder): 100 seats over 80/15/5
    q = temperature_quotas(
        {"a": 80.0, "b": 15.0, "c": 5.0}, {"a": 99, "b": 99, "c": 99}, 100, 1.0
    )
    assert q == {"a": 80, "b": 15, "c": 5}
    # alpha→0 → uniform (every mass^0 = 1)
    q0 = temperature_quotas(
        {"a": 80.0, "b": 15.0, "c": 5.0}, {"a": 99, "b": 99, "c": 99}, 99, 0.0
    )
    assert q0 == {"a": 33, "b": 33, "c": 33}
    # alpha=0.5 sits strictly between: the head source loses seats to tails
    qh = temperature_quotas(
        {"a": 80.0, "b": 15.0, "c": 5.0}, {"a": 99, "b": 99, "c": 99}, 100, 0.5
    )
    assert sum(qh.values()) == 100 and 5 < qh["c"] < 33 and qh["a"] < 80
    # a binding cap redistributes the surplus among uncapped sources, and
    # quotas never exceed caps
    qc = temperature_quotas(
        {"a": 80.0, "b": 15.0, "c": 5.0}, {"a": 10, "b": 99, "c": 99}, 100, 1.0
    )
    assert qc["a"] == 10 and sum(qc.values()) == 100
    # 15:5 split of the 90 surplus seats = 67.5:22.5 → remainder tie goes
    # to the lexicographically-first name
    assert qc["b"] == 68 and qc["c"] == 22
    # zero-mass / zero-cap sources get nothing; infeasible totals cap out
    qz = temperature_quotas({"a": 0.0, "b": 8.0}, {"a": 5, "b": 3}, 10, 0.5)
    assert qz == {"b": 3}


def test_mix_sources_temperature(spark, docs):
    from longqc_spark.operators.text import (
        mix_sources_temperature,
        temperature_quotas,
    )

    srcs = ["src0", "src1", "src2", "src3"]
    out = mix_sources_temperature(
        docs, sources=srcs, n_total=60, alpha=0.5, mass_col="n_chars"
    ).toPandas()
    # quotas match the driver-side arithmetic replayed on the same stats
    stats = (
        docs.filter(F.col("source").isin(srcs))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("m"))
        .collect()
    )
    expect = temperature_quotas(
        {r["source"]: float(r["m"]) for r in stats},
        {r["source"]: int(r["n"]) for r in stats},
        60,
        0.5,
    )
    got = out.source.value_counts().to_dict()
    assert got == expect and sum(got.values()) == 60
    # repartition-stable (md5-priority winners, not partition order)
    again = mix_sources_temperature(
        docs.repartition(13), sources=srcs, n_total=60, alpha=0.5,
        mass_col="n_chars",
    ).toPandas()
    assert sorted(out.doc_id) == sorted(again.doc_id)


def test_curate_web_hygiene_stage0(spark, docs):
    """Stage 0 (snapshot collapse → domain cap → global line dedup) gates
    and composes: aliases collapse to the newest fetch, mega-domains are
    capped, corpus-frequent boilerplate lines vanish from kept text."""
    # 3 synthetic fetches per page (url aliases differing by tracking
    # params), one boilerplate line planted in EVERY doc's text
    d = F.col("doc_id")
    crawl = (
        docs.filter(d < 120)
        .withColumn(
            "url",
            F.concat(
                F.lit("https://site"), (d % 4).cast("string"),
                F.lit(".com/p"), (d % 30).cast("string"),
                F.when(d % 3 == 0, F.lit("?utm_source=x")).otherwise(F.lit("")),
            ),
        )
        .withColumn(
            "warc_ts",
            F.expr(
                "timestamp'2025-01-01' + make_interval(0,0,0,"
                "CAST(doc_id % 9 AS INT),0,0,0)"
            ),
        )
        .withColumn("text", F.concat(F.lit("COOKIE BANNER\n"), F.col("text")))
    )

    bl = spark.createDataFrame([("site2.com",)], "entry string")
    out = curate(
        crawl,
        cfg=DRIVER_DOCS_CONFIG,
        key_col="url",
        text_col="text",
        collapse_snapshots=True,
        domain_cap_n=20,
        line_dedup_min_docs=3,
        blocklist=bl,
    )
    pdf = out.toPandas()
    # blocklist runs FIRST: no site2.com page survives anywhere downstream
    assert not pdf.url.str.contains("site2.com").any()
    # snapshot collapse: at most one row per canonical page (4*30=120 pages,
    # 3 aliases each → <= 120/3 + cap effects survivors)
    assert len(pdf) <= 120
    # the planted corpus-wide boilerplate line is gone from every kept text
    assert not pdf.scrubbed_text.str.contains("COOKIE BANNER").any()
    # domain cap: no domain contributes more than 20 kept rows
    assert pdf.url.str.extract(r"https://(site\d)")[0].value_counts().max() <= 20


def test_curate_line_dedup_requires_text(spark, docs):
    with pytest.raises(ValueError, match="text column"):
        curate(
            docs.filter(F.col("doc_id") < 10)
            .withColumn("url", F.concat(F.lit("https://a.com/"), F.col("doc_id")))
            .withColumn("html", F.col("text").cast("binary"))
            .drop("text"),
            cfg=DRIVER_DOCS_CONFIG,
            key_col="url",
            html_col="html",
            line_dedup_min_docs=3,
        )


def test_web_hygiene_scrub_spans_stage(spark):
    """Stage-0 span scrub: later occurrences of a duplicated 4-token span
    are cut from the text, other columns survive the rewrite, and rows with
    NULL text pass through untouched (NULL-identity rule)."""
    from longqc_spark.curation import web_hygiene

    crawl = spark.createDataFrame(
        [
            ("https://a.com/1", "alpha beta gamma delta tail", "en"),
            ("https://b.com/2", "head alpha beta gamma delta", "en"),
            ("https://c.com/3", None, "en"),
        ],
        "url string, text string, lang string",
    )
    out = {
        r["url"]: r
        for r in web_hygiene(crawl, scrub_span_window=4).collect()
    }
    assert out["https://a.com/1"]["text"] == "alpha beta gamma delta tail"
    assert out["https://b.com/2"]["text"] == "head"
    assert out["https://c.com/3"]["text"] is None
    assert out["https://b.com/2"]["lang"] == "en"  # non-text columns intact


def test_curate_scrub_spans_requires_text(spark, docs):
    with pytest.raises(ValueError, match="TEXT column"):
        curate(
            docs.filter(F.col("doc_id") < 10)
            .withColumn("url", F.concat(F.lit("https://a.com/"), F.col("doc_id")))
            .withColumn("html", F.col("text").cast("binary"))
            .drop("text"),
            key_col="url",
            html_col="html",
            scrub_span_window=8,
        )


def test_web_hygiene_optout_and_lang_thresholds(spark):
    """Stage-0 wiring for the round-4g gates: opt-out pages drop before
    anything else, per-lang thresholds apply after encoding repair, and
    both raise actionable errors when their input column is missing."""
    from longqc_spark.curation import web_hygiene

    rows = [
        ("u1", b"<html><head></head><body>ok</body></html>", "en", "x " * 150),
        ("u2", b'<html><head><meta name="robots" content="noai"></head></html>', "en", "x " * 150),
        ("u3", b"<html><head></head><body>ok</body></html>", "zh", "好" * 60),
        ("u4", b"<html><head></head><body>ok</body></html>", "zh", "好" * 20),
    ]
    df = spark.createDataFrame(rows, "url string, html binary, lang string, text string")
    out = web_hygiene(
        df,
        respect_optout=True,
        lang_thresholds={"zh": (50, 100_000, 0.6)},
        lang_default=(200, 100_000, 0.3),
    )
    assert sorted(r["url"] for r in out.collect()) == ["u1", "u3"]

    # missing html column -> actionable error
    with pytest.raises(ValueError, match="html"):
        web_hygiene(df.drop("html"), respect_optout=True)
    # missing lang column -> actionable error
    with pytest.raises(ValueError, match="lang"):
        web_hygiene(df.drop("lang"), lang_thresholds={"zh": (50, 100_000, 0.6)})
    # extraction-deferred html input without a text column -> refuse
    with pytest.raises(ValueError, match="TEXT"):
        web_hygiene(
            df.drop("text"), html_col="html",
            lang_thresholds={"zh": (50, 100_000, 0.6)},
        )


def test_curate_respects_optout_and_lang_thresholds(spark, docs):
    """curate() plumbs the two new hygiene knobs: the opted-out page never
    reaches QC, the per-lang floor prunes before the QC stage, and the
    observe hook shows the hygiene stage doing the dropping."""
    from longqc_spark.curation import curate

    base = docs.limit(40).withColumn(
        "html",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.encode(F.lit('<html><head><meta name="robots" content="noindex"></head></html>'), "UTF-8"),
        ).otherwise(F.encode(F.lit("<html><body>fine</body></html>"), "UTF-8")),
    ).withColumn("url", F.col("doc_id").cast("string"))
    obs: dict = {}
    out = curate(
        base,
        cfg=DRIVER_DOCS_CONFIG,
        key_col="url",
        respect_optout=True,
        lang_thresholds={"zh": (1, 1_000_000, 1.0)},
        lang_default=(1, 1_000_000, 1.0),
        observe=obs,
    )
    kept = [int(r["url"]) for r in out.select("url").collect()]
    assert all(k % 5 != 0 for k in kept)
    n_in = obs["input"].get["n"]
    n_hyg = obs["hygiene"].get["n"]
    assert n_in == 40 and n_hyg == 32  # exactly the doc_id%5==0 pages dropped


def test_web_hygiene_declared_canonical_dedup(spark):
    """dedup_urls_declared: aliases declaring the same rel-canonical
    collapse to one winner even with unrelated fetch URLs; missing html
    column raises an actionable error."""
    from longqc_spark.curation import web_hygiene

    link = b'<html><head><link rel="canonical" href="https://c.ex/one"></head></html>'
    rows = [
        ("https://a.com/x?utm_source=1", link),
        ("https://mirror.net/y", link),
        ("https://b.com/z", b"<html></html>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = web_hygiene(df, dedup_urls_declared=True)
    kept = sorted(r["url"] for r in out.collect())
    assert kept == ["https://a.com/x?utm_source=1", "https://b.com/z"]
    with pytest.raises(ValueError, match="html"):
        web_hygiene(df.drop("html"), dedup_urls_declared=True)
