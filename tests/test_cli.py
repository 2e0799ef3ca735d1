"""CLI entry-point regression: flag plumbing, guard rails, and report
artifacts — the local twin of the spark-submit launch (test_submit.py)."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from longqc_spark.cli import main


def test_cli_end_to_end_with_fuzzy_and_report(spark, corpus_path, tmp_path):
    out = str(tmp_path / "cli_out")
    rc = main(
        [
            "--input", corpus_path,
            "--out", out,
            "--buckets", "2",
            "--fuzzy-scrub",
            "--report",
            "--local-cores", "8",
        ]
    )
    assert rc == 0
    m = json.load(open(os.path.join(out, "manifest.json")))
    assert len(m["committed"]) == 2
    # the fuzzy flag is checkpoint identity: resuming without it must refuse
    with pytest.raises(ValueError, match="run config differs"):
        main(["--input", corpus_path, "--out", out, "--buckets", "2",
              "--local-cores", "8"])
    # same flags → no-op resume
    assert main(["--input", corpus_path, "--out", out, "--buckets", "2",
                 "--fuzzy-scrub", "--local-cores", "8"]) == 0
    assert os.path.exists(os.path.join(out, "report.json"))
    assert os.path.exists(os.path.join(out, "report.html"))
    labels = spark.read.parquet(os.path.join(out, "data"))
    assert labels.filter(F.col("keep").isNull()).count() == 0


def test_cli_expire_keep_zero_rejected(corpus_path, tmp_path):
    out = str(tmp_path / "cli_exp")
    with pytest.raises(ValueError, match="keep_last"):
        main(["--input", corpus_path, "--out", out, "--buckets", "1",
              "--expire-keep", "0", "--local-cores", "8"])


def test_cli_incremental_exclude_and_waves(spark, corpus_path, tmp_path):
    """--exclude-labels composes the cross-run dedup from the CLI; the
    second run admits only payloads absent from the first run's store.
    --wave-buckets plumbs through (manifest complete)."""
    run1 = str(tmp_path / "r1")
    assert main(["--input", corpus_path, "--out", run1, "--buckets", "2",
                 "--wave-buckets", "1", "--local-cores", "8"]) == 0
    m1 = json.load(open(os.path.join(run1, "manifest.json")))
    assert len(m1["committed"]) == 2

    run2 = str(tmp_path / "r2")
    assert main(["--input", corpus_path, "--out", run2, "--buckets", "2",
                 "--exclude-labels", run1, "--local-cores", "8"]) == 0
    # identical input fully excluded: nothing admitted in run 2
    labels2 = spark.read.parquet(os.path.join(run2, "data"))
    assert labels2.count() == 0
    m2 = json.load(open(os.path.join(run2, "manifest.json")))
    assert sum(v["n_in"] for v in m2["committed"].values()) == 0


def test_cli_web_hygiene_stage0(spark, corpus_path, tmp_path):
    """--collapse-snapshots / --domain-cap / --line-dedup-min-docs apply
    crawl-level hygiene before the lineage run: the committed labels store
    holds one row per canonical page, capped per domain, with the planted
    corpus-wide boilerplate line scrubbed out of every text."""
    docs = spark.read.parquet(corpus_path)
    n = docs.count()
    crawl = (
        docs.withColumn("rn", F.row_number().over(Window.orderBy("url")))
        .withColumn(
            "url",
            F.concat(
                F.lit("https://host"), (F.col("rn") % 3).cast("string"),
                F.lit(".com/p"), (F.col("rn") % 20).cast("string"),
                F.when(F.col("rn") % 2 == 0, F.lit("?utm_source=t"))
                .otherwise(F.lit("")),
            ),
        )
        .withColumn(
            "warc_ts",
            F.expr("timestamp'2025-06-01' + make_interval(0,0,0,"
                   "CAST(rn % 7 AS INT),0,0,0)"),
        )
        .withColumn("text", F.concat(F.lit("SHARED NAV BAR\n"), F.col("text")))
        .drop("rn")
    )
    crawl_path = str(tmp_path / "crawl")
    crawl.write.parquet(crawl_path)

    out = str(tmp_path / "hyg_out")
    rc = main(
        [
            "--input", crawl_path,
            "--out", out,
            "--buckets", "2",
            "--collapse-snapshots",
            "--domain-cap", "15",
            "--line-dedup-min-docs", "3",
            "--local-cores", "8",
        ]
    )
    assert rc == 0
    labels = spark.read.parquet(os.path.join(out, "data"))
    pdf = labels.toPandas()
    # collapse: 3 hosts x 20 paths = 60 canonical pages max (from n aliases)
    assert 0 < len(pdf) <= min(60, n)
    assert pdf.url.nunique() == len(pdf)
    # domain cap respected per registered domain
    assert pdf.url.str.extract(r"https://(host\d)")[0].value_counts().max() <= 15
    # global line dedup removed the planted boilerplate from every survivor
    assert not pdf.scrubbed_text.str.contains("SHARED NAV BAR").any()


def test_cli_blocklist(spark, corpus_path, tmp_path):
    """--blocklist runs FIRST in hygiene stage 0 (suffix semantics, comments
    skipped) and is part of the checkpoint identity: a resume with different
    blocklist flags is rejected."""
    docs = spark.read.parquet(corpus_path)
    crawl = docs.withColumn(
        "url",
        F.concat(
            F.lit("https://sub.host"),
            F.pmod(F.xxhash64("url"), F.lit(4)).cast("string"),
            F.lit(".com/p"),
            F.row_number().over(Window.orderBy("url")).cast("string"),
        ),
    )
    crawl_path = str(tmp_path / "crawl")
    crawl.write.parquet(crawl_path)
    bl_path = str(tmp_path / "bl.txt")
    with open(bl_path, "w") as f:
        f.write("# adult/malware list\n\nhost1.com\nhost3.com\n")

    out = str(tmp_path / "bl_out")
    assert main(
        ["--input", crawl_path, "--out", out, "--buckets", "2",
         "--blocklist", bl_path, "--local-cores", "8"]
    ) == 0
    labels = spark.read.parquet(os.path.join(out, "data"))
    hosts = labels.select(
        F.regexp_extract("url", r"https://sub\.(host\d)\.com", 1).alias("h")
    ).distinct()
    got = sorted(r["h"] for r in hosts.collect())
    assert got == ["host0", "host2"]  # subdomains of blocked hosts dropped
    # different blocklist on resume → rejected (checkpoint identity)
    with pytest.raises(ValueError, match="run config differs"):
        main(["--input", crawl_path, "--out", out, "--buckets", "2",
              "--local-cores", "8"])


def test_cli_drift_against(spark, corpus_path, tmp_path, capsys):
    """--drift-against compares this run's label distributions to a previous
    committed store: identical input is stable everywhere; a truncated
    re-crawl trips the major-drift alert."""
    run1 = str(tmp_path / "drift_run1")
    assert main(["--input", corpus_path, "--out", run1, "--buckets", "2",
                 "--local-cores", "8"]) == 0

    run2 = str(tmp_path / "drift_run2")
    assert main(["--input", corpus_path, "--out", run2, "--buckets", "2",
                 "--drift-against", run1, "--local-cores", "8"]) == 0
    err = capsys.readouterr().err
    assert "drift n_chars: psi=" in err
    assert "(stable)" in err and "DRIFT ALERT" not in err

    trunc = str(tmp_path / "trunc")
    spark.read.parquet(corpus_path).withColumn(
        "text", F.substring("text", 1, 60)
    ).write.parquet(trunc)
    run3 = str(tmp_path / "drift_run3")
    assert main(["--input", trunc, "--out", run3, "--buckets", "2",
                 "--drift-against", run1, "--local-cores", "8"]) == 0
    err = capsys.readouterr().err
    assert "(major)" in err and "DRIFT ALERT" in err


def test_cli_curate_export(spark, corpus_path, tmp_path):
    """--curate-out exports the user-facing funnel from the committed labels
    store: keep rows only, decontaminated against the eval set, split +
    shard columns present — resumable lineage commit first, curated training
    table second."""
    out = str(tmp_path / "run")
    curated_dir = str(tmp_path / "curated")
    # eval set = the first corpus doc's text → that doc must be decontaminated
    docs = spark.read.parquet(corpus_path)
    first = docs.orderBy("url").limit(1).select(
        F.lit(0).alias("eval_id"), F.col("text")
    )
    eval_path = str(tmp_path / "eval")
    first.write.parquet(eval_path)

    rc = main(
        [
            "--input", corpus_path,
            "--out", out,
            "--buckets", "2",
            "--curate-out", curated_dir,
            "--decontam-eval", eval_path,
            "--shard-bytes", "50000",
            "--local-cores", "8",
        ]
    )
    assert rc == 0
    curated = spark.read.parquet(curated_dir)
    assert {"split", "shard", "shard_key"} <= set(curated.columns)
    assert curated.filter(~F.col("keep")).count() == 0
    labels = spark.read.parquet(os.path.join(out, "data"))
    n_keep = labels.filter(F.col("keep")).count()
    # decontam dropped the planted eval doc (if it survived QC) and nothing else
    assert n_keep - 1 <= curated.count() <= n_keep
    # splits cover only train/val/test and all shards are contiguous 0..max
    assert {r["split"] for r in curated.select("split").distinct().collect()} <= {
        "train", "val", "test"
    }


def test_cli_digest_index(spark, corpus_path, tmp_path):
    """--digest-index materializes the committed digests as a bucketed
    catalog table; deduping the same corpus against it admits nothing."""
    import shutil

    from longqc_spark.operators.dedup import incremental_dedup

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS cli_digest_idx")
    shutil.rmtree(f"{wh}/cli_digest_idx", ignore_errors=True)

    out = str(tmp_path / "run")
    assert main(["--input", corpus_path, "--out", out, "--buckets", "2",
                 "--digest-index", "cli_digest_idx", "--local-cores", "8"]) == 0
    idx = spark.table("cli_digest_idx")
    assert idx.columns == ["payload_md5"]
    docs = spark.read.parquet(corpus_path)
    assert incremental_dedup(docs, idx, key_col="url", text_col="text").count() == 0
    spark.sql("DROP TABLE cli_digest_idx")


def test_cli_band_index(spark, corpus_path, tmp_path):
    """--band-index materializes the committed corpus's LSH band buckets;
    a re-crawl of the same pages with one token prepended (exact dedup
    would admit everything) is dropped by the near-dup probe."""
    import shutil

    from longqc_spark.operators.dedup import incremental_neardup

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("DROP TABLE IF EXISTS cli_band_idx")
    shutil.rmtree(f"{wh}/cli_band_idx", ignore_errors=True)

    out = str(tmp_path / "run")
    assert main(["--input", corpus_path, "--out", out, "--buckets", "2",
                 "--band-index", "cli_band_idx", "--local-cores", "8"]) == 0
    idx = spark.table("cli_band_idx")
    assert idx.columns == ["band", "bhash"]
    recrawl = spark.read.parquet(corpus_path).limit(100).select(
        "url", F.concat(F.lit("edited2025 "), F.col("text")).alias("text")
    )
    admitted = incremental_neardup(recrawl, idx, key_col="url", text_col="text")
    # every re-crawled page is near its committed original (the index is
    # built over stored scrubbed_text, so pages the scrubber edited may
    # slip — allow a small remainder, but the bulk must be caught)
    assert admitted.count() <= 20
    spark.sql("DROP TABLE cli_band_idx")


def test_cli_payload_dedup(spark, corpus_path, tmp_path):
    """--payload-dedup with --payload-score-col keeps the max-prior copy per
    payload digest before the lineage run, and the flag trio is checkpoint
    identity (a resume without it must refuse)."""
    docs = spark.read.parquet(corpus_path)
    dup = (
        docs.limit(40)
        .withColumn("url", F.concat(F.lit("https://mirror.example/"), F.col("url")))
    )
    corpus = (
        docs.unionByName(dup)
        .withColumn(
            "crawl_prior",
            F.col("url").startswith("https://mirror.example/").cast("double"),
        )
    )
    crawl_path = str(tmp_path / "dup_crawl")
    corpus.write.parquet(crawl_path)

    out = str(tmp_path / "pd_out")
    rc = main(
        [
            "--input", crawl_path,
            "--out", out,
            "--buckets", "2",
            "--payload-dedup",
            "--payload-score-col", "crawl_prior",
            "--local-cores", "8",
        ]
    )
    assert rc == 0
    labels = spark.read.parquet(os.path.join(out, "data")).toPandas()
    # one row per payload digest, and for duplicated pages the mirror
    # (higher prior) is the survivor
    assert labels.payload_md5.is_unique
    mirrored = labels.url.str.startswith("https://mirror.example/")
    assert mirrored.sum() > 0
    orig_urls = set(labels.loc[~mirrored, "url"])
    assert not orig_urls & {
        u.removeprefix("https://mirror.example/")
        for u in labels.loc[mirrored, "url"]
    }
    # checkpoint identity: dropping the payload-dedup flags must refuse
    with pytest.raises(ValueError, match="run config differs"):
        main(["--input", crawl_path, "--out", out, "--buckets", "2",
              "--local-cores", "8"])


def test_cli_dedup_scope(spark, corpus_path, tmp_path):
    """--dedup-scope bounds --payload-dedup to a per-dump horizon: an exact
    copy planted in ANOTHER dump survives (both copies labeled), and the
    scope value is checkpoint identity (a resume without it must refuse)."""
    docs = spark.read.parquet(corpus_path).withColumn("dump", F.lit(0))
    dup = (
        docs.limit(25)
        .withColumn("url", F.concat(F.lit("https://mirror.example/"), F.col("url")))
        .withColumn("dump", F.lit(1))
    )
    crawl_path = str(tmp_path / "scoped_crawl")
    docs.unionByName(dup).write.parquet(crawl_path)

    out = str(tmp_path / "scope_out")
    rc = main(
        [
            "--input", crawl_path,
            "--out", out,
            "--buckets", "2",
            "--payload-dedup",
            "--dedup-scope", "dump",
            "--local-cores", "8",
        ]
    )
    assert rc == 0
    labels = spark.read.parquet(os.path.join(out, "data")).toPandas()
    # the dump-1 copies are exact duplicates of dump-0 pages, but the scoped
    # horizon keeps one survivor PER DUMP: those digests appear twice
    mirrored = labels.url.str.startswith("https://mirror.example/")
    assert mirrored.sum() == 25
    assert not labels.payload_md5.is_unique
    # checkpoint identity: dropping the scope must refuse to resume
    with pytest.raises(ValueError, match="run config differs"):
        main(["--input", crawl_path, "--out", out, "--buckets", "2",
              "--payload-dedup", "--local-cores", "8"])


def test_cli_neardup_threshold(spark, corpus_path, tmp_path):
    """--neardup-threshold drops fuzzy re-crawls (exact digests differ)
    before the lineage run, and is checkpoint identity."""
    docs = spark.read.parquet(corpus_path)
    recrawl = docs.limit(30).withColumn(
        "url", F.concat(F.lit("https://mirror.example/"), F.col("url"))
    ).withColumn("text", F.concat(F.lit("recrawl2025 "), F.col("text")))
    crawl_path = str(tmp_path / "nd_crawl")
    docs.unionByName(recrawl).write.parquet(crawl_path)

    out = str(tmp_path / "nd_out")
    rc = main(
        [
            "--input", crawl_path,
            "--out", out,
            "--buckets", "2",
            "--neardup-threshold", "0.8",
            "--local-cores", "8",
        ]
    )
    assert rc == 0
    labels = spark.read.parquet(os.path.join(out, "data")).toPandas()
    # min-key winner: the original URLs sort before the mirror aliases is
    # NOT guaranteed (string order), but exactly one member per planted
    # pair must survive
    mirrored = set(
        labels.url[labels.url.str.startswith("https://mirror.example/")]
        .str.removeprefix("https://mirror.example/")
    )
    plain = set(labels.url[~labels.url.str.startswith("https://mirror.example/")])
    assert not mirrored & plain
    with pytest.raises(ValueError, match="run config differs"):
        main(["--input", crawl_path, "--out", out, "--buckets", "2",
              "--local-cores", "8"])


def test_cli_emit_blocklist_feedback_loop(spark, corpus_path, tmp_path):
    """--emit-blocklist writes the failing domains of THIS run as a file
    --blocklist can consume on the NEXT crawl: the closed feedback loop."""
    docs = spark.read.parquet(corpus_path)
    n = F.row_number().over(Window.orderBy("url"))
    crawl = (
        docs.withColumn("rn", n)
        # rn%5==0 docs live on junk.example and get garbage payloads that
        # fail the QC rules; everything else on clean.example keeps its text
        .withColumn(
            "url",
            F.when(F.col("rn") % 5 == 0,
                   F.concat(F.lit("https://junk.example/p"), F.col("rn").cast("string")))
            .otherwise(F.concat(F.lit("https://clean.example/p"), F.col("rn").cast("string"))),
        )
        .withColumn(
            "text",
            F.when(F.col("rn") % 5 == 0, F.lit("@@ ## $$ %% !! ?? ;; ::"))
            .otherwise(F.col("text")),
        )
        .drop("rn")
    )
    crawl_path = str(tmp_path / "fb_crawl")
    crawl.write.parquet(crawl_path)

    out1 = str(tmp_path / "fb_run1")
    bl_path = str(tmp_path / "auto_bl.txt")
    assert main(
        ["--input", crawl_path, "--out", out1, "--buckets", "2",
         "--emit-blocklist", bl_path, "--local-cores", "8"]
    ) == 0
    entries = [
        l.strip() for l in open(bl_path) if l.strip() and not l.startswith("#")
    ]
    assert "junk.example" in entries
    assert "clean.example" not in entries

    # feed it back: run 2 consumes the emitted file, junk domain never
    # enters the pipeline
    out2 = str(tmp_path / "fb_run2")
    assert main(
        ["--input", crawl_path, "--out", out2, "--buckets", "2",
         "--blocklist", bl_path, "--local-cores", "8"]
    ) == 0
    labels = spark.read.parquet(os.path.join(out2, "data")).toPandas()
    assert not labels.url.str.contains("junk.example").any()
    assert labels.url.str.contains("clean.example").any()


def test_cli_pack_out(spark, corpus_path, tmp_path):
    """--pack-out materializes the curated export as fixed-length training
    sequences whose concatenation reproduces the curated char stream."""
    out = str(tmp_path / "pk_run")
    curated_dir = str(tmp_path / "pk_curated")
    packed_dir = str(tmp_path / "pk_packed")
    rc = main(
        [
            "--input", corpus_path,
            "--out", out,
            "--buckets", "2",
            "--curate-out", curated_dir,
            "--pack-out", packed_dir,
            "--seq-len", "512",
            "--local-cores", "8",
        ]
    )
    assert rc == 0
    packed = spark.read.parquet(packed_dir).orderBy("seq_id").toPandas()
    curated = spark.read.parquet(curated_dir)
    total = curated.select(
        F.sum(F.length("scrubbed_text")).alias("c")
    ).collect()[0]["c"]
    assert (packed.seq_text.str.len()[:-1] == 512).all()
    assert packed.seq_text.str.len().sum() == total
    assert list(packed.seq_id) == list(range(len(packed)))


def test_cli_fix_encoding(spark, corpus_path, tmp_path):
    """--fix-encoding repairs cp1252 mojibake before QC so the committed
    scrubbed text carries the restored bytes, and the flag is part of the
    checkpoint identity (a resume with it dropped must be rejected)."""
    from longqc_spark.operators.text import _sloppy_cp1252

    marker = "privacy notice — it’s “fine”…"
    damaged = _sloppy_cp1252(marker.encode("utf-8"))
    docs = spark.read.parquet(corpus_path).withColumn(
        "text", F.concat(F.col("text"), F.lit(" " + damaged))
    )
    crawl_path = str(tmp_path / "moji_crawl")
    docs.write.parquet(crawl_path)

    out = str(tmp_path / "moji_out")
    rc = main(
        [
            "--input", crawl_path,
            "--out", out,
            "--buckets", "2",
            "--fix-encoding", "1",
            "--local-cores", "8",
        ]
    )
    assert rc == 0
    pdf = spark.read.parquet(os.path.join(out, "data")).toPandas()
    assert len(pdf) > 0
    # every surviving text ends with the REPAIRED marker, none with mojibake
    kept = pdf[pdf.keep]
    assert kept.scrubbed_text.str.contains("it’s “fine”", regex=False).all()
    assert not pdf.scrubbed_text.str.contains("â€™", regex=False).any()
    # identity: resuming the same out dir WITHOUT the flag must be rejected
    with pytest.raises(ValueError, match="hygiene"):
        main(
            [
                "--input", crawl_path,
                "--out", out,
                "--buckets", "2",
                "--local-cores", "8",
            ]
        )


def test_cli_clean_lines(spark, corpus_path, tmp_path):
    """--clean-lines runs C4 line cleaning as hygiene stage 0: javascript
    banner lines never reach the committed text, brace pages are dropped
    whole, and the flag is part of the checkpoint identity."""
    banner = "Please enable javascript to continue viewing."
    docs = spark.read.parquet(corpus_path).withColumn(
        "text",
        F.concat(
            F.lit(banner + "\n"),
            F.regexp_replace(F.col("text"), r"((?:\S+ ){5}\S+) ", "$1.\n"),
            F.lit("."),
        ),
    )
    crawl_path = str(tmp_path / "c4_crawl")
    docs.write.parquet(crawl_path)

    out = str(tmp_path / "c4_out")
    rc = main(
        [
            "--input", crawl_path,
            "--out", out,
            "--buckets", "2",
            "--clean-lines", "4",
            "--clean-lines-min-sentences", "2",
            "--local-cores", "8",
        ]
    )
    assert rc == 0
    pdf = spark.read.parquet(os.path.join(out, "data")).toPandas()
    assert len(pdf) > 0
    assert not pdf.scrubbed_text.str.contains("javascript", regex=False).any()
    # identity: resuming without the flag must be rejected
    with pytest.raises(ValueError, match="hygiene"):
        main(
            [
                "--input", crawl_path,
                "--out", out,
                "--buckets", "2",
                "--local-cores", "8",
            ]
        )


def test_cli_respect_optout_and_lang_thresholds(spark, corpus_path, tmp_path):
    """--respect-optout drops opted-out pages before QC (none reach the
    committed label store), --lang-thresholds parses and applies, and both
    are checkpoint identity (a resume without them is rejected)."""
    docs = spark.read.parquet(corpus_path).withColumn(
        "html",
        F.when(
            F.xxhash64("url") % 7 == 0,
            F.encode(
                F.concat(
                    F.lit('<html><head><meta name="robots" content="noindex, noai"></head><body><p>'),
                    F.col("text"),
                    F.lit("</p></body></html>"),
                ),
                "UTF-8",
            ),
        ).otherwise(F.col("html")),
    )
    crawl_path = str(tmp_path / "optout_crawl")
    docs.write.parquet(crawl_path)
    opted_out = {
        r["url"]
        for r in docs.filter(F.xxhash64("url") % 7 == 0).select("url").collect()
    }
    assert opted_out  # the fixture must actually exercise the gate

    out = str(tmp_path / "optout_out")
    rc = main(
        [
            "--input", crawl_path,
            "--out", out,
            "--buckets", "2",
            "--respect-optout",
            "--lang-thresholds", "en:1:1000000:1.0",
            "--lang-default", "1:1000000:1.0",
            "--local-cores", "8",
        ]
    )
    assert rc == 0
    committed = {
        r["url"]
        for r in spark.read.parquet(os.path.join(out, "data")).select("url").collect()
    }
    assert committed and not (committed & opted_out)
    # identity: resuming the same out dir WITHOUT the flags must be rejected
    with pytest.raises(ValueError, match="hygiene|run config"):
        main(
            [
                "--input", crawl_path,
                "--out", out,
                "--buckets", "2",
                "--local-cores", "8",
            ]
        )


def test_cli_lang_thresholds_spec_errors():
    """Malformed --lang-thresholds/--lang-default specs die with a usage
    error naming the expected shape, before any Spark work."""
    from longqc_spark.cli import _parse_lang_thresholds, _parse_lang_triple

    assert _parse_lang_thresholds("zh:100:100000:0.6,de:250:100000:0.3") == {
        "zh": (100, 100000, 0.6),
        "de": (250, 100000, 0.3),
    }
    assert _parse_lang_thresholds(None) is None
    assert _parse_lang_triple("200:100000:0.3") == (200, 100000, 0.3)
    with pytest.raises(SystemExit, match="lang_thresholds|min_chars"):
        _parse_lang_thresholds("zh:100")
    with pytest.raises(SystemExit, match="min_chars"):
        _parse_lang_triple("200:0.3")


def test_cli_anchors_out(spark, corpus_path, tmp_path):
    """--anchors-out exports the anchor corpus from pages that SURVIVED the
    hygiene gates: an opted-out page's links never appear; a missing html
    column dies with a usage error before any Spark job."""
    nav = (
        '<div><a href="/x">Archive link</a></div>'
    )
    docs = spark.read.parquet(corpus_path).withColumn(
        "html",
        F.when(
            F.xxhash64("url") % 3 == 0,
            F.encode(
                F.lit(
                    '<html><head><meta name="robots" content="noai"></head>'
                    "<body>" + nav + "</body></html>"
                ),
                "UTF-8",
            ),
        ).otherwise(
            F.encode(
                F.concat(
                    F.lit("<html><body>" + nav + "<p>"),
                    F.col("text"),
                    F.lit("</p></body></html>"),
                ),
                "UTF-8",
            )
        ),
    )
    crawl_path = str(tmp_path / "anchor_crawl")
    docs.write.parquet(crawl_path)
    n_kept_pages = docs.filter(F.xxhash64("url") % 3 != 0).count()

    out = str(tmp_path / "anchor_out")
    anchors_dir = str(tmp_path / "anchors")
    rc = main(
        [
            "--input", crawl_path,
            "--out", out,
            "--buckets", "2",
            "--respect-optout",
            "--anchors-out", anchors_dir,
            "--local-cores", "8",
        ]
    )
    assert rc == 0
    a = spark.read.parquet(anchors_dir)
    assert a.count() == n_kept_pages  # exactly one nav anchor per surviving page
    opted = {r["url"] for r in docs.filter(F.xxhash64("url") % 3 == 0).select("url").collect()}
    assert not ({r["url"] for r in a.select("url").collect()} & opted)
    assert a.filter((F.col("href") == "/x") & (F.col("anchor_text") == "Archive link")).count() == a.count()

    # missing html column -> argparse usage error (SystemExit), no Spark job
    with pytest.raises(SystemExit):
        main(
            [
                "--input", crawl_path,
                "--out", str(tmp_path / "never"),
                "--html-col", "nope",
                "--anchors-out", str(tmp_path / "never_a"),
                "--local-cores", "8",
            ]
        )


def test_cli_train_artifacts(spark, corpus_path, tmp_path):
    """--train-tokenizer/--train-lm produce the shipped artifacts FROM the
    curated export: BPE merges + unigram vocab parquets, and the KN bigram
    model tables — readable back and usable (the LM scores a probe)."""
    out = str(tmp_path / "run")
    curated_dir = str(tmp_path / "curated")
    tok_dir = str(tmp_path / "tok")
    lm_dir = str(tmp_path / "lm")
    rc = main(
        [
            "--input", corpus_path,
            "--out", out,
            "--buckets", "2",
            "--curate-out", curated_dir,
            "--train-tokenizer", tok_dir,
            "--tokenizer-merges", "5",
            "--tokenizer-vocab", "80",
            "--train-lm", lm_dir,
            "--local-cores", "8",
        ]
    )
    assert rc == 0
    merges = spark.read.parquet(os.path.join(tok_dir, "bpe_merges"))
    assert merges.count() >= 1
    assert {"rank", "left", "right", "merged"} <= set(merges.columns)
    vocab = spark.read.parquet(os.path.join(tok_dir, "unigram_vocab"))
    assert vocab.count() >= 10
    assert {"piece", "logprob_micro"} <= set(vocab.columns)
    # the written KN model scores a probe end-to-end
    from longqc_spark.operators.knlm import kn_score

    probe = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "zxqj unknown tokens")],
        "doc_id long, text string",
    )
    scored = kn_score(
        probe,
        spark.read.parquet(os.path.join(lm_dir, "pair")),
        spark.read.parquet(os.path.join(lm_dir, "ctx")),
        spark.read.parquet(os.path.join(lm_dir, "cont")),
        spark.read.parquet(os.path.join(lm_dir, "consts")),
    ).collect()
    assert len(scored) == 2
    assert all(r["sum_logp_micro"] < 0 for r in scored)
    # the trainers require the curated export
    with pytest.raises(SystemExit):
        main(["--input", corpus_path, "--out", out, "--buckets", "2",
              "--train-lm", lm_dir, "--local-cores", "8"])
