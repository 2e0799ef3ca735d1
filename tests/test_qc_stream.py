"""Streaming QC facade: micro-batched qc_pipeline must equal the batch run
exactly (chunk-loop parity, SURVEY.md §2.11), and a killed stream must resume
from the checkpoint without duplicating or losing documents."""

import pandas as pd
import pytest
from pyspark.errors.exceptions.captured import StreamingQueryException

from longqc_spark.pipeline import qc_pipeline
from longqc_spark.streaming.qc_stream import (
    read_stream_labels,
    stream_lineage,
    stream_qc,
)


def _stage_docs(spark, corpus_path, tmp_path, n_files=4):
    docs = spark.read.parquet(corpus_path)
    d = str(tmp_path / "docs_dir")
    docs.repartition(n_files).write.mode("overwrite").parquet(d)
    return d, docs


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values("url").reset_index(drop=True)[sorted(pdf.columns)]


def test_stream_qc_matches_batch(spark, corpus_path, tmp_path):
    d, docs = _stage_docs(spark, corpus_path, tmp_path)
    out = str(tmp_path / "qc_out")

    q = stream_qc(spark, d, docs.schema, out)
    q.awaitTermination(300)

    got = _norm(read_stream_labels(spark, out).toPandas())
    want = _norm(qc_pipeline(spark.read.parquet(d), num_partitions=0).toPandas())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want)

    rows = stream_lineage(out)
    assert len(rows) >= 2, "expected several micro-batches"
    assert sum(r["n_in"] for r in rows) == len(want)
    assert sum(r["n_kept"] for r in rows) == int(want["keep"].sum())


def test_stream_qc_resume_after_kill(spark, corpus_path, tmp_path):
    d, docs = _stage_docs(spark, corpus_path, tmp_path)
    out = str(tmp_path / "qc_resume")

    q = stream_qc(spark, d, docs.schema, out, fail_after_batches=2)
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(300)
    pre = stream_lineage(out)
    assert len(pre) == 2, "exactly the committed epochs survive the kill"

    # restart with the same out_dir: checkpoint resume, no recompute of
    # committed epochs, remaining backlog drains
    q2 = stream_qc(spark, d, docs.schema, out)
    q2.awaitTermination(300)

    post = stream_lineage(out)
    assert [r["epoch_id"] for r in post[:2]] == [r["epoch_id"] for r in pre]
    assert [r["input_fingerprint"] for r in post[:2]] == [
        r["input_fingerprint"] for r in pre
    ], "committed epochs untouched by the resumed run"

    got = _norm(read_stream_labels(spark, out).toPandas())
    want = _norm(qc_pipeline(spark.read.parquet(d), num_partitions=0).toPandas())
    assert got["url"].is_unique, "no duplicated documents across the restart"
    pd.testing.assert_frame_equal(got, want)


def test_stream_dedup_across_batches(spark, corpus_path, tmp_path):
    """Stateful dropDuplicates must drop duplicates that arrive in LATER
    micro-batches than their first occurrence (cross-chunk state — the thing
    the reference's per-chunk loop cannot do without its NG-set)."""
    from pyspark.sql import functions as F

    from longqc_spark.streaming.qc_stream import read_stream_labels, stream_dedup

    docs = spark.read.parquet(corpus_path).select("url", "text")
    d = str(tmp_path / "dedup_in")
    # file 1: the originals; files 2-3: 50 duplicated texts under fresh urls
    docs.coalesce(1).write.mode("overwrite").parquet(d)
    dups = (
        docs.limit(50)
        .withColumn("url", F.concat(F.lit("dup1://"), F.col("url")))
    )
    dups.coalesce(1).write.mode("append").parquet(d)
    dups.withColumn("url", F.concat(F.lit("x"), F.col("url"))).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    out = str(tmp_path / "dedup_out")
    q = stream_dedup(spark, d, spark.read.parquet(d).schema, out)
    q.awaitTermination(300)

    got = read_stream_labels(spark, out).toPandas()
    n_distinct = docs.select("text").distinct().count()
    assert len(got) == n_distinct, "one survivor per distinct payload"
    assert got.payload_hash.is_unique


def test_stream_dedup_within_watermark(spark, corpus_path, tmp_path):
    """Bounded-state variant: dropDuplicatesWithinWatermark still drops the
    cross-batch duplicates here (all warc_ts fall inside the horizon), while
    bounding the state store to the watermark window at scale."""
    from pyspark.sql import functions as F

    from longqc_spark.streaming.qc_stream import read_stream_labels, stream_dedup

    docs = spark.read.parquet(corpus_path).select("url", "warc_ts", "text")
    d = str(tmp_path / "wm_in")
    docs.coalesce(1).write.mode("overwrite").parquet(d)
    docs.limit(40).withColumn("url", F.concat(F.lit("dup://"), F.col("url"))).coalesce(
        1
    ).write.mode("append").parquet(d)

    out = str(tmp_path / "wm_out")
    q = stream_dedup(
        spark, d, spark.read.parquet(d).schema, out, watermark=("warc_ts", "365 days")
    )
    q.awaitTermination(300)
    got = read_stream_labels(spark, out).toPandas()
    assert len(got) == docs.select("text").distinct().count()
    assert got.payload_hash.is_unique


def test_stream_qc_html_funnel(spark, corpus_path, tmp_path):
    """The fused html→text funnel works identically inside the streaming
    facade: stream over raw-payload docs == batch funnel."""
    docs = spark.read.parquet(corpus_path).drop("text")
    d = str(tmp_path / "html_docs")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    out = str(tmp_path / "html_qc")

    q = stream_qc(spark, d, docs.schema, out, html_col="html")
    assert q.awaitTermination(540)

    got = _norm(read_stream_labels(spark, out).toPandas())
    want = _norm(qc_pipeline(spark.read.parquet(d), num_partitions=0, html_col="html").toPandas())
    pd.testing.assert_frame_equal(got, want)


def test_stream_static_incremental_dedup(spark, corpus_path, tmp_path):
    """Stream-static anti-join: a streamed re-crawl never re-admits payloads
    a previous run committed (the streaming twin of incremental_dedup —
    exclusion keyed on the stored payload_md5 of run-1 labels)."""
    from pyspark.sql import functions as F

    from longqc_spark.lineage import read_labels, run_qc_with_lineage
    from longqc_spark.streaming.qc_stream import read_stream_labels, stream_dedup

    docs = spark.read.parquet(corpus_path)
    h = F.crc32(F.col("url"))
    docs_a = docs.filter(h % 2 == 0)
    overlap = docs_a.filter(h % 7 == 0)
    docs_b = docs.filter(h % 2 == 1).unionByName(overlap).select("url", "text")

    run1 = str(tmp_path / "run1")
    run_qc_with_lineage(docs_a, run1, n_buckets=2)

    d = str(tmp_path / "recrawl")
    docs_b.coalesce(2).write.mode("overwrite").parquet(d)
    out = str(tmp_path / "stream_out")
    q = stream_dedup(
        spark,
        d,
        spark.read.parquet(d).schema,
        out,
        exclude_labels=read_labels(spark, run1),
    )
    assert q.awaitTermination(540)

    got = read_stream_labels(spark, out).toPandas()
    # admitted set == batch incremental_dedup on the same inputs (witness
    # choice differs: stream = first arrival, batch = min key; payload SETS
    # must agree exactly)
    from longqc_spark.operators.dedup import incremental_dedup

    want = incremental_dedup(
        docs_b, read_labels(spark, run1), key_col="url", text_col="text"
    ).toPandas()
    want_hashes = set(
        __import__("hashlib").md5(t.encode()).hexdigest() for t in want.text
    )
    assert set(got.payload_hash) == want_hashes
    assert got.payload_hash.is_unique


def test_stream_neardup_across_batches(spark, tmp_path):
    """Fuzzy twin of the cross-batch dedup: a later micro-batch's token-
    prepended re-crawl (new exact digest!) is dropped against the growing
    band index; fresh docs pass; within-batch near-dup pairs resolve to the
    min-key witness."""
    import os

    from longqc_spark.streaming.qc_stream import stream_neardup

    base = [
        " ".join(f"tok{i}w{j}" for j in range(40)) for i in range(6)
    ]
    # file order = micro-batch order (maxFilesPerTrigger=1, sorted paths)
    d = str(tmp_path / "nd_in")
    os.makedirs(d)
    b0 = spark.createDataFrame(
        [("u00", base[0]), ("u01", base[1]),
         # within-batch near-dup pair: u02 wins over u03 (min key)
         ("u02", base[2]), ("u03", "recrawl2025 " + base[2])],
        "url string, text string",
    )
    b1 = spark.createDataFrame(
        [("u10", "recrawl2025 " + base[0]),  # near-dup of epoch-0 doc
         ("u11", base[3])],
        "url string, text string",
    )
    b2 = spark.createDataFrame(
        [("u20", "recrawl2025 " + base[3]),  # near-dup of epoch-1 doc
         ("u21", base[4])],
        "url string, text string",
    )
    for i, b in enumerate((b0, b1, b2)):
        b.coalesce(1).write.parquet(os.path.join(d, f"batch{i}"))

    out = str(tmp_path / "nd_out")
    q = stream_neardup(spark, os.path.join(d, "*"), b0.schema, out, key_col="url")
    assert q.awaitTermination(540)

    epochs = sorted(n for n in os.listdir(out) if n.startswith("epoch="))
    assert len(epochs) == 3
    got = {
        r.url
        for r in spark.read.parquet(*(os.path.join(out, e) for e in epochs)).collect()
    }
    assert got == {"u00", "u01", "u02", "u11", "u21"}
    # the index grew per epoch
    ext = [n for n in os.listdir(os.path.join(out, "_band_index")) if n.startswith("epoch=")]
    assert len(ext) == 3


def test_stream_neardup_seeded_from_committed_run(spark, tmp_path):
    """seed_bands from a committed run excludes that run's near-dups in the
    very first micro-batch (the streaming twin of incremental_neardup)."""
    import os

    from longqc_spark.operators.dedup import minhash_band_table
    from longqc_spark.streaming.qc_stream import stream_neardup

    base = [" ".join(f"seed{i}w{j}" for j in range(40)) for i in range(3)]
    committed = spark.createDataFrame(
        [("c0", base[0]), ("c1", base[1])], "url string, text string"
    )
    seed = minhash_band_table(committed, key_col="url", text_col="text")

    d = str(tmp_path / "seed_in")
    os.makedirs(d)
    spark.createDataFrame(
        [("u0", "recrawl2025 " + base[0]), ("u1", base[2])],
        "url string, text string",
    ).coalesce(1).write.parquet(os.path.join(d, "b0"))

    out = str(tmp_path / "seed_out")
    q = stream_neardup(
        spark, os.path.join(d, "*"), committed.schema, out,
        key_col="url", seed_bands=seed,
    )
    assert q.awaitTermination(540)
    got = {r.url for r in spark.read.parquet(os.path.join(out, "epoch=0")).collect()}
    assert got == {"u1"}


def test_stream_neardup_replay_backfills_index(spark, tmp_path):
    """Crash window between the two commit points: the data epoch exists but
    its index extension is missing — the replay must backfill the extension
    WITHOUT reprocessing (an index-first order would near-dup the batch
    against its own bands and commit an empty epoch)."""
    import os
    import shutil

    from longqc_spark.streaming.qc_stream import stream_neardup

    base = [" ".join(f"rep{i}w{j}" for j in range(40)) for i in range(3)]
    d = str(tmp_path / "rp_in")
    os.makedirs(d)
    spark.createDataFrame(
        [("u0", base[0]), ("u1", base[1])], "url string, text string"
    ).coalesce(1).write.parquet(os.path.join(d, "b0"))
    spark.createDataFrame(
        [("u2", "recrawl2025 " + base[0]), ("u3", base[2])],
        "url string, text string",
    ).coalesce(1).write.parquet(os.path.join(d, "b1"))

    out = str(tmp_path / "rp_out")
    schema = "url string, text string"
    q = stream_neardup(spark, os.path.join(d, "*"), schema, out, key_col="url")
    assert q.awaitTermination(540)

    # simulate the crash: epoch-0 data committed, its index extension lost,
    # and the stream restarts from a wiped checkpoint (epoch replays)
    shutil.rmtree(os.path.join(out, "_band_index", "epoch=0"))
    shutil.rmtree(os.path.join(out, "_checkpoint"))
    q2 = stream_neardup(spark, os.path.join(d, "*"), schema, out, key_col="url")
    assert q2.awaitTermination(540)

    ep0 = {r.url for r in spark.read.parquet(os.path.join(out, "epoch=0")).collect()}
    assert ep0 == {"u0", "u1"}  # NOT emptied by the replay
    assert os.path.exists(os.path.join(out, "_band_index", "epoch=0"))  # backfilled
    ep1 = {r.url for r in spark.read.parquet(os.path.join(out, "epoch=1")).collect()}
    assert ep1 == {"u3"}  # cross-batch near-dup still excluded post-replay


def test_compact_band_index(spark, tmp_path):
    """Per-epoch extensions merge into one distinct compact table; probes
    after compaction behave identically (a re-crawl of epoch-0 content is
    still excluded)."""
    import os

    from longqc_spark.streaming.qc_stream import compact_band_index, stream_neardup

    base = [" ".join(f"cmp{i}w{j}" for j in range(40)) for i in range(4)]
    d = str(tmp_path / "cp_in")
    os.makedirs(d)
    for i in range(3):
        spark.createDataFrame(
            [(f"u{i}", base[i])], "url string, text string"
        ).coalesce(1).write.parquet(os.path.join(d, f"b{i}"))

    out = str(tmp_path / "cp_out")
    schema = "url string, text string"
    q = stream_neardup(spark, os.path.join(d, "*"), schema, out, key_col="url")
    assert q.awaitTermination(540)
    idx = os.path.join(out, "_band_index")
    assert len([n for n in os.listdir(idx) if n.startswith("epoch=")]) == 3

    res = compact_band_index(spark, out)
    assert res["n_merged"] == 3 and res["n_rows"] > 0
    names = [n for n in os.listdir(idx) if not n.startswith(".")]
    assert names == ["compact=2"]

    # drain a fourth batch: near-dup of epoch-0 content must still be
    # excluded via the compacted index, fresh doc admitted, and the new
    # epoch extension lands NEXT TO the compact part
    spark.createDataFrame(
        [("u3", "recrawl2025 " + base[0]), ("u4", base[3])],
        "url string, text string",
    ).coalesce(1).write.parquet(os.path.join(d, "b3"))
    q2 = stream_neardup(spark, os.path.join(d, "*"), schema, out, key_col="url")
    assert q2.awaitTermination(540)
    ep3 = {r.url for r in spark.read.parquet(os.path.join(out, "epoch=3")).collect()}
    assert ep3 == {"u4"}
    # compacting again folds the new extension in
    res2 = compact_band_index(spark, out)
    assert res2["n_merged"] == 2


def test_stream_hygiene_gates_match_batch(spark, corpus_path, tmp_path):
    """The round-4g hygiene gates are stateless/broadcast-only, so they
    compose into a readStream unchanged: opt-out filter + C4 cleaning +
    per-lang thresholds over AvailableNow micro-batches must equal the
    identical batch plan row for row (streaming parity for web_hygiene's
    stateless subset)."""
    from pyspark.sql import functions as F

    from longqc_spark.operators.web import (
        c4_clean,
        per_lang_thresholds,
        robots_optout_filter,
    )

    docs = spark.read.parquet(corpus_path).withColumn(
        "html",
        F.when(
            F.xxhash64("url") % 5 == 0,
            F.encode(F.lit('<html><head><meta name="robots" content="noai"></head></html>'), "UTF-8"),
        ).otherwise(F.col("html")),
    )
    d = str(tmp_path / "hyg_docs")
    docs.repartition(4).write.mode("overwrite").parquet(d)

    def gates(df):
        out = robots_optout_filter(df, html_col="html")
        out = per_lang_thresholds(
            out, {"en": (50, 1_000_000, 0.9)}, default=(50, 1_000_000, 0.9)
        )
        return c4_clean(out, min_words=3, min_sentences=1).select("url", "text")

    want = _norm(gates(spark.read.parquet(d)).toPandas())

    stream = spark.readStream.schema(docs.schema).parquet(d)
    sink = str(tmp_path / "hyg_sink")
    q = (
        gates(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "hyg_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = _norm(spark.read.parquet(sink).toPandas())
    pd.testing.assert_frame_equal(got, want)
