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
