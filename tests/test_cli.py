"""CLI entry-point regression: flag plumbing, guard rails, and report
artifacts — the local twin of the spark-submit launch (test_submit.py)."""

import json
import os

import pytest
from pyspark.sql import functions as F

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
