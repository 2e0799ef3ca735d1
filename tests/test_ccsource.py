"""The ``ccsynth`` Python Data Source: a generator-as-source whose table is a
pure function of (seed, doc_id) — bit-identical at any partition count."""

import pandas as pd
from pyspark.sql import functions as F

from longqc_spark.ccsource import CCSynthDataSource


def _load(spark, **opts):
    spark.dataSource.register(CCSynthDataSource)
    r = spark.read.format("ccsynth")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_schema_matches_input_hint(spark):
    df = _load(spark, n_docs=50)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("url", "string"),
        ("warc_ts", "timestamp_ntz"),
        ("html", "binary"),
        ("text", "string"),
        ("lang", "string"),
    ]


def test_partition_count_invariance(spark):
    a = _load(spark, n_docs=300, num_partitions=1).toPandas()
    b = _load(spark, n_docs=300, num_partitions=7).toPandas()
    a = a.sort_values("url", ignore_index=True)
    b = b.sort_values("url", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_seed_changes_corpus(spark):
    a = set(_load(spark, n_docs=100, seed=42).select("url").toPandas().url)
    b = set(_load(spark, n_docs=100, seed=43).select("url").toPandas().url)
    assert a != b


def test_text_is_extraction_of_html(spark):
    """The per-row invariant of BASELINE.json input_hint: text is the
    byte-identical extraction of html, checked inside Spark."""
    from longqc_spark.pipeline import with_extracted_text

    df = _load(spark, n_docs=100)
    ex = with_extracted_text(df, html_col="html", text_col="_re")
    assert ex.filter(F.col("_re") != F.col("text")).count() == 0


def test_source_feeds_qc_pipeline(spark):
    """The generated table flows through the full QC pipeline like any
    parquet corpus — source and pipeline compose."""
    from longqc_spark.config import DEFAULT_CONFIG
    from longqc_spark.pipeline import qc_pipeline

    df = _load(spark, n_docs=200, num_partitions=4)
    labels = qc_pipeline(df, DEFAULT_CONFIG, text_col="text", key_cols=["url"])
    out = labels.agg(
        F.count(F.lit(1)).alias("n"), F.count_if(F.col("keep")).alias("n_keep")
    ).collect()[0]
    assert out["n"] == 200 and 0 < out["n_keep"] < 200
