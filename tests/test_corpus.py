"""Corpus generator determinism and class coverage."""

import pandas as pd

from longqc_spark.corpus import CLASSES, generate_corpus


def test_deterministic():
    a = generate_corpus(200, seed=42)
    b = generate_corpus(200, seed=42)
    pd.testing.assert_frame_equal(a, b)


def test_schema():
    df = generate_corpus(50, seed=1)
    assert list(df.columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert df.url.is_unique
    assert isinstance(df.html.iloc[0], bytes)


def test_all_classes_present():
    df = generate_corpus(2000, seed=42)
    present = set(df.url.str.split("/").str[3])
    assert present == set(CLASSES)


def test_host_skew():
    df = generate_corpus(2000, seed=42)
    hosts = df.url.str.split("/").str[2]
    top = hosts.value_counts(normalize=True).iloc[0]
    assert top > 0.2  # Zipf head is heavy → exercises salting
