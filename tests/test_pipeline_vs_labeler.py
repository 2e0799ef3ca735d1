"""The correctness gate (BASELINE.md): Spark pipeline vs pure-pandas
reference labeler — keep/drop F1 ≥ 0.99 and byte-identical scrubbed text —
plus parallelism-invariance (SURVEY.md §5.4 determinism tier)."""

import pandas as pd
import pytest

from longqc_spark.labeler import label_corpus
from longqc_spark.pipeline import qc_pipeline


@pytest.fixture(scope="module")
def joined(spark, corpus_path, corpus_pdf):
    docs = spark.read.parquet(corpus_path)
    got = qc_pipeline(docs).toPandas().set_index("url").sort_index()
    ref = label_corpus(corpus_pdf).set_index("url").sort_index()
    assert len(got) == len(ref)
    return got, ref


def f1(got: pd.Series, ref: pd.Series) -> float:
    tp = (got & ref).sum()
    fp = (got & ~ref).sum()
    fn = (~got & ref).sum()
    return 2 * tp / (2 * tp + fp + fn)


def test_keep_f1(joined):
    got, ref = joined
    assert f1(got.keep, ref.keep) >= 0.99


def test_scrub_byte_identical(joined):
    got, ref = joined
    mism = (got.scrubbed_text != ref.scrubbed_text)
    assert mism.sum() == 0, got.index[mism][:5].tolist()


def test_reasons_identical(joined):
    got, ref = joined
    assert (got.reasons.apply(list) == ref.reasons.apply(list)).all()


def test_stat_vector_identical(joined):
    got, ref = joined
    for col in ("n_words", "mean_word_len", "dup_line_frac", "perplexity", "lang_pred"):
        pd.testing.assert_series_equal(got[col], ref[col], check_names=False)


def test_both_labels_present(joined):
    got, _ = joined
    assert got.keep.any() and (~got.keep).any()


def test_fuzzy_scrub_byte_identical(spark, corpus_path, corpus_pdf):
    """With the opt-in tolerance pass enabled, Spark and the pandas labeler
    still produce byte-identical scrubbed text and identical keep labels —
    the fuzzy path is the same shared kernel on both sides."""
    from longqc_spark.config import DEFAULT_CONFIG
    from longqc_spark.labeler import label_corpus as _label

    cfg = DEFAULT_CONFIG.with_overrides(scrub_fuzzy=True)
    docs = spark.read.parquet(corpus_path)
    got = qc_pipeline(docs, cfg).toPandas().set_index("url").sort_index()
    ref = _label(corpus_pdf, cfg).set_index("url").sort_index()
    assert (got.scrubbed_text == ref.scrubbed_text).all()
    assert (got.keep == ref.keep).all()
    # the tolerance pass only ever ADDS matches relative to the exact cascade
    exact = label_corpus(corpus_pdf).set_index("url").sort_index()
    assert (ref.tox_match_count >= exact.tox_match_count).all()


def test_parallelism_invariance(spark, corpus_path):
    """Same input at 2 vs 16 partitions → identical labels (guards against
    order-dependent floats; reference analog: chunk-size independence)."""
    docs = spark.read.parquet(corpus_path)
    a = qc_pipeline(docs, num_partitions=2).toPandas().set_index("url").sort_index()
    b = qc_pipeline(docs, num_partitions=16).toPandas().set_index("url").sort_index()
    assert (a.keep == b.keep).all()
    assert (a.scrubbed_text == b.scrubbed_text).all()
    pd.testing.assert_series_equal(a.perplexity, b.perplexity)


def test_spark_extraction_byte_identical(spark, corpus_path, corpus_pdf):
    """with_extracted_text (Arrow UDF) vs the shared kernel run serially —
    the 'byte-identical extracted text per url' invariant, Spark side."""
    from longqc_spark.pipeline import with_extracted_text

    docs = spark.read.parquet(corpus_path).select("url", "html")
    got = (
        with_extracted_text(docs, text_col="extracted")
        .select("url", "extracted")
        .toPandas()
        .set_index("url")
        .sort_index()
    )
    ref = corpus_pdf.set_index("url").sort_index()
    assert (got.extracted == ref.text).all()


def test_pipeline_from_html_matches_pipeline_from_text(spark, corpus_path):
    """Full funnel: html binary → extract → QC labels equals the text-column
    path (the corpus html wraps text invertibly)."""
    from longqc_spark.pipeline import with_extracted_text

    docs = spark.read.parquet(corpus_path)
    from_html = qc_pipeline(with_extracted_text(docs.drop("text")))
    a = from_html.toPandas().set_index("url").sort_index()
    b = qc_pipeline(docs).toPandas().set_index("url").sort_index()
    assert (a.keep == b.keep).all()
    assert (a.scrubbed_text == b.scrubbed_text).all()


def test_fused_html_pipeline_matches_two_stage(spark, corpus_path):
    """qc_pipeline(html_col=...) — extraction fused into the single Arrow
    pass — must equal the two-stage extract-then-QC path exactly."""
    from longqc_spark.pipeline import with_extracted_text

    docs = spark.read.parquet(corpus_path)
    fused = (
        qc_pipeline(docs.drop("text"), html_col="html")
        .toPandas().set_index("url").sort_index()
    )
    staged = (
        qc_pipeline(with_extracted_text(docs.drop("text")))
        .toPandas().set_index("url").sort_index()
    )
    assert (fused.keep == staged.keep).all()
    assert (fused.scrubbed_text == staged.scrubbed_text).all()
    pd.testing.assert_series_equal(fused.perplexity, staged.perplexity)
