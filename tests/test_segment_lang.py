"""Per-paragraph language segmentation (text.segment_languages) — the
CCNet-style pre-step that gives multilingual pages per-segment labels.
"""

import pytest
from pyspark.sql import functions as F

from longqc_spark.operators.text import segment_languages

EN = "the quick brown fox jumps over the lazy dog and runs away fast"
FR = "le rapide renard brun saute par dessus le chien paresseux du village"
DE = "der schnelle braune fuchs springt über den faulen hund im wald"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bilingual_page_two_segments(spark):
    docs = _docs(spark, ["\n\n".join([EN, EN, FR])])
    segs = segment_languages(docs).collect()
    assert [(s.seg_idx, s.lang, s.n_paras) for s in segs] == [
        (0, "en", 2),
        (1, "fr", 1),
    ]
    assert (segs[0].start_para, segs[0].end_para) == (0, 1)
    assert segs[0].n_chars == 2 * len(EN)


def test_monolingual_page_one_segment(spark):
    segs = segment_languages(_docs(spark, ["\n\n".join([DE, DE, DE])])).collect()
    assert [(s.lang, s.n_paras) for s in segs] == [("de", 3)]


def test_short_paragraph_segments_alone(spark):
    # a tiny separator paragraph must not bridge the EN runs around it
    docs = _docs(spark, ["\n\n".join([EN, "ok", EN])])
    segs = segment_languages(docs, min_chars=12).collect()
    assert [(s.lang, s.n_paras) for s in segs] == [
        ("en", 1),
        ("und", 1),
        ("en", 1),
    ]


def test_alternating_languages(spark):
    docs = _docs(spark, ["\n\n".join([EN, FR, EN, FR])])
    segs = segment_languages(docs).collect()
    assert [s.lang for s in segs] == ["en", "fr", "en", "fr"]
    assert all(s.n_paras == 1 for s in segs)


def test_empty_paragraphs_dropped_and_doc_scoped_window(spark):
    docs = _docs(spark, [EN + "\n\n\n\n" + FR, DE])
    segs = segment_languages(docs).orderBy("doc_id", "seg_idx").collect()
    by_doc = {}
    for s in segs:
        by_doc.setdefault(s.doc_id, []).append(s.lang)
    assert by_doc == {0: ["en", "fr"], 1: ["de"]}
    # seg_idx restarts per document (the window is doc-partitioned)
    assert [s.seg_idx for s in segs if s.doc_id == 1] == [0]
