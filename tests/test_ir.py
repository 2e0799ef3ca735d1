"""IR operators (operators/ir.py): BM25 ranking semantics, the TF-IDF
document-frequency band guard, and host digest entropy — plus plan
shape (broadcasts, no global sort in the per-doc ranking)."""

import math

from longqc_spark.operators.ir import (
    bm25_topk,
    host_digest_entropy,
    tfidf_topk_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bm25_tf_saturation_and_rarity(spark):
    # doc 0 is stuffed with the query term; doc 1 mentions it once in a
    # short doc; docs 2-9 are filler that never mention it -> high idf.
    rows = [(0, "apple " * 10 + "pad " * 10), (1, "apple juice")]
    rows += [(i, "filler words here only") for i in range(2, 10)]
    got = bm25_topk(_docs(spark, rows), ["apple"], k=5).collect()
    assert [r["doc_id"] for r in got][:2] == [0, 1]
    assert all(r["n_terms_hit"] == 1 for r in got)
    assert len(got) == 2  # non-matching docs never appear
    # saturation: tf=10 beats tf=1 but by far less than 10x
    assert got[0]["score"] < 3 * got[1]["score"]


def test_bm25_idf_downweights_common_terms(spark):
    # 'common' is in every doc, 'rare' in one; with both as query terms
    # the rare-term doc must outrank a doc with many 'common' hits.
    rows = [(0, "common rare"), (1, "common common common common")]
    rows += [(i, "common word") for i in range(2, 12)]
    got = bm25_topk(_docs(spark, rows), ["common", "rare"], k=3).collect()
    assert got[0]["doc_id"] == 0 and got[0]["n_terms_hit"] == 2


def test_bm25_matches_reference_formula(spark):
    # hand-check one score end-to-end (k1=1.2, b=0.75, Lucene idf)
    rows = [(0, "x x y"), (1, "y y"), (2, "z z z")]
    got = {r["doc_id"]: r["score"] for r in bm25_topk(_docs(spark, rows), ["x"], k=3).collect()}
    n, df, tf, dl, avgdl = 3, 1, 2, 3, 8 / 3
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    expect = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert abs(got[0] - round(expect, 6)) < 1e-9
    assert list(got) == [0]


def test_bm25_case_folding(spark):
    rows = [(0, "Apple APPLE"), (1, "apple")] + [(i, "pad") for i in range(2, 6)]
    got = bm25_topk(_docs(spark, rows), ["APPLE"], k=2).collect()
    assert [r["doc_id"] for r in got] == [0, 1]


def test_tfidf_band_guard_cuts_stopwords_and_hapax(spark):
    # 'the' in all 4 docs (df=4 > 0.78*4) and 'once' in one (df=1 < 2)
    # must both vanish; 'topic' (df=2) survives and ranks.
    rows = [
        (0, "the topic topic once"),
        (1, "the topic"),
        (2, "the other"),
        (3, "the other"),
    ]
    out = tfidf_topk_terms(_docs(spark, rows), k=3, min_df=2, max_df_frac=0.78)
    terms = {r["term"] for r in out.collect()}
    assert "the" not in terms and "once" not in terms
    assert {"topic", "other"} == terms


def test_tfidf_rank_ties_break_by_term(spark):
    rows = [(0, "beta alpha"), (1, "beta alpha"), (2, "gamma delta")]
    out = tfidf_topk_terms(_docs(spark, rows), k=2, min_df=1, max_df_frac=1.0)
    got = [(r["term"], r["rank"]) for r in out.filter("doc_id = 0").orderBy("rank").collect()]
    # identical tf and df -> identical score -> alphabetical order
    assert got == [("alpha", 1), ("beta", 2)]


def test_tfidf_no_global_sort_in_plan(spark):
    rows = [(i, f"w{i} common") for i in range(8)]
    out = tfidf_topk_terms(_docs(spark, rows), k=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # per-doc ranking is a window hash-partitioned on the doc key (the
    # 1-row n_docs aggregate is allowed its SinglePartition exchange);
    # a global-sort ranking would show a rangepartitioning on score
    assert "hashpartitioning(doc_id" in plan
    assert "rangepartitioning(score" not in plan


def test_host_entropy_extremes(spark):
    rows = [
        ("a.example", "same page"),
        ("a.example", "same page"),
        ("a.example", "same page"),
        ("a.example", "same page"),
        ("b.example", "p1"),
        ("b.example", "p2"),
        ("b.example", "p3"),
        ("b.example", "p4"),
        ("c.example", "solo"),
    ]
    df = spark.createDataFrame(rows, "host string, text string")
    got = {r["host"]: r for r in host_digest_entropy(df).collect()}
    assert got["a.example"]["entropy_bits"] == 0.0
    assert got["a.example"]["diversity"] == 0.0
    assert got["b.example"]["entropy_bits"] == 2.0  # log2(4), all distinct
    assert got["b.example"]["diversity"] == 1.0
    assert "c.example" not in got  # below min_pages


def test_host_entropy_mixed(spark):
    # 2 copies of one page + 2 distinct -> H = -(.5 log .5 + 2*.25 log .25)
    rows = [("h", "dup"), ("h", "dup"), ("h", "x"), ("h", "y")]
    df = spark.createDataFrame(rows, "host string, text string")
    r = host_digest_entropy(df).collect()[0]
    assert abs(r["entropy_bits"] - 1.5) < 1e-6
    assert r["n_pages"] == 4 and r["n_distinct"] == 3


def test_bm25_broadcasts_small_sides(spark):
    rows = [(i, "apple pie" if i % 2 else "plain crust") for i in range(50)]
    plan = (
        bm25_topk(_docs(spark, rows), ["apple"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # df table + corpus stats ride broadcast joins, never a shuffle
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
