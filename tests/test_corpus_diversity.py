"""Corpus-diversity metrics: distinct-n (text.ngram_diversity) and
host-concentration HHI (web.host_concentration) — hand fixtures pin the
arithmetic and the degenerate cases; plan shape pinned against the
documented trade-offs.
"""

from pyspark.sql import functions as F

from longqc_spark.operators.text import ngram_diversity
from longqc_spark.operators.web import host_concentration


def test_ngram_diversity_hand_fixture(spark):
    # "a b a b" + "a b": unigrams 6 total / 2 distinct; bigrams
    # 'a b','b a','a b' + 'a b' = 4 total / 2 distinct; trigrams 2 + 0
    df = spark.createDataFrame([("a b a b",), ("a b",)], "text string")
    out = {r.n: r for r in ngram_diversity(df, max_n=3).collect()}
    assert (out[1].total_ngrams, out[1].distinct_ngrams) == (6, 2)
    assert (out[2].total_ngrams, out[2].distinct_ngrams) == (4, 2)
    assert (out[3].total_ngrams, out[3].distinct_ngrams) == (2, 2)
    assert out[2].distinct_ratio == 0.5


def test_ngram_diversity_flags_template_flood(spark):
    rows = [("the same boilerplate line again",)] * 50 + [
        ("genuinely novel words appear here once",)
    ]
    df = spark.createDataFrame(rows, "text string")
    out = {r.n: r for r in ngram_diversity(df, max_n=2).collect()}
    assert out[2].distinct_ratio < 0.05  # flood collapses distinct-2


def test_ngram_diversity_no_expand(spark):
    # the documented shape: one agg per n, never one agg with stacked
    # count_distincts (which would Expand the token stream)
    df = spark.createDataFrame([("a b c",)], "text string")
    plan = ngram_diversity(df)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_ngram_diversity_hashed_matches_string_grams(spark, sf001):
    """The r6 hashed gram keys must reproduce the string-gram counts
    exactly: distinct/total per n over real fixture text equals a
    reference that rebuilds every n-gram as a joined string (the shape
    the DuckDB oracle uses). A divergence means the rolling-hash
    construction broke, not a collision (p ~ 1e-10 at this size)."""
    docs = (
        spark.read.parquet(f"{sf001}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("text")
    )
    got = {r.n: r for r in ngram_diversity(docs, max_n=3).collect()}

    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit(""))

    def _gram(n):
        return lambda i: F.array_join(F.slice(toks, i, n), " ")

    for n in (1, 2, 3):
        if n == 1:
            grams = toks
        else:
            cnt = F.size(toks) - F.lit(n - 1)
            grams = F.when(
                cnt >= 1, F.transform(F.sequence(F.lit(1), cnt), _gram(n))
            ).otherwise(F.array().cast("array<string>"))
        ref = (
            docs.select(F.explode(grams).alias("g"))
            .agg(
                F.count(F.lit(1)).alias("total"),
                F.count_distinct("g").alias("distinct"),
            )
            .first()
        )
        assert (got[n].total_ngrams, got[n].distinct_ngrams) == (
            ref["total"],
            ref["distinct"],
        ), f"n={n}"


def test_host_concentration(spark):
    rows = [(f"https://big.com/{i}",) for i in range(8)] + [
        (f"https://h{i}.com/x",) for i in range(2)
    ]
    rows += [("no-scheme-url",), (None,)]
    df = spark.createDataFrame(rows, "url string")
    r = host_concentration(df, top_k=1).first()
    assert (r.n_docs, r.n_hosts) == (10, 3)
    assert r.hhi == round((64 + 1 + 1) / 100, 6)
    assert r.topk_share == 0.8


def test_host_concentration_uniform_floor(spark):
    df = spark.createDataFrame(
        [(f"https://h{i}.com/x",) for i in range(20)], "url string"
    )
    r = host_concentration(df, top_k=5).first()
    assert r.hhi == round(1 / 20, 6)  # uniform crawl: HHI = 1/n_hosts
    assert r.topk_share == 0.25
