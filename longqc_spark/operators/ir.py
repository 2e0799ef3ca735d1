"""Information-retrieval operators over a documents table.

A training-data pipeline needs lightweight retrieval for three everyday
jobs: decontamination lookup ("which corpus docs match this eval query"),
data selection ("rank docs by relevance to a seed set" — the retrieval
flavor of DSIR), and corpus forensics ("what is this document about" /
"how self-similar is this host"). These are the same shapes as the
reference's minimizer-index lookup (``lqmap.c:140-205``: build a hash
index over one side, probe with the other, score matches) re-expressed
as Spark plans:

- :func:`bm25_topk` — Okapi BM25 over whitespace tokens. The probe side
  (query terms) is a literal ``isin`` filter that Catalyst pushes into
  the scan, so the heavy explode/aggregate runs only over matching
  tokens; every join after that is a broadcast of a ≤|query|-row or
  1-row table. The only corpus-wide work is one pass for doc lengths.
- :func:`tfidf_topk_terms` — per-document top-k TF-IDF key terms with a
  document-frequency band guard (``min_df`` / ``max_df_frac``) that is
  simultaneously the stopword cut and the heavy-hitter/skew guard (the
  ``lqmap.c:166-173`` repetitive-minimizer skip, lifted to terms).
- :func:`host_digest_entropy` — Shannon entropy of the per-host content
  digest distribution: ~0 bits = a mirror/boilerplate farm serving one
  page under many URLs, high bits = genuinely diverse host. The
  corpus-health twin of the reference's per-chunk composition
  histograms (``lq_nanopore.py`` GC stats).

Tokenization contract (shared with the DuckDB oracles): tokens are the
non-empty segments of ``lower(text)`` split on ``\\s+``. No stemming, no
punctuation stripping — cross-engine reproducibility beats linguistic
nicety here, and every downstream consumer (dedup shingles, vocab
coverage) uses the same contract.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def _tokens(text_col: str):
    """Non-empty lowercase whitespace tokens (the corpus-wide contract)."""
    return F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    key_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-``k`` docs for a bag of ``query_terms``.

    ``score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1-b+b·dl/avgdl))``
    with the Lucene-style non-negative idf ``ln(1 + (N-df+0.5)/(df+0.5))``.

    Scale posture: the corpus-wide work is ONE pass computing per-doc
    token counts (needed for ``avgdl`` and ``dl`` anyway); the term
    explode is filtered to ``query_terms`` by a literal ``isin`` BEFORE
    any aggregation, so the (doc, term) shuffle carries only matching
    tokens — at web scale that is |docs containing a query term|, not
    |corpus tokens|. df/idf is a ≤|query|-row broadcast; corpus stats a
    1-row broadcast; the final candidates⋈lengths join has a small side
    AQE broadcasts. No driver collect anywhere.

    Returns ``(key_col, score, n_terms_hit)`` ordered by
    ``score desc, key_col`` — deterministic under ties; score rounded to
    6 dp for cross-engine comparison.
    """
    terms = sorted({t.lower() for t in query_terms})
    toks = df.select(
        F.col(key_col), F.explode(_tokens(text_col)).alias("token")
    )
    # one corpus pass: per-doc lengths (token counts) → also yields N, avgdl
    dl = df.select(F.col(key_col), F.size(_tokens(text_col)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    # probe side: literal isin — Catalyst pushes this below the explode's
    # generator where possible and into the scan as a string filter
    tf = (
        toks.filter(F.col("token").isin(terms))
        .groupBy(key_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(F.broadcast(stats))
        .join(dl, key_col)
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy(key_col)
        .agg(
            F.round(F.sum("contrib"), 6).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.desc("score"), F.col(key_col))
        .limit(k)
    )


def tfidf_topk_terms(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_df: int = 1,
    max_df_frac: float = 1.0,
) -> DataFrame:
    """Per-document top-``k`` key terms by smoothed TF-IDF.

    ``score = tf · (ln((1+N)/(1+df)) + 1)`` (the sklearn smoothing — no
    zero idf, no division by zero on a term in every doc). Terms outside
    the ``[min_df, max_df_frac·N]`` document-frequency band are dropped
    BEFORE scoring: the lower cut removes hapax noise, the upper cut is
    the stopword/heavy-hitter guard — the same document-frequency skip
    that keeps the dedup token join from flooding
    (``operators/dedup.py`` ``max_occ``), so a boilerplate term shared
    by every page can never dominate the (doc, term) shuffle or the
    per-doc ranking.

    Scale posture: explode → partial-agg groupBy(doc, term) (map-side
    combine carries the tf count); df table groupBy(term) — bounded by
    vocab, joined back shuffle-on-term (AQE broadcasts it when the band
    guard leaves it small); per-doc ranking is a window partitioned by
    ``key_col`` — no global sort. Ties broken by term, so output is
    deterministic.

    Returns ``(key_col, term, tf, df, score, rank)``.
    """
    tf = (
        df.select(F.col(key_col), F.explode(_tokens(text_col)).alias("term"))
        .groupBy(key_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(n_docs))
        .filter(
            (F.col("df") >= F.lit(min_df))
            & (F.col("df") <= F.col("n_docs") * F.lit(max_df_frac))
        )
    )
    w = Window.partitionBy(key_col).orderBy(
        F.desc("score"), F.col("term")
    )
    return (
        tf.join(dfreq, "term")
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df")))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(key_col, "term", "tf", "df", "score", "rank")
    )


def host_digest_entropy(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    min_pages: int = 2,
) -> DataFrame:
    """Shannon entropy (bits) of each host's content-digest distribution.

    ``H(host) = -Σ_d p_d·log2(p_d)`` over the md5 digests of the host's
    pages. 0 bits = every URL serves the same payload (mirror farm,
    parked domain, soft-404 template); ``log2(n_pages)`` = all distinct.
    The normalized ratio ``H / log2(n_pages)`` is emitted as
    ``diversity`` so hosts of different sizes compare on one scale
    (NULL for single-page hosts — one page is no evidence either way).

    Two partial-aggregating shuffles, both on narrow keys:
    groupBy(host, digest) then groupBy(host); per-host page counts ride
    the second agg as a sum. Hosts below ``min_pages`` are dropped after
    counting (they carry no signal). md5, not xxhash, so a DuckDB oracle
    reproduces it bit-exactly.
    """
    per_digest = (
        df.select(
            F.col(host_col).alias("host"),
            F.md5(F.col(text_col).cast("binary")).alias("digest"),
        )
        .groupBy("host", "digest")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ln2 = math.log(2.0)
    agg = per_digest.groupBy("host").agg(
        F.sum("n").alias("n_pages"),
        F.count(F.lit(1)).alias("n_distinct"),
        # -Σ n_d/N · log2(n_d/N) == log2(N) - (Σ n_d·log2(n_d))/N
        (F.sum(F.col("n") * F.log("n")) / F.lit(ln2)).alias("sum_nlogn"),
    )
    h = (
        F.log("n_pages") / F.lit(ln2) - F.col("sum_nlogn") / F.col("n_pages")
    )
    return (
        agg.filter(F.col("n_pages") >= F.lit(min_pages))
        .select(
            "host",
            "n_pages",
            "n_distinct",
            F.round(h, 6).alias("entropy_bits"),
            F.when(
                F.col("n_pages") > 1,
                F.round(h / (F.log("n_pages") / F.lit(ln2)), 6),
            ).alias("diversity"),
        )
        .orderBy("host")
    )
