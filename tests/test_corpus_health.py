"""Round-4b corpus-health operators: quality-aware dedup, token-budget
mixtures, split-leakage audit, duplicate-inflation histogram.

Semantics pinned on hand fixtures; scale posture pinned by plan audits
(WindowGroupLimit pre-shuffle cut for the dedup window, bounded exchanges).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from longqc_spark.operators.dedup import dup_cluster_sizes, keep_best_dedup, scoped_dedup
from longqc_spark.operators.text import (
    mix_sources_token_budget,
    split_leakage_report,
)


def _formatted(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.fixture()
def dup_docs(spark):
    # three copies of "aaa" (scores 1.0 / 5.0 / 5.0), two of "bbb" (NULL and
    # 2.0 scores), one unique "ccc", one NULL payload, one all-NULL-score pair
    rows = [
        (1, "aaa", 1.0),
        (2, "aaa", 5.0),
        (3, "aaa", 5.0),
        (4, "bbb", None),
        (5, "bbb", 2.0),
        (6, "ccc", 7.0),
        (7, None, 9.0),
        (8, "ddd", None),
        (9, "ddd", None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, score double")


def test_keep_best_picks_argmax_with_min_key_tiebreak(dup_docs):
    kept = keep_best_dedup(dup_docs, "score", key_col="doc_id", text_col="text")
    got = sorted(r.doc_id for r in kept.collect())
    # aaa → doc 2 (max score 5.0, tie with 3 → min key); bbb → doc 5 (NULL
    # score loses); ccc → doc 6; NULL payload doc 7 passes through untouched;
    # all-NULL-score ddd group still keeps its min-key row (doc 8)
    assert got == [2, 5, 6, 7, 8]


def test_keep_best_normalize_collapses_trivial_variants(spark):
    docs = spark.createDataFrame(
        [(1, "Hello,  World!", 1.0), (2, "hello world", 3.0), (3, "other", 0.0)],
        "doc_id long, text string, score double",
    )
    kept = keep_best_dedup(
        docs, "score", key_col="doc_id", text_col="text", normalize=True
    )
    assert sorted(r.doc_id for r in kept.collect()) == [2, 3]


def test_keep_best_window_has_pre_shuffle_group_limit(dup_docs):
    """row_number + _rn = 1 must compile to a WindowGroupLimit (per-partition
    top-1 BEFORE the digest exchange) — the property that keeps the dedup
    shuffle at one candidate row per digest per input partition at 10^12
    docs, identical to the min-key dedup plan."""
    kept = keep_best_dedup(dup_docs, "score", key_col="doc_id", text_col="text")
    plan = _formatted(kept)
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final


@pytest.fixture()
def dumped_docs(spark):
    # "aaa" appears in dump 0 twice (docs 10, 20) and dump 1 once (doc 11);
    # "bbb" once per dump; NULL payload in dump 0; scores for the policy test
    rows = [
        (10, 0, "aaa", 1.0),
        (20, 0, "aaa", 5.0),
        (11, 1, "aaa", 9.0),
        (30, 0, "bbb", 2.0),
        (31, 1, "bbb", 4.0),
        (40, 0, None, 8.0),
    ]
    return spark.createDataFrame(rows, "doc_id long, dump int, text string, score double")


def test_scoped_dedup_collapses_within_scope_only(dumped_docs):
    kept = scoped_dedup(dumped_docs, "dump", key_col="doc_id", text_col="text")
    got = sorted(r.doc_id for r in kept.collect())
    # dump 0 "aaa" → min-key doc 10 (20 dropped); dump 1's "aaa" copy (11)
    # SURVIVES — the FineWeb per-dump horizon; both "bbb" survive (one per
    # dump); NULL payload passes through
    assert got == [10, 11, 30, 31, 40]


def test_scoped_dedup_score_policy_picks_argmax_within_scope(dumped_docs):
    kept = scoped_dedup(dumped_docs, "dump", score_col="score", key_col="doc_id", text_col="text")
    got = sorted(r.doc_id for r in kept.collect())
    # dump 0 "aaa" now keeps doc 20 (score 5.0 > 1.0)
    assert got == [11, 20, 30, 31, 40]


def test_scoped_dedup_window_has_pre_shuffle_group_limit(dumped_docs):
    """Same scale contract as keep_best_dedup: one candidate per
    (scope, digest) per input partition moves through the single exchange."""
    kept = scoped_dedup(dumped_docs, "dump", key_col="doc_id", text_col="text")
    plan = _formatted(kept)
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final
    # exactly one hash exchange, keyed on (scope, digest)
    assert plan.count("hashpartitioning(dump") == 1


def test_scope_col_typo_raises_actionable_error(dumped_docs):
    """A typo'd scope column must fail up front with the fix named (the
    _check_score_col contract extended to the horizon knob)."""
    with pytest.raises(ValueError, match="scope column 'dmup'"):
        scoped_dedup(dumped_docs, "dmup", key_col="doc_id", text_col="text")
    from longqc_spark.operators.dedup import minhash_jaccard_estimate

    with pytest.raises(ValueError, match="scope column 'dmup'"):
        minhash_jaccard_estimate(
            dumped_docs, key_col="doc_id", threshold=0.5, scope_col="dmup"
        )


def test_incremental_dedup_scoped_excludes_same_dump_only(spark):
    """incremental_dedup(scope_col=): a committed digest excludes a batch
    doc only in the SAME dump; the within-batch window also keys on
    (dump, digest); NULL payloads pass through."""
    from longqc_spark.operators.dedup import incremental_dedup

    committed = spark.createDataFrame(
        [("aaa-digest-placeholder", 0)], "payload_md5 string, dump int"
    ).select(F.md5(F.lit("aaa").cast("binary")).alias("payload_md5"), "dump")
    batch = spark.createDataFrame(
        [
            (1, 0, "aaa"),   # committed in dump 0 → excluded
            (2, 1, "aaa"),   # same digest, dump 1 → ADMITTED
            (3, 1, "aaa"),   # within-batch dup of 2 in dump 1 → dropped
            (4, 0, "bbb"),   # fresh → admitted
            (5, 1, None),    # NULL payload → passes through
        ],
        "doc_id long, dump int, text string",
    )
    got = incremental_dedup(
        batch, committed, key_col="doc_id", text_col="text", scope_col="dump"
    )
    assert sorted(r.doc_id for r in got.collect()) == [2, 4, 5]
    # unscoped contrast: the committed digest kills BOTH dumps' copies
    got_global = incremental_dedup(
        batch, committed.drop("dump"), key_col="doc_id", text_col="text"
    )
    assert sorted(r.doc_id for r in got_global.collect()) == [4, 5]


def test_dup_cluster_sizes_histogram(spark):
    docs = spark.createDataFrame(
        [
            (1, "aaa", 3),
            (2, "aaa", 3),
            (3, "aaa", 3),
            (4, "bbb", 5),
            (5, "bbb", 5),
            (6, "ccc", 7),
            (7, None, 9),
        ],
        "doc_id long, text string, n_chars int",
    )
    got = {
        r.cluster_size: r
        for r in dup_cluster_sizes(docs, "text", "n_chars").collect()
    }
    assert set(got) == {1, 2, 3}
    assert (got[1].n_clusters, got[1].n_docs, got[1].n_excess_docs) == (1, 1, 0)
    assert (got[2].n_clusters, got[2].n_docs, got[2].n_excess_docs) == (1, 2, 1)
    assert got[2].excess_chars == 5  # one dropped "bbb" copy
    assert (got[3].n_clusters, got[3].n_docs, got[3].n_excess_docs) == (1, 3, 2)
    assert got[3].excess_chars == 6  # two dropped "aaa" copies


def test_token_budget_mix_greedy_prefix(spark):
    """Per-source md5-priority order; a doc is admitted iff the running
    total BEFORE it is under budget (one-doc overshoot allowed) — verify
    against a pandas reimplementation of the same rule."""
    import hashlib

    pdf = pd.DataFrame(
        {
            "doc_id": range(40),
            "source": ["a", "b"] * 20,
            "n_chars": [(i * 37) % 90 + 10 for i in range(40)],
        }
    )
    budgets = {"a": 150, "b": 60}
    docs = spark.createDataFrame(pdf)
    got = sorted(
        r.doc_id
        for r in mix_sources_token_budget(
            docs, budgets, count_col="n_chars", seed=23
        ).collect()
    )

    def prio(i):
        return hashlib.md5(f"{i}#23".encode()).hexdigest()

    want = []
    for src, grp in pdf.groupby("source"):
        run = 0
        for _, row in grp.assign(p=grp.doc_id.map(prio)).sort_values(
            ["p", "doc_id"]
        ).iterrows():
            if run < budgets[src]:
                want.append(int(row.doc_id))
            run += int(row.n_chars)
    assert got == sorted(want)
    assert len(got) > 0


def test_token_budget_mix_stable_under_repartition(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    budgets = {"src0": 2000, "src1": 1000}
    a = mix_sources_token_budget(docs, budgets).select("doc_id")
    b = mix_sources_token_budget(docs.repartition(13), budgets).select("doc_id")
    assert sorted(r.doc_id for r in a.collect()) == sorted(
        r.doc_id for r in b.collect()
    )


def test_split_leakage_report_counts(spark):
    # digest X straddles train(2)/val(1) → leaky, excess = 1 (majority=train)
    # digest Y is train-only → clean; NULL text ignored
    docs = spark.createDataFrame(
        [
            (1, "xxx", "train"),
            (2, "xxx", "train"),
            (3, "XXX!", "val"),  # normalized twin of xxx
            (4, "yyy", "train"),
            (5, "yyy", "train"),
            (6, None, "test"),
        ],
        "doc_id long, text string, split string",
    )
    row = split_leakage_report(docs, "split", normalize=True).collect()[0]
    assert (row.n_leaky_texts, row.n_docs_in_leaky, row.n_cross_split_excess) == (
        1,
        3,
        1,
    )


def test_split_leakage_zero_when_clean(spark):
    docs = spark.createDataFrame(
        [(1, "a", "train"), (2, "b", "val")], "doc_id long, text string, split string"
    )
    row = split_leakage_report(docs, "split").collect()[0]
    assert (row.n_leaky_texts, row.n_docs_in_leaky, row.n_cross_split_excess) == (
        0,
        0,
        0,
    )


def test_split_leakage_single_corpus_exchange(spark, sf001):
    """The digest repartition must be the ONLY corpus-side exchange: both
    groupBys (digest,split → digest) run on HashPartitioning(_digest); the
    final 1-row rollup adds its own SinglePartition exchange over ≤|leaky
    digests| rows, which is not corpus-sized."""
    from longqc_spark.operators.text import dataset_split_expr

    docs = (
        spark.read.parquet(f"{sf001}/documents.parquet")
        .withColumn("split", dataset_split_expr("doc_id"))
    )
    plan = _formatted(split_leakage_report(docs, "split"))
    # exactly two Exchanges total: the explicit digest repartition + the
    # SinglePartition gather for the global rollup ("Exchange (n)" is the
    # tree-line form; the "(n) Exchange" detail headers would double-count)
    assert plan.count("Exchange (") == 2
    assert plan.count("REPARTITION_BY_COL") == 1
    assert plan.count("SinglePartition") == 1


def test_curate_payload_dedup_best(spark, sf001):
    """curate(payload_dedup=True, payload_score_col=...) keeps exactly one
    winner per payload digest — the max-prior copy — before QC."""
    from longqc_spark.config import DRIVER_DOCS_CONFIG
    from longqc_spark.curation import curate

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    # plant exact duplicates: every doc_id%5==0 re-crawled under +10000 with
    # a HIGHER crawl prior, so the re-crawl must win over the original
    recrawl = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 10000
    )
    corpus = docs.unionByName(recrawl).withColumn(
        "crawl_prior", (F.col("doc_id") >= 10000).cast("double")
    )
    out = curate(
        corpus,
        cfg=DRIVER_DOCS_CONFIG,
        key_col="doc_id",
        text_col="text",
        payload_dedup=True,
        payload_score_col="crawl_prior",
    ).toPandas()
    survivors = set(out.doc_id)
    # for every planted pair, the high-prior +10000 copy is the only survivor
    assert not survivors & set(range(0, 500, 5))
    # and no un-duplicated doc was touched by the dedup stage
    base = curate(
        docs, cfg=DRIVER_DOCS_CONFIG, key_col="doc_id", text_col="text"
    ).toPandas()
    assert set(base.doc_id) - set(range(0, 500, 5)) <= survivors | set(
        range(0, 500, 5)
    )


def test_curate_payload_dedup_normalize_html_rejected(spark, sf001):
    from longqc_spark.curation import curate

    docs = spark.read.parquet(f"{sf001}/documents.parquet").withColumn(
        "html", F.col("text").cast("binary")
    )
    with pytest.raises(ValueError, match="normalize"):
        curate(
            docs,
            key_col="doc_id",
            html_col="html",
            payload_dedup=True,
            payload_dedup_normalize=True,
        )


def test_pack_sequences_layout(spark):
    """seq_id/seq_offset must equal the naive concatenate-and-cut layout."""
    from longqc_spark.operators.relational import pack_sequences

    pdf = pd.DataFrame({"doc_id": range(30), "n_chars": [(i * 13) % 40 + 1 for i in range(30)]})
    got = (
        pack_sequences(spark.createDataFrame(pdf), seq_len=50, key_col="doc_id",
                       tokens_col="n_chars")
        .orderBy("doc_id")
        .toPandas()
    )
    cum = pdf.n_chars.cumsum() - pdf.n_chars
    assert (got.seq_id == cum // 50).all()
    assert (got.seq_offset == cum % 50).all()
    assert (got.seq_offset < 50).all()
    # packing is dense: consecutive docs are contiguous in the stream
    stream_pos = got.seq_id * 50 + got.seq_offset
    assert (stream_pos.diff().dropna() == pdf.n_chars[:-1].values).all()


def test_pack_sequences_range_width_invariant(spark, sf001):
    from longqc_spark.operators.relational import pack_sequences

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    a = pack_sequences(docs, 1000).select("doc_id", "seq_id", "seq_offset")
    b = pack_sequences(docs, 1000, range_width=7).select(
        "doc_id", "seq_id", "seq_offset"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_sequences_no_global_window(spark, sf001):
    """Same posture as assign_shards: the only window is PARTITIONED by the
    key range — no single-task global window in the plan."""
    import re as _re

    from longqc_spark.operators.relational import pack_sequences

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    plan = pack_sequences(docs, 1000)._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    for m in _re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\](, \[[^\]]*\])?", plan):
        assert m.group(2) is not None, f"global (unpartitioned) window: {m.group(0)}"


def test_pack_sequences_string_key_rejected(spark):
    from longqc_spark.operators.relational import pack_sequences

    docs = spark.createDataFrame([("a", 3)], "url string, n_chars int")
    with pytest.raises(TypeError, match="NUMERIC"):
        pack_sequences(docs, 10, key_col="url")


def test_cluster_keep_best_semantics(spark):
    """Transitive cluster {1,2,3} (chain pairs) keeps only its max-score
    member; pair cluster {10,11} keeps max score with min-key tie-break;
    singleton 20 survives untouched."""
    from longqc_spark.operators.dedup import cluster_keep_best

    docs = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 7.0), (10, 4.0), (11, 4.0), (20, 0.0)],
        "doc_id long, score double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "key_a long, key_b long"
    )
    kept = cluster_keep_best(docs, pairs, "score", key_col="doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [2, 10, 20]
    # score_col=None degrades to the min-key witness rule
    kept_min = cluster_keep_best(docs, pairs, None, key_col="doc_id")
    assert sorted(r.doc_id for r in kept_min.collect()) == [1, 10, 20]


def test_curate_neardup_stage(spark, sf001):
    """curate(neardup_threshold=...) drops near-duplicate re-crawls (one
    token prepended — exact digests differ, so stage 0.5 would admit them)
    keeping one survivor per fuzzy cluster."""
    from longqc_spark.config import DRIVER_DOCS_CONFIG
    from longqc_spark.curation import curate

    docs = spark.read.parquet(f"{sf001}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    recrawl = docs.filter(F.col("doc_id") % 4 == 0).withColumn(
        "doc_id", F.col("doc_id") + 10000
    ).withColumn("text", F.concat(F.lit("recrawl2025 "), F.col("text")))
    corpus = docs.unionByName(recrawl)

    out = curate(
        corpus,
        cfg=DRIVER_DOCS_CONFIG,
        key_col="doc_id",
        text_col="text",
        neardup_threshold=0.8,
    ).toPandas()
    survivors = set(out.doc_id)
    # every planted near-dup cluster lost its +10000 copy (min-key winner)
    assert not {d for d in survivors if d >= 10000}
    # and the result equals the SAME near-dup run without the re-crawls:
    # the synthetic corpus has natural near-dup pairs too, and min-key
    # winners among originals are unaffected by adding higher-key re-crawls
    base = set(
        curate(
            docs,
            cfg=DRIVER_DOCS_CONFIG,
            key_col="doc_id",
            text_col="text",
            neardup_threshold=0.8,
        ).toPandas().doc_id
    )
    assert survivors == base


def test_curate_neardup_keep_best_prior(spark, sf001):
    """With payload_score_col the near-dup cluster keeps the max-prior copy
    (here the re-crawl) instead of the min key."""
    from longqc_spark.config import DRIVER_DOCS_CONFIG
    from longqc_spark.curation import curate

    docs = spark.read.parquet(f"{sf001}/documents.parquet").filter(
        F.col("doc_id") < 100
    )
    recrawl = docs.withColumn("doc_id", F.col("doc_id") + 10000).withColumn(
        "text", F.concat(F.lit("recrawl2025 "), F.col("text"))
    )
    corpus = docs.unionByName(recrawl).withColumn(
        "crawl_prior", (F.col("doc_id") >= 10000).cast("double")
    )
    out = curate(
        corpus,
        cfg=DRIVER_DOCS_CONFIG,
        key_col="doc_id",
        text_col="text",
        neardup_threshold=0.8,
        payload_score_col="crawl_prior",
    ).toPandas()
    # clusters resolved toward the re-crawls
    assert (out.doc_id >= 10000).all()
    assert len(out) > 0


def test_pack_sequence_rows_reconstructs_stream(spark):
    """Concatenating the packed rows in seq_id order must reproduce the doc
    stream byte-for-byte; every row but the last is exactly seq_len chars."""
    from longqc_spark.operators.relational import pack_sequence_rows

    pdf = pd.DataFrame(
        {
            "doc_id": range(25),
            "text": ["".join(chr(97 + (i * 7 + j) % 26) for j in range((i * 13) % 40 + 1))
                     for i in range(25)],
        }
    )
    got = (
        pack_sequence_rows(spark.createDataFrame(pdf), 32, key_col="doc_id")
        .orderBy("seq_id")
        .toPandas()
    )
    stream = "".join(pdf.sort_values("doc_id").text)
    assert "".join(got.seq_text) == stream
    assert (got.seq_text.str.len()[:-1] == 32).all()
    assert list(got.seq_id) == list(range(len(got)))


def test_pack_sequence_rows_skips_empty_and_null(spark):
    from longqc_spark.operators.relational import pack_sequence_rows

    docs = spark.createDataFrame(
        [(1, "abc"), (2, ""), (3, None), (4, "defgh")], "doc_id long, text string"
    )
    got = pack_sequence_rows(docs, 4).orderBy("seq_id").toPandas()
    assert "".join(got.seq_text) == "abcdefgh"
    assert list(got.seq_text) == ["abcd", "efgh"]


def test_pack_sequence_rows_no_global_window(spark, sf001):
    import re as _re

    from longqc_spark.operators.relational import pack_sequence_rows

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    plan = (
        pack_sequence_rows(docs, 1000)._jdf.queryExecution().executedPlan().toString()
    )
    for m in _re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\](, \[[^\]]*\])?", plan):
        assert m.group(2) is not None, f"global (unpartitioned) window: {m.group(0)}"


def test_curate_funnel_observations(spark, sf001):
    """observe= populates per-stage Observations riding the funnel's own
    execution: stage counts must match independently computed values."""
    from longqc_spark.config import DRIVER_DOCS_CONFIG
    from longqc_spark.curation import curate
    from longqc_spark.pipeline import qc_pipeline

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    recrawl = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 10000
    )
    corpus = docs.unionByName(recrawl)
    n_in = corpus.count()

    obs: dict = {}
    out = curate(
        corpus,
        cfg=DRIVER_DOCS_CONFIG,
        key_col="doc_id",
        text_col="text",
        payload_dedup=True,
        observe=obs,
    )
    n_final = out.count()  # the one action; all observations harvest from it
    assert set(obs) == {"input", "hygiene", "payload_dedup", "qc_keep"}
    assert obs["input"].get["n"] == n_in
    assert obs["hygiene"].get["n"] == n_in  # no hygiene stages enabled
    assert obs["payload_dedup"].get["n"] == docs.count()  # dups collapsed
    assert obs["qc_keep"].get["n"] == n_final
    # qc_keep equals an independent keep count over the deduped rows
    want_keep = (
        qc_pipeline(docs, DRIVER_DOCS_CONFIG, key_cols=["doc_id"])
        .filter(F.col("keep"))
        .count()
    )
    assert n_final == want_keep


# -- hypothesis properties: the new operators must hold their invariants on
# arbitrary inputs, not just the synthetic corpus (SURVEY §5 strategy) --

from hypothesis import given, settings, strategies as st  # noqa: E402

_doc_lists = st.lists(
    st.one_of(st.none(), st.text(alphabet="abc xyz", max_size=25)),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(_doc_lists, st.integers(min_value=1, max_value=30))
def test_pack_rows_reconstruction_property(spark, docs_texts, L):
    from longqc_spark.operators.relational import pack_sequence_rows

    pdf = pd.DataFrame(
        {"doc_id": range(len(docs_texts)), "text": pd.Series(docs_texts, dtype=object)}
    )
    df = spark.createDataFrame(pdf.astype({"doc_id": "int64"}))
    got = pack_sequence_rows(df, L, key_col="doc_id").orderBy("seq_id").toPandas()
    stream = "".join(t for t in docs_texts if t)
    assert "".join(got.seq_text) == stream
    if len(got):
        assert (got.seq_text.str.len()[:-1] == L).all()
        assert list(got.seq_id) == list(range(len(got)))


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.sampled_from(["aa", "bb", "cc"])),
            st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_keep_best_winner_property(spark, rows):
    """Per digest group exactly the (score desc nulls-last, key asc) argmax
    survives; NULL payloads all pass through."""
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": pd.Series([r[0] for r in rows], dtype=object),
            "score": pd.Series(
                [None if r[1] is None else float(r[1]) for r in rows], dtype="float64"
            ),
        }
    )
    df = spark.createDataFrame(pdf.astype({"doc_id": "int64"}))
    got = sorted(
        r.doc_id
        for r in keep_best_dedup(df, "score", key_col="doc_id", text_col="text").collect()
    )
    want = [int(i) for i, r in enumerate(rows) if r[0] is None]
    groups: dict = {}
    for i, (t, q) in enumerate(rows):
        if t is not None:
            groups.setdefault(t, []).append((i, q))
    for members in groups.values():
        # score desc with NULLs last, then min key
        want.append(
            min(members, key=lambda m: (m[1] is None, -(m[1] or 0), m[0]))[0]
        )
    assert got == sorted(want)


def test_funnel_counts_summary(spark, sf001):
    from longqc_spark.config import DRIVER_DOCS_CONFIG
    from longqc_spark.curation import curate, funnel_counts

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    recrawl = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 10000
    )
    obs: dict = {}
    out = curate(
        docs.unionByName(recrawl),
        cfg=DRIVER_DOCS_CONFIG,
        key_col="doc_id",
        text_col="text",
        payload_dedup=True,
        observe=obs,
    )
    n_final = out.count()
    fc = funnel_counts(obs)
    assert list(fc) == ["input", "hygiene", "payload_dedup", "qc_keep"]
    assert fc["input"]["dropped"] == 0
    assert fc["payload_dedup"]["dropped"] == recrawl.count()
    assert fc["qc_keep"]["n"] == n_final
    # drops telescope: input n - sum(drops) = final n
    assert fc["input"]["n"] - sum(s["dropped"] for s in fc.values()) == n_final


def test_compression_ratio_signal(spark):
    """zlib ratio: boilerplate < prose < random (the two-sided gate the
    signal exists for); Spark values equal direct zlib on the driver
    (engine adds nothing); NULL/empty -> NULL; bad level rejected."""
    import zlib

    import numpy as np
    import pytest as _pytest

    from longqc_spark.operators.text import compression_ratio

    rng = np.random.default_rng(7)
    alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz "))
    random_text = "".join(rng.choice(alphabet, size=2000))
    prose = (
        "The committee reviewed the updated proposal on Thursday and asked "
        "for two clarifications about the budget and the timeline before "
        "approving the next phase of the work. "
    ) * 8
    boiler = "cookie consent required please accept our policy " * 40
    rows = [(1, boiler), (2, prose), (3, random_text), (4, None), (5, "")]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r["id"]: r["zlib_ratio"] for r in compression_ratio(df).collect()}
    assert got[1] < got[2] < got[3]
    for i, t in rows:
        if t:
            b = t.encode("utf-8")
            assert got[i] == _pytest.approx(len(zlib.compress(b, 6)) / len(b))
    assert got[4] is None and got[5] is None
    with _pytest.raises(ValueError, match="level"):
        compression_ratio(df, level=0)
