"""Skew-adversarial corpus: one boilerplate template dominating ~30% of all
documents — the canonical web-crawl pathology (cookie banners, parked
domains). The LSH banded join is the operator at risk: every flood doc lands
in the SAME (band, bhash) bucket and the all-pairs join goes quadratic.
These tests pin the ``max_bucket`` guard's two contracts: bounded candidate
fan-out AND unchanged duplicate clusters."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from longqc_spark.operators.dedup import (
    connected_components,
    lsh_candidate_pairs,
    minhash_jaccard_estimate,
    minhash_signatures,
)

TEMPLATE = (
    "cookie consent required this website uses cookies to improve your "
    "experience please accept our policy terms and conditions apply "
    "all rights reserved contact us about privacy settings"
)


def boilerplate_corpus(n: int, flood_frac: float = 0.3, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = [f"w{i:04d}" for i in range(5000)]
    rows = []
    for i in range(n):
        if i % 10 < int(flood_frac * 10):
            rows.append((i, TEMPLATE))  # exact template flood
        else:
            rows.append((i, " ".join(rng.choice(vocab, size=30))))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_bucket_guard_bounds_candidate_fanout(spark):
    """30% flood, n=3000: unguarded banding is quadratic in the flood size
    (~C(900,2) pairs); with max_bucket the fan-out is linear in n."""
    n = 3000
    docs = spark.createDataFrame(boilerplate_corpus(n))
    sigs = minhash_signatures(docs, key_col="doc_id", text_col="text").cache()

    unguarded = lsh_candidate_pairs(sigs, key_col="doc_id").count()
    guarded = lsh_candidate_pairs(sigs, key_col="doc_id", max_bucket=50).count()

    flood = int(n * 0.3)
    assert unguarded >= flood * (flood - 1) // 2  # quadratic blow-up is real
    assert guarded < 5 * n  # bounded: linear in corpus size
    assert unguarded > 25 * guarded


def test_bucket_guard_preserves_clusters(spark):
    """Star expansion keeps connectivity: the duplicate CLUSTERS (connected
    components over threshold-passing pairs) are identical with and without
    the guard."""
    docs = spark.createDataFrame(boilerplate_corpus(600))

    def clusters(max_bucket):
        pairs = minhash_jaccard_estimate(
            docs, key_col="doc_id", text_col="text", threshold=0.8, max_bucket=max_bucket
        ).select("key_a", "key_b")
        comp = connected_components(pairs).toPandas()
        return sorted(
            frozenset(g.node) for _, g in comp.groupby("component") if len(g) > 1
        )

    assert clusters(None) == clusters(25)


def test_bucket_guard_flood_one_component(spark):
    """Every flood doc ends up in one duplicate cluster under the guard —
    nothing is silently dropped the way a hard bucket cut would."""
    n = 1000
    docs = spark.createDataFrame(boilerplate_corpus(n))
    pairs = minhash_jaccard_estimate(
        docs, key_col="doc_id", text_col="text", threshold=0.9, max_bucket=20
    ).select("key_a", "key_b")
    comp = connected_components(pairs).toPandas()
    flood_ids = {i for i in range(n) if i % 10 < 3}
    flood_comp = comp[comp.node.isin(flood_ids)]
    assert set(flood_comp.node) == flood_ids
    assert flood_comp.component.nunique() == 1


def test_skewed_pipeline_throughput_sane(spark):
    """The guarded LSH pipeline on the boilerplate corpus completes within
    ~1.5x the uniform-corpus time at equal size (the AQE/banded join does
    not degenerate). Generous bound: this VM's co-tenant noise is real."""
    import time

    n = 20_000
    skewed = spark.createDataFrame(boilerplate_corpus(n)).cache()
    uniform = spark.createDataFrame(boilerplate_corpus(n, flood_frac=0.0)).cache()
    skewed.count(), uniform.count()

    def run(df):
        t0 = time.time()
        minhash_jaccard_estimate(
            df, key_col="doc_id", text_col="text", threshold=0.8, max_bucket=100
        ).count()
        return time.time() - t0

    run(uniform)  # warm-up
    t_uniform = min(run(uniform) for _ in range(2))
    t_skewed = min(run(skewed) for _ in range(2))
    assert t_skewed < max(3.0, 2.5 * t_uniform), (t_skewed, t_uniform)


def test_aqe_skew_split_one_sided_but_not_selfjoin(spark):
    """Two facts about AQE skew handling, pinned because together they are
    WHY the max_bucket guard exists:

    1. a ONE-SIDED skewed shuffle join IS split by AQE at these thresholds
       (final adaptive plan carries SortMergeJoin(skew=true)) — ordinary
       skewed equi-joins in this engine are protected by configuration;
    2. AQE can at best split the flooded SELF-join's INPUT partitions
       (plan-shape-dependent — observed both ways across plan variants);
       it can never bound the OUTPUT: the flood still emits a quadratic
       candidate-pair count (~C(flood,2)·coincidence factor), which is the
       actual 100-TB failure. Only the max_bucket star expansion bounds
       the pairs themselves — asserted here as quadratic-vs-linear on the
       same signatures under the same AQE settings."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32768",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # fact 1: one-sided skew (80% of the big side on one key) IS split
        left = spark.range(300_000).select(
            F.when(F.col("id") % 10 < 8, F.lit(1)).otherwise(F.col("id")).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(5_000).select(F.col("id").alias("k"), F.lit("r").alias("v"))
        probe = left.join(right, "k").select(F.count(F.lit(1)).alias("n"))
        assert probe.collect()[0]["n"] == 241_000
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan and "skew=true" in plan

        # fact 2: with the SAME AQE settings, the unguarded flood self-join
        # still emits a quadratic pair count — whatever AQE does to the
        # input partitions, it cannot shrink the output; the guard can
        docs = spark.createDataFrame(boilerplate_corpus(4000))
        sigs = minhash_signatures(docs, key_col="doc_id", text_col="text").cache()
        flood = 1200
        unguarded = lsh_candidate_pairs(sigs, key_col="doc_id").count()
        assert unguarded >= flood * (flood - 1) // 2
        guarded = lsh_candidate_pairs(sigs, key_col="doc_id", max_bucket=50).count()
        assert guarded < 5 * 4000
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_simhash_bucket_guard(spark):
    """SimHash has the identical flood pathology (a template flood shares
    ONE simhash, hence one chunk bucket per chunk_id): the guard bounds the
    fan-out and preserves the flood's one-cluster connectivity."""
    from longqc_spark.operators.dedup import simhash_near_pairs, simhash_signatures

    n = 2000
    docs = spark.createDataFrame(boilerplate_corpus(n))
    sims = simhash_signatures(docs, key_col="doc_id", text_col="text").cache()

    unguarded = simhash_near_pairs(sims, key_col="doc_id").count()
    guarded_pairs = simhash_near_pairs(sims, key_col="doc_id", max_bucket=50)
    guarded = guarded_pairs.count()
    flood = int(n * 0.3)
    assert unguarded >= flood * (flood - 1) // 2
    assert guarded < 5 * n
    # connectivity: all flood docs in one component via the star pairs
    comp = connected_components(
        guarded_pairs.filter(F.col("hamming") == 0).select("key_a", "key_b")
    ).toPandas()
    flood_ids = {i for i in range(n) if i % 10 < 3}
    assert flood_ids <= set(comp.node)
    assert comp[comp.node.isin(flood_ids)].component.nunique() == 1


def test_embed_neardup_bucket_guard(spark):
    """Embedding flood (one vector repeated in 30% of rows): the guarded
    hyperplane path bounds pair fan-out; flood stays one cosine-1.0 cluster
    via the star pairs."""
    from longqc_spark.operators.simsearch import embed_neardup

    rng = np.random.default_rng(3)
    n, dim = 1500, 16
    flood_vec = rng.normal(size=dim).tolist()
    rows = []
    for i in range(n):
        if i % 10 < 3:
            rows.append((i, flood_vec))
        else:
            rows.append((i, rng.normal(size=dim).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    unguarded = embed_neardup(emb, threshold=0.99, n_bits=8).count()
    guarded_df = embed_neardup(emb, threshold=0.99, n_bits=8, max_bucket=50)
    guarded = guarded_df.count()
    flood = int(n * 0.3)
    assert unguarded >= flood * (flood - 1) // 2
    assert guarded < 5 * n
    comp = connected_components(guarded_df.select("key_a", "key_b")).toPandas()
    flood_ids = {i for i in range(n) if i % 10 < 3}
    assert flood_ids <= set(comp.node)
    assert comp[comp.node.isin(flood_ids)].component.nunique() == 1


def test_skew_split_requires_plain_shuffle_sides(spark):
    """Round-5 pin (the shape constraint behind BENCH_CORPUS.json's
    ``onesided_hot_host_1m``): ``OptimizeSkewedJoin`` pattern-matches
    ``Sort ← ShuffleQueryStage`` DIRECTLY on both join sides, so

    * docs × plain dimension relation → the skewed side IS split;
    * the byte-identical join whose dimension side is aggregated in the
      same plan (groupBy → join) is NOT split — the partial aggregate
      sits between the Sort and the shuffle stage and the rule never
      fires, no matter the thresholds.

    Production consequence, encoded in curation.py's ordering: host-grain
    features joined against the corpus should arrive as materialized
    tables from a prior job, not as agg subplans fused into the consumer."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32768",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        docs = spark.range(100_000).select(
            F.when(F.col("id") % 10 < 8, F.lit("hot.example"))
            .otherwise(F.concat(F.lit("h"), F.col("id") % 500, F.lit(".example")))
            .alias("host"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        dim_plain = spark.range(501).select(
            F.when(F.col("id") == 500, F.lit("hot.example"))
            .otherwise(F.concat(F.lit("h"), F.col("id"), F.lit(".example")))
            .alias("host"),
            (F.col("id") % 9).alias("score"),
        )

        def run(dim):
            probe = docs.join(dim, "host").groupBy().agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.length("pad")).alias("pc"),
                F.sum("score").alias("s"),
            )
            probe.collect()
            return probe._jdf.queryExecution().executedPlan().toString()

        assert "skew=true" in run(dim_plain)
        dim_agged = docs.groupBy("host").agg(F.min(F.length("pad")).alias("score"))
        assert "skew=true" not in run(dim_agged)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
