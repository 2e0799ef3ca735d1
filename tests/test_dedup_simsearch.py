"""Correctness of the dedup + similarity-search operators: the LSH paths are
rows-only in the driver contract, so exactness is proven here against planted
near-duplicates and brute-force baselines."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from longqc_spark.operators.dedup import (
    minhash_jaccard_estimate,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_signatures,
)
from longqc_spark.operators.simsearch import cosine_topk, lsh_topk


def _planted_docs(spark):
    """10 base docs; docs 100+i are near-copies of doc i (1 token changed of
    ~60); docs 200+ are unrelated."""
    rng = np.random.default_rng(5)
    vocab = [f"w{j}" for j in range(500)]
    rows = []
    for i in range(10):
        toks = [vocab[x] for x in rng.integers(0, 500, 60)]
        rows.append((i, " ".join(toks)))
        near = list(toks)
        near[5] = "CHANGED"
        rows.append((100 + i, " ".join(near)))
    for i in range(10):
        toks = [vocab[x] for x in rng.integers(0, 500, 60)]
        rows.append((200 + i, " ".join(toks)))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def _exact_jaccard(a: str, b: str) -> float:
    sa, sb = set(a.lower().split()), set(b.lower().split())
    return len(sa & sb) / len(sa | sb)


def test_ngram_jaccard_matches_python(spark):
    docs = _planted_docs(spark)
    got = ngram_jaccard_pairs(docs, min_jaccard=0.5).toPandas()
    pdf = docs.toPandas().set_index("doc_id").text
    pairs = {(r.key_a, r.key_b): r.jaccard for r in got.itertuples()}
    for i in range(10):
        key = (i, 100 + i)
        assert key in pairs
        assert pairs[key] == pytest.approx(_exact_jaccard(pdf[i], pdf[100 + i]))
    # unrelated docs share few tokens → no pair at 0.5
    assert all(b - a == 100 for a, b in pairs)


def test_ngram_jaccard_heavy_hitter_guard(spark):
    """A planted stopword in EVERY doc must not explode the token self-join:
    with max_occ the ubiquitous token is cut before pairing, bounding the
    candidate count, while jaccard stays exact over the surviving tokens."""
    rows = []
    for i in range(40):
        # 'the' everywhere (df=40) + 8 unique tokens per doc; docs 0 and 1
        # additionally share 6 rare tokens → one genuine near-dup pair
        toks = ["the"] + [f"u{i}_{j}" for j in range(8)]
        if i in (0, 1):
            toks += [f"shared{j}" for j in range(6)]
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

    guarded = ngram_jaccard_pairs(docs, max_occ=10).toPandas()
    # without the guard every one of the 40·39/2=780 pairs shares 'the'
    unguarded = ngram_jaccard_pairs(docs).toPandas()
    assert len(unguarded) == 40 * 39 // 2
    # with it, only the genuinely-overlapping pair survives the join at all
    assert len(guarded) == 1
    assert (guarded.key_a[0], guarded.key_b[0]) == (0, 1)
    # exact jaccard over surviving tokens: |∩|=6, |∪|=8+8+6=22
    assert guarded.jaccard[0] == pytest.approx(6 / 22)
    # the convergence guard: chain of length > max_iter raises loudly
    from longqc_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        pd.DataFrame({"key_a": range(9), "key_b": range(1, 10)})
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2)
    assert (
        connected_components(chain, max_iter=12)
        .filter(F.col("component") == 0)
        .count()
        == 10
    )


def test_contamination_check_planted(spark):
    """Hand-computed decontamination: doc 100 embeds an exact 6-token eval
    span (two 5-shingles), doc 101 shares only 4 consecutive tokens (below
    the shingle width → clean), doc 102 is disjoint."""
    from longqc_spark.operators.dedup import contamination_check

    eval_df = spark.createDataFrame(
        pd.DataFrame({"eval_id": [0], "text": ["alpha beta gamma delta epsilon zeta"]})
    )
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [100, 101, 102],
                "text": [
                    "intro alpha beta gamma delta epsilon zeta outro end",
                    "alpha beta gamma delta UNRELATED tail words here",
                    "completely different text with enough tokens here",
                ],
            }
        )
    )
    got = contamination_check(docs, eval_df).toPandas()
    assert got.doc_id.tolist() == [100]
    # eval has 2 distinct 5-shingles; both appear in doc 100
    assert got.n_contaminated_shingles.tolist() == [2]
    assert got.n_eval_docs_hit.tolist() == [1]


def test_minhash_lsh_finds_planted_pairs(spark):
    docs = _planted_docs(spark)
    got = minhash_jaccard_estimate(docs, threshold=0.5).toPandas()
    found = {(r.key_a, r.key_b) for r in got.itertuples()}
    assert {(i, 100 + i) for i in range(10)} <= found
    # estimates in a sane band around the true shingle jaccard (~0.85)
    assert (got.est_jaccard >= 0.5).all()


def test_minhash_lsh_scoped_restricts_pairs_to_same_dump(spark):
    """scope_col joins the dump into the LSH bucket key: the planted
    near-pair splits across dumps when base and copy land in different
    dumps, so only the same-dump plants may surface — cross-dump copies
    survive (the FineWeb per-dump horizon)."""
    docs = _planted_docs(spark)
    # dump assignment: base docs (0-9) → dump 0; near-copies (100-109) of
    # EVEN bases → dump 0 (same dump: pair must be found), of ODD bases →
    # dump 1 (cross-dump: pair must NOT form)
    dump = F.when(F.col("doc_id") < 100, F.lit(0)).otherwise(
        F.pmod(F.col("doc_id"), F.lit(2)).cast("int")
    )
    scoped = docs.withColumn("dump", dump)
    got = minhash_jaccard_estimate(scoped, threshold=0.5, scope_col="dump").toPandas()
    found = {(r.key_a, r.key_b) for r in got.itertuples()}
    same_dump = {(i, 100 + i) for i in range(0, 10, 2)}
    cross_dump = {(i, 100 + i) for i in range(1, 10, 2)}
    assert same_dump <= found
    assert not (cross_dump & found)
    # unscoped on the same input finds ALL plants — the horizon is the only
    # difference
    got_all = minhash_jaccard_estimate(scoped, threshold=0.5).toPandas()
    found_all = {(r.key_a, r.key_b) for r in got_all.itertuples()}
    assert (same_dump | cross_dump) <= found_all


def test_minhash_lsh_scoped_splits_flooded_bucket(spark):
    """A template flood that breaches max_bucket globally stays under it
    per dump: scoping must yield the exact all-pairs candidates within each
    dump (no star expansion engaged) while the global run with the same cap
    would star-expand."""
    text = "the same boilerplate template page body repeated verbatim"
    rows = [(i, i % 4, text) for i in range(20)]  # 5 docs per dump
    docs = spark.createDataFrame(rows, "doc_id long, dump int, text string")
    got = minhash_jaccard_estimate(
        docs, threshold=0.9, max_bucket=8, scope_col="dump"
    ).toPandas()
    found = {(r.key_a, r.key_b) for r in got.itertuples()}
    expect = {
        (a, b)
        for a in range(20)
        for b in range(20)
        if a < b and a % 4 == b % 4
    }
    assert found == expect  # all within-dump pairs, zero cross-dump


def test_simhash_planted_pairs_within_hamming(spark):
    docs = _planted_docs(spark)
    sims = simhash_signatures(docs)
    # planted pairs sit at hamming 3-6 → 8 chunks guarantee radius ≤ 7
    got = simhash_near_pairs(sims, max_hamming=7, n_chunks=8).toPandas()
    found = {(r.key_a, r.key_b) for r in got.itertuples()}
    assert {(i, 100 + i) for i in range(10)} <= found


def test_simhash_scoped_restricts_pairs_to_same_dump(spark):
    """scope_col on simhash_near_pairs mirrors the LSH contract: identical
    docs in different dumps never pair; same-dump plants still do."""
    docs = _planted_docs(spark)
    dump = F.when(F.col("doc_id") < 100, F.lit(0)).otherwise(
        F.pmod(F.col("doc_id"), F.lit(2)).cast("int")
    )
    sims = simhash_signatures(
        docs.withColumn("dump", dump), passthrough_cols=("dump",)
    )
    got = simhash_near_pairs(
        sims, max_hamming=7, n_chunks=8, scope_col="dump"
    ).toPandas()
    found = {(r.key_a, r.key_b) for r in got.itertuples()}
    assert {(i, 100 + i) for i in range(0, 10, 2)} <= found  # same dump
    assert not ({(i, 100 + i) for i in range(1, 10, 2)} & found)  # cross dump


def test_embed_neardup_scoped_both_paths(spark):
    """scope_col on embed_neardup: identical vectors in different dumps
    never pair, same-dump copies do — on BOTH the exact theta path and the
    hyperplane-bucketed path (where the scope folds into the bucket id)."""
    from longqc_spark.operators.simsearch import embed_neardup

    v1, v2 = [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]
    rows = [
        (1, 0, v1), (2, 0, v1),   # same dump, identical → pair
        (3, 1, v1),               # other dump, identical → no pair with 1/2
        (4, 0, v2), (5, 1, v2),   # cross dump only → no pair
    ]
    emb = spark.createDataFrame(rows, "vec_id long, dump int, embedding array<double>")
    for n_bits in (0, 4):
        got = embed_neardup(
            emb, threshold=0.9, n_bits=n_bits, scope_col="dump"
        ).toPandas()
        assert {(r.key_a, r.key_b) for r in got.itertuples()} == {(1, 2)}, n_bits
    # unscoped contrast: all three identical-v1 copies pair up
    got_all = embed_neardup(emb, threshold=0.9).toPandas()
    assert {(r.key_a, r.key_b) for r in got_all.itertuples()} == {(1, 2), (1, 3), (2, 3), (4, 5)}


def test_incremental_neardup_scoped_probes_same_dump_only(spark):
    """minhash_band_table(scope_col=) + incremental_neardup(scope_col=):
    a committed band bucket excludes a batch near-copy only in the SAME
    dump; the identical near-copy in another dump is admitted."""
    from longqc_spark.operators.dedup import incremental_neardup, minhash_band_table

    rng_text = " ".join(f"w{j}" for j in range(60))
    committed_docs = spark.createDataFrame(
        [(100, 0, rng_text)], "doc_id long, dump int, text string"
    )
    bands_tbl = minhash_band_table(committed_docs, key_col="doc_id", scope_col="dump")
    near = rng_text.replace("w5", "CHANGED", 1)
    batch = spark.createDataFrame(
        [
            (1, 0, near),                          # near-copy, same dump → dropped
            (2, 1, near),                          # near-copy, other dump → admitted
            (3, 0, " ".join(f"x{j}" for j in range(60))),  # unrelated → admitted
        ],
        "doc_id long, dump int, text string",
    )
    got = incremental_neardup(batch, bands_tbl, key_col="doc_id", scope_col="dump")
    assert sorted(r.doc_id for r in got.collect()) == [2, 3]
    # unscoped contrast: the committed buckets kill both near-copies
    got_global = incremental_neardup(
        batch, minhash_band_table(committed_docs, key_col="doc_id"), key_col="doc_id"
    )
    assert sorted(r.doc_id for r in got_global.collect()) == [3]


def test_simhash_deterministic(spark):
    docs = _planted_docs(spark)
    a = simhash_signatures(docs).toPandas().set_index("doc_id").simhash
    b = simhash_signatures(docs.repartition(7)).toPandas().set_index("doc_id").simhash
    pd.testing.assert_series_equal(a.sort_index(), b.sort_index())


def test_cosine_topk_exact(spark, sf01):
    emb = spark.read.parquet(f"{sf01}/embeddings.parquet")
    got = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=3).toPandas()
    pdf = emb.toPandas()
    q = np.array(pdf[pdf.vec_id == 0].embedding.iloc[0])
    m = np.vstack(pdf.embedding.to_numpy())
    cos = m @ q / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    cos[pdf.vec_id == 0] = -np.inf
    top3 = pdf.vec_id.to_numpy()[np.argsort(-cos)[:3]]
    assert list(got.vec_id) == list(top3)
    assert got.cosine.to_numpy() == pytest.approx(np.sort(cos)[::-1][:3])


def test_lsh_topk_structure_on_driver_embeddings(spark, sf01):
    # driver embeddings are isotropic noise (intra≈inter cosine) — assert
    # structural properties only: per-query rank monotone, ≤ k rows
    emb = spark.read.parquet(f"{sf01}/embeddings.parquet")
    got = lsh_topk(emb, emb.filter(F.col("vec_id") < 10), k=3, n_bits=4).toPandas()
    assert (got.groupby("query_id").cosine.apply(lambda s: s.is_monotonic_decreasing)).all()
    assert (got.groupby("query_id").size() <= 3).all()
    assert (got.query_id != got.vec_id).all()


def test_ivf_topk_recall_on_clustered_vectors(spark):
    """IVF with n_probe=2 over 10 planted clusters must recover most exact
    neighbors (cells align with clusters)."""
    from longqc_spark.operators.simsearch import ivf_topk

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((10, 64)) * 3
    rows = []
    for c in range(10):
        for j in range(20):
            v = centers[c] + rng.standard_normal(64) * 0.5
            rows.append((c * 20 + j, [float(x) for x in v]))
    emb = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    exact = cosine_topk(emb, queries, k=5).toPandas()
    approx = ivf_topk(emb, queries, k=5, n_cells=10, n_probe=2, sample_n=200).toPandas()
    e = {(r.query_id, r.vec_id) for r in exact.itertuples()}
    g = {(r.query_id, r.vec_id) for r in approx.itertuples()}
    assert len(e & g) / len(e) >= 0.8


def test_lsh_topk_recall_on_clustered_vectors(spark):
    """Planted clusters: 10 centers × 20 members; LSH top-k must recover
    same-cluster neighbors found by exact search with high recall."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((10, 64)) * 3
    rows = []
    for c in range(10):
        for j in range(20):
            v = centers[c] + rng.standard_normal(64) * 0.5
            rows.append((c * 20 + j, [float(x) for x in v]))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    emb = spark.createDataFrame(pdf)
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    exact = cosine_topk(emb, queries, k=5).toPandas()
    approx = lsh_topk(emb, queries, k=5, n_bits=4).toPandas()
    e = {(r.query_id, r.vec_id) for r in exact.itertuples()}
    g = {(r.query_id, r.vec_id) for r in approx.itertuples()}
    assert len(e & g) / len(e) >= 0.6


def test_embed_neardup_exact_and_bucketed(spark):
    """Embedding-cosine near-dup: exact path finds exactly the planted
    near-copies (vec, vec+tiny noise); the LSH-bucketed path finds most of
    them with 2^bits fewer candidate pairs."""
    from longqc_spark.operators.simsearch import embed_neardup

    rng = np.random.default_rng(3)
    rows = []
    for i in range(40):
        v = rng.standard_normal(64)
        rows.append((i, [float(x) for x in v]))
        rows.append((1000 + i, [float(x) for x in v + rng.standard_normal(64) * 0.05]))
    emb = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    exact = embed_neardup(emb, threshold=0.9).toPandas()
    # every planted pair, nothing else (random 64-d gaussians: cos ~ N(0, 1/8))
    assert {(r.key_a, r.key_b) for r in exact.itertuples()} == {(i, 1000 + i) for i in range(40)}
    assert (exact["cosine"] > 0.9).all()
    bucketed = embed_neardup(emb, threshold=0.9, n_bits=2).toPandas()
    got = {(r.key_a, r.key_b) for r in bucketed.itertuples()}
    assert got <= {(i, 1000 + i) for i in range(40)}
    assert len(got) / 40 >= 0.6  # 2-bit buckets: recall traded for 4x candidate cut


def test_reconstruct_traces_hand_computed(spark):
    """M13 grouped-map analog: run-length stitching on a hand-built frame."""
    import pandas as pd

    from longqc_spark.operators.grouped import reconstruct_traces

    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2],
            "event_id": [10, 11, 12, 13, 20],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:01:00",
                 "2024-01-01 00:02:00", "2024-01-01 00:03:00",
                 "2024-01-01 00:00:00"]
            ),
            "event_type": ["a", "a", "b", "a", "c"],
            "value": [1.501, 2.0, 0.999, 0.0, 10.0],
        }
    )
    got = (
        reconstruct_traces(spark.createDataFrame(pdf))
        .orderBy("user_id")
        .toPandas()
        .set_index("user_id")
    )
    assert got.loc[1, "trace"] == "a:2|b:1|a:1"
    assert got.loc[1, "n_runs"] == 3 and got.loc[1, "n_events"] == 4
    assert got.loc[1, "total_cents"] == 150 + 200 + 99 + 0
    assert got.loc[2, "trace"] == "c:1" and got.loc[2, "total_cents"] == 1000


def test_connected_components_hand_graph(spark):
    """Two components + a path graph (diameter > 1 forces propagation)."""
    import pandas as pd

    from longqc_spark.operators.dedup import connected_components

    pairs = pd.DataFrame(
        {"key_a": [1, 2, 5, 10, 11, 12, 13], "key_b": [2, 3, 6, 11, 12, 13, 14]}
    )
    got = (
        connected_components(spark.createDataFrame(pairs))
        .toPandas()
        .set_index("node")["component"]
        .to_dict()
    )
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 10: 10, 11: 10, 12: 10, 13: 10, 14: 10}


def test_hll_sketch_rollup(spark, sf001):
    """Per-group HLL sketches must union to the global estimate within HLL
    error bounds (the mergeable-rollup contract; lgK=12 → ~1.6% rse)."""
    from longqc_spark.operators.relational import distinct_sketch_rollup

    ev = spark.read.parquet(f"{sf001}/events.parquet")
    per_group, total = distinct_sketch_rollup(ev, "event_id", "event_type")
    est = total.collect()[0]["n_distinct_est"]
    exact = ev.select("event_id").distinct().count()
    assert abs(est - exact) / exact < 0.05
    pg = per_group.toPandas()
    exact_pg = (
        ev.groupBy("event_type").agg(F.count_distinct("event_id").alias("n")).toPandas()
        .set_index("event_type")["n"]
    )
    for _, r in pg.iterrows():
        assert abs(r.n_distinct_est - exact_pg[r.event_type]) / exact_pg[r.event_type] < 0.05
    # sum of per-group estimates >= union estimate (disjoint here, ~equal)
    assert pg.n_distinct_est.sum() >= est * 0.95


def test_embed_neardup_cache_bounded(spark):
    """ADVICE r3: the bucket cache is one-slot — each embed_neardup call
    releases the previous call's cached bucket table, so repeated calls in a
    long-lived session never accumulate cached partitions."""
    from longqc_spark.operators import simsearch
    from longqc_spark.operators.simsearch import embed_neardup, release_bucket_cache

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(30)]
    emb = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))

    embed_neardup(emb, threshold=0.9, n_bits=2).count()
    first = simsearch._BUCKET_CACHE.peek()
    assert first.storageLevel.useMemory  # materialized
    # different n_bits → different logical plan (an identical plan would be
    # re-registered by Spark's CacheManager and mask the unpersist)
    embed_neardup(emb, threshold=0.9, n_bits=3).count()
    assert len(simsearch._BUCKET_CACHE) == 1  # one-slot: old entry released
    assert simsearch._BUCKET_CACHE.peek() is not first
    assert not first.storageLevel.useMemory  # previous cache unpersisted
    release_bucket_cache()
    assert len(simsearch._BUCKET_CACHE) == 0


def test_contamination_hashed_matches_string_path(spark, sf001):
    """The 64-bit hashed shingle path (production default) must produce
    IDENTICAL per-doc contamination counts to the human-readable string
    path — a silent divergence would mean hash construction broke, not a
    collision (p < 1e-14 per doc)."""
    from longqc_spark.operators.dedup import contamination_check

    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    eval_df = docs.filter(F.col("doc_id") % 37 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    a = contamination_check(docs, eval_df, hashed=True).toPandas()
    b = contamination_check(docs, eval_df, hashed=False).toPandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
    assert len(a) > 0


def test_contamination_shingle_hash_values_match_fold_form(spark, sf001):
    """The r6 unrolled shingle hash (per-leg rotate + zip_with XOR) must be
    BIT-IDENTICAL to the original rolling fold [acc <- rot13(acc) ^ h_i]
    it replaced — same multiset of (key, sh) rows, not just same counts.
    Guards the rotation-distributes-over-XOR identity the rewrite rests on."""
    from longqc_spark.operators.dedup import contamination_hits

    docs = (
        spark.read.parquet(f"{sf001}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .limit(300)
        .select("doc_id", "text")
    )
    shingle = 5
    # reference: the pre-r6 fold expression, reconstructed verbatim
    ts = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit(""))
    th = F.transform(ts, lambda t: F.xxhash64(t))

    def comb(i):
        acc = F.lit(0).cast("long")
        for j in range(shingle):
            rot = F.shiftleft(acc, 13).bitwiseOR(F.shiftrightunsigned(acc, 51))
            acc = rot.bitwiseXOR(F.element_at(F.col("th"), i + F.lit(j) + 1))
        return acc

    ref = (
        docs.select(F.col("doc_id"), th.alias("th"))
        .filter(F.size("th") >= shingle)
        .select(
            "doc_id",
            F.explode(
                F.transform(F.sequence(F.lit(0), F.size("th") - shingle), comb)
            ).alias("sh"),
        )
        .toPandas()
    )
    # production path: contamination_hits with the doc side as its own eval
    # side would dedupe; instead compare through the shingles of the hashed
    # path by self-joining docs against themselves (every shingle matches)
    got = (
        contamination_hits(
            docs,
            docs.select(F.col("doc_id").alias("eval_id"), "text"),
            key_col="doc_id",
            text_col="text",
            hashed=True,
        )
        .select("doc_id", "sh")
        .distinct()
        .toPandas()
    )
    ref_set = set(map(tuple, ref[["doc_id", "sh"]].drop_duplicates().values))
    got_set = set(map(tuple, got.values))
    assert len(ref) > 1000  # the fixture genuinely exercises the path
    assert got_set == ref_set


def _neardup_fixture(spark):
    """Committed run = 40 template docs; batch = 20 near-copies (one word
    edited), 20 fresh docs, 1 NULL and 1 too-short-for-shingles row."""
    rng = np.random.default_rng(29)
    vocab = [f"w{i}" for i in range(500)]

    def doc(seed_row):
        return " ".join(rng.choice(vocab, 30))

    committed_rows = [(i, doc(i)) for i in range(40)]
    near = [
        (100 + i, committed_rows[i][1].replace(f"w", "v", 1)) for i in range(20)
    ]
    fresh = [(200 + i, doc(i)) for i in range(20)]
    edge = [(300, None), (301, "two words")]
    committed = spark.createDataFrame(committed_rows, "doc_id long, text string")
    batch = spark.createDataFrame(near + fresh + edge, "doc_id long, text string")
    return committed, batch


def test_incremental_neardup_matches_within_run_candidates(spark):
    """The cross-run exclusion must be candidate-IDENTICAL to the within-run
    pipeline: a batch doc is dropped iff lsh_candidate_pairs on the pooled
    corpus (same params) pairs it with some committed doc. NULL-text and
    no-shingle docs pass through on both sides."""
    from longqc_spark.operators.dedup import (
        incremental_neardup,
        lsh_candidate_pairs,
        minhash_band_table,
        minhash_signatures,
    )

    committed, batch = _neardup_fixture(spark)
    bands_tbl = minhash_band_table(committed, key_col="doc_id", text_col="text")
    admitted = sorted(
        r["doc_id"]
        for r in incremental_neardup(
            batch, bands_tbl, key_col="doc_id", text_col="text"
        ).collect()
    )

    pooled = committed.unionByName(batch).filter(F.col("text").isNotNull())
    pairs = lsh_candidate_pairs(
        minhash_signatures(pooled, key_col="doc_id", text_col="text"),
        key_col="doc_id",
    ).collect()
    dropped_expected = {
        (r["key_b"] if r["key_a"] < 100 else r["key_a"])
        for r in pairs
        if (r["key_a"] < 100) != (r["key_b"] < 100)  # exactly one side committed
    }
    batch_ids = {r["doc_id"] for r in batch.collect()}
    assert admitted == sorted(batch_ids - dropped_expected)
    # the planted near-copies were actually caught, fresh docs survived,
    # NULL/short rows passed through
    assert all(100 <= d < 120 for d in dropped_expected)
    assert len(dropped_expected) >= 18  # ≥90% recall on 1-word edits
    assert 300 in admitted and 301 in admitted


def test_incremental_neardup_empty_docs_not_near_each_other(spark):
    """Empty/too-short docs share the all-max signature; they must NOT be
    treated as near-duplicates of each other across runs."""
    from longqc_spark.operators.dedup import incremental_neardup, minhash_band_table

    committed = spark.createDataFrame([(1, ""), (2, "a b")], "doc_id long, text string")
    batch = spark.createDataFrame([(10, ""), (11, "x y")], "doc_id long, text string")
    bands_tbl = minhash_band_table(committed, key_col="doc_id", text_col="text")
    assert bands_tbl.count() == 0  # no shingles → no band rows at all
    out = incremental_neardup(batch, bands_tbl, key_col="doc_id", text_col="text")
    assert sorted(r["doc_id"] for r in out.collect()) == [10, 11]


def test_minhash_estimate_excludes_zero_shingle_docs(spark):
    """Docs shorter than the shingle width share the all-empty signature
    (est_jaccard 1.0 on every position) — they must NOT pair with each
    other, mirroring the band-index builders' guard."""
    from longqc_spark.operators.dedup import minhash_jaccard_estimate

    long_text = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "c d"), (3, ""), (4, long_text),
         (5, "recrawl " + long_text)],
        "doc_id long, text string",
    )
    pairs = minhash_jaccard_estimate(docs, threshold=0.5).collect()
    got = {(r.key_a, r.key_b) for r in pairs}
    assert got == {(4, 5)}  # the real near-dup pair; no tiny-doc pairs


def test_margin_align_matches_numpy_reference(spark, sf001):
    """Margin alignment == a direct numpy computation of the ratio margin
    (same k, same tie-breaks), on the real embeddings table."""
    import numpy as np

    from longqc_spark.operators.simsearch import margin_align

    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    src = emb.filter(F.col("vec_id") % 2 == 0)
    tgt = emb.filter(F.col("vec_id") % 2 == 1)
    got = {
        r["src_id"]: (r["tgt_id"], r["cosine"], r["margin"])
        for r in margin_align(src, tgt, k=4).collect()
    }
    rows = sorted(
        (r["vec_id"], np.array(r["embedding"], dtype=np.float64))
        for r in emb.collect()
    )
    sids = [i for i, _ in rows if i % 2 == 0]
    tids = [i for i, _ in rows if i % 2 == 1]
    S = np.stack([v for i, v in rows if i % 2 == 0])
    T = np.stack([v for i, v in rows if i % 2 == 1])
    C = (S / np.linalg.norm(S, axis=1, keepdims=True)) @ (
        T / np.linalg.norm(T, axis=1, keepdims=True)
    ).T
    a = np.sort(C, axis=1)[:, -4:].mean(axis=1)  # per-src top-4 mean
    b = np.sort(C, axis=0)[-4:, :].mean(axis=0)  # per-tgt top-4 mean
    M = C / ((a[:, None] + b[None, :]) / 2.0)
    assert set(got) == set(sids)
    for si, sid in enumerate(sids):
        ti = int(np.argmax(M[si]))  # ties broken by lowest tgt index = id order
        tgt_id, cosine, margin = got[sid]
        assert tgt_id == tids[ti]
        assert abs(cosine - C[si, ti]) < 1e-9
        assert abs(margin - M[si, ti]) < 1e-9


def test_margin_align_corrects_hubness(spark):
    """A hub target that is moderately close to EVERYTHING loses to a
    sharp 1:1 match once the margin normalizes by neighbourhood density —
    raw cosine would pick the hub, the margin must not."""
    import numpy as np

    from longqc_spark.operators.simsearch import margin_align

    rng = np.random.default_rng(3)
    dim = 16
    base = rng.standard_normal((6, dim))
    # tgt 0 = hub: the normalized mean direction of all sources (cosine
    # ~equal to everyone); tgt 1..6 = sharp matches for src 1..6 (source
    # + small noise), far from other sources
    hub = base.mean(axis=0)
    tgts = [hub] + [b + 0.18 * rng.standard_normal(dim) for b in base]
    rows_s = [(i * 2, [float(x) for x in base[i]]) for i in range(6)]
    rows_t = [(j * 2 + 1, [float(x) for x in tgts[j]]) for j in range(7)]
    src = spark.createDataFrame(rows_s, "vec_id long, embedding array<float>")
    tgt = spark.createDataFrame(rows_t, "vec_id long, embedding array<float>")
    out = {r["src_id"]: r["tgt_id"] for r in margin_align(src, tgt, k=3).collect()}
    # every source aligns to ITS sharp target (tgt id = 2*i+3), never the hub
    assert out == {i * 2: (i + 1) * 2 + 1 for i in range(6)}


def test_containment_planted_excerpt(spark):
    from longqc_spark.operators.dedup import containment_pairs

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma"),          # subset of 1 -> containment 1.0
        (3, "omega psi chi"),             # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["contained"], r["container"]): r["containment"]
        for r in containment_pairs(df, min_containment=0.0).collect()
    }
    assert got[(2, 1)] == pytest.approx(1.0)
    assert got[(1, 2)] == pytest.approx(3 / 6)  # reverse direction differs
    assert (3, 1) not in got and (1, 3) not in got  # no intersection, no row


def test_containment_threshold_and_direction(spark):
    from longqc_spark.operators.dedup import containment_pairs

    rows = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e k"),  # 5/6 contained in 1 = 0.833
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = containment_pairs(df, min_containment=0.8).collect()
    assert [(r["contained"], r["container"]) for r in out] == [(2, 1)]
    assert out[0]["containment"] == pytest.approx(5 / 6)


def test_containment_max_occ_universe_consistency(spark):
    from longqc_spark.operators.dedup import containment_pairs

    # "stop" appears in all 3 docs; with max_occ=2 it leaves the universe
    # on BOTH the intersection and the size side, so doc 2 (subset of 1
    # apart from "stop") still reads containment 1.0 over survivors
    rows = [
        (1, "stop alpha beta gamma"),
        (2, "stop alpha beta"),
        (3, "stop other words entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["contained"], r["container"]): r["containment"]
        for r in containment_pairs(df, min_containment=0.0, max_occ=2).collect()
    }
    assert got[(2, 1)] == pytest.approx(1.0)
