"""Similarity search over an embedding column (``array<float>``).

Brute-force cosine top-k is the exact baseline (all JVM-side: ``zip_with`` +
``aggregate`` higher-order functions, no Python in the loop); the scale path
buckets vectors with random-hyperplane LSH so the candidate join touches
~1/2^bits of the corpus — the same build-side-bounding idea as the
reference's `-I` index batching (``minimap2-coverage.c:446-458``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


# One-slot registry for embed_neardup's bucket cache: the cached bucket
# DataFrame must outlive the returned (lazy) plan, so it cannot be
# unpersisted inside the call — instead each embed_neardup call releases the
# PREVIOUS call's cache, bounding storage accumulation in a long-lived
# session to one bucket table (policy shared via longqc_spark.cache).
from ..cache import OneSlotCache

_BUCKET_CACHE = OneSlotCache(lambda df: df.unpersist(False))


def release_bucket_cache() -> None:
    """Unpersist any bucket DataFrame cached by a prior embed_neardup call."""
    _BUCKET_CACHE.release()


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force: broadcast the (small) query set against the corpus,
    per-query top-k by cosine. → (query_id, vec_id, cosine) with deterministic
    tie-break (cosine desc, vec_id asc)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = emb.select(F.col(id_col), F.col(vec_col).alias("cvec"))
    cos = (_dot(F.col("qvec"), F.col("cvec")) / (_norm(F.col("qvec")) * _norm(F.col("cvec")))).alias("cosine")
    scored = c.join(F.broadcast(q)).filter(F.col("query_id") != F.col(id_col)).select(
        "query_id", id_col, cos
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
        .orderBy("query_id", F.desc("cosine"), id_col)
    )


def hyperplane_buckets(
    emb: DataFrame,
    n_bits: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    passthrough_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector: bit i = sign(v·h_i).
    Hyperplanes are a deterministic seeded matrix, embedded as literal columns
    (broadcast-equivalent; no Python at eval time).
    → (id[, passthrough...], bucket int).

    ``dim=None`` (the default) infers the dimension from the data — one
    eager 1-row peek at build time, skipping NULL vectors. The plane length
    MUST match the vector length: ``zip_with`` pads the shorter side with
    NULL, which silently nulls every bucket and makes downstream bucket
    equi-joins return ZERO pairs — recall 0 with no error; inference makes
    that impossible for every caller (pass an explicit ``dim`` to keep the
    builder fully lazy)."""
    if dim is None:
        row = emb.filter(F.col(vec_col).isNotNull()).select(F.size(vec_col)).first()
        dim = int(row[0]) if row is not None and row[0] is not None else 0
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))
    bit_cols = []
    for i in range(n_bits):
        h = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit_cols.append((_dot(F.col(vec_col), h) > 0).cast("int") * F.lit(2**i))
    bucket = sum(bit_cols[1:], bit_cols[0]).alias("bucket")
    return emb.select(
        F.col(id_col), *[F.col(c) for c in passthrough_cols], F.col(vec_col), bucket
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    sample_n: int = 2000,
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer (fit on a bounded
    deterministic sample), corpus bucketed by nearest centroid, each query
    probes its ``n_probe`` closest cells, exact cosine rank within them.

    Candidate cost ≈ corpus × n_probe / n_cells. The centroid table is tiny
    and broadcast; assignment is a JVM-side argmin over literal centroids —
    no Python, no MLlib vector conversions in the hot path.
    """
    import numpy as np

    sample = [
        r[0]
        for r in emb.select(vec_col)
        .orderBy(F.xxhash64(id_col, F.lit(seed)))
        .limit(sample_n)
        .collect()
    ]
    x = np.array(sample, dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    # deterministic Lloyd's k-means on the driver sample (seeded init)
    rng = np.random.default_rng(seed)
    centroids = x[rng.choice(len(x), n_cells, replace=False)]
    for _ in range(20):
        d = x @ centroids.T
        assign = np.argmax(d, axis=1)
        for c in range(n_cells):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                centroids[c] = v / max(np.linalg.norm(v), 1e-12)

    def cell_scores(vec):
        # cosine against each literal centroid (vectors need not be normalized
        # for ARGMAX since centroids are unit-norm → scale cancels per row)
        return [
            _dot(vec, F.array(*[F.lit(float(v)) for v in centroids[c]]))
            / _norm(vec)
            for c in range(n_cells)
        ]

    def top_cells(vec, n):
        scores = F.array(*cell_scores(vec))
        idx = F.sequence(F.lit(0), F.lit(n_cells - 1))
        pairs = F.arrays_zip(scores.alias("s"), idx.alias("i"))
        return F.slice(F.reverse(F.array_sort(pairs)), 1, n)

    corpus = emb.select(
        F.col(id_col),
        F.col(vec_col),
        top_cells(F.col(vec_col), 1)[0]["i"].alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(F.transform(top_cells(F.col(vec_col), n_probe), lambda p: p["i"])).alias("cell"),
    )
    cos = (_dot(F.col("qvec"), F.col(vec_col)) / (_norm(F.col("qvec")) * _norm(F.col(vec_col)))).alias("cosine")
    scored = corpus.join(F.broadcast(q), "cell").filter(
        F.col("query_id") != F.col(id_col)
    ).select("query_id", id_col, cos)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
        .orderBy("query_id", F.desc("cosine"), id_col)
    )


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then exact cosine rank within bucket. Recall grows with multi-probe /
    fewer bits; this is the 1/2^bits-cost operating point. ``dim`` defaults
    to inference from the corpus (a hardcoded mismatch would NULL every
    bucket — zero results, no error)."""
    if dim is None:
        row = emb.filter(F.col(vec_col).isNotNull()).select(F.size(vec_col)).first()
        dim = int(row[0]) if row is not None and row[0] is not None else 0
    b_corpus = hyperplane_buckets(emb, n_bits, dim, id_col, vec_col)
    b_query = hyperplane_buckets(queries, n_bits, dim, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), F.col("bucket")
    )
    cos = (_dot(F.col("qvec"), F.col(vec_col)) / (_norm(F.col("qvec")) * _norm(F.col(vec_col)))).alias("cosine")
    scored = b_corpus.join(F.broadcast(b_query), "bucket").filter(
        F.col("query_id") != F.col(id_col)
    ).select("query_id", id_col, cos)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
        .orderBy("query_id", F.desc("cosine"), id_col)
    )


def embed_neardup(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 0,
    max_bucket: int | None = None,
    scope_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b) with a < b and
    cosine(a, b) > threshold — the semantic-dedup sibling of MinHash-LSH
    (same all-vs-all similarity shape as the reference's J2 overlap join,
    ``lqmap.c:140-205``, with cosine in place of shared-minimizer count).

    ``n_bits=0`` is the exact path: a theta self-join (`key_a < key_b`) with
    the cosine as a JVM-side higher-order expression — quadratic, for
    report-scale corpora and as the oracle for the bucketed path.
    ``n_bits>0`` prefilters pairs through random-hyperplane LSH buckets
    (equi-join on the bucket id → shuffle hash join, AQE-skewable): at corpus
    scale only near-parallel vectors share all sign bits, cutting candidates
    ~2^bits× at some recall cost (raise recall by unioning rotations).

    ``max_bucket`` (bucketed path only): the same embedding-flood guard as
    the MinHash/SimHash joins — a corpus where one embedding repeats
    verbatim (boilerplate pages embed identically) floods one hyperplane
    bucket, and the self-join is quadratic AND un-splittable by AQE (both
    sides share the skewed partition). Over-cap buckets star-expand onto
    the min-id member; exact-duplicate vectors are cosine-1.0 from the head
    so duplicate CLUSTERS survive intact, at the cost of direct pairwise
    cosines between non-head members of an over-cap bucket.

    ``scope_col`` restricts pairs to the same scope (the per-dump semantic
    dedup horizon, same contract as the MinHash/SimHash joins): on the
    exact path it is an extra equality term in the theta join; on the
    bucketed path it folds INTO the bucket id, so an embedding flood splits
    across scopes before the guard sees it.
    """
    if scope_col is not None and scope_col not in emb.columns:
        raise ValueError(
            f"embed_neardup: scope column {scope_col!r} not in the input "
            f"(columns: {emb.columns}) — pass the crawl dump / snapshot / "
            "source column that bounds the dedup horizon"
        )
    a_cols = [F.col(id_col).alias("key_a"), F.col(vec_col).alias("va")]
    b_cols = [F.col(id_col).alias("key_b"), F.col(vec_col).alias("vb")]
    if scope_col:
        a_cols.append(F.col(scope_col).alias("_scope_a"))
        b_cols.append(F.col(scope_col).alias("_scope_b"))
    a = emb.select(*a_cols)
    b = emb.select(*b_cols)
    if n_bits > 0:
        # cache: the bucket expression (n_bits dot products per row) feeds
        # the a-side, the b-side, and (guarded) the bucket-size stats —
        # without the cache it is recomputed in every join branch. The
        # previous call's cache is released here (one-slot registry) so
        # repeated calls in a long session don't accumulate storage.
        hb = hyperplane_buckets(
            emb,
            n_bits=n_bits,
            dim=None,
            id_col=id_col,
            vec_col=vec_col,
            passthrough_cols=(scope_col,) if scope_col else (),
        )
        # NULL scope must propagate to a NULL bucket (concat_ws SKIPS nulls,
        # which would silently pool all NULL-scope rows into scope-less
        # buckets): a NULL bucket never equi-joins, matching the exact
        # path's NULL-equality semantics and the MinHash/SimHash scoped
        # joins (NULL-scope rows pair with nothing)
        bucket_expr = (
            F.when(
                F.col(scope_col).isNotNull(),
                F.concat_ws(
                    "#", F.col(scope_col).cast("string"), F.col("bucket").cast("string")
                ),
            )
            if scope_col
            else F.col("bucket")
        )
        ba = _BUCKET_CACHE.put(
            hb.select(F.col(id_col).alias("key_a"), bucket_expr.alias("bucket_a"))
            .cache()
        )
        bb = ba.select(F.col("key_a").alias("key_b"), F.col("bucket_a").alias("bucket_b"))
        a = a.join(ba, "key_a")
        b = b.join(bb, "key_b")
        if max_bucket is not None:
            stats = ba.groupBy("bucket_a").agg(
                F.count(F.lit(1)).alias("_bsize"), F.min("key_a").alias("_bhead")
            )
            a_tag = a.join(stats, "bucket_a")
            small = a_tag.filter(F.col("_bsize") <= max_bucket).drop("_bsize", "_bhead").join(
                b,
                (F.col("bucket_a") == F.col("bucket_b")) & (F.col("key_a") < F.col("key_b")),
            ).select("key_a", "va", "key_b", "vb")
            heads = (
                a_tag.filter(F.col("_bsize") > max_bucket)
                .filter(F.col("key_a") == F.col("_bhead"))
                .select("bucket_a", "key_a", "va")
            )
            big = heads.join(
                b,
                (F.col("bucket_a") == F.col("bucket_b")) & (F.col("key_a") < F.col("key_b")),
            ).select("key_a", "va", "key_b", "vb")
            pairs = small.unionByName(big)
        else:
            pairs = a.join(
                b, (F.col("bucket_a") == F.col("bucket_b")) & (F.col("key_a") < F.col("key_b"))
            )
    else:
        cond = F.col("key_a") < F.col("key_b")
        if scope_col:
            cond = (F.col("_scope_a") == F.col("_scope_b")) & cond
        pairs = a.join(b, cond)
    cosine = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        pairs.select("key_a", "key_b", cosine.alias("cosine"))
        .filter(F.col("cosine") > threshold)
        .orderBy("key_a", "key_b")
    )


def margin_align(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    threshold: float = 0.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Margin-based embedding alignment (the CCMatrix/LASER bitext-mining
    criterion, Artetxe & Schwenk 2019 "ratio" margin): for every src
    vector x, its best tgt match y by

        margin(x, y) = cos(x, y) / ((avgk_src(x) + avgk_tgt(y)) / 2)

    where avgk_src(x) = mean cosine of x's k nearest tgt neighbours and
    avgk_tgt(y) the mirror — raw cosine is a poor mining score because
    hub vectors are near everything; dividing by the local neighbourhood
    density cancels hubness. → (src_id, tgt_id, cosine, margin), one row
    per src vector with margin > ``threshold``, tie-break (margin desc,
    tgt_id asc).

    Exact path (this function): the scored pair table is |src|·|tgt| with
    the cosine as a JVM higher-order expression; two window passes rank it
    from each side (one exchange per side) and the top-k means come from
    the already-partitioned slices — the same quadratic-but-oracle-able
    posture as ``cosine_topk``/``embed_neardup(n_bits=0)``. At corpus
    scale, bound the candidate set first with ``hyperplane_buckets``
    (union a few seeds for recall) exactly as ``embed_neardup(n_bits>0)``
    does — the margin arithmetic is unchanged, only the pair generation
    narrows.

    Reference analog: the reference scores overlap candidates by a
    NORMALIZED shared-minimizer fraction rather than the raw count
    (``lqmap.c:140-205``) — the same local-density correction this margin
    applies to cosine.
    """
    from pyspark.sql import Window

    # float64 kernels (unlike _dot/_norm, which multiply in float32 before
    # accumulating): casting each element to double BEFORE the multiply
    # makes the sequential fold bit-identical to DuckDB's
    # list_cosine_similarity over DOUBLE[] — the margin is a RATIO of
    # neighbourhood averages, so float32 products drift it past the 3dp
    # output rounding (observed: one flipped boundary row per ~1000 at
    # sf0.1), while the double path agrees bit-exactly
    def dot64(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def norm64(a):
        return F.sqrt(
            F.aggregate(
                F.transform(a, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )

    s = src.select(F.col(id_col).alias("src_id"), F.col(vec_col).alias("_sv"))
    t = tgt.select(F.col(id_col).alias("tgt_id"), F.col(vec_col).alias("_tv"))
    cos = dot64(F.col("_sv"), F.col("_tv")) / (
        norm64(F.col("_sv")) * norm64(F.col("_tv"))
    )
    scored = s.join(F.broadcast(t)).select("src_id", "tgt_id", cos.alias("cosine"))
    ws = Window.partitionBy("src_id").orderBy(F.desc("cosine"), "tgt_id")
    wt = Window.partitionBy("tgt_id").orderBy(F.desc("cosine"), "src_id")
    ranked = scored.withColumn("_rs", F.row_number().over(ws)).withColumn(
        "_rt", F.row_number().over(wt)
    )
    a = (
        ranked.filter(F.col("_rs") <= k)
        .groupBy("src_id")
        .agg(F.avg("cosine").alias("_a"))
    )
    b = (
        ranked.filter(F.col("_rt") <= k)
        .groupBy("tgt_id")
        .agg(F.avg("cosine").alias("_b"))
    )
    wbest = Window.partitionBy("src_id").orderBy(F.desc("margin"), "tgt_id")
    return (
        scored.join(a, "src_id")
        .join(b, "tgt_id")
        .withColumn("margin", F.col("cosine") / ((F.col("_a") + F.col("_b")) / 2.0))
        .withColumn("_rb", F.row_number().over(wbest))
        .filter((F.col("_rb") == 1) & (F.col("margin") > threshold))
        .select("src_id", "tgt_id", "cosine", "margin")
        .orderBy("src_id")
    )
