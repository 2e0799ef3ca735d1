"""Deduplication operators for web-scale corpora.

The reference's all-vs-sample minimizer hash join (J2, ``lqmap.c:140-205``:
hash shared k-mers between records to estimate similarity/coverage) is exactly
the near-duplicate problem; these are its web-text instantiations at the four
standard operating points:

* exact           — hash-groupBy on full text (md5)
* n-gram Jaccard  — token-set equi-join (the literal J2 analog)
* MinHash + LSH   — shingle → minhash signature → banded bucket join
* SimHash         — 64-bit sign-aggregated fingerprint, hamming-band join

Scale notes: every join here is an equi-join on a hash/bucket column → plain
shuffle hash join, AQE-skewable; banding bounds candidate-pair fan-out the
same way max_occ bounds repetitive minimizers (``lqmap.c:166-173``).
All signature computation is flat-stream numpy inside ``mapInPandas``.
"""

from __future__ import annotations

import math
from itertools import chain

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F, types as T

from ..cache import OneSlotCache
from ..models import hash_tokens, ngram_keys

# One-slot registry for the Bloom-filter broadcast (same policy as the
# bucket/contaminated-key DataFrame caches): each bloom_might_contain call
# destroys the PREVIOUS call's broadcast, so a long-lived session running
# repeated re-crawl dedups holds at most one filter (up to ~1 GiB) in
# block-manager memory instead of one per call. The latest returned
# predicate stays usable; a predicate from an EARLIER call must be consumed
# before the next bloom_might_contain call (or re-derived from its bytes).
_BLOOM_BC_CACHE = OneSlotCache(lambda bc: bc.destroy())


def release_bloom_broadcast() -> None:
    """Destroy the broadcast held by the last bloom_might_contain call."""
    _BLOOM_BC_CACHE.release()

# deterministic odd multipliers/offsets for the minhash family (seeded PCG)
_MH_RNG = np.random.default_rng(20240101)


def _minhash_params(n_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    a = (_MH_RNG.integers(1, 2**63, size=n_hashes, dtype=np.int64).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
    b = _MH_RNG.integers(0, 2**63, size=n_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


_MH_A, _MH_B = _minhash_params(64)


def _shingle_stream(texts: pd.Series, shingle: int):
    """Flat (keys uint64, doc_ids, n_shingles_per_doc) word-shingle stream."""
    n_docs = len(texts)
    split = texts.fillna("").str.lower().str.split()
    n_tok = np.fromiter(map(len, split), dtype=np.int64, count=n_docs)
    flat = np.array(list(chain.from_iterable(split)), dtype=object)
    hashes = hash_tokens(flat)
    keys = ngram_keys(hashes, shingle)
    starts = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
    pos_in_doc = np.arange(flat.shape[0]) - np.repeat(starts, n_tok)
    valid = pos_in_doc >= (shingle - 1)
    n_sh = np.maximum(n_tok - shingle + 1, 0)
    return keys[valid], n_sh


def minhash_signatures(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    shingle: int = 3,
    passthrough_cols: tuple[str, ...] = (),
) -> DataFrame:
    """→ (key[, passthrough...], sig array<long>): minhash signature per
    document. ``passthrough_cols`` ride the Arrow batch unchanged (e.g. a
    dump/scope column for scoped LSH) — no post-hoc join needed.

    Vectorized: per hash function one multiply-add over the flat shingle
    stream + one segmented min (``np.minimum.reduceat``); docs' shingles are
    contiguous by construction.
    """
    a, b = _MH_A[:n_hashes], _MH_B[:n_hashes]
    out_schema = T.StructType(
        [
            df.schema[key_col],
            *[df.schema[c] for c in passthrough_cols],
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )

    def compute(batches):
        for pdf in batches:
            keys, n_sh = _shingle_stream(pdf[text_col], shingle)
            n_docs = len(pdf)
            seg = np.concatenate(([0], np.cumsum(n_sh)[:-1]))
            seg = np.clip(seg, 0, max(keys.shape[0] - 1, 0))
            sig = np.full((n_docs, n_hashes), np.iinfo(np.int64).max, dtype=np.int64)
            if keys.shape[0]:
                with np.errstate(over="ignore"):
                    for i in range(n_hashes):
                        g = keys * a[i] + b[i]
                        mins = np.minimum.reduceat(g, seg)
                        # shift to signed for Spark LongType (order-preserving)
                        row = (mins >> np.uint64(1)).astype(np.int64)
                        row = np.where(n_sh > 0, row, np.iinfo(np.int64).max)
                        sig[:, i] = row
            out = {key_col: pdf[key_col].to_numpy()}
            for c in passthrough_cols:
                out[c] = pdf[c].to_numpy()
            out["sig"] = list(sig)
            yield pd.DataFrame(out)

    return df.select(key_col, *passthrough_cols, text_col).mapInPandas(
        compute, schema=out_schema
    )


def _star_guarded_pairs(
    banded: DataFrame,
    bucket_cols: tuple[str, ...],
    key_col: str,
    max_bucket: int | None,
    payload_col: str | None = None,
) -> DataFrame:
    """The ONE star-expansion flood guard shared by the LSH and SimHash
    candidate joins (and mirrored by ``simsearch.embed_neardup``): buckets
    up to ``max_bucket`` get the exact all-pairs self-join; larger buckets
    pair every member with the bucket's min key only — O(k) fan-out,
    connectivity to the head preserved. ``payload_col`` (e.g. the simhash)
    is carried on both pair sides, with the head's payload via ``min_by``.
    → (key_a, key_b[, payload_a, payload_b])."""

    def all_pairs(df: DataFrame) -> DataFrame:
        l, r = df.alias("l"), df.alias("r")
        cond = F.col(f"l.{key_col}") < F.col(f"r.{key_col}")
        for c in bucket_cols:
            cond = (F.col(f"l.{c}") == F.col(f"r.{c}")) & cond
        cols = [
            F.col(f"l.{key_col}").alias("key_a"),
            F.col(f"r.{key_col}").alias("key_b"),
        ]
        if payload_col:
            cols += [
                F.col(f"l.{payload_col}").alias("payload_a"),
                F.col(f"r.{payload_col}").alias("payload_b"),
            ]
        return l.join(r, cond).select(*cols)

    if max_bucket is None:
        return all_pairs(banded).distinct()
    aggs = [F.count(F.lit(1)).alias("_bsize"), F.min(key_col).alias("_bhead")]
    drop = ["_bsize", "_bhead"]
    if payload_col:
        aggs.append(F.min_by(payload_col, key_col).alias("_bhead_payload"))
        drop.append("_bhead_payload")
    stats = banded.groupBy(*bucket_cols).agg(*aggs)
    tagged = banded.join(stats, list(bucket_cols))
    small = all_pairs(tagged.filter(F.col("_bsize") <= max_bucket).drop(*drop))
    big_cols = [F.col("_bhead").alias("key_a"), F.col(key_col).alias("key_b")]
    if payload_col:
        big_cols += [
            F.col("_bhead_payload").alias("payload_a"),
            F.col(payload_col).alias("payload_b"),
        ]
    big = tagged.filter(
        (F.col("_bsize") > max_bucket) & (F.col(key_col) != F.col("_bhead"))
    ).select(*big_cols)
    return small.unionByName(big).distinct()


def lsh_candidate_pairs(
    sigs: DataFrame,
    key_col: str = "doc_id",
    bands: int = 16,
    n_hashes: int = 64,
    max_bucket: int | None = None,
    scope_col: str | None = None,
) -> DataFrame:
    """Banded LSH: split each signature into ``bands`` rows of r = n/bands,
    hash each band, equi-join on (band, hash). → (key_a, key_b) distinct,
    key_a < key_b.

    ``max_bucket`` is the boilerplate guard (the LSH analog of the ngram
    join's ``max_occ`` frequency cut, reference ``lqmap.c:166-173``): a web
    corpus where one template dominates puts ~30% of all docs into ONE
    (band, bhash) bucket, and the all-pairs self-join goes quadratic —
    O((0.3N)²) candidate pairs at bucket granularity is the single worst
    100-TB failure mode of banded LSH. Buckets larger than ``max_bucket``
    switch from all-pairs to STAR expansion: every member pairs with the
    bucket's min key only — O(k) pairs, and connectivity is preserved, so
    downstream ``connected_components`` clustering produces the same
    duplicate clusters for template floods (est_jaccard between a flood
    member and the bucket head passes the same threshold the member-member
    pair would). Direct pairwise estimates between non-head members of an
    over-cap bucket are the one thing given up — use ``max_bucket=None``
    (the default, exact pair semantics) when those are required.

    ``scope_col`` (a column already on ``sigs``) restricts candidates to
    same-scope pairs by joining the scope INTO the bucket key — the
    per-dump near-dup horizon (FineWeb deduped each CommonCrawl dump
    independently). Scoping also divides bucket sizes: a corpus-wide
    template flood that breaches ``max_bucket`` globally splits into
    per-dump buckets that may not.
    """
    _check_scope_col(sigs, scope_col, "lsh_candidate_pairs")
    extra = (scope_col,) if scope_col else ()
    banded = _band_rows(sigs, key_col, bands=bands, n_hashes=n_hashes, extra_cols=extra)
    return _star_guarded_pairs(banded, extra + ("band", "bhash"), key_col, max_bucket)


# a minhash signature of a doc with ZERO shingles (NULL/too-short text) is
# all-_SIG_EMPTY by construction (kernels set it where n_sh == 0); real
# mins are right-shifted once so they can never reach it
_SIG_EMPTY = int(np.iinfo(np.int64).max)


def _band_rows(
    sigs: DataFrame,
    key_col: str,
    bands: int,
    n_hashes: int,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """→ (key[, extra...], band:int, bhash:long): the banded-LSH bucket
    rows. ONE definition shared by the within-run candidate join and the
    cross-run band index, so the band hashing can never drift between
    them. ``extra_cols`` (e.g. a scope column) are carried per row so the
    caller can put them in the bucket key."""
    r = n_hashes // bands
    return sigs.select(
        F.col(key_col),
        *[F.col(c) for c in extra_cols],
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.col("sig")[i * r + j] for j in range(r)])
                    for i in range(bands)
                ]
            )
        ).alias("band", "bhash"),
    )


def minhash_band_table(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle: int = 3,
    scope_col: str | None = None,
) -> DataFrame:
    """→ distinct ``(band:int, bhash:long)`` of every non-empty document —
    the committed-corpus side of cross-run NEAR-dup (what ``payload_md5``
    is to exact cross-run dedup, the band bucket set is to fuzzy). Docs
    with no shingles (NULL or shorter than the shingle width) contribute
    no rows: their all-``_SIG_EMPTY`` signatures would otherwise make every
    empty doc "near" every other empty doc.

    Size: ≤ ``bands`` rows per doc before the distinct; boilerplate-heavy
    corpora collapse hard (duplicate docs share all their buckets).
    Persist it bucketed on ``bhash`` (``lineage.write_band_index``) and
    later probes shuffle only the batch side.

    ``scope_col`` adds the dump/snapshot column to the table → distinct
    ``(scope, band, bhash)`` rows; probe it with
    ``incremental_neardup(scope_col=)`` for the per-dump cross-run
    horizon."""
    _check_scope_col(df, scope_col, "minhash_band_table")
    extra = (scope_col,) if scope_col else ()
    sigs = minhash_signatures(
        df.filter(F.col(text_col).isNotNull()),
        key_col=key_col,
        text_col=text_col,
        n_hashes=n_hashes,
        shingle=shingle,
        passthrough_cols=extra,
    ).filter(F.col("sig")[0] != _SIG_EMPTY)
    return _band_rows(
        sigs, key_col, bands=bands, n_hashes=n_hashes, extra_cols=extra
    ).select(*extra, "band", "bhash").distinct()


def incremental_neardup(
    batch: DataFrame,
    committed_bands: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle: int = 3,
    scope_col: str | None = None,
) -> DataFrame:
    """Cross-run NEAR-duplicate exclusion: drop batch docs that share ANY
    LSH band bucket with a previously committed corpus — the fuzzy twin of
    ``incremental_dedup`` (which needs byte-identical payloads). A re-crawl
    whose pages differ from run 1 only by timestamps/boilerplate noise
    passes exact digest dedup but is caught here. Reference analog: the
    all-vs-sample minimizer join (``lqmap.c:140-205``) with the "sample"
    being a prior run's sketch instead of a subsample.

    Semantics are CANDIDATE-level, by construction identical to the
    within-run pipeline: a batch doc is dropped iff ``lsh_candidate_pairs``
    (same n_hashes/bands/shingle — MUST match the values the index was
    built with) would emit it as a candidate against some committed doc.
    False-positive rate is the LSH candidate rate at r = n_hashes/bands
    rows per band; raise r (fewer bands) for precision, more bands for
    recall — exactly the within-run tuning. NULL-text and no-shingle docs
    pass through (no identity; the empty-signature bucket is excluded on
    BOTH sides).

    Scale: batch side is signatures (flat-stream numpy) + one equi-join on
    (band, bhash); the committed side is a pre-distinct band table — read
    from a ``bhash``-bucketed index, the corpus side arrives pre-
    partitioned and only the (small) batch shuffles. No corpus rescan, no
    all-pairs anything.

    ``scope_col`` (present on BOTH the batch and the committed band table —
    build the latter with ``minhash_band_table(scope_col=)``) probes on
    ``(scope, band, bhash)``: a committed bucket excludes a batch doc only
    in the same dump — the per-dump cross-run horizon."""
    _check_scope_col(batch, scope_col, "incremental_neardup (batch)")
    _check_scope_col(committed_bands, scope_col, "incremental_neardup (committed_bands)")
    extra = (scope_col,) if scope_col else ()
    eligible = batch.filter(F.col(text_col).isNotNull())
    nulls = batch.filter(F.col(text_col).isNull())
    sigs = minhash_signatures(
        eligible,
        key_col=key_col,
        text_col=text_col,
        n_hashes=n_hashes,
        shingle=shingle,
        passthrough_cols=extra,
    ).filter(F.col("sig")[0] != _SIG_EMPTY)
    join_keys = list(extra) + ["band", "bhash"]
    hit_keys = (
        _band_rows(sigs, key_col, bands=bands, n_hashes=n_hashes, extra_cols=extra)
        .join(committed_bands.select(*join_keys), join_keys, "left_semi")
        .select(key_col)
        .distinct()
    )
    return eligible.join(hit_keys, key_col, "left_anti").unionByName(nulls)


def minhash_jaccard_estimate(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = None,
    scope_col: str | None = None,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidates via banding, then
    signature-agreement Jaccard estimate, filtered at ``threshold``.
    → (key_a, key_b, est_jaccard). ``max_bucket``: boilerplate bucket guard;
    ``scope_col``: per-dump candidate horizon (same-scope pairs only) —
    see ``lsh_candidate_pairs`` for both."""
    # exclude zero-shingle (NULL/too-short) docs: their all-_SIG_EMPTY
    # signatures agree on every position (est_jaccard 1.0), so without the
    # filter EVERY tiny doc is "near" every other tiny doc and a keep-one
    # policy would collapse them all to a single survivor — the same guard
    # minhash_band_table / incremental_neardup apply on the cross-run path
    _check_scope_col(df, scope_col, "minhash_jaccard_estimate")
    sigs = (
        minhash_signatures(
            df,
            key_col,
            text_col,
            n_hashes,
            shingle,
            passthrough_cols=(scope_col,) if scope_col else (),
        )
        .filter(F.col("sig")[0] != _SIG_EMPTY)
        .cache()
    )
    pairs = lsh_candidate_pairs(sigs, key_col, bands, n_hashes, max_bucket, scope_col)
    a = sigs.select(F.col(key_col).alias("key_a"), F.col("sig").alias("sig_a"))
    b = sigs.select(F.col(key_col).alias("key_b"), F.col("sig").alias("sig_b"))
    est = (
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.lit(n_hashes)
    ).alias("est_jaccard")
    return (
        pairs.join(a, "key_a")
        .join(b, "key_b")
        .select("key_a", "key_b", est)
        .filter(F.col("est_jaccard") >= threshold)
    )


def _token_set_intersections(
    df: DataFrame,
    key_col: str,
    text_col: str,
    max_occ: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared candidate machinery for the exact set-overlap measures
    (:func:`ngram_jaccard_pairs`, :func:`containment_pairs`): distinct
    lowercased whitespace tokens per doc, the ``max_occ`` document-
    frequency heavy-hitter cut (the reference's repetitive-minimizer
    skip, ``lqmap.c:166-173`` — bounds the self-join fan-out to
    O(docs·max_occ)), then the token equi-join. Returns
    ``(inter(key_a, key_b, inter), sizes(k, sz))`` with key_a < key_b;
    sizes are measured AFTER the cut so every measure is exact over the
    same surviving universe."""
    toks = (
        df.select(
            F.col(key_col).alias("k"),
            F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    if max_occ is not None:
        rare = (
            toks.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("df_freq"))
            .filter(F.col("df_freq") <= max_occ)
            .select("tok")
        )
        toks = toks.join(rare, "tok", "left_semi")
    sizes = toks.groupBy("k").agg(F.count(F.lit(1)).alias("sz"))
    l, r = toks.alias("l"), toks.alias("r")
    inter = (
        l.join(r, (F.col("l.tok") == F.col("r.tok")) & (F.col("l.k") < F.col("r.k")))
        .groupBy(F.col("l.k").alias("key_a"), F.col("r.k").alias("key_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return inter, sizes


def ngram_jaccard_pairs(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float = 0.0,
    top_k: int | None = None,
    max_occ: int | None = None,
) -> DataFrame:
    """Exact word-set Jaccard via token equi-join (J2 minimizer-join analog):
    explode distinct tokens, self-join on token, count intersections, derive
    |A∪B| = |A|+|B|−|A∩B|. → (key_a, key_b, jaccard).

    ``max_occ`` is the heavy-hitter guard (the reference's repetitive-
    minimizer skip, ``lqmap.c:166-173``): tokens appearing in more than
    ``max_occ`` documents are dropped BEFORE the self-join, bounding the
    candidate fan-out to O(docs · max_occ) — a stopword in 10^9 docs would
    otherwise emit ~10^18 pairs. Jaccard stays EXACT over the surviving
    token sets (sizes are computed after the cut, so intersection and union
    use the same universe); a near-ubiquitous token carries no dedup signal,
    which is why the reference applies the identical cut. ``max_occ=None``
    keeps the unguarded exact semantics for bounded verification corpora."""
    inter, sizes = _token_set_intersections(df, key_col, text_col, max_occ)
    sa = sizes.select(F.col("k").alias("key_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("k").alias("key_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(sa, "key_a")
        .join(sb, "key_b")
        .select(
            "key_a",
            "key_b",
            (
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
    if top_k:
        out = out.orderBy(F.desc("jaccard"), "key_a", "key_b").limit(top_k)
    return out


def containment_pairs(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    min_containment: float = 0.5,
    max_occ: int | None = None,
) -> DataFrame:
    """DIRECTIONAL token-set containment C(A ⊆ B) = |A∩B| / |A| (Broder
    1997's second resemblance measure) — the one-sided dup signal Jaccard
    misses: an excerpt, quote, or syndicated fragment inside a larger page
    has near-1 containment but low Jaccard once the container grows, so a
    resemblance threshold never fires. → (contained, container,
    containment) with BOTH orientations of each intersecting pair
    evaluated and only those ≥ ``min_containment`` kept.

    Same candidate machinery and scale posture as
    :func:`ngram_jaccard_pairs` (token equi-join with the ``max_occ``
    document-frequency heavy-hitter cut bounding fan-out to
    O(docs·max_occ); containment stays exact over the surviving token
    universe, and a cut token carries no containment signal for the same
    reason it carries no resemblance signal). Reference analog: the
    one-sided read-in-read overlap class of the minimizer chain scorer
    (lqmap.c:140-205 distinguishes containment from dovetail overlap)."""
    inter, sizes = _token_set_intersections(df, key_col, text_col, max_occ)
    sa = sizes.select(F.col("k").alias("key_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("k").alias("key_b"), F.col("sz").alias("sz_b"))
    sided = inter.join(sa, "key_a").join(sb, "key_b")
    fwd = sided.select(
        F.col("key_a").alias("contained"),
        F.col("key_b").alias("container"),
        (F.col("inter") / F.col("sz_a")).alias("containment"),
    )
    rev = sided.select(
        F.col("key_b").alias("contained"),
        F.col("key_a").alias("container"),
        (F.col("inter") / F.col("sz_b")).alias("containment"),
    )
    return fwd.unionByName(rev).filter(F.col("containment") >= min_containment)


def simhash_signatures(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    passthrough_cols: tuple[str, ...] = (),
) -> DataFrame:
    """64-bit SimHash per doc: sign of per-bit sums of token hashes.
    → (key[, passthrough...], simhash long). Hamming-close docs are
    near-duplicates; pair generation joins on 16-bit chunks (any pair
    within hamming distance 3 shares at least one intact chunk).
    ``passthrough_cols`` ride the Arrow batch unchanged (e.g. a dump column
    for ``simhash_near_pairs(scope_col=)``)."""
    out_schema = T.StructType(
        [
            df.schema[key_col],
            *[df.schema[c] for c in passthrough_cols],
            T.StructField("simhash", T.LongType()),
        ]
    )

    def compute(batches):
        for pdf in batches:
            texts = pdf[text_col].fillna("").str.lower()
            n_docs = len(texts)
            split = texts.str.split()
            n_tok = np.fromiter(map(len, split), dtype=np.int64, count=n_docs)
            flat = np.array(list(chain.from_iterable(split)), dtype=object)
            hashes = hash_tokens(flat)
            doc_ids = np.repeat(np.arange(n_docs), n_tok)
            sims = np.zeros(n_docs, dtype=np.uint64)
            for bit in range(64):
                b = ((hashes >> np.uint64(bit)) & np.uint64(1)).astype(np.float64)
                pos = np.bincount(doc_ids, weights=b, minlength=n_docs)
                ones = (pos * 2 > n_tok) & (n_tok > 0)
                sims |= ones.astype(np.uint64) << np.uint64(bit)
            out = {key_col: pdf[key_col].to_numpy()}
            for c in passthrough_cols:
                out[c] = pdf[c].to_numpy()
            out["simhash"] = sims.astype(np.int64)
            yield pd.DataFrame(out)

    return df.select(key_col, *passthrough_cols, text_col).mapInPandas(
        compute, schema=out_schema
    )


def simhash_near_pairs(
    sims: DataFrame,
    key_col: str = "doc_id",
    max_hamming: int = 3,
    n_chunks: int = 4,
    max_bucket: int | None = None,
    scope_col: str | None = None,
) -> DataFrame:
    """Chunk-join candidate generation + exact hamming filter.
    → (key_a, key_b, hamming).

    Pigeonhole guarantee: any pair within hamming distance ``n_chunks - 1``
    shares at least one intact chunk, so recall is 1.0 for
    ``max_hamming ≤ n_chunks - 1`` (use n_chunks=8 for radius ≤7); beyond
    that the join is best-effort.

    ``max_bucket``: the same boilerplate guard as ``lsh_candidate_pairs`` —
    a template flood gives every flood doc the IDENTICAL simhash, so one
    (chunk_id, chunk) bucket holds the whole flood and the self-join goes
    quadratic (and, being a self-join, AQE cannot skew-split it). Over-cap
    buckets star-expand onto the bucket's min key; the hamming filter still
    applies to star pairs, so flood docs (hamming 0 from the head) stay one
    cluster. PRECISE contract under the guard: the pigeonhole recall
    guarantee holds through every under-cap bucket, and within an over-cap
    bucket connectivity is guaranteed only for members within
    ``max_hamming`` of the bucket HEAD — a pair of non-head members whose
    ONLY intact shared chunk lands in an over-cap bucket is given up (their
    star pairs to a distant head fail the hamming filter). That trade
    targets exactly the template-flood case the guard exists for; use
    ``max_bucket=None`` when full radius-recall is required.

    ``scope_col`` (a column already on ``sims``) restricts candidates to
    same-scope pairs by joining the scope into the chunk bucket key — the
    per-dump near-dup horizon, same contract as
    ``lsh_candidate_pairs(scope_col=)``; a flood bucket splits across
    scopes before the guard sees it."""
    _check_scope_col(sims, scope_col, "simhash_near_pairs")
    width = 64 // n_chunks
    chunk_mask = (1 << width) - 1
    extra = (scope_col,) if scope_col else ()
    chunks = sims.select(
        F.col(key_col),
        *[F.col(c) for c in extra],
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
                        F.lit(chunk_mask)
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("chunk_id", "chunk"),
    )
    cand = _star_guarded_pairs(
        chunks, extra + ("chunk_id", "chunk"), key_col, max_bucket, payload_col="simhash"
    )
    hamming = F.bit_count(
        F.col("payload_a").bitwiseXOR(F.col("payload_b"))
    ).alias("hamming")
    return cand.select("key_a", "key_b", hamming).filter(F.col("hamming") <= max_hamming)


def contamination_hits(
    docs: DataFrame,
    eval_df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    eval_key: str = "eval_id",
    shingle: int = 5,
    hashed: bool = False,
) -> DataFrame:
    """The matched-shingle table behind ``contamination_check`` —
    (key, sh, eval_key) one row per contaminated shingle occurrence, useful
    as an audit artifact (WHICH spans leaked from WHICH benchmark doc).

    Shuffle-free by construction (plan-audited in test_plans): the corpus
    shingle stream flows scan → explode → broadcast-probe with no hash
    exchange; only the benchmark side (small) is deduped/broadcast.

    ``hashed=True`` is the corpus-scale fast path: each token is
    ``xxhash64``-ed ONCE per doc, and every shingle key is a rotate-XOR
    combine of its ``shingle`` token hashes — 64-bit longs instead of
    rebuilt strings, entirely bitwise (no ANSI overflow surface). Measured
    1.75x faster on the explode leg at 400k docs (70M shingles), and the
    broadcast build + probe shrink to 8-byte keys. ``sh`` is then the hash,
    not the text — use the default string mode when the audit artifact
    must be human-readable. Counts agree between modes barring a 64-bit
    collision inside one doc's shingle set (p < 1e-14 per doc;
    equality is pytest-pinned on the test corpus)."""

    def shingles(df: DataFrame, key: str, dedupe: bool) -> DataFrame:
        ts = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))
        if hashed:
            # Rolling combine sh_i = fold_j [acc <- rot13(acc) ^ h_{i+j}],
            # computed in unrolled form: rotations distribute over XOR, so
            # sh_i = rot(h_i, 13*(S-1)) ^ rot(h_{i+1}, 13*(S-2)) ^ ... ^ h_{i+S-1}
            # — BIT-IDENTICAL values to the per-shingle fold, but each leg is
            # one O(n) array pass (slice + transform + zip_with) instead of a
            # per-shingle tree of S element_at lookups. Array lambda HOFs are
            # interpreted (no whole-stage codegen), so expression COUNT is the
            # cost driver: this shape measured 2.6x faster on the 100k-doc
            # bench corpus (guide §1.2 per-task work); equality with the fold
            # form is pytest-pinned (test_dedup_simsearch).
            th = F.transform(ts, lambda t: F.xxhash64(t))
            n_sh = F.size("th") - shingle + 1

            def rot(c, k: int):
                k %= 64
                if k == 0:
                    return c
                return F.shiftleft(c, k).bitwiseOR(F.shiftrightunsigned(c, 64 - k))

            def leg(j: int):
                return F.transform(
                    F.slice("th", j + 1, n_sh),
                    lambda t: rot(t, 13 * (shingle - 1 - j)),
                )

            acc = leg(0)
            for j in range(1, shingle):
                acc = F.zip_with(acc, leg(j), lambda x, y: x.bitwiseXOR(y))
            out = (
                df.select(F.col(key), th.alias("th"))
                .filter(F.size("th") >= shingle)
                .select(key, F.explode(acc).alias("sh"))
            )
        else:
            out = (
                df.select(F.col(key), ts.alias("ts"))
                .filter(F.size("ts") >= shingle)
                .select(
                    key,
                    F.explode(
                        F.transform(
                            F.sequence(F.lit(0), F.size("ts") - shingle),
                            lambda i: F.concat_ws(" ", F.slice("ts", i + 1, F.lit(shingle))),
                        )
                    ).alias("sh"),
                )
            )
        # dedupe only the SMALL (broadcast) side: a corpus-side distinct
        # would shuffle every corpus shingle, and downstream countDistinct
        # aggregates already dedupe repeats
        return out.distinct() if dedupe else out

    eval_sh = shingles(eval_df, eval_key, dedupe=True)
    doc_sh = shingles(docs, key_col, dedupe=False)
    return doc_sh.join(F.broadcast(eval_sh), "sh")


def contamination_check(
    docs: DataFrame,
    eval_df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    eval_key: str = "eval_id",
    shingle: int = 5,
    hashed: bool = True,
) -> DataFrame:
    """Train/eval DECONTAMINATION — the canonical pre-training hygiene pass:
    flag corpus documents sharing any ``shingle``-token word shingle with a
    benchmark/eval set, so evaluation data can be excluded from training.

    Spark-first shape: the eval set is small by construction (benchmarks are
    thousands of docs, the corpus is 10^12), so its distinct shingle set
    BROADCASTS and contamination detection is a map-side hash semi-join —
    zero shuffle of the corpus. Per-doc outputs: how many of the doc's
    distinct shingles are contaminated and how many eval docs it overlaps.
    → (key, n_contaminated_shingles, n_eval_docs_hit), hit docs only.

    Reference analog: the all-vs-sample minimizer overlap (J2,
    ``lqmap.c:140-205``) with the sample side broadcast; same J2 machinery
    as ``ngram_jaccard_pairs`` but asymmetric, which is what makes it scale.
    """
    # hashed=True (default): 64-bit shingle keys — the corpus-scale fast
    # path; the distinct-count output is identical to the string path
    # barring a 64-bit in-doc collision (pytest-pinned equality)
    hits = contamination_hits(docs, eval_df, key_col, text_col, eval_key, shingle, hashed)
    return (
        hits.groupBy(key_col)
        .agg(
            F.countDistinct("sh").alias("n_contaminated_shingles"),
            F.countDistinct(eval_key).alias("n_eval_docs_hit"),
        )
        .orderBy(key_col)
    )


def connected_components(
    pairs: DataFrame,
    key_a: str = "key_a",
    key_b: str = "key_b",
    max_iter: int = 25,
) -> DataFrame:
    """Duplicate CLUSTERS from near-dup pairs: connected components by
    iterative min-label propagation (each node repeatedly takes the minimum
    label in its closed neighborhood; converges in graph-diameter rounds).

    → (node, component) where component = min node id of the cluster —
    deterministic regardless of partitioning. The keep-one-per-cluster
    policy is then ``filter(node == component)`` (min-key witness, matching
    the batch exact-dedup winner rule).

    At 10^12 docs: pairs come from LSH banding, components are shallow
    (near-dup clusters are cliques-ish, diameter ~2-3), so 3-5 iterations of
    two shuffles each; ``localCheckpoint`` truncates the growing lineage the
    same way GraphX/GraphFrames' CC does per superstep. Reference analog:
    the exclude-list transitive growth of ``longQC.py:376-389`` is the
    1-hop special case.
    """
    edges = pairs.select(F.col(key_a).alias("src"), F.col(key_b).alias("dst"))
    # materialize the symmetric edge table ONCE: every superstep runs 2
    # actions (label join + convergence count) against it, and without the
    # checkpoint each action re-executes the whole upstream pair pipeline
    # (banded LSH join + Jaccard estimate over the corpus) — measured 198 s
    # vs 47 s for the full near-dup stage at 1M docs (BENCH_CORPUS
    # neardup_keep_best_1m_skew30). Edges ≪ corpus (bounded by the star
    # guard), so executor storage holds them comfortably.
    sym = (
        edges.union(edges.select(F.col("dst"), F.col("src")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("node")).distinct().withColumn("label", F.col("node"))
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)  # truncate lineage per superstep
        )
        n_changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if n_changed == 0:
            break
    else:
        # silently-wrong labels are worse than a loud failure: a chain longer
        # than max_iter hops would return unconverged components and dedup
        # would keep/drop the wrong witnesses
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            f"({n_changed} labels still changing) — raise max_iter"
        )
    return labels.select("node", F.col("label").alias("component"))


# Bloom sizing cap: 2^33 bits = 1 GiB of filter — beyond this the filter no
# longer broadcasts comfortably and the caller should shard by digest prefix.
_BLOOM_MAX_BITS = 1 << 33


def _bloom_hashes(col: Column | str) -> list[Column]:
    """The two JVM xxhash64 seeds feeding Kirsch–Mitzenmacher double
    hashing: position_i = (h1 + i·h2) mod m, computed in numpy on both the
    build and probe sides. Only TWO int64 columns ever cross the Arrow
    boundary per row — not k position arrays — which is what keeps the
    probe pass cheap enough to beat the shuffle it replaces."""
    c = F.col(col) if isinstance(col, str) else col
    return [F.xxhash64(c), F.xxhash64(c, F.lit(0xB10053))]


def _bloom_pos(h1: np.ndarray, h2: np.ndarray, i: int, m: int) -> np.ndarray:
    # uint64 view keeps the JVM's signed bits verbatim; |1 makes the stride
    # odd so it is coprime with any power-of-two-free m slice walk
    u1 = h1.astype(np.int64).view(np.uint64)
    u2 = h2.astype(np.int64).view(np.uint64) | np.uint64(1)
    return ((u1 + np.uint64(i) * u2) % np.uint64(m)).astype(np.int64)


def digest_bloom(
    df: DataFrame,
    digest_col: str = "payload_md5",
    fpp: float = 1e-3,
    n_items: int | None = None,
) -> tuple[bytes, int, int]:
    """Build a Bloom filter over a digest column → ``(bits, m, k)``.

    Spark's JVM ``BloomFilterAggregate`` is not in the public function
    registry, so this is the classic treeAggregate shape in DataFrame
    clothing: two JVM xxhash64 seeds per digest (``_bloom_hashes``) expand
    to k Kirsch–Mitzenmacher positions in numpy, each partition ORs its
    rows into one numpy bit array inside ``mapInPandas`` (one binary row
    per partition), and the driver ORs the per-partition blooms — driver
    traffic is ``n_partitions × m/8`` bytes, never row-count-bound. Sizing is the standard ``m = -n ln(fpp)/ln²2``,
    ``k = m/n ln2``, capped at 1 GiB (shard by digest prefix past that).

    Reference analog: the exclude-list membership structure the chunk loop
    consults before re-emitting a read (``longQC.py:376-389``), made
    probabilistic so membership travels as a broadcast payload instead of a
    shuffled table.
    """
    src = df.select(F.col(digest_col).alias("_d")).filter(F.col("_d").isNotNull())
    n = n_items if n_items is not None else src.count()
    n = max(int(n), 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = min(max(m, 64), _BLOOM_MAX_BITS)
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    nbytes = m // 8

    def build(batches):
        bits = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if len(pdf):
                seen = True
                h1, h2 = pdf["h1"].to_numpy(), pdf["h2"].to_numpy()
                for i in range(k):
                    flat = _bloom_pos(h1, h2, i, m)
                    np.bitwise_or.at(
                        bits, flat >> 3, (1 << (flat & 7)).astype(np.uint8)
                    )
        if seen:  # empty partitions yield nothing (Arrow empty-batch gotcha)
            yield pd.DataFrame({"bf": [bits.tobytes()]})

    h1c, h2c = _bloom_hashes("_d")
    parts = src.select(h1c.alias("h1"), h2c.alias("h2")).mapInPandas(
        build, "bf binary"
    ).collect()
    bits = np.zeros(nbytes, dtype=np.uint8)
    for r in parts:
        bits |= np.frombuffer(r["bf"], dtype=np.uint8)
    return bits.tobytes(), m, k


def bloom_might_contain(col: Column | str, bloom: bytes, m: int, k: int) -> Column:
    """Boolean column: digest MAY be in the filter (no false negatives).

    The filter ships once per executor as a SparkContext broadcast; the
    probe is one Arrow-vectorized pandas UDF doing pure numpy bit tests
    over the JVM-computed position arrays — a map-side predicate with no
    join, no shuffle, and no per-row Python.
    """
    spark = SparkSession.getActiveSession()
    bc = _BLOOM_BC_CACHE.put(spark.sparkContext.broadcast(bloom))
    n_hashes, n_bits = k, m

    @F.pandas_udf("boolean")
    def _maybe(h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        if not len(h1s):
            return pd.Series([], dtype=bool)
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        h1, h2 = h1s.to_numpy(), h2s.to_numpy()
        ok = np.ones(len(h1), dtype=bool)
        for i in range(n_hashes):  # short-circuits in aggregate: k is small
            flat = _bloom_pos(h1, h2, i, n_bits)
            ok &= ((bits[flat >> 3] >> (flat & 7).astype(np.uint8)) & 1).astype(bool)
        return pd.Series(ok)

    h1c, h2c = _bloom_hashes(col)
    return _maybe(h1c, h2c)


def incremental_dedup(
    new_docs: DataFrame,
    committed: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    html_col: str | None = None,
    digest_col: str = "payload_md5",
    within_batch: bool = True,
    bloom_fpp: float | None = None,
    scope_col: str | None = None,
) -> DataFrame:
    """Cross-RUN dedup: admit only the docs of a new batch (re-crawl) whose
    payload digest is absent from an already-committed label corpus — the
    cross-chunk exclude-list (reference ``longQC.py:376-389``: chunk N skips
    reads already emitted by chunks 1..N-1), lifted to run granularity.

    Two stages, both digest-keyed:
    1. WITHIN-batch exact dedup — keep the min-key doc per digest (the same
       deterministic winner rule as the lineage dedup window, so resumed /
       repeated runs agree). ``within_batch=False`` skips this stage and
       performs ONLY the cross-run exclusion — used by the lineage layer,
       where intra-batch dedup is ``dedup=True``'s separately-audited job;
    2. anti-join against the committed corpus's STORED ``payload_md5``
       column (written by ``qc_pipeline`` at label time) — run-1 INPUT is
       never re-read, only its label table's one digest column.

    100-TB shape: the committed side projects to a single 32-char column and
    pre-aggregates distinct per shuffle partition (partial agg) before the
    anti-join; both sides shuffle on the digest — a plain equi-anti-join AQE
    can skew-split. No broadcast assumption: BOTH sides may be petabyte-scale
    (the committed corpus certainly is at 10^12 docs).

    ``bloom_fpp`` (optional) removes that corpus-side shuffle entirely: a
    Bloom filter is built over the BATCH digests (the small side — one extra
    batch scan + a broadcast of the filter bytes) and applied as a map-side
    predicate on the committed corpus's digest scan, shrinking ``known`` to
    ≈ |batch ∩ corpus| + fpp·|corpus| rows BEFORE the anti-join — small
    enough that AQE turns the join broadcast. No false negatives → every
    digest that could match survives the prefilter, so the result is
    bit-identical to the exact path (the FPs only add never-matching rows to
    the anti-join build side). Budget fpp ≈ |batch| / (10·|corpus|): at a
    10^12-doc corpus and a 10^8-doc re-crawl, fpp=1e-5 costs a ~34-bit/item
    filter (~400 MB broadcast) and leaves ~10^7 stray corpus rows — three
    orders of magnitude below the shuffle it replaces. Opt-in because the
    crossover is NETWORK economics: measured single-node (BENCH_CORPUS
    `bloom_dedup_*`, 4M docs) the prefilter cuts shuffle rows 64× but still
    loses wall-clock (9.0 s vs 3.4 s) — local shuffles are memcpy-cheap,
    so the two extra bloom jobs only pay off once shuffle bytes cross
    racks.

    NULL payloads (html/text missing) carry no digest, so they are not
    duplicates of anything — they pass through BOTH stages untouched rather
    than being collapsed into one NULL-digest group by the window (which
    would silently drop distinct docs) or dropped by the anti-join semantics
    of ``NOT IN`` with a NULL probe. Oracle SQL mirrors this with an
    explicit ``payload IS NULL OR …`` disjunct.

    ``scope_col`` gives the cross-run exclusion the per-dump horizon: a
    batch doc is excluded only if the committed corpus holds its digest IN
    THE SAME scope (``committed`` must carry a same-named scope column —
    the labels store does when the input did), and the within-batch window
    partitions on (scope, digest) — the operational pattern of processing
    ONE dump in batches across resumed runs while cross-dump copies keep
    their FineWeb-style natural upsampling. The Bloom prefilter stays
    digest-only (a superset of any (scope, digest) match — no false
    negatives), the final anti-join carries the scope equality.

    Returns the surviving rows of ``new_docs`` (original columns).
    """
    _check_scope_col(new_docs, scope_col, "incremental_dedup (batch)")
    _check_scope_col(committed, scope_col, "incremental_dedup (committed)")
    payload = F.col(html_col or text_col)
    nulls = new_docs.filter(payload.isNull())
    # materialize the digest ONCE: the window partitions on it AND the
    # anti-join keys on it, so the window's exchange satisfies the join's
    # distribution requirement and is REUSED (one batch-side shuffle total;
    # deriving md5(...) twice makes Spark see two distinct expressions and
    # shuffle twice)
    fresh = new_docs.filter(payload.isNotNull()).withColumn(
        "_digest", F.md5(payload.cast("binary"))
    )
    if within_batch:
        wkeys = ([scope_col] if scope_col else []) + ["_digest"]
        w = Window.partitionBy(*wkeys).orderBy(key_col)
        fresh = (
            fresh.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    known_cols = [F.col(digest_col).alias("_known_md5")]
    if scope_col:
        known_cols.append(F.col(scope_col).alias("_known_scope"))
    known = committed.select(*known_cols)
    if bloom_fpp is not None:
        # prefilter BEFORE the distinct so the corpus-wide shuffle (the
        # distinct's exchange) also runs over the shrunken row set
        bloom, m, k = digest_bloom(
            fresh.select(F.col("_digest").alias("_d")), "_d", fpp=bloom_fpp
        )
        known = known.filter(bloom_might_contain("_known_md5", bloom, m, k))
    known = known.distinct()
    cond = F.col("_digest") == F.col("_known_md5")
    if scope_col:
        cond = cond & (F.col(scope_col) == F.col("_known_scope"))
    kept = fresh.join(known, on=cond, how="left_anti").drop("_digest")
    return kept.unionByName(nulls)


def _check_score_col(df: DataFrame, score_col: str | None, op: str) -> None:
    """Actionable up-front error for a missing score column (the deep
    mid-plan AnalysisException names internal columns, not the fix).
    Membership follows Spark's own resolution rules: case-insensitive
    unless ``spark.sql.caseSensitive`` is on."""
    if score_col is None:
        return
    case_sensitive = (
        df.sparkSession.conf.get("spark.sql.caseSensitive", "false").lower()
        == "true"
    )
    cols = df.columns if case_sensitive else [c.lower() for c in df.columns]
    probe = score_col if case_sensitive else score_col.lower()
    if probe not in cols:
        raise ValueError(
            f"{op}: score column {score_col!r} not in the input "
            f"(columns: {df.columns}) — derive a pre-QC prior first, e.g. "
            "withColumn(score, F.length(text)) or a crawl-rank column"
        )


def _check_scope_col(df: DataFrame, scope_col: str | None, op: str) -> None:
    """Actionable up-front error for a missing dedup-horizon column — the
    same contract as ``_check_score_col`` (a typo'd ``--dedup-scope`` must
    fail with the fix named, not a deep AnalysisException or a mid-job
    pandas KeyError). Same case-sensitivity rules."""
    if scope_col is None:
        return
    case_sensitive = (
        df.sparkSession.conf.get("spark.sql.caseSensitive", "false").lower()
        == "true"
    )
    cols = df.columns if case_sensitive else [c.lower() for c in df.columns]
    probe = scope_col if case_sensitive else scope_col.lower()
    if probe not in cols:
        raise ValueError(
            f"{op}: scope column {scope_col!r} not in the input "
            f"(columns: {df.columns}) — pass the crawl dump / snapshot / "
            "source column that bounds the dedup horizon"
        )


def keep_best_dedup(
    df: DataFrame,
    score_col: str | None,
    key_col: str = "url",
    text_col: str = "text",
    html_col: str | None = None,
    normalize: bool = False,
    scope_col: str | None = None,
) -> DataFrame:
    """Quality-aware exact dedup: keep the HIGHEST-``score_col`` doc per
    payload digest (tie → min ``key_col``), instead of the arbitrary-but-
    deterministic min-key winner the plain dedup window picks.

    This is the keep policy production corpora actually want: a page crawled
    from both a clean mirror and an ad-injected aggregator should survive as
    the clean copy, not whichever URL sorts first. The reference's analog is
    M13's per-key best-record reconstruction (``lq_sequel.py:76-137``: among
    subreads of one hole, the longest/highest-quality one represents the
    ZMW).

    Plan shape: identical to the min-key dedup — ONE hash exchange on the
    digest; ``row_number`` + ``_rn = 1`` filter lets Catalyst derive a
    WindowGroupLimit (per-partition top-1 precedes the shuffle, so only one
    candidate row per digest per input partition moves). ``normalize=True``
    digests whitespace/case/punct-normalized text, catching trivial-variant
    duplicates at the same cost.

    Returns the surviving rows (original columns). NULL payloads carry no
    digest and pass through untouched (not duplicates of anything); NULL
    scores lose every tie (sorted last) but a digest group that is ALL-NULL
    score still keeps its min-key row. ``score_col=None`` degrades to the
    plain min-key winner (same plan, no score sort key) so callers can
    expose one dedup stage with an optional quality policy.

    ``scope_col`` prepends a dump/snapshot column to the window key — the
    per-dump dedup horizon (see ``scoped_dedup`` for the rationale); same
    single exchange, now on (scope, digest), which also splits a
    template-digest flood across scopes.
    """
    from .text import normalize_text_expr

    _check_score_col(df, score_col, "keep_best_dedup")
    _check_scope_col(df, scope_col, "keep_best_dedup")
    if normalize and html_col is not None:
        raise ValueError(
            "normalize digests TEXT (lowercase/whitespace folding is "
            "meaningless on raw html bytes); run extraction first or drop "
            "the normalize flag"
        )
    payload = F.col(html_col or text_col)
    nulls = df.filter(payload.isNull())
    digest = (
        F.md5(normalize_text_expr(text_col).cast("binary"))
        if normalize
        else F.md5(payload.cast("binary"))
    )
    order = [F.col(score_col).desc_nulls_last(), key_col] if score_col else [key_col]
    wkeys = ([scope_col] if scope_col else []) + ["_digest"]
    w = Window.partitionBy(*wkeys).orderBy(*order)
    kept = (
        df.filter(payload.isNotNull())
        .withColumn("_digest", digest)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_digest")
    )
    return kept.unionByName(nulls)


def scoped_dedup(
    df: DataFrame,
    scope_col: str,
    score_col: str | None = None,
    key_col: str = "url",
    text_col: str = "text",
    html_col: str | None = None,
    normalize: bool = False,
) -> DataFrame:
    """Per-scope exact dedup: collapse duplicates only WITHIN each value of
    ``scope_col`` (crawl dump / snapshot / source) — a copy of the same page
    in two different dumps survives in both.

    This is the FineWeb finding lifted to an operator: global (cross-dump)
    dedup removes the natural upsampling of long-lived pages and measurably
    HURT downstream quality vs deduping each CommonCrawl dump independently;
    the scope column makes the dedup horizon an explicit knob instead of a
    pipeline accident. Reference analog: the per-chunk (not cross-chunk)
    duplicate handling of the chunked scan (``longQC.py:376-389`` processes
    each chunk's reads independently before the cross-chunk merge).

    A named front door for ``keep_best_dedup(scope_col=...)`` — ONE
    implementation (window on (scope, digest), WindowGroupLimit pre-shuffle
    cut, NULL passthrough, optional score policy and normalized digest);
    see it for the full contract."""
    return keep_best_dedup(
        df,
        score_col,
        key_col=key_col,
        text_col=text_col,
        html_col=html_col,
        normalize=normalize,
        scope_col=scope_col,
    )


def dup_cluster_sizes(
    df: DataFrame,
    text_col: str = "text",
    size_col: str = "n_chars",
) -> DataFrame:
    """Duplicate-inflation histogram: distribution of exact-duplicate
    cluster sizes plus the volume they inflate — the corpus-health number a
    dedup pass is judged by ("X% of tokens are copies"). Reference analog:
    A14's per-bin count histogram over a derived stat (``longQC.py:418-427``)
    with the stat being the duplicate-cluster size.

    Two partial-agg groupBys (digest → cluster size, size → histogram row);
    the first is the exact-dedup exchange, the second's cardinality is the
    number of DISTINCT cluster sizes (tiny). No sorts beyond the final
    presentation orderBy.

    → (cluster_size, n_clusters, n_docs, n_excess_docs, excess_chars) where
    excess = everything a keep-one dedup would drop.
    """
    clusters = (
        df.filter(F.col(text_col).isNotNull())
        .groupBy(F.md5(F.col(text_col).cast("binary")).alias("_digest"))
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.sum(size_col).alias("_chars"),
            F.max(size_col).alias("_chars_one"),
        )
    )
    return (
        clusters.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            (F.count(F.lit(1)) * F.col("cluster_size")).cast("bigint").alias("n_docs"),
            (F.count(F.lit(1)) * (F.col("cluster_size") - 1))
            .cast("bigint")
            .alias("n_excess_docs"),
            (F.sum("_chars") - F.sum("_chars_one")).cast("bigint").alias("excess_chars"),
        )
        .orderBy("cluster_size")
    )


def cluster_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    score_col: str | None,
    key_col: str = "doc_id",
    key_a: str = "key_a",
    key_b: str = "key_b",
) -> DataFrame:
    """Quality-aware NEAR-dup dedup: connected components over candidate
    ``pairs`` (LSH / SimHash / n-gram Jaccard — any pair source), then ONE
    survivor per cluster — the max-``score_col`` doc (tie → min key), or the
    min-key witness when ``score_col`` is None (matching the exact-dedup
    winner rule). Docs in no pair are singleton clusters and survive
    untouched.

    The near-dup twin of ``keep_best_dedup``: production near-dedup keeps
    the best-quality cluster representative, not an arbitrary witness
    (reference analog: ``lq_sequel.py:76-137`` — the best subread represents
    the ZMW's cluster).

    Scale: components over LSH pairs are shallow (see
    ``connected_components``); the label join is an equi-join on the key
    (cluster table ≤ |docs in any pair|, usually ≪ corpus — AQE turns it
    broadcast when small), and the winner window shuffles on the component
    label with the same WindowGroupLimit top-1 pre-cut as the exact path.

    Returns the surviving rows of ``df`` (original columns).
    """
    _check_score_col(df, score_col, "cluster_keep_best")
    cc = connected_components(pairs, key_a=key_a, key_b=key_b)
    labeled = df.join(
        cc.withColumnRenamed("node", key_col), key_col, "left"
    ).withColumn("_comp", F.coalesce(F.col("component"), F.col(key_col)))
    order = [F.col(score_col).desc_nulls_last(), key_col] if score_col else [key_col]
    w = Window.partitionBy("_comp").orderBy(*order)
    return (
        labeled.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_comp", "component")
    )


def scrub_dup_spans(
    df: DataFrame,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    hash_spans: bool = True,
) -> DataFrame:
    """Exact duplicated-span REMOVAL — the scrub twin of the ``dup_spans``
    detector (Lee-et-al-style substring dedup / C4 repeated-span rule):
    every ``window``-token sliding span is keyed across the corpus, the
    globally-first occurrence (min ``(key, pos)``) keeps its text, every
    later occurrence has its token range deleted from its document, and
    each document is rebuilt from the surviving tokens in order.

    Reference analog: the adapter scrub cascade (``lq_adapt.py``, M7/M8)
    removes KNOWN artifact patterns from each record; this removes EMERGENT
    corpus-level repeats, discovering the pattern set with the same grouped
    hash join the detector uses (``lqmap.c:140-205`` shared-k-mer flavor).

    All JVM-side Catalyst ops — split → posexplode → per-span
    first-occurrence window → ``sequence()`` range explode → anti-join →
    ordered reassembly; no Python touches a row. Scale posture: with
    ``hash_spans=True`` (the default, and the production path) the span is
    collapsed map-side to ``xxhash64(span)`` so 8 bytes cross the window
    exchange instead of the ~window·word text — output is identical unless
    two DISTINCT spans collide in 64 bits (birthday bound ≈ n²/2⁶⁵: ~3·10⁻⁹
    at 10¹⁰ corpus spans — acceptable for a scrub; the oracled registry
    query pins ``hash_spans=False`` so the DuckDB twin stays expressible,
    and a test pins hashed == unhashed output on the fixture corpus); a
    boilerplate span present in k docs
    costs one k-row window partition (linear row_number, no pair
    explosion), and each duplicate occurrence fans out to exactly
    ``window`` delete positions. Whitespace normalizes to single spaces in
    the rebuilt text (tokens are the unit of identity). The plan's three
    branches (spans / position-tokens / per-doc counts) each re-scan the
    source — columnar-pruned to (key, text) — because Spark does not
    materialize shared subplans; at 100 TB persist the tokenized
    projection (``toks.persist(DISK_ONLY)``) or stage it to parquet first
    so the raw text is read once.

    Returns ``(key_col, n_tokens, n_removed, text_scrubbed)``, one row per
    input doc with non-NULL text.
    """
    w = int(window)
    if w < 2:
        raise ValueError(f"scrub_dup_spans: window must be >= 2, got {window}")
    toks = df.filter(F.col(text_col).isNotNull()).select(
        key_col,
        F.expr(f"filter(split({text_col}, '\\\\s+'), t -> t <> '')").alias("_ts"),
    )
    pos_tok = toks.select(
        key_col, F.posexplode("_ts").alias("_p0", "_tok")
    ).select(key_col, (F.col("_p0") + 1).alias("_pos"), "_tok")
    spans = (
        toks.filter(F.size("_ts") >= w)
        .select(
            key_col,
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(_ts) - {w - 1}),"
                    f" i -> array_join(slice(_ts, i, {w}), ' '))"
                )
            ).alias("_p0", "_span"),
        )
        .select(key_col, (F.col("_p0") + 1).alias("_pos"), "_span")
    )
    if hash_spans:
        spans = spans.withColumn("_span", F.xxhash64("_span"))
    first_w = Window.partitionBy("_span").orderBy(key_col, "_pos")
    dups = spans.withColumn("_rn", F.row_number().over(first_w)).filter(F.col("_rn") > 1)
    deleted = dups.select(
        key_col,
        F.explode(F.sequence(F.col("_pos"), F.col("_pos") + F.lit(w - 1))).alias("_pos"),
    ).distinct()
    rebuilt = (
        pos_tok.join(deleted, [key_col, "_pos"], "left_anti")
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("_n_kept"),
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(_pos, _tok))),"
                " x -> x._tok), ' ')"
            ).alias("text_scrubbed"),
        )
    )
    base = toks.select(key_col, F.size("_ts").cast("long").alias("n_tokens"))
    return base.join(rebuilt, key_col, "left").select(
        key_col,
        "n_tokens",
        (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0))).alias("n_removed"),
        F.coalesce(F.col("text_scrubbed"), F.lit("")).alias("text_scrubbed"),
    )
