"""Feature hashing (HashingTF-style) + TF-IDF — the vocab-free featurizer.

At web scale a vocabulary-indexed featurizer needs a second corpus pass
plus a corpus-sized dictionary broadcast; the hashing trick replaces both
with a stateless token→bucket hash into a FIXED dimension, which is why
it is the standard first stage for linear classifiers / clustering over
text at 10^12-doc scale (Weinberger et al. 2009; Spark MLlib's
HashingTF). This module is the pure-DataFrame form, feeding
:mod:`.kmeans` (dense int vectors) and the quality classifiers.

Cross-engine contract: the bucket is the first 8 md5 hex digits of the
token as an int, mod ``dim`` (reproducible in DuckDB — the same move as
``text.fingerprint``); IDF is micro-quantized ``ln(N/df)`` per
:mod:`.quant`, so per-doc TF-IDF values are exact int64 products and
every aggregate is order-free.

Scale posture: TF is ONE shuffle at (doc, bucket) grain (map-side
combine does the heavy lifting — per-partition token repeats collapse
before the exchange); bucket stats are a second shuffle at ``dim`` grain
(tiny, broadcast back); dense assembly stays at doc grain with a
map-lookup fill, no per-row Python anywhere.

Reference analog: lq_gamma.py's fixed-length per-read stat vector — here
the stat vector is the hashed token histogram of a document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .quant import micro_quantize, ws_tokens

__all__ = ["hash_bucket", "hashed_tf", "bucket_idf", "hashed_tfidf", "hash_vectors"]


def hash_bucket(token: Column, dim: int) -> Column:
    """token → bucket in [0, dim): first 8 md5 hex digits as int, mod
    ``dim``. 32-bit value, so the mod is non-negative in any engine."""
    u = F.conv(F.substring(F.md5(token.cast("binary")), 1, 8), 16, 10).cast("long")
    return F.pmod(u, F.lit(dim)).cast("long")


def hashed_tf(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", dim: int = 1024
) -> DataFrame:
    """(id, bucket, tf) term frequencies over hashed buckets — NULL texts
    drop (no tokens → no features). Token-free (empty/whitespace-only)
    texts contribute no rows here and therefore get NO dense row from
    :func:`hash_vectors` either; callers that need every doc represented
    should left-join the vectors back to the doc table and zero-fill.

    Shape note (ADVICE r5): the ``repartition(_id)`` below trades map-side
    pre-aggregation for a single doc-keyed exchange shared with
    :func:`hash_vectors` — a win whenever a doc's distinct buckets ≈ its
    token count (any realistic text at dim ≥ 64). At very small ``dim``
    (or highly repetitive token streams) partial aggregation would shrink
    the shuffle more than the saved exchange; callers in that regime can
    pre-aggregate with a plain groupBy and skip :func:`hash_vectors`."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    tok = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.explode(ws_tokens(text_col)).alias("_t")
    )
    # ONE doc-keyed exchange for the whole featurization (round 5): project
    # the token stream to (id, bucket) — two fixed-width values, smaller
    # than the tokens themselves — and hash-partition it by _id.
    # HashPartitioning(_id) satisfies the clustering BOTH of this
    # (_id, bucket) groupBy AND of hash_vectors' downstream (_id) assembly
    # (the knlm w1-repartition move), so the dense-vector composition runs
    # agg → broadcast-IDF join → assemble with zero further corpus-sized
    # exchanges. The old shape (groupBy's own hash(_id,bucket) exchange +
    # a second hash(_id) exchange in hash_vectors) paid two: map-side
    # partial aggregation bought nothing there, since a partition's docs ×
    # dim already exceeds its token count at dim ≥ 64.
    return (
        tok.select("_id", hash_bucket(F.col("_t"), dim).alias("bucket"))
        .repartition(F.col("_id"))
        .groupBy("_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select(F.col("_id").alias(id_col), "bucket", "tf")
    )


def bucket_idf(tf: DataFrame, n_docs: Column | int) -> DataFrame:
    """(bucket, df_docs, idf_micro) from a :func:`hashed_tf` table:
    df = docs with a nonzero bucket count, idf = micro ``ln(N/df)`` —
    the plain (unsmoothed) convention; df ≥ 1 for every present bucket
    so the log is always defined. ``n_docs`` may be an int or a column
    constant riding every row (e.g. a broadcast 1-row aggregate — the
    in-plan path :func:`hashed_tfidf` uses)."""
    n = (
        F.lit(n_docs).cast("double")
        if isinstance(n_docs, int)
        else F.first(n_docs).cast("double")
    )
    return tf.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("df_docs"),
        micro_quantize(F.log(n / F.count(F.lit(1)))).alias("idf_micro"),
    )


def hashed_tfidf(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", dim: int = 1024
) -> DataFrame:
    """(id, bucket, tf, tfidf_micro): int64 tf × micro-IDF products. The
    ``dim``-grain IDF table broadcasts back onto the (doc, bucket) table
    — no second corpus-sized shuffle, and N (docs with a non-NULL text)
    rides IN-PLAN as a broadcast 1-row aggregate rather than an eager
    driver count, so constructing the plan costs nothing and the whole
    featurization stays one job."""
    tf = hashed_tf(df, text_col, id_col, dim)
    n_docs = (
        df.filter(F.col(text_col).isNotNull())
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    idf = bucket_idf(tf.crossJoin(F.broadcast(n_docs)), F.col("_n"))
    return tf.join(F.broadcast(idf.select("bucket", "idf_micro")), "bucket").select(
        id_col, "bucket", "tf", (F.col("tf") * F.col("idf_micro")).alias("tfidf_micro")
    )


def hash_vectors(
    sparse: DataFrame,
    dim: int,
    id_col: str = "doc_id",
    value_col: str = "tfidf_micro",
) -> DataFrame:
    """Assemble dense int vectors ``(id, vec: array<long>)`` from a
    sparse (id, bucket, value) table — zero-filled via map lookup, so the
    collect_list order never matters. Feed straight into
    :func:`kmeans.kmeans_fit` (vectors are already int-exact; pass them
    through ``quantize_vec`` only if mixing with float embeddings)."""
    # map_from_entries over ONE collect_list of structs: the bucket/value
    # pairing is by construction, not by alignment of two independent
    # aggregate buffers (collect_list order is not contractual)
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("bucket"), F.col(value_col).cast("long")))
    )
    return (
        sparse.groupBy(F.col(id_col))
        .agg(m.alias("_m"))
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(F.col("_m")[i.cast("long")], F.lit(0).cast("long")),
            ).alias("vec"),
        )
    )
