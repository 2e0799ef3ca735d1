"""Distributed Lloyd's k-means over embedding columns — integer-exact.

Clustering is the backbone of several curation moves this engine already
ships pieces of: cluster-balanced sampling, SemDeDup-style semantic
pruning (``semantic_keep_best``), and the IVF coarse quantizer
(``simsearch.ivf_topk`` — which fits its centroids on a driver-bounded
SAMPLE). This module is the full-corpus fit: every vector participates
in every Lloyd iteration, with the Spark-native job shape MLlib's KMeans
uses —

* **assignment is a narrow map** (zero shuffle): the k centroids are
  driver-held literals (k·dim values — tiny at any corpus size) folded
  into a single JVM expression per row: ``array_min`` over an
  ``array<struct<dist,cluster>>`` built with ``zip_with``/``aggregate``.
  Struct ordering compares ``dist`` first then ``cluster`` — ties break
  to the lowest cluster id, deterministically.
* **update is ONE shuffle per iteration at cluster grain** — k groups
  × dim per-component sum columns (no explode: a Generate would
  re-evaluate the assignment expression per emitted row), with map-side
  partial aggregation doing almost all the work. The k×dim sums/counts
  collect to the driver (the same driver/executor split as MLlib and as
  ``simsearch.ivf_topk``'s centroid table).

**Integer-exact cross-engine contract**: components are micro-quantized
(``floor(x·1e6 + 0.5)`` — the repo-wide :mod:`.quant` contract) BEFORE
any arithmetic; distances are int64 sums of squared int differences;
updated centroids are ``floor(sum/count)`` in exact integer math. No
float ever crosses a partition boundary, so assignments, inertia, and
centroids are bit-identical across engines, partitionings, and runs —
a DuckDB oracle can unroll the same iterations and match exactly.

int64 headroom: |q| ≤ ~2^21 for unit-scale embeddings, a squared diff
≤ 2^44, × dim(≤2^12) ≤ 2^56 per distance. Component SUMS stay exact
while n·|q| < 2^53 (the float64 division guard) — at 10^12 rows shard
the update into per-range partial means or widen to DECIMAL; documented
rather than silently wrong (a ValueError guards the collect).

Reference analog: lq_nanopore.py's per-platform signal clustering
(grouping reads by QC-stat centroids) — here the stat vector is the
document embedding and the fit is corpus-wide.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, functions as F

from .quant import MICRO

__all__ = ["quantize_vec", "kmeans_fit", "kmeans_report"]

# |sum(q)| per (cluster, dim) must stay under 2^53: Python's // is exact
# at any width, but the DuckDB oracle's floor(sum/count) divides in
# float64. ~unit-scale embeddings (|q|~2^20) leave room for ~2^33 ≈
# 8.6e9 members per cluster; beyond that, shard the update.
_EXACT_SUM_LIMIT = 1 << 53


def quantize_vec(col: Column) -> Column:
    """array<float> → array<long>: per-component micro-quantization
    (floor(x·1e6 + 0.5)). float32 widens to float64 exactly, so the
    quantized ints are engine-independent."""
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * MICRO + F.lit(0.5)).cast("long")
    )


def _sqdist(qcol: Column, centroid: Column) -> Column:
    """int64 squared L2 distance between a quantized vector column and a
    centroid array expression."""
    return F.aggregate(
        F.zip_with(qcol, centroid, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign_expr(qcol: Column, centroids: list[list[int]]) -> Column:
    """struct<dist:long, cluster:int> of the nearest centroid — ties to
    the lowest cluster id via struct ordering. Pure JVM, no shuffle.

    The k×dim centroid values enter the plan as ONE array<array<long>>
    literal (data payload, not expression nodes) iterated with an
    indexed ``transform`` — k unrolled per-centroid subtrees made every
    Lloyd iteration's fresh plan cost ~0.5 s of driver-side analysis per
    update job (measured at k=4, dim=64: 1.2 s/update → 0.7 s, same
    executor-side work, bit-identical assignment incl. tie-breaks)."""
    cl = F.lit([[int(v) for v in c] for c in centroids])
    return F.array_min(
        F.transform(
            cl,
            lambda c, i: F.named_struct(
                F.lit("dist"), _sqdist(qcol, c), F.lit("cluster"), i
            ),
        )
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iters: int = 3,
) -> tuple[DataFrame, list[list[int]]]:
    """Fit k-means with ``iters`` Lloyd updates; return
    ``(assignments, centroids)`` where assignments is the plan
    ``(id_col, cluster, dist)`` under the FINAL centroids and centroids
    is the k×dim micro-int list.

    Deterministic init: the quantized vectors of the k smallest
    ``id_col`` values (cluster i = rank i). **Precondition: ``id_col``
    is unique** — with duplicate ids the ``orderBy.limit(k)`` seed would
    resolve ties nondeterministically while the SQL oracle's
    ``dense_rank() <= k`` takes every row of the k smallest distinct
    ids, so the two engines could seed differently. An iteration that
    empties a cluster keeps its previous centroid (mirrored by the SQL
    oracle). Drop policy for malformed input: NULL vectors and vectors
    containing a NULL component are excluded up front; after the seed
    fixes ``dim``, any row whose vector length differs from ``dim`` is
    dropped too (a ragged vector would otherwise yield NULL distances
    and a silent misassignment through ``array_min``).

    The quantized corpus is pinned once (serialized MEMORY_AND_DISK persist —
    see the inline note) so the ``iters+1`` passes (one update job per iteration
    + the returned assignment) re-read a materialized columnar table
    instead of re-running the upstream plan — the :func:`graph.pagerank`
    move, minus the memory competition. Blocks release when the returned
    plan is garbage-collected."""
    if k < 1 or iters < 0:
        raise ValueError(f"need k >= 1 and iters >= 0, got k={k} iters={iters}")
    q = (
        df.filter(
            F.col(vec_col).isNotNull()
            # a NULL component would propagate NULL through _sqdist and
            # misassign via array_min over structs with NULL dist
            & ~F.exists(F.col(vec_col), lambda x: x.isNull())
        )
        .select(F.col(id_col).alias("_id"), quantize_vec(F.col(vec_col)).alias("_q"))
        # serialized MEMORY_AND_DISK (pyspark default), not localCheckpoint: the deserialized
        # checkpoint blocks of a corpus-sized table starve the update's
        # dim-wide hash aggregate of execution memory (measured: OOM
        # aborts at 8M×64 under an 8g heap), while pure DISK_ONLY pays
        # serialization+disk on every pass even when memory is ample
        # (measured 8× slower at 8M under a 48g heap). Serialized+
        # evictable is the standard posture for corpus-sized caches:
        # memory-fast when the heap allows, graceful spill when not.
        # The seed's TakeOrdered scan below materializes every block once.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    seed = q.orderBy("_id").limit(k).collect()
    if len(seed) < k:
        raise ValueError(f"k={k} but only {len(seed)} non-null vectors")
    centroids: list[list[int]] = [list(r["_q"]) for r in seed]

    dim = len(centroids[0])
    if any(len(c) != dim for c in centroids):
        raise ValueError(
            f"seed vectors are ragged (expected every length == {dim}); "
            "k-means needs a fixed-dimension embedding column"
        )
    # documented drop policy: rows whose vector length differs from the
    # seed-derived dim are excluded (cache-backed filter, no recompute)
    q = q.filter(F.size("_q") == dim)
    for _ in range(iters):
        best = _assign_expr(F.col("_q"), centroids)
        # per-dimension sum expressions, NOT posexplode: a Generate would
        # re-evaluate the k-way assignment expression once per EXPLODED
        # row (dim× per doc — measured 12× slower at 100k×64); dim column
        # aggregates evaluate it once per doc and stay in codegen. k rows
        # × dim cols to the driver — bounded by construction.
        upd = (
            q.select(best["cluster"].alias("_c"), "_q")
            .groupBy("_c")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[F.sum(F.col("_q")[i]).alias(f"_s{i}") for i in range(dim)],
            )
            .collect()
        )
        new = [list(c) for c in centroids]  # empty cluster keeps previous
        for r in upd:
            n = r["_n"]
            for i in range(dim):
                s = r[f"_s{i}"]
                if abs(s) >= _EXACT_SUM_LIMIT:
                    # a real error, not an assert: -O must not compile away
                    # the cross-engine exactness guard
                    raise ValueError(
                        f"component sum {s} exceeds 2^53 — an SQL twin's "
                        "float floor-division would diverge; shard the "
                        "update into per-range partial means"
                    )
                # floor(sum/count) — exact integer floor division
                new[r["_c"]][i] = int(s // n)
        centroids = new

    best = _assign_expr(F.col("_q"), centroids)
    asg = q.select(
        F.col("_id").alias(id_col),
        best["cluster"].alias("cluster"),
        best["dist"].alias("dist"),
    )
    return asg, centroids


def kmeans_report(asg: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Per-cluster fit summary: size, exact int64 inertia, and the
    smallest member id (an identity anchor that pins the partition of
    ids into clusters, not just its shape)."""
    return (
        asg.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("dist").alias("inertia"),
            F.min(id_col).alias("min_id"),
        )
        .orderBy("cluster")
    )
