"""Alternating large-star/small-star connected components (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC 2014).

:func:`dedup.connected_components` (min-label propagation) converges in
graph-DIAMETER rounds — the right tool for LSH near-dup clusters, whose
components are clique-ish (diameter 2-3). But dedup graphs are not the
only CC workload this engine meets: redirect chains, mirror-host
equivalences, and canonical-URL forests produce PATHS, where diameter is
O(n) and label propagation degenerates to O(n) shuffles. The alternating
star algorithm contracts such chains in **O(log n) rounds** regardless
of diameter:

* **large-star**: every node u points its LARGER neighbors at the
  minimum of its closed neighborhood — emit ``(v, m)`` for v ∈ Γ(u),
  v > u, m = min(Γ(u) ∪ {u}).
* **small-star**: edges oriented large→small; every node points its
  smaller neighbors AND itself at the minimum — emit ``(v, m)`` for
  v ∈ Γ⁻(u) ∪ {u} \\ {m}, m = min(Γ⁻(u)).

Both halves preserve connectivity and never create cross-component
edges; at the fixpoint the edge set is a star forest child→root with
root = component minimum — the same deterministic witness rule as the
label-propagation twin, so the two are drop-in interchangeable.

Spark shape: each half is ONE groupBy shuffle (the neighborhood min)
plus a join back that AQE co-partitions with it; ``localCheckpoint``
truncates lineage per round (the GraphX superstep move). Convergence is
an exact-count plus dual-seed hash fingerprint — one cheap aggregate,
no extra shuffle — with collision probability ~2^-128 (and a wrong early
stop is bounded by the star-forest shape check in tests, not silent
corruption of unrelated components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components_star"]


def _fingerprint(e: DataFrame) -> tuple:
    """(count, hash-xor, hash-xor') of an edge set — order-free exact
    count with two independent 64-bit XOR folds for the equality check
    (XOR, not sum: ANSI mode makes an int64 hash sum overflow; the edge
    set is distinct so the XOR fold is a faithful set fingerprint)."""
    row = e.agg(
        F.count(F.lit(1)),
        F.bit_xor(F.xxhash64(F.col("u"), F.col("v"), F.lit(1))),
        F.bit_xor(F.xxhash64(F.col("u"), F.col("v"), F.lit(2))),
    ).first()
    return tuple(row)


def connected_components_star(
    pairs: DataFrame,
    key_a: str = "key_a",
    key_b: str = "key_b",
    max_iter: int = 50,
) -> DataFrame:
    """→ ``(node, component)`` with component = min node id — the
    :func:`dedup.connected_components` contract, in O(log n) rounds.

    Keys must be orderable and hash-joinable (ints or strings); self
    loops drop; isolated nodes never enter ``pairs`` and so (as with the
    label-propagation twin) do not appear in the output."""
    edges = (
        pairs.select(F.col(key_a).alias("u"), F.col(key_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # orient (hi, lo) once so the first small-star sees canonical edges
    e = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct().localCheckpoint(eager=True)
    if e.isEmpty():
        return e.select(F.col("u").alias("node"), F.col("v").alias("component"))

    fp = _fingerprint(e)
    for _ in range(max_iter):
        # -- large-star: symmetric neighborhoods, larger neighbors → min
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("_mn", "u").alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # -- small-star: edges are (hi, lo); group the lo-side per hi
        lo_min = large.groupBy("u").agg(F.min("v").alias("m"))
        center = lo_min.select(F.col("u"), F.col("m").alias("v"))
        spokes = (
            large.join(lo_min, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        e = center.union(spokes).distinct().localCheckpoint(eager=True)
        new_fp = _fingerprint(e)
        if new_fp == fp:
            break
        fp = new_fp
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "alternating rounds — raise max_iter"
        )
    roots = e.select(F.col("v").alias("u"), F.col("v")).distinct()
    return (
        e.union(roots)
        .distinct()
        .select(F.col("u").alias("node"), F.col("v").alias("component"))
    )
