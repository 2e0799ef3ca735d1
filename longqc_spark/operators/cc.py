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


def _cc_driver(spark, rows: list, node_type) -> DataFrame:
    """Driver-side union-find for edge sets below the size gate in
    :func:`connected_components_star` — same contract (component = min
    member, nodes = edge endpoints only), exact and deterministic."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in rows:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp_min: dict = {}
    for x in parent:
        r = find(x)
        m = comp_min.get(r)
        if m is None or x < m:
            comp_min[r] = x
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField("node", node_type), StructField("component", node_type)]
    )
    none_first = lambda x: (x is None, x)  # noqa: E731
    return spark.createDataFrame(
        sorted(((x, comp_min[find(x)]) for x in parent), key=lambda t: none_first(t[0])),
        schema,
    )


def connected_components_star(
    pairs: DataFrame,
    key_a: str = "key_a",
    key_b: str = "key_b",
    max_iter: int = 50,
    driver_solve_max_edges: int = 500_000,
) -> DataFrame:
    """→ ``(node, component)`` with component = min node id — the
    :func:`dedup.connected_components` contract, in O(log n) rounds.

    Keys must be orderable and hash-joinable (ints or strings); self
    loops drop; isolated nodes never enter ``pairs`` and so (as with the
    label-propagation twin) do not appear in the output.

    Size-adaptive (guide §1.2): a distinct edge set at or below
    ``driver_solve_max_edges`` — known for free from the convergence
    fingerprint's count — is solved by driver union-find instead of the
    ~log n alternating rounds, each of which is several tiny shuffles,
    two lineage checkpoints and a fingerprint collect of pure overhead
    at that size (measured: 4.0 s → ~1.3 s on a 48k-edge chain graph).
    Larger graphs take the distributed loop unchanged; 0 disables the
    fast path. Parity pinned by test_star_driver_and_distributed_agree."""
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
    if fp[0] <= driver_solve_max_edges:
        return _cc_driver(
            e.sparkSession,
            [(r["u"], r["v"]) for r in e.collect()],
            e.schema["u"].dataType,
        )
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
