"""Count-Min Sketch: bounded-memory frequency estimation (Cormode &
Muthukrishnan 2005).

``topk_tokens`` / ``token_counts`` keep exact corpus-wide counts — a
vocab-sized shuffle. At 10^12 docs the long tail makes "vocab-sized"
tens of billions of groups; the CMS caps the state at ``depth × width``
counters REGARDLESS of vocabulary, overestimates only (never under),
and merges by cell-wise addition — so per-partition sketches combine
associatively exactly like any Spark partial aggregate, and sketches
from different corpus shards / crawl snapshots can be added after the
fact (the same mergeability story as the HLL rollup in
``relational.py``).

Cross-engine contract: row r hashes a token to
``int(md5(token ⊕ "#r")[:8], 16) % width`` — the :mod:`.features`
bucket idiom with a per-row seed — so the sketch cells and every
estimate are deterministic integers any engine reproduces bit-for-bit.

Scale posture: building is ONE shuffle at (row, bucket) grain — at most
``depth × width`` groups regardless of corpus size, map-side combine
absorbing the token stream; the materialized sketch (``depth·width``
rows) is broadcastable, and estimation is a broadcast join + per-token
min over ``depth`` cells. Error bound: overestimate ≤ ε·N with
ε = e/width at confidence 1-(1/e)^depth.

Reference analog: lq_counters' bounded per-chunk stat accumulators
(longQC.py:294-360) — fixed-size state summarizing an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["cms_build", "cms_estimate"]


def _row_bucket(token: Column, row: int, width: int) -> Column:
    """Row-r hash: first 8 md5 hex digits of token⊕seed, mod width."""
    u = F.conv(
        F.substring(F.md5(F.concat(token, F.lit(f"#{row}")).cast("binary")), 1, 8),
        16,
        10,
    ).cast("long")
    return F.pmod(u, F.lit(width)).cast("long")


def cms_build(
    items: DataFrame,
    item_col: str = "token",
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """→ ``(row, bucket, c)`` sketch cells (absent cells are zero). One
    (row, bucket)-grain shuffle; ``weight_col`` (default weight 1) lets
    pre-aggregated counts or byte weights feed the sketch. Two sketches
    with the same (depth, width) merge by unioning and re-summing."""
    if depth < 1 or width < 1:
        raise ValueError(f"need depth/width >= 1, got {depth}/{width}")
    w = F.col(weight_col) if weight_col else F.lit(1)
    tok = items.filter(F.col(item_col).isNotNull()).select(
        F.col(item_col).alias("_t"), w.cast("long").alias("_w")
    )
    # all depth buckets computed ONCE per item in the array (cheap 4-int
    # payload through the Generate — not the kmeans re-eval trap: the md5
    # work sits in the array construction, evaluated once per input row)
    cells = tok.select(
        "_w",
        F.posexplode(
            F.array(*[_row_bucket(F.col("_t"), r, width) for r in range(depth)])
        ).alias("row", "bucket"),
    )
    return cells.groupBy("row", "bucket").agg(F.sum("_w").alias("c"))


def cms_estimate(
    queries: DataFrame,
    sketch: DataFrame,
    item_col: str = "token",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate each query item: min over the item's ``depth``
    cells (a broadcast join against the ≤ depth·width-row sketch).
    Absent cells count 0 — an item never sketched estimates 0. Output:
    queries' columns + ``cms_count``, **grouped by all of queries'
    columns** — duplicate query rows collapse to one output row
    (DISTINCT semantics; output rows ≤ input rows). Callers needing
    per-row multiplicity should carry a unique tag column through
    ``queries``, which then survives the groupBy."""
    probes = queries.select(
        "*",
        F.posexplode(
            F.array(*[_row_bucket(F.col(item_col), r, width) for r in range(depth)])
        ).alias("row", "bucket"),
    )
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return (
        joined.groupBy(*queries.columns)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("cms_count"))
    )
