"""Redirect-chain resolution: collapse HTTP 3xx hop chains to their
terminal destination, distributed as pointer-doubling.

A crawl snapshot records redirects as ``(url, status, location)`` fetch
rows; the page identity a curation pipeline wants is the TERMINAL url —
``a.example/x -> b.example/y -> c.example/z`` should count as ONE page at
``c.example/z`` for URL dedup, frontier scheduling, and link-graph
construction (the identity analog of the declared-canonical collapse in
``web.canonical_collapse``, but driven by the server's own 3xx answers
instead of the page markup; reference analog: the per-read name
re-mapping in ``lq_utils.py:141-196`` lifted to the URL identity space).

Scale design — pointer DOUBLING, not hop-at-a-time walking: the naive
resolution follows one hop per join (``max_hops`` sequential shuffles);
doubling composes the partial walks with themselves, so after *k*
self-joins every chain of length ``<= 2**k`` is fully resolved —
``ceil(log2(max_hops))`` shuffles total, each over the REDIRECT SOURCES
only (the 3xx fraction of fetches, not the corpus). ``localCheckpoint``
truncates lineage per iteration so the plan stays constant-size (the same
iteration hygiene as ``graph.pagerank``). Cycles (including self-loops)
and chains longer than ``max_hops`` never reach a terminal and surface as
``resolved = false`` — the crawler-trap signal, never an infinite loop.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


def redirect_edges(
    fetches: DataFrame,
    url_col: str = "url",
    status_col: str = "status",
    location_col: str = "location",
) -> DataFrame:
    """The ``(src, dst)`` redirect edge set of a fetch table: rows with a
    3xx status and a non-NULL ``location``. A URL fetched more than once
    (re-crawls, racing mirrors) keeps its MIN location so the successor
    function is single-valued and deterministic — resolution is a walk,
    and a walk needs one next-hop per node. Pure filter + one partial-agg
    groupBy over the 3xx slice only."""
    s = F.col(status_col)
    return (
        fetches.where(
            s.isNotNull()
            & (s >= 300)
            & (s <= 399)
            & F.col(location_col).isNotNull()
            & F.col(url_col).isNotNull()
        )
        .groupBy(F.col(url_col).alias("src"))
        .agg(F.min(location_col).alias("dst"))
    )


def resolve_redirects(
    fetches: DataFrame,
    url_col: str = "url",
    status_col: str = "status",
    location_col: str = "location",
    max_hops: int = 16,
) -> DataFrame:
    """Resolve every redirect source to its terminal destination →
    ``(url, terminal_url, hops, resolved)``, one row per distinct
    redirect source.

    ``resolved`` is true iff a NON-redirecting URL is reached within
    ``max_hops`` hops; then ``terminal_url``/``hops`` report it. Cycles
    (self-loops included) and over-budget chains yield
    ``resolved = false`` with NULL terminal/hops — those sources are
    crawler-trap candidates for the frontier to down-weight.

    Pointer doubling: state is ``(url, cur, hops, final)`` — the walk
    from ``url`` has reached ``cur`` after ``hops`` hops, ``final`` iff
    ``cur`` has no outgoing edge. Each round substitutes every
    non-final row's remainder with ``cur``'s OWN partial walk
    (``hops`` add), doubling resolved depth per round:
    ``ceil(log2(max_hops))`` rounds cover every chain within budget.
    Each round is one equi-join of the source table with itself — the
    corpus is never touched."""
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    e = redirect_edges(fetches, url_col, status_col, location_col)
    # final after 1 hop <=> dst is not itself a redirect source.
    srcs = e.select(F.col("src").alias("_s"))
    p = (
        e.join(srcs, e["dst"] == srcs["_s"], "left")
        .select(
            F.col("src").alias("url"),
            F.col("dst").alias("cur"),
            F.lit(1).cast("long").alias("hops"),
            F.col("_s").isNull().alias("final"),
        )
        .localCheckpoint(eager=False)
    )
    rounds = max(0, math.ceil(math.log2(max_hops)))
    for _ in range(rounds):
        done = p.where(F.col("final"))
        todo = p.where(~F.col("final"))
        nxt = p.select(
            F.col("url").alias("_u2"),
            F.col("cur").alias("_c2"),
            F.col("hops").alias("_h2"),
            F.col("final").alias("_f2"),
        )
        # every non-final cur IS a redirect source, so the join always hits
        stepped = todo.join(nxt, todo["cur"] == nxt["_u2"], "inner").select(
            "url",
            F.col("_c2").alias("cur"),
            (F.col("hops") + F.col("_h2")).alias("hops"),
            F.col("_f2").alias("final"),
        )
        p = done.unionByName(stepped).localCheckpoint(eager=False)
    ok = F.col("final") & (F.col("hops") <= max_hops)
    return p.select(
        "url",
        F.when(ok, F.col("cur")).alias("terminal_url"),
        F.when(ok, F.col("hops")).alias("hops"),
        ok.alias("resolved"),
    )


def apply_redirects(
    df: DataFrame,
    resolution: DataFrame,
    url_col: str = "url",
    out_col: str = "final_url",
) -> DataFrame:
    """Annotate any URL-keyed table with its redirect-terminal identity:
    ``out_col`` = the resolved terminal when ``url_col`` is a resolved
    redirect source, else the URL itself (non-redirecting URLs and
    unresolved trap chains keep their own identity — an unresolved chain
    has no trustworthy terminal to collapse onto).

    One left equi-join against the resolution table — broadcast-able
    whenever the 3xx slice is small relative to ``df``, which AQE picks
    up at runtime; feed ``out_col`` to ``web.url_dedup`` /
    ``web.canonical_collapse`` to dedup under redirect identity."""
    r = resolution.where(F.col("resolved")).select(
        F.col("url").alias("_r_src"), F.col("terminal_url").alias("_r_dst")
    )
    return (
        df.join(r, df[url_col] == r["_r_src"], "left")
        .withColumn(out_col, F.coalesce(F.col("_r_dst"), F.col(url_col)))
        .drop("_r_src", "_r_dst")
    )
