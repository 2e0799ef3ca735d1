"""Crawl-frontier scheduling: which URLs to fetch next.

Completes the crawl side of the corpus loop: discovery produces
candidate URLs (anchor hrefs — operators/web.extract_anchors; sitemap
locs — operators/sitemap; CDX backfill — operators/cdx), consent
gates them (operators/robots), and THIS operator turns the survivors
into the next fetch batch: de-duplicated against everything already
crawled, prioritized, and capped per host so no origin is hammered
(politeness) and no mega-host monopolizes the batch (the frontier's
version of the domain cap).

Selection is deterministic: priority descending (caller-supplied —
e.g. the linking host's PageRank from operators/graph, or sitemap
``priority``), md5-of-URL tiebreak, ``row_number() ≤ budget`` per
host. Determinism matters for the same reason it does everywhere else
in this repo: a re-run of the scheduler on the same state must pick
the same batch, or crash-resume duplicates fetch work.

Plan shape: one anti-join keyed by URL (the seen-set probe — the
crawled side can also be a Bloom sketch, see ``operators.dedup``'s
bloom path, when the exact set is too big to join cheaply), one
max-aggregate per candidate URL (a URL found via many links keeps its
best priority), and one window shuffle keyed by host. The window
sorts each host's candidates; a pathological host with 10^8 pending
URLs pays that sort — at that scale pre-filter with a per-host random
band (``F.pmod(F.xxhash64(url), K) == epoch % K``) before scheduling,
which this module deliberately leaves to the caller because it
changes WHICH urls are eligible, a policy choice.

Reference analog: the reference's work-cap subsampling
(``lq_utils.py`` sample caps before expensive stats) — bounding
per-group work before a costly downstream step, here the fetch itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .psl import host_expr


def frontier_next(
    candidates: DataFrame,
    crawled: DataFrame | None = None,
    url_col: str = "url",
    score_col: str | None = None,
    per_host_budget: int = 10,
    host_budgets: DataFrame | None = None,
) -> DataFrame:
    """Next fetch batch → ``(host, url, priority, fetch_rank)``.

    ``candidates``: one row per discovered URL (duplicates fine — the
    best ``score_col`` per URL wins; NULL/hostless URLs are not
    schedulable and are dropped). ``crawled``: URLs already fetched
    (exact anti-join; pass None for a cold start). ``score_col``:
    higher = sooner; absent scores rank 0.0. ``fetch_rank`` is the
    1-based position within the host's budget.

    ``host_budgets``: optional ``(host, budget int)`` overrides —
    broadcast (one row per host with a declared policy; everyone else
    gets ``per_host_budget``). Derive it from ``Crawl-delay`` as
    ``budget = cycle_seconds / crawl_delay_s`` via
    ``robots.robots_crawl_delays`` to turn the site's requested
    cadence into a per-cycle cap; a budget ≤ 0 schedules nothing for
    that host."""
    score = (
        F.coalesce(F.col(score_col).cast("double"), F.lit(0.0))
        if score_col
        else F.lit(0.0)
    )
    cand = (
        candidates.select(F.col(url_col).alias("url"), score.alias("_score"))
        .groupBy("url")
        .agg(F.max("_score").alias("priority"))
        .withColumn("host", host_expr("url"))
        .where(F.col("host").isNotNull())
    )
    if crawled is not None:
        seen = crawled.select(F.col(url_col).alias("url"))
        cand = cand.join(seen, "url", "left_anti")
    budget = F.lit(per_host_budget)
    if host_budgets is not None:
        cand = cand.join(
            F.broadcast(
                host_budgets.select("host", F.col("budget").alias("_budget"))
            ),
            "host",
            "left",
        )
        budget = F.coalesce(F.col("_budget"), F.lit(per_host_budget))
    w = Window.partitionBy("host").orderBy(
        F.desc("priority"), F.md5(F.col("url").cast("binary")), F.col("url")
    )
    return (
        cand.withColumn("fetch_rank", F.row_number().over(w))
        .where(F.col("fetch_rank") <= budget)
        .select("host", "url", "priority", "fetch_rank")
    )
