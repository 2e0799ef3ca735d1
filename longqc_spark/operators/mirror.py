"""Mirror-site detection: host pairs sharing identical page content.

Web crawls are full of mirrors — the same site served under several
hosts (CDN aliases, country mirrors, scraper clones). Domain-level caps
and per-host quality statistics double-count them unless the mirror
pairs are found first. The detector works at the content-digest grain:

  1. distinct ``(host, digest)`` pairs — a host's page SET, not its
     crawl multiplicity;
  2. a document-frequency guard: a digest appearing on more than
     ``max_hosts`` hosts is cross-site boilerplate (empty pages, soft
     404s, parked-domain templates), not evidence of mirroring — and it
     is exactly the key that would star-explode the self-join (k hosts
     → k² pairs). Dropping it bounds the join at ``max_hosts²`` pairs
     per digest, the same flood guard the LSH dedup uses
     (operators/dedup.py:103);
  3. digest-keyed self-join (host_a < host_b) → shared-page count per
     host pair; joined back to per-host set sizes for containment
     (shared / min set size — robust when a small mirror carries a
     subset of a big site) and Jaccard.

Every step is a relational plan (distinct → groupBy → equi-join):
Catalyst shuffles on digest then on host pair, AQE handles residual
skew, and nothing touches Python. The same logic is expressible 1:1 in
ANSI SQL, so the registry entry has a full value oracle.

Reference analog: the reference's spike-in / control-sequence
cross-sample filter (``longQC.py:553-592``) — recognizing that the same
payload shows up under many labels and must be collapsed before
per-label statistics are trusted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def host_page_sets(
    df: DataFrame, host_col: str = "host", digest_col: str = "digest",
    max_hosts: int = 16,
) -> DataFrame:
    """Distinct ``(host, digest)`` with the boilerplate guard applied:
    digests present on more than ``max_hosts`` distinct hosts are
    dropped (with NULL hosts/digests ignored — a NULL payload is not
    shared content)."""
    hd = (
        df.select(host_col, digest_col)
        .where(F.col(host_col).isNotNull() & F.col(digest_col).isNotNull())
        .distinct()
    )
    wide = (
        hd.groupBy(digest_col)
        .agg(F.count(F.lit(1)).alias("_nh"))
        .where(F.col("_nh") > max_hosts)
        .select(digest_col)
    )
    return hd.join(wide, digest_col, "left_anti")


def mirror_pairs(
    df: DataFrame,
    host_col: str = "host",
    digest_col: str = "digest",
    min_shared: int = 2,
    min_containment: float = 0.5,
    max_hosts: int = 16,
) -> DataFrame:
    """Host pairs ``(host_a < host_b)`` whose page sets overlap enough to
    call them mirrors → ``(host_a, host_b, shared, size_a, size_b,
    containment, jaccard)``, containment-descending.

    ``min_shared`` suppresses one-page coincidences; ``min_containment``
    is the mirror call itself. Set sizes are computed AFTER the
    boilerplate guard so a host of pure boilerplate cannot reach 100%
    containment on junk."""
    hd = host_page_sets(df, host_col, digest_col, max_hosts=max_hosts)
    sizes = hd.groupBy(host_col).agg(F.count(F.lit(1)).alias("size"))
    a, b = hd.alias("a"), hd.alias("b")
    shared = (
        a.join(b, F.col(f"a.{digest_col}") == F.col(f"b.{digest_col}"))
        .where(F.col(f"a.{host_col}") < F.col(f"b.{host_col}"))
        .groupBy(
            F.col(f"a.{host_col}").alias("host_a"),
            F.col(f"b.{host_col}").alias("host_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    out = (
        shared.join(sizes.withColumnRenamed(host_col, "host_a"), "host_a")
        .withColumnRenamed("size", "size_a")
        .join(sizes.withColumnRenamed(host_col, "host_b"), "host_b")
        .withColumnRenamed("size", "size_b")
    )
    cont = F.col("shared") / F.least("size_a", "size_b")
    jac = F.col("shared") / (F.col("size_a") + F.col("size_b") - F.col("shared"))
    return (
        out.select(
            "host_a", "host_b", "shared", "size_a", "size_b",
            F.round(cont, 6).alias("containment"),
            F.round(jac, 6).alias("jaccard"),
        )
        .where(F.col("containment") >= min_containment)
        .orderBy(F.desc("containment"), "host_a", "host_b")
    )


def mirror_collapse(
    df: DataFrame,
    pairs: DataFrame,
    host_col: str = "host",
    key_col: str = "doc_id",
) -> DataFrame:
    """Drop the mirror side of each detected pair: for every ``(host_a,
    host_b)`` pair the lexicographically-smaller host survives and the
    other host's documents are removed entirely (union of all losing
    hosts, broadcast anti-join — pairs output is tiny relative to the
    corpus). Chained mirrors collapse transitively to the smallest host
    because losing hosts are the union of every pair's ``host_b``."""
    losers = pairs.select(F.col("host_b").alias(host_col)).distinct()
    return df.join(F.broadcast(losers), host_col, "left_anti")
