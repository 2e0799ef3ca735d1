"""Soft-404 and host-error-template detection.

Web servers routinely answer missing pages with HTTP 200 and an
"oops, not found" body — a soft 404. At crawl scale these pages are a
double hazard: they carry no training value, and because one template
backs thousands of URLs they inflate a host's apparent page count and
poison URL-level dedup statistics. Two complementary detectors:

* **content heuristic** (``soft404_expr``): the page SAYS it is an
  error — title or leading body text matches an error phrase
  (404 / not found / no longer exists / …). The body match only fires
  on SHORT documents (``max_chars``) so an article *about* 404 pages
  is not flagged; the title match is unconditional (a title is the
  server's own label). Pure JVM regexp over two columns, scan-fused,
  zero shuffle.

* **structural template** (``host_error_templates``): the page
  BEHAVES like an error — one content digest served for ``min_urls``
  or more distinct URLs *within a single host* (error pages, parked
  placeholders, login walls). This needs no phrase list and catches
  non-English and custom error pages. One groupBy(host, digest)
  aggregate; the template table is tiny (hosts × few templates) and
  broadcasts back for the removal anti-join.

The two overlap but neither subsumes the other: a one-URL custom 404
only the heuristic sees; a 10k-URL "coming soon" page only the
template detector sees. ``soft404_filter`` applies both.

Cross-host note: a digest shared by many HOSTS is handled by the
mirror/boilerplate guard (operators/mirror.py); here the grouping is
deliberately per-host so a popular legitimate page syndicated across
hosts is not an error template.

Reference analog: the reference's spike-in/control filtering and its
low-complexity masks (``longQC.py:553-592``, sdust) — recognizing
payloads whose FORM marks them as non-signal regardless of where they
appear.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# error phrases; anchored on word boundaries, case-insensitive via (?i)
_ERR = (
    r"(?i)\b(404\s+(error|not\s+found)|error\s+404|page\s+not\s+found|"
    r"not\s+found\b.{0,20}\b404|page\s+(no\s+longer|does\s+not)\s+exist[s]?|"
    r"page\s+(is\s+)?unavailable|this\s+page\s+has\s+been\s+removed)\b"
)


def soft404_expr(
    title_col: str = "title", text_col: str = "text", max_chars: int = 512
) -> Column:
    """TRUE when the page declares itself an error: error phrase in the
    title (any length), or in the first 200 chars of a SHORT body
    (≤ ``max_chars``). NULL-safe: missing title/text contribute false,
    both missing → false."""
    t = F.coalesce(F.col(title_col), F.lit(""))
    body = F.coalesce(F.col(text_col), F.lit(""))
    title_hit = t.rlike(_ERR)
    body_hit = (F.length(body) <= max_chars) & F.substring(body, 1, 200).rlike(_ERR)
    return title_hit | body_hit


def host_error_templates(
    df: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    digest_col: str = "digest",
    min_urls: int = 5,
) -> DataFrame:
    """``(host, digest, n_urls)`` for digests served on ≥ ``min_urls``
    distinct URLs of one host — the host's template pages. NULL host or
    digest never forms a template."""
    return (
        df.where(F.col(host_col).isNotNull() & F.col(digest_col).isNotNull())
        .groupBy(host_col, digest_col)
        .agg(F.count_distinct(F.col(url_col)).alias("n_urls"))
        .where(F.col("n_urls") >= min_urls)
    )


def soft404_filter(
    df: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    digest_col: str = "digest",
    title_col: str = "title",
    text_col: str = "text",
    max_chars: int = 512,
    min_urls: int = 5,
    keep_flagged: bool = False,
) -> DataFrame:
    """Drop soft-404s by EITHER detector. ``keep_flagged=True`` returns
    every row annotated with ``soft404_content`` / ``soft404_template``
    booleans instead (the audit view). The template anti-join is
    broadcast — the template table is bounded by hosts, not pages."""
    templates = host_error_templates(
        df, host_col=host_col, url_col=url_col, digest_col=digest_col,
        min_urls=min_urls,
    ).select(host_col, digest_col, F.lit(True).alias("soft404_template"))
    content = soft404_expr(title_col, text_col, max_chars=max_chars)
    if keep_flagged:
        return (
            df.join(F.broadcast(templates), [host_col, digest_col], "left")
            .withColumn(
                "soft404_template",
                F.coalesce(F.col("soft404_template"), F.lit(False)),
            )
            .withColumn("soft404_content", content)
        )
    out = df.join(F.broadcast(templates), [host_col, digest_col], "left_anti")
    return out.where(~content)
