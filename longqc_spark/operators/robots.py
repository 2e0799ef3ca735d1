"""RFC 9309 robots.txt gate — the fetch-level crawl-consent filter.

The meta-tag opt-out gate (``web.robots_optout_filter``) honors per-PAGE
consent; this module honors the per-HOST ``robots.txt`` contract: a
pipeline re-processing a crawl snapshot drops documents whose URL the
host's robots rules disallow for the processing agent.

Semantics implemented (RFC 9309 §2):
- groups = one or more ``User-agent`` lines followed by ``Allow``/
  ``Disallow`` rules; the group(s) whose agent token equals the caller's
  product token (case-insensitive) win; otherwise the ``*`` group(s);
  matching groups MERGE.
- longest-match wins between Allow and Disallow (specificity = octet
  length of the raw pattern); on a tie, Allow wins.
- ``*`` matches any character run; a trailing ``$`` anchors the pattern
  end; rules with an empty path are no-ops; no matching rule → allowed;
  no robots row for the host at all → allowed.

Scale posture: robots bodies are HOST-grain (~10^8 rows web-wide, tiny
next to pages), so parsing runs in one Arrow-batched ``mapInPandas`` over
the robots table only — never over pages — and the compiled rule table is
broadcast into the page join. The page-side work is a JVM regex match
(``rlike`` with a per-rule pattern column) plus one aggregation keyed by
page url (no skew: urls are unique), so the gate adds one broadcast join
and one shuffle regardless of corpus size.

Reference analog: the spike-in / contaminant exclusion join
(``longQC.py:553-592``) — an external per-entity rule table gating which
records continue down the pipeline.
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .web import host_expr

RULES_SCHEMA = "host string, allow boolean, pattern string, regex string, spec_len int"


def _pattern_to_java_regex(pat: str) -> str:
    """Robots path pattern → anchored Java-compatible regex: ``*`` → ``.*``,
    trailing ``$`` → end anchor, everything else literal (``re.escape``
    only escapes punctuation, which Java regex accepts)."""
    anchored_end = pat.endswith("$")
    core = pat[:-1] if anchored_end else pat
    body = "".join(".*" if c == "*" else re.escape(c) for c in core)
    return "^" + body + ("$" if anchored_end else "")


def _parse_one(txt: str, ua: str) -> list[tuple[bool, str]]:
    """Rules applying to ``ua`` from one robots.txt body: the merged
    specific-agent groups if any, else the merged ``*`` groups."""
    ua = ua.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    in_agents = True
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agents:  # a new group starts
                groups.append((agents, rules))
                agents, rules = [], []
            agents.append(val.lower())
            in_agents = True
        elif key in ("allow", "disallow"):
            if agents:
                in_agents = False
                if val:  # empty path = no-op rule
                    rules.append((key == "allow", val))
        # other keys (sitemap, crawl-delay, ...) are ignored
    if agents:
        groups.append((agents, rules))
    specific = [r for a, rs in groups if ua in a for r in rs]
    if any(ua in a for a, _ in groups):
        return specific
    return [r for a, rs in groups if "*" in a for r in rs]


def parse_robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    txt_col: str = "robots_txt",
    user_agent: str = "*",
) -> DataFrame:
    """Host-grain robots parse → one row per applicable rule:
    ``(host, allow, pattern, regex, spec_len)``. Hosts whose body yields
    no applicable rules emit nothing (the gate treats them as allow-all)."""
    import pandas as pd

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "host": [],
                "allow": [],
                "pattern": [],
                "regex": [],
                "spec_len": [],
            }
            for host, txt in zip(pdf[host_col], pdf[txt_col]):
                if txt is None:
                    continue
                for allow, pat in _parse_one(str(txt), user_agent):
                    out["host"].append(host)
                    out["allow"].append(allow)
                    out["pattern"].append(pat)
                    out["regex"].append(_pattern_to_java_regex(pat))
                    out["spec_len"].append(len(pat))
            yield pd.DataFrame(out)

    return robots.select(
        F.col(host_col).alias(host_col), F.col(txt_col).alias(txt_col)
    ).mapInPandas(parse, schema=RULES_SCHEMA)


def robots_gate(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    keep: str = "allowed",
) -> DataFrame:
    """Filter pages by compiled robots rules (from
    :func:`parse_robots_rules`). ``keep='allowed'`` (default) returns the
    crawlable pages; ``'denied'`` returns the complement (audit);
    ``'both'`` returns all pages with a ``robots_allowed`` column.

    Longest-match + Allow-tie resolution happens in one aggregation:
    ``max(struct(spec_len, allow))`` — the struct ordering IS the RFC
    precedence. Rules are broadcast (host-grain); the only shuffle keys on
    the page url."""
    if keep not in ("allowed", "denied", "both"):
        raise ValueError(f"keep must be allowed|denied|both, got {keep!r}")
    path = F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    p = pages.withColumn("_host", host_expr(url_col)).withColumn(
        "_path", F.when(path == "", "/").otherwise(path)
    )
    r = rules.select(
        F.col("host").alias("_host"),
        F.col("allow").alias("_allow"),
        F.col("regex").alias("_regex"),
        F.col("spec_len").alias("_spec"),
    )
    matched = (
        p.select(url_col, "_host", "_path")
        .join(F.broadcast(r), "_host")
        .filter(F.expr("_path rlike _regex"))
    )
    decisions = matched.groupBy(url_col).agg(
        F.max(F.struct(F.col("_spec"), F.col("_allow"))).alias("_win")
    )
    out = (
        p.join(decisions, url_col, "left")
        .withColumn(
            "robots_allowed", F.coalesce(F.col("_win._allow"), F.lit(True))
        )
        .drop("_win", "_host", "_path")
    )
    if keep == "allowed":
        return out.filter(F.col("robots_allowed")).drop("robots_allowed")
    if keep == "denied":
        return out.filter(~F.col("robots_allowed")).drop("robots_allowed")
    return out


def robots_sitemaps(
    robots: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """``Sitemap:`` declarations from robots bodies → one ``(host,
    sitemap_url)`` row each — the discovery step that feeds
    ``operators.sitemap`` (fetch the declared URLs, parse with
    ``parse_sitemap_entries`` / ``parse_sitemap_index``, then join the
    crawl with ``sitemap_coverage``). RFC 9309 §2.3: the key is
    case-insensitive, the value is an absolute URL, and the line lives
    OUTSIDE any user-agent group, so this is a pure line extract — all
    JVM (split + filter + regexp), no Python, no shuffle. Comment tails
    are stripped; blank values dropped; duplicate declarations kept
    once per host."""
    line = F.explode(F.split(F.col(txt_col), r"\r?\n")).alias("_line")
    url = F.regexp_extract(
        F.regexp_replace(F.col("_line"), r"#.*$", ""),
        r"(?i)^\s*sitemap\s*:\s*(\S+)\s*$",
        1,
    )
    return (
        robots.select(host_col, line)
        .select(host_col, url.alias("sitemap_url"))
        .where(F.col("sitemap_url") != "")
        .dropDuplicates([host_col, "sitemap_url"])
    )


def robots_crawl_delays(
    robots: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """``Crawl-delay:`` declarations → ``(host, crawl_delay_s double)``,
    the MAXIMUM across the body when several groups declare one (the
    conservative read: honor the slowest cadence any group asks
    for). Crawl-delay is not in RFC 9309 — it is a de-facto extension
    and group-scoped in the wild; collapsing to a per-host min avoids
    re-running the full group matcher for a value this scheduler only
    uses as a budget scale (see ``frontier.frontier_next`` host_budgets).
    Non-numeric values are ignored; line extract is all JVM."""
    line = F.explode(F.split(F.col(txt_col), r"\r?\n")).alias("_line")
    val = F.regexp_extract(
        F.regexp_replace(F.col("_line"), r"#.*$", ""),
        r"(?i)^\s*crawl-delay\s*:\s*([0-9]+(?:\.[0-9]+)?)\s*$",
        1,
    )
    return (
        robots.select(host_col, line)
        # ANSI mode: cast('') throws — nullify the non-match sentinel first
        .select(
            host_col,
            F.when(val == "", None).otherwise(val).cast("double").alias("_d"),
        )
        .where(F.col("_d").isNotNull())
        .groupBy(host_col)
        .agg(F.max("_d").alias("crawl_delay_s"))
    )
