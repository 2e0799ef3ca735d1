"""Web-corpus hygiene operators: URL canonicalization, URL-level dedup,
per-domain representation caps, and within-document line dedup — the
Common-Crawl curation steps that act on the URL/page structure rather than
the text statistics (the structural complement of the QC rule cascade,
reference analog: the per-read name/coordinate handling around
``lq_utils.py:141-196`` lifted to the web-page identity space).

All JVM-side column expressions (regexp/array higher-order functions, no
Python): canonicalization and line dedup are pure maps fused into the scan
stage; ``domain_cap`` is the only operator here with a shuffle (by domain).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window, functions as F

# Query parameters commonly injected for click tracking; stripping them is
# the single highest-yield URL canonicalization for crawl dedup (the same
# page is re-crawled under thousands of distinct tracking URLs).
_TRACKING_PARAMS = r"utm_[^=&]*|gclid|fbclid|ref|mc_cid|mc_eid"


def canonical_url_expr(col: str = "url") -> Column:
    """Canonical form of a URL, as a chain of JVM regexp rewrites (each
    step mirrors 1:1 into ANSI/DuckDB ``regexp_replace`` for oracle
    parity):

    1. strip the ``#fragment`` (never part of page identity);
    2. rewrite ``?`` → ``?&`` so EVERY query param is ``&``-prefixed —
       this makes the tracking strip position-independent (a tracking
       param in first position would otherwise leave a dangling ``&``);
    3. strip tracking query params (``utm_*``, ``gclid``, ...);
    4. collapse the ``?&`` seam back to ``?`` and drop a trailing
       ``?``/``&`` (query emptied entirely);
    5. lowercase the scheme+host (case-insensitive per RFC 3986) while
       leaving the path's case alone;
    6. drop a trailing ``/``.

    Pure map — at 10^12 docs this fuses into the scan stage (no shuffle,
    stays in whole-stage codegen)."""
    return _canonicalize(F.col(col))


def _canonicalize(u: Column) -> Column:
    """The :func:`canonical_url_expr` normalization chain over an arbitrary
    Column expression (shared with the declared-canonical identity path of
    :func:`canonical_collapse`, so both identity sources live in one
    normalized space)."""
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, r"\?", "?&")
    u = F.regexp_replace(u, r"&(" + _TRACKING_PARAMS + r")=[^&]*", "")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"[?&]$", "")
    head = F.lower(F.regexp_extract(u, r"^[^/]*//[^/?#]*", 0))
    tail = F.regexp_replace(u, r"^[^/]*//[^/?#]*", "")
    u = F.when(head == "", u).otherwise(F.concat(head, tail))
    return F.regexp_replace(u, r"/$", "")


def domain_expr(col: str = "url") -> Column:
    """Registrable-host approximation: the URL's host with any ``www.``
    prefix dropped (a full public-suffix-list parse needs a lookup table;
    for corpus capping the host is the operative grain)."""
    return F.regexp_extract(F.lower(F.col(col)), r"^[a-z]+://(?:www\.)?([^/?#:]+)", 1)


def url_dedup(
    df: DataFrame, url_col: str = "url", key_col: str = "doc_id"
) -> DataFrame:
    """URL-level exact dedup AFTER canonicalization: one row per canonical
    URL, deterministic min-key winner (the same winner rule as every other
    dedup here, so policies compose). The canonical column is kept as
    ``canonical_url`` for lineage.

    Scale: hash-groupBy-equivalent window on the canonical string — one
    shuffle keyed by it; partial row_number state is one counter per key.

    NULL-url rows are NOT duplicates of each other: they pass through
    unchanged (canonical_url NULL) instead of collapsing into one window
    group that silently keeps a single winner.
    """
    out = df.withColumn("canonical_url", canonical_url_expr(url_col))
    keyed = out.filter(F.col(url_col).isNotNull())
    nulls = out.filter(F.col(url_col).isNull())
    w = Window.partitionBy("canonical_url").orderBy(key_col)
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .unionByName(nulls)
    )


def domain_cap(
    df: DataFrame,
    cap: int,
    url_col: str = "url",
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-domain representation cap: keep at most ``cap`` documents per
    domain, chosen by a deterministic md5 priority over the key (NOT crawl
    order — crawl order over-samples a site's front section). The standard
    anti-over-representation step of web-corpus construction: without it a
    handful of mega-domains dominate the token budget.

    Scale: one shuffle keyed by domain. A mega-domain is the built-in skew
    case, but the per-row window state is a single counter and the LITERAL
    cap bound means every row with rank > cap is dropped in the same stage
    — output per partition is bounded by cap × domains-in-partition, so
    the skew cost is scan-side only (AQE can split the oversized input
    partition; nothing quadratic exists to guard).
    → original columns + ``domain``.

    Rows with no parseable domain (NULL url or a non-URL string) have no
    identity to cap on: they pass through uncapped rather than being
    lumped into one pseudo-domain that silently drops all but ``cap``."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    out = df.withColumn("domain", domain_expr(url_col))
    has_dom = F.col("domain").isNotNull() & (F.col("domain") != "")
    keyed = out.filter(has_dom)
    rest = out.filter(~has_dom)  # has_dom is never NULL: isNotNull() anchors it
    w = Window.partitionBy("domain").orderBy(
        F.md5(F.concat(F.lit("domcap#"), F.col(key_col).cast("string")).cast("binary")),
        F.col(key_col),
    )
    return (
        keyed.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
        .unionByName(rest)
    )


def dedup_lines_expr(text_col: str = "text") -> Column:
    """Within-document line dedup, first occurrence wins — the cheap,
    shuffle-free sibling of global line dedup (C4 does the global variant;
    within-doc removes the nav/footer boilerplate repeated inside a page).
    ``array_distinct`` preserves first-occurrence order in Spark; the
    DuckDB oracle reproduces it with a min-ordinality window."""
    return F.array_join(F.array_distinct(F.split(F.col(text_col), r"\n")), "\n")


def clean_lines_expr(
    text_col: str = "text",
    min_words: int = 5,
    require_terminal: bool = True,
    drop_javascript: bool = True,
) -> Column:
    """C4's LINE-level heuristic filter (Raffel et al. 2020 §2.2), as one
    pure JVM expression: keep only lines that (a) end in a terminal
    punctuation mark (``.`` ``!`` ``?`` ``"``), (b) carry at least
    ``min_words`` whitespace-separated words, and (c) do not contain the
    word "javascript" (case-insensitive — the classic enable-JS banner
    marker). Surviving lines keep their original order; a page whose every
    line fails becomes ``""`` (the downstream length rule drops it — same
    composability contract as :func:`corpus_line_dedup`); NULL text stays
    NULL (``split``/``filter``/``array_join`` are all NULL-preserving).

    This is the line-grain complement of the DOC-grain Gopher/C4 rule
    cascade in ``pipeline.py`` (reference analog: the per-window mask
    rules of ``lq_utils.py:141-196`` applied at sub-record grain rather
    than whole-record thresholds). Pure map over the split array — fuses
    into the scan stage, no shuffle, stays in whole-stage codegen."""
    if min_words < 1:
        raise ValueError(f"min_words must be >= 1, got {min_words}")

    def _keep(l: Column) -> Column:
        t = F.trim(l)
        cond = F.size(F.split(t, r"\s+")) >= min_words
        if require_terminal:
            cond = cond & t.rlike(r'[.!?"]$')
        if drop_javascript:
            cond = cond & ~F.lower(l).contains("javascript")
        return cond

    return F.array_join(F.filter(F.split(F.col(text_col), r"\n"), _keep), "\n")


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    min_sentences: int = 3,
    require_terminal: bool = True,
    drop_javascript: bool = True,
    drop_lorem_ipsum: bool = True,
    drop_braces: bool = True,
) -> DataFrame:
    """The full C4 page-cleaning stage: PAGE-drop gates on the raw text
    (any page containing "lorem ipsum" — placeholder boilerplate — or a
    ``{`` — source code — is removed whole, before any line is touched,
    exactly as C4 applies them to the page source), then the line filter
    of :func:`clean_lines_expr`, then the page-level minimum-sentence gate
    (``min_sentences`` sentences COUNTED ON THE CLEANED TEXT via terminal
    punctuation — a page left with fewer than 3 sentences after line
    cleaning is dropped). NULL-text rows pass every gate untouched (the
    NULL-identity rule of the whole hygiene funnel).

    Scale: three chained narrow filters + one map — no shuffle anywhere,
    predicate order cheapest-first so the contains() gates prune before
    the per-line regex work; Catalyst fuses all of it into the scan."""
    if min_sentences < 0:
        raise ValueError(f"min_sentences must be >= 0, got {min_sentences}")
    orig = F.col(text_col)
    page_ok = F.lit(True)
    if drop_lorem_ipsum:
        page_ok = page_ok & ~F.lower(orig).contains("lorem ipsum")
    if drop_braces:
        page_ok = page_ok & ~orig.contains("{")
    out = df.filter(orig.isNull() | page_ok)
    out = out.withColumn(
        text_col,
        clean_lines_expr(
            text_col,
            min_words=min_words,
            require_terminal=require_terminal,
            drop_javascript=drop_javascript,
        ),
    )
    if min_sentences > 0:
        n_sent = F.length(F.regexp_replace(F.col(text_col), r"[^.!?]", ""))
        out = out.filter(F.col(text_col).isNull() | (n_sent >= min_sentences))
    return out


def corpus_line_dedup(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """C4-style GLOBAL boilerplate-line removal: drop every line that
    occurs in ``min_docs``-or-more *distinct* documents (nav bars, cookie
    banners, footers — the lines whose corpus frequency, not their
    within-doc repetition, marks them as boilerplate), preserving the
    original order of the surviving lines. Documents whose every line is
    boilerplate survive with empty text (the downstream length rule drops
    them — policy stays composable). ``sep`` sets the dedup grain: the
    default ``"\\n"`` is the C4 line rule; ``"\\n\\n"`` dedups whole
    PARAGRAPHS (the coarser cut some pipelines prefer — a paragraph must
    repeat verbatim across ``min_docs`` docs to be dropped, so partial
    rewrites survive). Reference analog: the corpus-level
    over-represented-sequence cut of ``lq_utils.py:141-196``'s masking
    stage, lifted from read k-mers to page lines.

    Scale (the heavy path — this is the one web-hygiene op that must see
    every line twice). The text itself NEVER moves through a shuffle:

    1. hash every line (``md5`` — never the line string: shuffle rows are
       16-byte keys; md5 so the SAME key is computable in the DuckDB
       oracle, and 128 bits so collisions cannot silently drop a good
       line) and ``array_distinct`` WITHIN the doc, map-side — so the
       distinct-doc count is a plain partial-aggregating ``count`` (each
       doc contributes a line once by construction; no countDistinct
       expand, and within-doc repeats never reach the exchange);
    2. the heavy set (count >= min_docs) is a tiny fraction of distinct
       lines — the equi-join against it is broadcast-able and AQE picks
       that up at runtime; no all-pairs path exists;
    3. collect each doc's OWN heavy hashes (``collect_list`` of 16-byte
       hashes — only heavy MEMBERSHIPS shuffle, never line text), join
       the per-doc set back, and drop the doc's boilerplate lines with a
       map-side ``filter`` over the split array. First-occurrence order
       is preserved by construction, documents with no heavy line skip
       the rewrite entirely, and the reassembly shuffle of a naive
       explode→anti-join→collect_list plan (ALL line text through one
       exchange) never exists.
    """
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    sep_re = _sep_regex(sep)
    lines = _doc_line_hashes(df, text_col, key_col, sep_re)
    heavy = (
        lines.groupBy("_lh")
        # one row per (doc, line) by construction → plain count IS the
        # distinct-doc count, with full map-side partial aggregation
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_lh")
    )
    return _drop_heavy_lines(df, lines, heavy, text_col, key_col, sep_re, sep)


def _sep_regex(sep: str) -> str:
    """F.split takes a REGEX; quote the literal separator (paragraph mode's
    "\\n\\n" is regex-safe, but quoting keeps any literal sep correct)."""
    if not sep:
        raise ValueError("sep must be a non-empty literal separator")
    return "".join(re.escape(c) for c in sep)


def _doc_line_hashes(
    df: DataFrame, text_col: str, key_col: str, sep_re: str
) -> DataFrame:
    """(key, _lh): one row per DISTINCT line per doc — hashes computed and
    deduped map-side (``array_distinct`` of 16-byte md5s), so downstream
    counts are plain partial-agg counts and within-doc repeats never reach
    an exchange."""
    return df.select(
        F.col(key_col),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.split(F.col(text_col), sep_re),
                    lambda l: F.md5(l.cast("binary")),
                )
            )
        ).alias("_lh"),
    )


def _drop_heavy_lines(
    df: DataFrame,
    lines: DataFrame,
    heavy: DataFrame,
    text_col: str,
    key_col: str,
    sep_re: str,
    sep: str,
) -> DataFrame:
    """Remove each doc's lines whose hash is in ``heavy`` — text never
    shuffles: collect each doc's OWN heavy hashes (only heavy MEMBERSHIPS
    move), join the per-doc set back, filter the split array map-side
    (first-occurrence order by construction)."""
    doc_heavy = (
        lines.join(heavy, "_lh")
        .groupBy(key_col)
        .agg(F.collect_list("_lh").alias("_heavy"))
    )
    return _rewrite_drop_doc_heavy(df, doc_heavy, text_col, key_col, sep_re, sep)


def _rewrite_drop_doc_heavy(
    df: DataFrame,
    doc_heavy: DataFrame,
    text_col: str,
    key_col: str,
    sep_re: str,
    sep: str,
) -> DataFrame:
    """The rewrite half of heavy-line removal: ``doc_heavy`` is
    ``(key, _heavy: array<line_md5>)`` for docs that have any line to
    drop; everything else passes through untouched (shared by the global
    and the host-scoped strippers so the NULL/empty policy cannot
    drift)."""
    return (
        df.join(doc_heavy, key_col, "left")
        # NULL text stays NULL (a missing payload is not an empty page); a
        # doc with no heavy line (NULL _heavy) keeps its text untouched; a
        # non-null doc whose every line was boilerplate becomes ""
        .withColumn(
            text_col,
            F.when(
                F.col(text_col).isNull(), F.lit(None).cast("string")
            )
            .when(F.col("_heavy").isNull(), F.col(text_col))
            .otherwise(
                F.array_join(
                    F.filter(
                        F.split(F.col(text_col), sep_re),
                        lambda l: ~F.array_contains(
                            F.col("_heavy"), F.md5(l.cast("binary"))
                        ),
                    ),
                    sep,
                )
            ),
        )
        .drop("_heavy")
    )


def host_boilerplate_strip(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    key_col: str = "doc_id",
    min_frac: float = 0.5,
    min_pages: int = 4,
    sep: str = "\n",
) -> DataFrame:
    """HOST-scoped boilerplate-line removal: drop a line from a host's
    pages when it appears on at least ``min_frac`` of that host's pages
    (hosts with fewer than ``min_pages`` pages are left alone — a
    2-page host would call half its content boilerplate). The host-local
    complement of :func:`corpus_line_dedup`: a site's own header, nav
    and footer lines repeat on most of ITS pages while staying below
    any global ``min_docs`` threshold on a big corpus — and conversely
    a fractional per-host rule is self-normalizing (no absolute count
    to retune as a host grows).

    Same scale shape as the global rule (and the same map-side
    machinery): line text never shuffles — 16-byte md5 line hashes are
    deduped within the doc map-side, counted per (host, hash) with
    plain partial-agg counts, thresholded against the host's page count
    (one small host-grain aggregate), and removed by a map-side array
    filter. NULL text/host rows pass through untouched.

    Reference analog: the per-sample (not per-run) adapter/overrep cut
    of ``lq_utils.py:141-196`` — the contaminant is defined relative to
    its OWN group's frequency, not the corpus's.
    """
    if not 0 < min_frac <= 1:
        raise ValueError(f"min_frac must be in (0, 1], got {min_frac}")
    sep_re = _sep_regex(sep)
    lines = df.where(F.col(host_col).isNotNull()).select(
        F.col(host_col),
        F.col(key_col),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.split(F.col(text_col), sep_re),
                    lambda l: F.md5(l.cast("binary")),
                )
            )
        ).alias("_lh"),
    )
    pages = (
        df.where(F.col(host_col).isNotNull() & F.col(text_col).isNotNull())
        .groupBy(host_col)
        .agg(F.count(F.lit(1)).alias("_np"))
    )
    heavy = (
        lines.groupBy(host_col, "_lh")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .join(pages, host_col)
        .where(
            (F.col("_np") >= min_pages)
            & (F.col("_nd") >= F.col("_np") * min_frac)
        )
        .select(host_col, "_lh")
    )
    doc_heavy = (
        lines.join(heavy, [host_col, "_lh"])
        .groupBy(key_col)
        .agg(F.collect_list("_lh").alias("_heavy"))
    )
    return _rewrite_drop_doc_heavy(df, doc_heavy, text_col, key_col, sep_re, sep)


def line_doc_counts(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Per-line distinct-document counts — the COMMITTABLE state of global
    line dedup: (line_md5, n_docs), one row per distinct line. Persist a
    run's counts (``lineage.write_line_counts`` buckets them by line_md5)
    and later batches get the C4 line rule against the WHOLE history via
    :func:`incremental_line_dedup` without rescanning the corpus. ``sep``
    must match at probe time (same contract as the LSH index params)."""
    return (
        _doc_line_hashes(df, text_col, key_col, _sep_regex(sep))
        .groupBy(F.col("_lh").alias("line_md5"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


def incremental_line_dedup(
    batch: DataFrame,
    committed_counts: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Cross-run GLOBAL line dedup: drop from the NEW batch every line whose
    distinct-doc count across committed history + this batch reaches
    ``min_docs`` — the line-grain member of the incremental family
    (``incremental_dedup`` = exact payloads, ``incremental_neardup`` = LSH
    near-dups). A re-crawl inherits the corpus's accumulated boilerplate
    knowledge (nav bars seen in run 1 are cut from run 2's docs even if
    only one run-2 doc carries them) with ZERO corpus rescan.

    ``committed_counts`` is a (line_md5, n_docs) table from
    :func:`line_doc_counts` / ``lineage.write_line_counts`` built with the
    SAME ``sep``. Committed documents are immutable (their already-written
    text is not retroactively edited — the standard incremental-pipeline
    trade-off); to advance history, union this batch's
    ``line_doc_counts`` into the store (sum n_docs per line_md5 —
    log-structured, compact like the band index).

    Scale: batch lines are hashed/deduped map-side; the count lookup is an
    equi-join on the 16-byte key where the committed side read from a
    line_md5-bucketed table arrives pre-partitioned (zero committed-side
    exchange — only the batch shuffles); the drop is the same
    text-never-shuffles filter as :func:`corpus_line_dedup`. Reference
    analog: cross-chunk accumulated masking state (``longQC.py:299-389`` +
    ``lq_utils.py:141-196``)."""
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    sep_re = _sep_regex(sep)
    lines = _doc_line_hashes(batch, text_col, key_col, sep_re)
    batch_counts = lines.groupBy("_lh").agg(F.count(F.lit(1)).alias("_nb"))
    heavy = (
        batch_counts.join(
            committed_counts.select(
                F.col("line_md5").alias("_lh"), F.col("n_docs").alias("_nc")
            ),
            "_lh",
            "left",
        )
        .filter(F.col("_nb") + F.coalesce(F.col("_nc"), F.lit(0)) >= min_docs)
        .select("_lh")
    )
    return _drop_heavy_lines(batch, lines, heavy, text_col, key_col, sep_re, sep)


def latest_crawl(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    key_col: str = "doc_id",
) -> DataFrame:
    """Snapshot dedup: one row per CANONICAL url — the newest fetch wins
    (max ``ts_col``, ties broken by min ``key_col`` so the winner is
    deterministic). The standard Common-Crawl multi-snapshot collapse:
    a page re-fetched across monthly crawls contributes its freshest
    capture only. Keeps ``canonical_url`` for lineage.

    Scale: ONE shuffle keyed by the canonical string; per-key window
    state is a single running rank counter, so a hot URL costs scan-side
    skew only (nothing quadratic).

    NULL-url rows have no page identity: they pass through unchanged
    (canonical_url NULL) rather than collapsing into one group whose
    single newest row silently wins."""
    out = df.withColumn("canonical_url", canonical_url_expr(url_col))
    keyed = out.filter(F.col(url_col).isNotNull())
    nulls = out.filter(F.col(url_col).isNull())
    w = Window.partitionBy("canonical_url").orderBy(
        F.col(ts_col).desc(), F.col(key_col).asc()
    )
    return (
        keyed.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
        .unionByName(nulls)
    )


def host_expr(col: str = "url") -> Column:
    """The URL's host, lowercased, ``www.`` kept (suffix matching handles
    it); NULL for NULL/non-URL strings (empty extract → NULL)."""
    h = F.regexp_extract(F.lower(F.col(col)), r"^[a-z]+://([^/?#:]+)", 1)
    return F.when(h == "", None).otherwise(h)


def blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    key_col: str = "doc_id",
    entry_col: str = "entry",
    max_labels: int = 10,
    keep_blocked: bool = False,
) -> DataFrame:
    """UT1-style domain-blocklist filter with SUFFIX semantics: a page is
    blocked when its host equals a blocklist entry or is a subdomain of one
    (``a.b.spam.com`` matches entry ``spam.com``; ``notspam.com`` does NOT —
    matching is per dot-separated label, never substring). The standard
    adult/malware/spam domain-exclusion stage of web-corpus construction
    (the reference's exclude-list skip F9, ``lq_utils.py``-style read-name
    sets, lifted to the domain hierarchy).

    Spark-first scale shape: suffix match is not an equi-join, so each host
    is EXPLODED into its dot-suffixes (``a.b.c.com`` → ``a.b.c.com``,
    ``b.c.com``, ``c.com`` — bounded fan-out ≤ ``max_labels``), which turns
    the match into a plain equi-join on the suffix string. The blocklist
    side is aggregated to distinct entries and broadcast (UT1-scale lists —
    millions of domains — broadcast comfortably; beyond that the same
    explode keys a shuffle equi-join, no semantics change). The corpus side
    is one projection + generate + one hash-join probe: no corpus shuffle,
    no per-row Python.

    NULL/non-URL rows have no host identity and pass through as KEPT
    (module NULL-passthrough policy). ``keep_blocked=True`` inverts the
    selection (audit: which docs WERE blocked).
    → original columns (the match itself is the semi/anti join predicate).
    """
    labels = F.split(host_expr(url_col), r"\.")
    n = F.size(labels)
    # suffixes: join(labels[i:], '.') for i in 0..min(n,max_labels)-1
    sufs = F.transform(
        F.sequence(F.lit(1), F.least(n, F.lit(max_labels))),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )
    entries = blocklist.select(
        F.lower(F.col(entry_col)).alias("_bl_suffix")
    ).distinct()
    hosted = df.withColumn("_suffixes", sufs)
    probe = (
        hosted.filter(F.col("_suffixes").isNotNull())
        .select(F.col(key_col).alias("_bl_key"), F.explode("_suffixes").alias("_bl_suffix"))
        .join(F.broadcast(entries), "_bl_suffix")
        .select(F.col("_bl_key").alias(key_col))
        .distinct()
    )
    how = "left_semi" if keep_blocked else "left_anti"
    return hosted.drop("_suffixes").join(probe, key_col, how)


def score_drift(
    ref: DataFrame,
    cur: DataFrame,
    score_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Population-stability-index (PSI) drift between two crawl snapshots'
    score distributions — the quality-score monitoring a production filter
    pipeline runs per crawl to catch upstream shifts (scraper change, spam
    wave) before they move the keep/drop rate. Web analog of the
    reference's per-batch QC summary histograms compared release-over-
    release (``lq_nanopore.py:294-314`` time-bin series).

    Bins are ``n_bins`` equal-width buckets over the REFERENCE snapshot's
    [min, max] (current-snapshot values clamp into the edge bins, so new
    out-of-range mass is visible in bins 0/n-1); shares are smoothed at
    1e-6 before the log so empty bins stay finite. Deterministic and
    oracle-exact: bin edges derive from two aggregates, no quantile sketch.

    Scale: one min/max aggregate on the reference (2 values, broadcast
    back via a 1-row cross-join — stays a lazy plan, no driver collect),
    then one groupBy(bin) per side — partial-agg shuffles of ≤ ``n_bins``
    rows each. NULL scores carry no signal and are filtered from both
    sides.

    → ``(bin, lo, hi, share_ref, share_cur, psi_term)`` ordered by bin;
    ``sum(psi_term)`` is the PSI (rule of thumb: <0.1 stable, >0.25 major
    shift). All floats rounded to 6 dp for cross-engine hash parity.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    s = F.col(score_col)
    edges = ref.filter(s.isNotNull()).agg(
        F.min(s.cast("double")).alias("_lo"), F.max(s.cast("double")).alias("_hi")
    )

    def binned(df: DataFrame, side: str) -> DataFrame:
        x = F.col(score_col).cast("double")
        width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
        raw = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
            F.floor((x - F.col("_lo")) / width)
        )
        b = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw)).cast("int")
        return (
            df.filter(F.col(score_col).isNotNull())
            .crossJoin(F.broadcast(edges))
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias(f"_n_{side}"))
        )

    a, b = binned(ref, "ref"), binned(cur, "cur")
    allbins = ref.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    counts = (
        allbins.join(a, "bin", "left").join(b, "bin", "left")
        .select(
            "bin",
            F.coalesce("_n_ref", F.lit(0)).alias("_n_ref"),
            F.coalesce("_n_cur", F.lit(0)).alias("_n_cur"),
        )
    )
    # unpartitioned window is safe here: `counts` is exactly n_bins rows.
    # Guarded division: an empty/all-NULL side yields NULL shares, not an
    # ANSI DIVIDE_BY_ZERO (the threshold_sweep/classification_curve rule).
    tot = Window.partitionBy()
    tot_r, tot_c = F.sum("_n_ref").over(tot), F.sum("_n_cur").over(tot)
    share_r = F.when(tot_r > 0, F.col("_n_ref") / tot_r)
    share_c = F.when(tot_c > 0, F.col("_n_cur") / tot_c)
    # smooth, round BEFORE the log so both engines take ln of the identical
    # 6-dp value (cross-engine hash parity)
    sm_r = F.round(F.greatest(share_r, F.lit(1e-6)), 6)
    sm_c = F.round(F.greatest(share_c, F.lit(1e-6)), 6)
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    return (
        counts.crossJoin(F.broadcast(edges))
        .select(
            "bin",
            F.round(F.col("_lo") + F.col("bin") * width, 6).alias("lo"),
            F.round(F.col("_lo") + (F.col("bin") + 1) * width, 6).alias("hi"),
            F.round(share_r, 6).alias("share_ref"),
            F.round(share_c, 6).alias("share_cur"),
            F.round((sm_c - sm_r) * F.log(sm_c / sm_r), 6).alias("psi_term"),
        )
        .orderBy("bin")
    )


def snapshot_novelty(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-crawl-day novelty: for each fetch day, how many fetches were
    the FIRST-ever capture of their canonical URL (novelty_frac = share
    of the day's fetches that grew the corpus vs re-crawled known pages)
    — the crawl-health time series a snapshot scheduler watches, the web
    analog of the reference's per-time-bin yield series
    (``lq_nanopore.py:294-314``).

    Scale: one window shuffle keyed by canonical url (rank of each fetch
    within its url's history), then an ordinary partial-agg rollup by
    day. → ``(crawl_day:string, n_fetches, n_novel, novelty_frac)``."""
    # NULL urls have no page identity (module NULL-passthrough policy): a
    # NULL-identity fetch can never be a "re-crawl of a known page", so each
    # one ranks in its OWN partition via a per-row key surrogate and counts
    # as novel — instead of all NULL fetches collapsing into one partition
    # where only the first would count.
    ident = F.coalesce(
        canonical_url_expr(url_col),
        F.concat(F.lit("\x00null\x00"), F.col(key_col).cast("string")),
    )
    out = df.withColumn("canonical_url", ident)
    w = Window.partitionBy("canonical_url").orderBy(
        F.col(ts_col).asc(), F.col(key_col).asc()
    )
    return (
        out.withColumn("_rk", F.row_number().over(w))
        .groupBy(F.date_format(ts_col, "yyyy-MM-dd").alias("crawl_day"))
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.count_if(F.col("_rk") == 1).alias("n_novel"),
            F.round(
                F.count_if(F.col("_rk") == 1) / F.count(F.lit(1)), 6
            ).alias("novelty_frac"),
        )
        .orderBy("crawl_day")
    )


# ---------------------------------------------------------------------------
# Block-level boilerplate extraction (justext-lite), robots opt-out gate,
# and per-language adaptive thresholds — round-4g additions
# ---------------------------------------------------------------------------

# Block boundaries: the structural HTML elements that delimit visually
# separate text blocks (jusText's "paragraph" unit). <br> is a boundary
# too (self-closing, so it gets its own alternative without the "/?").
_BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|td|th|li|h[1-6]|article|section|table|tr|ul|ol|"
    r"blockquote|header|footer|nav|aside|main|figure|figcaption|dd|dt|dl)"
    r"[^>]*>|<br[^>]*>"
)
_SCRIPT_STYLE_COMMENT_RE = (
    r"(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->"
)
# \b after <a: without it <abbr>/<address>/<audio> would start a
# pseudo-anchor running to the next </a> and inflate link density
_ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"
_INLINE_TAG_RE = r"<[^>]*>"

# Order matters: named entities first, &amp; LAST so that a double-escaped
# "&amp;lt;" correctly resolves to "&lt;" (html.unescape semantics for the
# core five + nbsp). Mirrored verbatim in the DuckDB oracle.
_ENTITY_CHAIN: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def _unescape_entities(c: Column) -> Column:
    for ent, ch in _ENTITY_CHAIN:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _html_string(df: DataFrame, html_col: str) -> Column:
    """The html column as a string: ``binary`` columns are UTF-8 decoded,
    string columns pass through (both shapes appear in the wild; the CC
    fixture stores binary per the input contract)."""
    from pyspark.sql import types as T

    if isinstance(df.schema[html_col].dataType, T.BinaryType):
        return F.decode(F.col(html_col), "UTF-8")
    return F.col(html_col).cast("string")


def block_extract(
    df: DataFrame,
    html_col: str = "html",
    text_col: str = "text",
    min_words: int = 2,
    max_link_density: float = 0.5,
) -> DataFrame:
    """jusText-lite BLOCK-level boilerplate removal (Pomikalek 2011): split
    the page into text blocks at structural-tag boundaries, score each
    block by word count and LINK DENSITY (chars of anchor text / chars of
    block text), and keep only content-like blocks — the navigation bars,
    footers and link farms that a flat tag-strip (``with_extracted_text``)
    leaves in are dropped here because their text is mostly anchor text.

    Surviving blocks are whitespace-normalized, entity-unescaped, and
    re-joined with ``\\n`` in page order. NULL html stays NULL (module
    NULL-identity policy). Reference analog: the masked-region extraction
    of ``lq_utils.py:141-196`` — sub-record grain selection by a local
    quality statistic, transplanted from read windows to DOM blocks.

    Scale: one pure JVM map (split + higher-order filter/transform), no
    Python, no shuffle — fuses into the scan stage like the other hygiene
    expressions, so it composes with ``c4_clean``/``corpus_line_dedup``
    at zero extra exchanges."""
    if min_words < 1:
        raise ValueError(f"min_words must be >= 1, got {min_words}")
    if not 0.0 <= max_link_density <= 1.0:
        raise ValueError(f"max_link_density must be in [0,1], got {max_link_density}")

    s = F.regexp_replace(_html_string(df, html_col), _SCRIPT_STYLE_COMMENT_RE, " ")
    blocks = F.split(s, _BLOCK_SPLIT_RE)

    def _plain(b: Column) -> Column:
        # tag-stripped, single-spaced, trimmed block text (PRE-entity form:
        # word counts and the link-density ratio both use this so the two
        # sides of the ratio are measured on the same string)
        return F.trim(
            F.regexp_replace(F.regexp_replace(b, _INLINE_TAG_RE, " "), r"\s+", " ")
        )

    def _link_chars(b: Column) -> Column:
        return F.coalesce(
            F.aggregate(
                F.regexp_extract_all(b, F.lit(_ANCHOR_RE), 1),
                F.lit(0),
                lambda acc, x: acc + F.length(_plain(x)),
            ),
            F.lit(0),
        )

    def _keep(b: Column) -> Column:
        p = _plain(b)
        return (
            (p != "")
            & (F.size(F.split(p, " ")) >= min_words)
            & (_link_chars(b) <= F.lit(max_link_density) * F.length(p))
        )

    extracted = F.array_join(
        F.transform(F.filter(blocks, _keep), lambda b: _unescape_entities(_plain(b))),
        "\n",
    )
    return df.withColumn(
        text_col, F.when(F.col(html_col).isNull(), None).otherwise(extracted)
    )


# A robots meta opt-out: <meta name="robots" content="... noindex|none|
# noai|noimageai ...">, attributes in either order, any quoting. RE2- and
# Java-regex-compatible (no backrefs/lookaround) so the DuckDB oracle can
# run the IDENTICAL pattern.
_OPTOUT_TOKENS = r"(?:noindex|none|noai|noimageai)"
_OPTOUT_META_RE = (
    r"(?is)<meta[^>]*"
    r"(?:name\s*=\s*['\"]?robots\b[^>]*content\s*=\s*['\"]?[^'\">]*\b"
    + _OPTOUT_TOKENS
    + r"\b"
    r"|content\s*=\s*['\"]?[^'\">]*\b" + _OPTOUT_TOKENS + r"\b[^'\">]*['\"]?[^>]*"
    r"name\s*=\s*['\"]?robots\b)"
    r"[^>]*>"
)


def optout_expr(df: DataFrame, html_col: str = "html") -> Column:
    """Boolean: the page carries a robots/AI opt-out meta tag (``noindex``,
    ``none``, ``noai``, ``noimageai``) — the consent signal a responsible
    crawl-curation pipeline must honor before any text reaches training.
    NULL html → NULL (caller decides the NULL policy; the filter below
    passes them through, consistent with the module's NULL-identity rule)."""
    return _html_string(df, html_col).rlike(_OPTOUT_META_RE)


def robots_optout_filter(
    df: DataFrame, html_col: str = "html", keep_opted_out: bool = False
) -> DataFrame:
    """Drop pages whose html carries a robots/AI opt-out meta tag (or keep
    ONLY them with ``keep_opted_out=True``, for audit). NULL html passes the
    default filter (no page, no signal — same NULL-identity contract as the
    other hygiene gates).

    Scale: a pure JVM rlike over the (already-scanned) html column — a
    narrow scan-fused filter, no shuffle; at crawl scale this is the
    cheapest possible placement (drop before extraction, so opted-out pages
    never pay the extract/QC cost)."""
    flag = optout_expr(df, html_col)
    if keep_opted_out:
        return df.filter(flag)
    return df.filter(F.col(html_col).isNull() | ~flag)


def per_lang_thresholds(
    df: DataFrame,
    thresholds: dict[str, tuple[int, int, float]],
    default: tuple[int, int, float] = (200, 100_000, 0.30),
    lang_col: str = "lang",
    text_col: str = "text",
    keep_col: str | None = None,
) -> DataFrame:
    """CCNet-style PER-LANGUAGE adaptive QC thresholds: each language gets
    its own (min_chars, max_chars, max_symbol_frac) cutoffs — what counts
    as "too short" or "too symbol-heavy" differs by script (a 200-char
    Chinese page carries several times the content of a 200-char German
    one), so one global threshold either over-prunes dense scripts or
    under-prunes sparse ones. Languages absent from ``thresholds`` (and
    NULL lang) fall back to ``default``; NULL text passes (NULL-identity).

    ``keep_col=None`` filters; a name instead ANNOTATES with the boolean
    (for calibration sweeps). symbol_frac = non-alphanumeric-non-space
    chars / total chars.

    Scale: the thresholds dim is a handful of literal rows — broadcast
    hash join against it, then a scan-fused JVM predicate; no shuffle on
    the corpus side. Reference analog: the per-platform threshold presets
    of the rule cascade (``lq_nanopore.py`` vs ``lq_sequel.py`` defaults),
    keyed here by language instead of sequencer platform."""
    for lang, t in thresholds.items():
        if len(t) != 3:
            raise ValueError(f"thresholds[{lang!r}] must be (min_chars, max_chars, max_symbol_frac)")
    spark = df.sparkSession
    rows = [(k, int(v[0]), int(v[1]), float(v[2])) for k, v in sorted(thresholds.items())]
    dim = spark.createDataFrame(
        rows, "_thr_lang string, _min_chars int, _max_chars int, _max_symbol_frac double"
    )
    joined = df.join(
        F.broadcast(dim), F.col(lang_col) == F.col("_thr_lang"), "left"
    )
    n = F.length(F.col(text_col))
    # Unicode letter/number classes, not ASCII — a CJK character is a
    # letter, not a "symbol" (the whole point of per-language thresholds);
    # \p{L}\p{N} parse identically in Java regex and DuckDB's RE2.
    sym = F.length(F.regexp_replace(F.col(text_col), r"[\p{L}\p{N}\s]", ""))
    keep = (
        (n >= F.coalesce(F.col("_min_chars"), F.lit(int(default[0]))))
        & (n <= F.coalesce(F.col("_max_chars"), F.lit(int(default[1]))))
        & (
            sym
            <= F.coalesce(F.col("_max_symbol_frac"), F.lit(float(default[2])))
            * F.greatest(n, F.lit(1))
        )
    )
    keep = F.col(text_col).isNull() | keep
    dim_cols = ("_thr_lang", "_min_chars", "_max_chars", "_max_symbol_frac")
    if keep_col is not None:
        return joined.withColumn(keep_col, keep).drop(*dim_cols)
    return joined.filter(keep).drop(*dim_cols)


def extract_anchors(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    min_text_chars: int = 1,
) -> DataFrame:
    """Anchor-text corpus extraction (the MassiveWeb-style signal: the
    text OTHER pages' links carry is a labeled summary of the target —
    Rae et al. 2021 use anchor text as a first-class training stream):
    every ``<a ...>text</a>`` on the page becomes one output row
    ``(url, href, anchor_text, anchor_pos)``, in page order, with the
    anchor text tag-stripped, whitespace-normalized, and entity-unescaped
    the same way :func:`block_extract` treats block text. Anchors whose
    cleaned text is shorter than ``min_text_chars`` are dropped (icon/
    image links); href is NULL for ``<a>`` without one. NULL html rows
    produce no anchors (explode of an empty array).

    Scale: regexp_extract_all + posexplode — a pure JVM map followed by a
    generator, no shuffle; output cardinality is the page's anchor count
    (bounded by page bytes), so the stage scales with input bytes like
    the other extraction maps."""
    if min_text_chars < 0:
        raise ValueError(f"min_text_chars must be >= 0, got {min_text_chars}")
    s = F.regexp_replace(_html_string(df, html_col), _SCRIPT_STYLE_COMMENT_RE, " ")
    # full <a ...>...</a> elements, page order; group 1 = attrs, group 2 = body
    full = F.regexp_extract_all(s, F.lit(r"(?is)<a\b([^>]*)>(.*?)</a>"), 0)

    def _clean(x: Column) -> Column:
        return _unescape_entities(
            F.trim(
                F.regexp_replace(F.regexp_replace(x, _INLINE_TAG_RE, " "), r"\s+", " ")
            )
        )

    exploded = df.select(
        url_col, F.posexplode_outer(full).alias("anchor_pos", "_a")
    ).filter(F.col("_a").isNotNull())
    href = F.regexp_extract(
        F.col("_a"), r"(?is)<a\b[^>]*\bhref\s*=\s*['\"]?([^'\"\s>]+)", 1
    )
    body = F.regexp_extract(F.col("_a"), r"(?is)<a\b[^>]*>(.*?)</a>", 1)
    out = exploded.select(
        url_col,
        F.when(href == "", None).otherwise(href).alias("href"),
        _clean(body).alias("anchor_text"),
        "anchor_pos",
    )
    return out.filter(F.length("anchor_text") >= min_text_chars)


# <link rel="canonical" href="..."> — attribute order varies in the wild;
# both orders handled, any quoting; href captured up to quote/space/>.
# Java∩RE2-compatible (mirrors into DuckDB for oracle parity).
# rel is a space-separated TOKEN LIST per the HTML spec ("alternate
# canonical" is valid), and attribute names can be hyphenated (data-rel=
# must NOT match): the value alternatives accept a quoted token list
# containing the word canonical or the bare unquoted token, and both
# attribute names require a preceding whitespace so -rel/-href never match.
_REL_VAL = r"(?:\"[^\"]*\bcanonical\b[^\"]*\"|'[^']*\bcanonical\b[^']*'|canonical\b)"
_REL_CANONICAL_RE = (
    r"(?is)<link\b(?:[^>]*\srel\s*=\s*" + _REL_VAL + r"[^>]*"
    r"\shref\s*=\s*['\"]?([^'\"\s>]+)"
    r"|[^>]*\shref\s*=\s*['\"]?([^'\"\s>]+)['\"]?[^>]*"
    r"\srel\s*=\s*" + _REL_VAL + r")"
)


def declared_canonical_expr(df: DataFrame, html_col: str = "html") -> Column:
    """The page's SELF-DECLARED canonical URL (``<link rel="canonical"
    href=...>``), RAW as written, or NULL when absent — the strongest
    URL-identity signal a crawl gets: the site itself says which of its
    alias URLs is the real page, cutting across tracking params, mirrors,
    and pagination variants that syntactic canonicalization can't see.
    Attribute order and quoting both vary in the wild; both forms and
    rel token lists ("alternate canonical") are matched; hyphenated
    attributes (data-rel=) are not. NULL html → NULL. Callers that USE
    the value as an identity must resolve + normalize it first — that is
    :func:`canonical_collapse`'s job, not this extractor's."""
    s = F.regexp_replace(_html_string(df, html_col), _SCRIPT_STYLE_COMMENT_RE, " ")
    rel_first = F.regexp_extract(s, _REL_CANONICAL_RE, 1)
    href_first = F.regexp_extract(s, _REL_CANONICAL_RE, 2)
    out = F.when(rel_first != "", rel_first).when(href_first != "", href_first)
    return out  # otherwise NULL


def canonical_collapse(
    df: DataFrame,
    url_col: str = "url",
    key_col: str = "doc_id",
    html_col: str = "html",
) -> DataFrame:
    """URL dedup that HONORS the page's declared canonical: the page
    identity is ``coalesce(resolved+normalized declared rel-canonical,
    syntactic canonical url)``, one deterministic min-key winner per
    identity — so the thousand tracking-URL aliases of one article
    collapse even when their fetch URLs share no syntactic form, exactly
    as the site requested.

    The declared href is entity-unescaped, RESOLVED against the fetch URL
    (absolute used as-is; ``//host/…`` gets the fetch scheme; ``/path``
    gets the fetch origin; any other relative form is IGNORED — a bare
    ``href="/"`` must not collapse every site's homepage into one global
    identity), and then passed through the SAME normalization chain as
    the syntactic fallback (:func:`canonical_url_expr`) so declared and
    syntactic identities live in one normalized space — a declared
    ``https://A.com/article/`` and an undeclared fetch of
    ``https://a.com/article`` collapse as they should.

    The identity is kept as ``canonical_url`` for lineage; rows with
    neither a usable declaration nor a parseable URL pass through
    uncollapsed (NULL-identity rule — each rides its own surrogate window
    key, same single-scan shape as :func:`snapshot_novelty`).

    Scale: one pure-map identity derivation fused into the scan, then the
    same single hash-window shuffle as ``url_dedup`` — the declared
    canonical ADDS no exchange, it only improves the key."""
    decl = _unescape_entities(declared_canonical_expr(df, html_col))
    scheme = F.regexp_extract(F.col(url_col), r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    origin = F.regexp_extract(F.col(url_col), r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    resolved = (
        F.when(decl.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), decl)
        .when(decl.startswith("//") & (scheme != ""), F.concat(scheme, F.lit(":"), decl))
        .when(decl.startswith("/") & ~decl.startswith("//") & (origin != ""), F.concat(origin, decl))
    )
    ident = F.coalesce(_canonicalize(resolved), canonical_url_expr(url_col))
    surrogate = F.coalesce(
        ident, F.concat(F.lit("\x00null\x00"), F.col(key_col).cast("string"))
    )
    out = df.withColumn("canonical_url", ident)
    w = Window.partitionBy(surrogate).orderBy(key_col)
    return out.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


_TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
_META_DESC_RE = (
    r"(?is)<meta\b(?:[^>]*\sname\s*=\s*['\"]?description\b[^>]*"
    r"\scontent\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^'\"\s>]+))"
    r"|[^>]*\scontent\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^'\"\s>]+))[^>]*"
    r"\sname\s*=\s*['\"]?description\b)"
)


def page_meta_exprs(df: DataFrame, html_col: str = "html") -> dict[str, Column]:
    """Page-metadata extraction: ``title`` (the <title> element's text,
    tag-stripped / whitespace-normalized / entity-unescaped like block
    text) and ``meta_description`` (the <meta name="description">
    content, either attribute order, any quoting) — the two page-level
    signals quality classifiers and SERP-style dedup keys lean on.
    NULL html → NULL; absent element → NULL.

    Returns {name: Column} so callers select exactly what they need; both
    are pure JVM regexp maps that fuse into the scan (zero shuffle)."""
    s = F.regexp_replace(_html_string(df, html_col), _SCRIPT_STYLE_COMMENT_RE, " ")
    title_raw = F.regexp_extract(s, _TITLE_RE, 1)
    title = _unescape_entities(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(title_raw, _INLINE_TAG_RE, " "), r"\s+", " "
            )
        )
    )
    # six capture groups: 1-3 = name-first (dquote/squote/bare), 4-6 =
    # content-first; coalesce on the empty-string sentinel regexp_extract
    # returns for a non-participating group
    descs = [F.regexp_extract(s, _META_DESC_RE, i) for i in range(1, 7)]
    desc_raw = None
    for d in descs:
        desc_raw = d if desc_raw is None else F.when(desc_raw != "", desc_raw).otherwise(d)
    desc = _unescape_entities(F.trim(F.regexp_replace(desc_raw, r"\s+", " ")))
    return {
        "title": F.when(title != "", title),
        "meta_description": F.when(desc != "", desc),
    }


def with_page_meta(
    df: DataFrame, html_col: str = "html", prefix: str = ""
) -> DataFrame:
    """Annotate with ``title`` and ``meta_description`` (see
    :func:`page_meta_exprs`); ``prefix`` namespaces the output columns."""
    cols = page_meta_exprs(df, html_col)
    out = df
    for name, c in cols.items():
        out = out.withColumn(prefix + name, c)
    return out


def anchor_targets(
    anchors: DataFrame,
    href_col: str = "href",
    text_col: str = "anchor_text",
    src_col: str = "url",
    min_sources: int = 1,
) -> DataFrame:
    """Target-side rollup of an anchor corpus (:func:`extract_anchors`
    output): per linked-to ``href`` → ``(href, n_anchors, n_sources,
    top_text, top_text_n)`` where ``top_text`` is the most common anchor
    string pointing at the target (count ties broken by binary text order, so the
    rollup is deterministic) — the MassiveWeb TARGET view: what the web
    collectively calls a page, usable as a training caption or a
    retrieval label for documents that were never fetched.

    ``n_sources`` counts distinct linking pages; self-referential rows
    with a NULL href are dropped. Two keyed aggregates (text-grain then
    target-grain) — both partial-aggregating counts; no joins.

    Reference analog: the per-target pileup rollup of the reference's
    coverage join (``lqmap.c:140-205`` — many query reads voting on one
    target region), with anchor strings as the votes."""
    a = anchors.where(F.col(href_col).isNotNull())
    per_text = a.groupBy(href_col, text_col).agg(F.count(F.lit(1)).alias("_n"))
    top = per_text.groupBy(href_col).agg(
        F.max(
            F.struct(
                F.col("_n"),
                # struct max: count first, then binary text order — on
                # equal counts the lexicographically LAST text wins,
                # a deterministic (re-run-stable) tie-break
                F.col(text_col),
            )
        ).alias("_top")
    )
    per_target = a.groupBy(href_col).agg(
        F.count(F.lit(1)).alias("n_anchors"),
        F.count_distinct(F.col(src_col)).alias("n_sources"),
    )
    # both sides are keyed on href — same hash partitioning, no extra
    # exchange beyond the two aggregates themselves
    return (
        per_target.join(top, href_col)
        .select(
            href_col,
            F.col("n_anchors").cast("bigint").alias("n_anchors"),
            F.col("n_sources").cast("bigint").alias("n_sources"),
            F.col("_top._n").cast("bigint").alias("top_text_n"),
            F.col(f"_top.{text_col}").alias("top_text"),
        )
        .where(F.col("n_sources") >= min_sources)
    )


def snapshot_churn(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
) -> DataFrame:
    """Per-host churn between two crawl snapshots → ``(host, n_old,
    n_new, n_refetched, n_changed, n_added, n_gone, churn)``.

    ``churn`` = changed ÷ re-fetched (NULL when nothing was re-fetched)
    — the empirical page-change rate that sets a host's re-crawl
    cadence (high churn → schedule sooner via
    ``frontier.frontier_next`` priorities; near-zero churn → the host's
    snapshot can be trusted across crawls, and ``latest_crawl``'s
    newest-wins collapse loses nothing). ``n_added``/``n_gone`` are the
    URL-set deltas — the growth/decay complement the novelty metric
    tracks corpus-wide.

    One full-outer join keyed by URL + one host aggregate. Duplicate
    URLs within a snapshot should be collapsed first (``latest_crawl``)
    — the join is URL-identity; NULL urls are dropped (no identity to
    compare)."""
    from .psl import host_expr

    o = old.where(F.col(url_col).isNotNull()).select(
        F.col(url_col).alias("_u"), F.col(digest_col).alias("_do")
    )
    n = new.where(F.col(url_col).isNotNull()).select(
        F.col(url_col).alias("_u"), F.col(digest_col).alias("_dn")
    )
    j = o.join(n, "_u", "full_outer").select(
        host_expr("_u").alias("host"), "_do", "_dn"
    )
    both = F.col("_do").isNotNull() & F.col("_dn").isNotNull()
    return (
        j.groupBy("host")
        .agg(
            F.count_if(F.col("_do").isNotNull()).alias("n_old"),
            F.count_if(F.col("_dn").isNotNull()).alias("n_new"),
            F.count_if(both).alias("n_refetched"),
            F.count_if(both & (F.col("_do") != F.col("_dn"))).alias("n_changed"),
            F.count_if(F.col("_do").isNull()).alias("n_added"),
            F.count_if(F.col("_dn").isNull()).alias("n_gone"),
        )
        .withColumn(
            "churn",
            F.when(
                F.col("n_refetched") > 0,
                F.round(F.col("n_changed") / F.col("n_refetched"), 6),
            ),
        )
        .orderBy("host")
    )


def url_skeleton_expr(col: str = "url") -> Column:
    """The URL's TEMPLATE identity — host + path with every digit run
    folded to ``N`` + the SORTED query-param NAME set (values dropped) —
    so ``/cal/2024?sess=a9`` and ``/cal/2025?sess=k2`` share one
    skeleton. This is the grain at which crawler traps live: a calendar
    or session-ID pattern mints unbounded distinct URLs from one
    template while serving near-identical content. Pure JVM
    regexp/array chain (scan-fused, each step mirrors 1:1 into DuckDB
    for oracle parity); NULL for hostless/NULL input."""
    u = F.col(col)
    host = host_expr(col)
    path = F.regexp_replace(
        F.regexp_extract(u, r"^[a-z]+://[^/?#]+([^?#]*)", 1), r"[0-9]+", "N"
    )
    q = F.regexp_extract(u, r"\?([^#]*)", 1)
    names = F.array_join(
        F.array_sort(
            F.transform(
                F.split(q, "&"), lambda x: F.regexp_replace(x, "=.*$", "")
            )
        ),
        "&",
    )
    skel = F.concat(
        host, path, F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), names))
    )
    return F.when(host.isNull(), None).otherwise(skel)


def crawler_traps(
    df: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
    min_urls: int = 10,
    max_content_ratio: float = 0.2,
) -> DataFrame:
    """Detect URL-template explosions → ``(skeleton, n_urls, n_digests,
    content_ratio, is_trap)``, one row per skeleton with ``>= min_urls``
    distinct URLs.

    A trap skeleton mints many distinct URLs that serve few distinct
    payloads (``content_ratio = n_digests / n_urls <=
    max_content_ratio``): session-ID params, calendar pages, print/sort
    permutations. Feed the trap rows to :func:`trap_filter` to cut the
    pattern out of the frontier — the classic crawl defense, applied
    corpus-side from the evidence the crawl already paid for.

    Three CASCADING partial-agg shuffles on narrowing grains
    (skeleton+url → skeleton+digest → skeleton), deliberately NOT
    ``countDistinct`` twice in one agg (that plans an Expand that
    doubles the shuffle volume). Duplicate fetches of one URL collapse
    to their min digest first, so re-crawls don't inflate counts."""
    g = (
        df.select(
            url_skeleton_expr(url_col).alias("skeleton"),
            F.col(url_col).alias("_u"),
            F.col(digest_col).alias("_d"),
        )
        .where(F.col("skeleton").isNotNull())
        .groupBy("skeleton", "_u")
        .agg(F.min("_d").alias("_d"))
    )
    gd = g.groupBy("skeleton", "_d").agg(F.count("*").alias("_nu"))
    return (
        gd.groupBy("skeleton")
        .agg(
            F.sum("_nu").alias("n_urls"),
            F.count("*").alias("n_digests"),
        )
        .where(F.col("n_urls") >= min_urls)
        .select(
            "skeleton",
            "n_urls",
            "n_digests",
            F.round(F.col("n_digests") / F.col("n_urls"), 6).alias("content_ratio"),
            (F.col("n_digests") / F.col("n_urls") <= max_content_ratio).alias(
                "is_trap"
            ),
        )
    )


def trap_filter(
    df: DataFrame,
    traps: DataFrame,
    url_col: str = "url",
    keep_trapped: bool = False,
) -> DataFrame:
    """Cut every URL whose skeleton is a detected trap (``is_trap``
    rows of :func:`crawler_traps`) — the frontier/corpus gate that stops
    a calendar or session-ID pattern from eating the crawl budget.
    Broadcast-able anti-join on the skeleton (trap tables are tiny —
    template-grain, not URL-grain); ``keep_trapped=True`` returns the
    flagged slice instead (audit view). NULL-skeleton rows (hostless
    input) pass through the anti-join untouched, matching every other
    hygiene gate's NULL-identity rule."""
    t = traps.where(F.col("is_trap")).select(F.col("skeleton").alias("_t_skel"))
    keyed = df.withColumn("_skel", url_skeleton_expr(url_col))
    out = keyed.join(
        F.broadcast(t),
        keyed["_skel"] == t["_t_skel"],
        "semi" if keep_trapped else "anti",
    )
    return out.drop("_skel")


# ---------------------------------------------------------------------------
# Charset sniffing (WHATWG-style BOM + <meta> prescan)
# ---------------------------------------------------------------------------

# The WHATWG encoding-sniffing algorithm, restricted to the parts that are
# decidable from the payload alone: (1) a BOM wins over everything;
# (2) otherwise a <meta charset=...> / <meta http-equiv=content-type
# content="...charset=..."> declaration inside the first 1024 bytes;
# (3) otherwise the windows-1252 web default. Labels normalize per the
# Encoding Standard (latin1/iso-8859-1/ascii are windows-1252 labels;
# utf8 is a utf-8 label), and a UTF-16 label found by the META prescan is
# remapped to utf-8 (the spec's "if charset is a UTF-16 encoding, set
# charset to UTF-8" rule — readable ASCII markup proves the page is not
# actually UTF-16). Everything is a JVM regexp/CASE chain over the
# latin1-decoded byte prefix: zero shuffle, fuses into the scan.
_BOM_UTF8 = "\u00ef\u00bb\u00bf"  # EF BB BF seen through latin1
_BOM_UTF16BE = "\u00fe\u00ff"  # FE FF
_BOM_UTF16LE = "\u00ff\u00fe"  # FF FE
# one regex covers both declaration shapes: the prescan looks for a charset=
# token anywhere inside a <meta ...> tag (the http-equiv form carries it
# inside the content attribute's value)
_META_CHARSET_RE = r"""(?i)<meta[^>]*charset\s*=\s*["']?\s*([a-zA-Z0-9._:\-]+)"""

# Encoding Standard label → canonical name (the subset that appears in web
# corpora; unknown labels pass through lowercased so the audit column shows
# what was declared)
_CHARSET_LABELS = {
    "utf8": "utf-8",
    "unicode-1-1-utf-8": "utf-8",
    "latin1": "windows-1252",
    "latin-1": "windows-1252",
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
    "cp1252": "windows-1252",
    "x-user-defined": "windows-1252",
}


def _normalize_charset(c: Column) -> Column:
    c = F.lower(c)
    out = c
    for label, canon in _CHARSET_LABELS.items():
        out = F.when(c == label, F.lit(canon)).otherwise(out)
    # META prescan UTF-16 remap (BOM-declared UTF-16 is NOT remapped)
    return F.when(
        out.isin("utf-16", "utf-16le", "utf-16be"), F.lit("utf-8")
    ).otherwise(out)


def charset_sniff_exprs(
    df: DataFrame, html_col: str = "html", prescan_bytes: int = 1024
) -> dict[str, Column]:
    """{bom_charset, meta_charset, charset, charset_conflict} columns.

    ``charset`` follows BOM > meta > windows-1252 default;
    ``charset_conflict`` flags pages whose BOM and meta declaration
    disagree (the mislabeled-page signal a re-decode pass keys on).
    NULL html → all NULL."""
    from pyspark.sql import types as T

    if isinstance(df.schema[html_col].dataType, T.BinaryType):
        s = F.decode(F.col(html_col), "ISO-8859-1")  # lossless byte→char
    else:
        s = F.col(html_col).cast("string")
    head = F.substring(s, 1, prescan_bytes)
    bom = (
        F.when(head.startswith(_BOM_UTF8), "utf-8")
        .when(head.startswith(_BOM_UTF16BE), "utf-16be")
        .when(head.startswith(_BOM_UTF16LE), "utf-16le")
    )
    meta_raw = F.regexp_extract(head, _META_CHARSET_RE, 1)
    meta = F.when(meta_raw != "", _normalize_charset(meta_raw))
    charset = F.when(
        F.col(html_col).isNotNull(),
        F.coalesce(bom, meta, F.lit("windows-1252")),
    )
    conflict = F.when(
        F.col(html_col).isNotNull(),
        bom.isNotNull() & meta.isNotNull() & (bom != meta),
    )
    return {
        "bom_charset": bom,
        "meta_charset": meta,
        "charset": charset,
        "charset_conflict": conflict,
    }


def charset_sniff(
    df: DataFrame, html_col: str = "html", prescan_bytes: int = 1024
) -> DataFrame:
    """Annotate with the :func:`charset_sniff_exprs` columns — the
    fetch-side encoding gate that runs BEFORE text extraction (a page
    decoded with the wrong charset poisons every downstream stat, the
    same reason the mojibake repair pass exists at the text layer)."""
    out = df
    for name, c in charset_sniff_exprs(df, html_col, prescan_bytes).items():
        out = out.withColumn(name, c)
    return out


def ks_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    precision: int = 3,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between two snapshots'
    metric distributions — the distribution-free drift alarm that
    complements :func:`score_drift`'s binned PSI (PSI needs a bin grid
    and misses within-bin shape changes; KS is the sup-norm CDF gap, so
    it catches any distributional move and has known critical values:
    reject same-distribution at α=0.05 when
    ``ks > 1.358*sqrt((n1+n2)/(n1*n2))``).

    → one row ``(ks, n_ref, n_cur)``; ``ks`` rounded to 6 dp.

    Values are quantized to ``precision`` decimals first — that bounds
    the distinct-value grid the CDFs are evaluated on (≤ range·10^p
    points), which is (a) the standard practice for KS on continuous
    scores at scale and (b) what makes the single global window here
    BOUNDED: the per-side counts shuffle is partial-agg (≤ grid-size
    rows), and the cumulative-sum window runs over the grid, never the
    corpus. Exact on the quantized values (no sketch): the sup over grid
    points equals the sup over all reals for step CDFs with jumps only at
    grid points. NULLs carry no distribution mass and are filtered."""
    v = F.round(F.col(value_col).cast("double"), precision)
    a = ref.filter(v.isNotNull()).select(v.alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).alias("na")
    )
    b = cur.filter(v.isNotNull()).select(v.alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).alias("nb")
    )
    grid = a.join(b, "v", "full_outer").select(
        "v",
        F.coalesce("na", F.lit(0)).alias("na"),
        F.coalesce("nb", F.lit(0)).alias("nb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    return (
        grid.select(
            F.sum("na").over(w).alias("ca"),
            F.sum("nb").over(w).alias("cb"),
            F.sum("na").over(wt).alias("ta"),
            F.sum("nb").over(wt).alias("tb"),
        )
        .agg(
            # try_divide: an empty side yields NULL ks, not a divide error
            F.round(
                F.max(
                    F.abs(
                        F.try_divide(F.col("ca"), F.col("ta"))
                        - F.try_divide(F.col("cb"), F.col("tb"))
                    )
                ),
                6,
            ).alias("ks"),
            F.max("ta").alias("n_ref"),
            F.max("tb").alias("n_cur"),
        )
    )


def host_concentration(
    df: DataFrame, url_col: str = "url", top_k: int = 10
) -> DataFrame:
    """Crawl-diversity reading: host-share concentration as HHI
    (Herfindahl-Hirschman index = Σ share², 1/n_hosts for a uniform crawl,
    →1 when one host dominates) plus the top-``top_k`` hosts' combined
    share — the number a crawl operator watches so one CDN or link farm
    doesn't quietly become half the corpus (the corpus-level dual of
    ``domain_cap``). → one row (n_docs, n_hosts, hhi, topk_share).

    Shape: one groupBy(host) partial-agg shuffle; HHI is a plain sum over
    host counts (no sorting); the top-k share is a TakeOrdered over the
    host table (k rows to the driver-side limit, no global sort). NULL /
    hostless URLs carry no share."""
    h = host_expr(url_col)
    hosts = (
        df.select(h.alias("host"))
        .filter(F.col("host").isNotNull() & (F.col("host") != ""))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = hosts.orderBy(F.desc("cnt"), F.asc("host")).limit(top_k)
    totals = hosts.agg(
        F.sum("cnt").alias("n_docs"),
        F.count(F.lit(1)).alias("n_hosts"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("_sq"),
    )
    topsum = top.agg(F.sum("cnt").alias("_topcnt"))
    return totals.crossJoin(topsum).select(
        "n_docs",
        "n_hosts",
        F.round(F.col("_sq") / (F.col("n_docs") * F.col("n_docs")), 6).alias("hhi"),
        F.round(F.col("_topcnt") / F.col("n_docs"), 6).alias("topk_share"),
    )
