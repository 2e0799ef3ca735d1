"""End-to-end training-data curation funnel — the composition a user of the
reference would actually run, as ONE module: cross-run exclusion → QC
keep/drop + scrub → eval-set decontamination → deterministic dataset split →
byte-balanced shard assignment.

Every stage is an operator that already carries its own oracle/tests; this
facade only COMPOSES them (lazily where Spark allows), mirroring how the
reference chains its phases (``longQC.py:299-517``: chunk loop → stats →
filters → report) but over the web-text curation stages a 10^12-doc
training pipeline needs.

Scale notes: exclusion and decontamination are anti-joins whose build sides
are digest/shingle columns (see ``operators.dedup``); QC is the one
mapInPandas pass; the split is a pure expression; sharding adds two small
driver actions (the two-pass prefix sum — ``operators.relational.
assign_shards``). Nothing here introduces a new shuffle beyond the
operators' own documented ones.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, functions as F

from .config import DEFAULT_CONFIG, QCConfig
from .operators.dedup import contamination_check, incremental_dedup
from .operators.relational import assign_shards
from .operators.text import dataset_split_expr
from .pipeline import qc_pipeline

# One-slot registry for the contaminated-key cache (same pattern as
# operators.simsearch, shared via longqc_spark.cache): the decontamination
# shingle explode is the most expensive leg of the funnel, and downstream
# sharding adds two driver actions that would otherwise re-execute it.
# Caching the HIT-KEY table (small: eval-overlap keys only, never
# corpus-sized) makes the shingle pass run exactly once per curate call;
# each call releases the previous call's cache so long-lived sessions stay
# bounded.
from .cache import OneSlotCache

_CONTAM_CACHE = OneSlotCache(lambda df: df.unpersist(False))


def release_contam_cache() -> None:
    """Unpersist any contaminated-key table cached by a prior curate call."""
    _CONTAM_CACHE.release()


def _cached_contaminated(df):
    return _CONTAM_CACHE.put(df.cache())


def web_hygiene(
    docs: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    html_col: str | None = None,
    collapse_snapshots: bool = False,
    ts_col: str = "warc_ts",
    dedup_urls: bool = False,
    dedup_urls_declared: bool = False,
    collapse_mirrors: bool = False,
    mirror_min_shared: int = 2,
    mirror_min_containment: float = 0.5,
    mirror_max_hosts: int = 16,
    domain_cap_n: int | None = None,
    host_boilerplate_frac: float | None = None,
    line_dedup_min_docs: int | None = None,
    blocklist: DataFrame | None = None,
    fix_encoding_passes: int | None = None,
    clean_lines_min_words: int | None = None,
    clean_lines_min_sentences: int = 3,
    scrub_span_window: int | None = None,
    respect_optout: bool = False,
    lang_thresholds: dict | None = None,
    lang_col: str = "lang",
    lang_default: tuple[int, int, float] = (200, 100_000, 0.30),
) -> DataFrame:
    """Stage 0 of the funnel — crawl-level hygiene before any QC work, in
    order: domain blocklist (``blocklist`` — a 1-column ``entry`` table,
    UT1-style suffix semantics; FIRST because it is the cheapest predicate,
    a broadcast probe with no shuffle, so blocked rows never enter the
    window stages), then the robots/AI opt-out gate (``respect_optout`` —
    a scan-fused rlike over the html column; consent gates precede all
    value extraction, see ``robots_optout_filter``), then snapshot collapse (``collapse_snapshots`` — newest
    ``ts_col`` fetch per canonical URL wins) or URL dedup (``dedup_urls`` —
    min-key winner, for single-snapshot inputs), then per-domain
    representation cap (``domain_cap_n``), then ftfy-style encoding repair
    (``fix_encoding_passes`` — cp1252-mojibake fix BEFORE any text-derived
    statistic, so langid/dedup digests/line dedup see repaired bytes; needs
    a real ``text_col``), then per-language adaptive thresholds
    (``lang_thresholds`` — CCNet-style {lang: (min_chars, max_chars,
    max_symbol_frac)} cutoffs with ``lang_default`` fallback, a broadcast-
    dim predicate placed before the per-line regex stages so whole pages
    prune cheaply), then C4's line-level heuristic cleaning
    (``clean_lines_min_words`` — lorem-ipsum/curly-brace page drops,
    terminal-punctuation + min-words + javascript line rules, and the
    ``clean_lines_min_sentences`` page gate, BEFORE global line dedup so
    corpus line counts only ever see rule-eligible lines), then C4-style
    GLOBAL line dedup
    (``line_dedup_min_docs`` — drop lines occurring in that many distinct
    docs corpus-wide; needs a real ``text_col``, so it is incompatible with
    extraction-deferred ``html_col`` inputs), then Lee-et-al duplicated-SPAN
    removal (``scrub_span_window`` — every ``scrub_span_window``-token span
    keeps only its globally-first occurrence, later occurrences' token
    ranges are cut; LAST because it is the heaviest rewrite and should see
    only rows the cheaper stages kept. Rebuilt text is whitespace-normalized
    to single spaces; rows with NULL text pass through untouched; keys
    should be unique by this stage — the earlier URL dedup/collapse stages
    guarantee that on multi-snapshot crawls).

    Shared by ``curate()`` and the CLI (``--collapse-snapshots`` etc.) so
    the gating/order semantics cannot drift between the two entry points.
    """
    from .operators.web import (
        blocklist_filter,
        corpus_line_dedup,
        domain_cap,
        latest_crawl,
        url_dedup,
    )

    src = docs
    if blocklist is not None:
        src = blocklist_filter(src, blocklist, url_col=key_col, key_col=key_col)
    if respect_optout:
        # Right after the blocklist (URL-only probe) and before everything
        # else: a scan-fused rlike over the html column, so opted-out pages
        # never pay extraction, windows, or any text-derived work. Consent
        # gates come before value-extraction gates.
        from .operators.web import robots_optout_filter

        oc = html_col if html_col is not None else "html"
        if oc not in src.columns:
            raise ValueError(
                "respect_optout reads the robots meta from the HTML column; "
                f"no column {oc!r} in the input — pass html_col or drop the flag"
            )
        src = robots_optout_filter(src, html_col=oc)
    if collapse_snapshots:
        src = latest_crawl(src, url_col=key_col, ts_col=ts_col, key_col=key_col)
    elif dedup_urls_declared:
        # URL dedup honoring the page's <link rel=canonical> declaration
        # (falls back to the syntactic canonical where absent) — same
        # single shuffle as dedup_urls, stronger key.
        from .operators.web import canonical_collapse

        oc = html_col if html_col is not None else "html"
        if oc not in src.columns:
            raise ValueError(
                "dedup_urls_declared reads <link rel=canonical> from the "
                f"HTML column; no column {oc!r} in the input — pass "
                "html_col or use dedup_urls"
            )
        src = canonical_collapse(src, url_col=key_col, key_col=key_col, html_col=oc)
    elif dedup_urls:
        src = url_dedup(src, url_col=key_col, key_col=key_col)
    if collapse_mirrors:
        # After URL-grain dedup (page sets should reflect deduped pages)
        # and BEFORE the domain cap — a mirror must not consume cap quota
        # for content its original already holds. Needs text digests, so
        # extraction-deferred html inputs must extract first. The pairs
        # subtree re-reads the hygiene prefix once (pairs output is tiny
        # and broadcast back; see mirror_collapse).
        from .operators.mirror import mirror_collapse, mirror_pairs
        from .operators.psl import host_expr

        if html_col is not None and text_col not in src.columns:
            raise ValueError(
                "collapse_mirrors digests the TEXT column; with an "
                "extraction-deferred html_col run extraction first or drop "
                "the flag"
            )
        tagged = src.withColumn("_mhost", host_expr(key_col)).withColumn(
            "_mdigest", F.md5(F.col(text_col).cast("binary"))
        )
        pairs = mirror_pairs(
            tagged,
            host_col="_mhost",
            digest_col="_mdigest",
            min_shared=mirror_min_shared,
            min_containment=mirror_min_containment,
            max_hosts=mirror_max_hosts,
        )
        src = mirror_collapse(tagged, pairs, host_col="_mhost").drop(
            "_mhost", "_mdigest"
        )
    if domain_cap_n is not None:
        src = domain_cap(src, cap=domain_cap_n, url_col=key_col, key_col=key_col)
    if fix_encoding_passes is not None:
        from .operators.text import fix_mojibake_expr

        if html_col is not None and text_col not in src.columns:
            raise ValueError(
                "fix_encoding_passes repairs the TEXT column; with an "
                "extraction-deferred html_col run extraction first or drop "
                "the flag"
            )
        src = src.withColumn(text_col, fix_mojibake_expr(text_col, fix_encoding_passes))
    if lang_thresholds is not None:
        # After encoding repair (thresholds should see repaired bytes),
        # before the line-grain stages: a broadcast-dim predicate is far
        # cheaper than per-line regex work, so prune whole pages first.
        from .operators.web import per_lang_thresholds

        if html_col is not None and text_col not in src.columns:
            raise ValueError(
                "lang_thresholds measures the TEXT column; with an "
                "extraction-deferred html_col run extraction first or drop "
                "the thresholds"
            )
        if lang_col not in src.columns:
            raise ValueError(
                f"lang_thresholds needs a language column; no column "
                f"{lang_col!r} in the input — run langid first or drop the "
                "thresholds"
            )
        src = per_lang_thresholds(
            src,
            lang_thresholds,
            default=lang_default,
            lang_col=lang_col,
            text_col=text_col,
        )
    if clean_lines_min_words is not None:
        if html_col is not None and text_col not in src.columns:
            raise ValueError(
                "clean_lines_min_words rewrites the TEXT column; with an "
                "extraction-deferred html_col run extraction first or drop "
                "the flag"
            )
        from .operators.web import c4_clean

        src = c4_clean(
            src,
            text_col=text_col,
            min_words=clean_lines_min_words,
            min_sentences=clean_lines_min_sentences,
        )
    if host_boilerplate_frac is not None:
        # Site chrome (per-host nav/footer lines) strips BEFORE the global
        # line rule: host-local boilerplate is self-normalizing (a frac of
        # the host's own pages) and removing it first keeps the global
        # counts about genuinely cross-site lines.
        from .operators.psl import host_expr
        from .operators.web import host_boilerplate_strip

        if html_col is not None and text_col not in src.columns:
            raise ValueError(
                "host_boilerplate_frac rewrites the TEXT column; with an "
                "extraction-deferred html_col run extraction first or drop "
                "the flag"
            )
        src = host_boilerplate_strip(
            src.withColumn("_bhost", host_expr(key_col)),
            host_col="_bhost",
            text_col=text_col,
            key_col=key_col,
            min_frac=host_boilerplate_frac,
        ).drop("_bhost")
    if line_dedup_min_docs is not None:
        if html_col is not None and text_col not in src.columns:
            raise ValueError(
                "line_dedup_min_docs needs an extracted text column; run "
                "extraction first or drop the html_col deferral"
            )
        src = corpus_line_dedup(
            src, text_col=text_col, key_col=key_col, min_docs=line_dedup_min_docs
        )
    if scrub_span_window is not None:
        if html_col is not None and text_col not in src.columns:
            raise ValueError(
                "scrub_span_window rewrites the TEXT column; with an "
                "extraction-deferred html_col run extraction first or drop "
                "the flag"
            )
        from .operators.dedup import scrub_dup_spans

        scrubbed = scrub_dup_spans(
            src.select(key_col, text_col),
            key_col=key_col,
            text_col=text_col,
            window=scrub_span_window,
        ).select(key_col, F.col("text_scrubbed").alias(text_col))
        # left join: NULL-text rows (filtered by the operator) pass through
        # with their NULL intact, matching every other hygiene stage's
        # NULL-identity rule. One equi-join shuffle on the key.
        src = src.drop(text_col).join(scrubbed, key_col, "left")
    return src


def curate(
    docs: DataFrame,
    cfg: QCConfig = DEFAULT_CONFIG,
    key_col: str = "url",
    text_col: str = "text",
    html_col: str | None = None,
    exclude_labels: DataFrame | None = None,
    eval_df: DataFrame | None = None,
    eval_key: str = "eval_id",
    shard_bytes: int | None = None,
    shard_range_width: int | None = None,
    split_fractions: tuple[int, int] = (80, 10),
    collapse_snapshots: bool = False,
    ts_col: str = "warc_ts",
    dedup_urls: bool = False,
    dedup_urls_declared: bool = False,
    collapse_mirrors: bool = False,
    mirror_min_shared: int = 2,
    mirror_min_containment: float = 0.5,
    mirror_max_hosts: int = 16,
    domain_cap_n: int | None = None,
    host_boilerplate_frac: float | None = None,
    line_dedup_min_docs: int | None = None,
    blocklist: DataFrame | None = None,
    fix_encoding_passes: int | None = None,
    clean_lines_min_words: int | None = None,
    clean_lines_min_sentences: int = 3,
    scrub_span_window: int | None = None,
    respect_optout: bool = False,
    lang_thresholds: dict | None = None,
    lang_col: str = "lang",
    lang_default: tuple[int, int, float] = (200, 100_000, 0.30),
    payload_dedup: bool = False,
    payload_score_col: str | None = None,
    payload_dedup_normalize: bool = False,
    neardup_threshold: float | None = None,
    neardup_max_bucket: int | None = 500,
    dedup_scope_col: str | None = None,
    observe: dict | None = None,
) -> DataFrame:
    """documents → curated training rows.

    Stages (each optional input gates its stage):
    0. web hygiene (``operators.web``), in order: domain blocklist
       (``blocklist`` — UT1-style suffix match, broadcast probe), then the
       robots/AI opt-out gate (``respect_optout``), then
       snapshot collapse
       (``collapse_snapshots`` — newest ``ts_col`` fetch per canonical URL
       wins) or URL dedup (``dedup_urls`` — min-key winner, for
       single-snapshot inputs), then mirror-site collapse
       (``collapse_mirrors`` — hosts whose text-digest page sets overlap
       past ``mirror_min_containment`` lose their lexicographically
       larger member wholesale; see ``operators.mirror``), then
       per-domain representation cap
       (``domain_cap_n``), then per-language adaptive thresholds
       (``lang_thresholds`` / ``lang_default`` / ``lang_col``), then C4
       line-level heuristic cleaning
       (``clean_lines_min_words`` / ``clean_lines_min_sentences`` — see
       ``web_hygiene``), then C4-style GLOBAL line dedup
       (``line_dedup_min_docs`` — drop lines occurring in that many
       distinct docs corpus-wide; needs a real ``text_col``, so it is
       incompatible with extraction-deferred ``html_col`` inputs), then
       duplicated-span removal (``scrub_span_window`` — see
       ``web_hygiene``);
    0.5 ``payload_dedup``: within-corpus exact payload dedup — ONE winner
       per (optionally normalized: ``payload_dedup_normalize``) payload
       digest. Winner policy: min ``key_col`` by default, or quality-argmax
       when ``payload_score_col`` names a pre-QC prior (crawl rank,
       fetch-quality score — the QC score itself doesn't exist yet at this
       stage). Same single digest exchange either way
       (``dedup.keep_best_dedup``);
    0.6 ``neardup_threshold``: within-corpus NEAR-dup dedup — MinHash-LSH
       candidate pairs at that estimated-Jaccard threshold → connected
       components → one survivor per cluster (``payload_score_col``-argmax
       if set, else min key — the same keep policy knobs as stage 0.5,
       applied to fuzzy clusters). ``neardup_max_bucket`` is the
       boilerplate star guard (see ``lsh_candidate_pairs``; None disables).
       ``dedup_scope_col`` names a column (crawl dump / snapshot / source)
       that bounds BOTH dedup stages to a per-scope horizon — duplicates
       collapse within a dump only, cross-dump copies survive (the FineWeb
       per-dump finding; ``dedup.scoped_dedup`` /
       ``lsh_candidate_pairs(scope_col=)``);
    1. ``exclude_labels``: incremental cross-run dedup against a committed
       label store (anti-join on its stored ``payload_md5``);
    2. QC: full stat vector + rules + scrub; only ``keep`` rows survive;
    3. ``eval_df``: decontamination — drop docs sharing any 5-token shingle
       with the eval set (broadcast semi-join, zero corpus shuffle);
    4. ``split``: deterministic train/val/test (md5 percent bucket of key);
    5. ``shard_bytes``: byte-balanced ``shard`` ids over scrubbed length
       (two-pass prefix sum, no global window). REQUIRES a numeric key
       column — ``assign_shards`` validates this up front and raises a
       TypeError naming the fix (derive ``xxhash64(url)`` or an id) rather
       than dying in a deep ANSI cast; with the default string ``url`` key,
       leave ``shard_bytes`` unset or supply a numeric key.

    Returns the curated labels (stat vector + scrubbed_text + split
    [+ shard]).

    ``observe``: pass an empty dict to receive per-stage ``Observation``
    handles (keys: input, hygiene, payload_dedup, neardup, exclusion,
    qc_keep, decontam — only the stages that ran). Each records the row
    count LEAVING its stage, riding the funnel's own single execution
    (CollectMetrics nodes — zero extra scans or actions); read
    ``observe[k].get["n"]`` AFTER an action on the returned frame. The
    funnel audit the north-rule's per-stage metric aggregates call for.
    Caveat (documented in lineage.py too): on a runtime-EMPTY input AQE's
    PropagateEmptyRelation can eliminate CollectMetrics nodes — guard with
    the excludedRules conf if empty inputs are expected.
    """

    def _obs(df: DataFrame, tag: str) -> DataFrame:
        if observe is None:
            return df
        from pyspark.sql import Observation

        o = Observation(f"curate-{tag}-{uuid.uuid4().hex[:8]}")
        observe[tag] = o
        return df.observe(o, F.count(F.lit(1)).alias("n"))

    docs = _obs(docs, "input")
    src = web_hygiene(
        docs,
        key_col=key_col,
        text_col=text_col,
        html_col=html_col,
        collapse_snapshots=collapse_snapshots,
        ts_col=ts_col,
        dedup_urls=dedup_urls,
        dedup_urls_declared=dedup_urls_declared,
        collapse_mirrors=collapse_mirrors,
        mirror_min_shared=mirror_min_shared,
        mirror_min_containment=mirror_min_containment,
        mirror_max_hosts=mirror_max_hosts,
        domain_cap_n=domain_cap_n,
        host_boilerplate_frac=host_boilerplate_frac,
        line_dedup_min_docs=line_dedup_min_docs,
        blocklist=blocklist,
        fix_encoding_passes=fix_encoding_passes,
        clean_lines_min_words=clean_lines_min_words,
        clean_lines_min_sentences=clean_lines_min_sentences,
        scrub_span_window=scrub_span_window,
        respect_optout=respect_optout,
        lang_thresholds=lang_thresholds,
        lang_col=lang_col,
        lang_default=lang_default,
    )
    src = _obs(src, "hygiene")
    if payload_dedup:
        from .operators.dedup import keep_best_dedup

        if payload_dedup_normalize and html_col is not None:
            raise ValueError(
                "payload_dedup_normalize normalizes TEXT; with an "
                "extraction-deferred html_col run extraction first or drop "
                "the normalize flag"
            )
        src = keep_best_dedup(
            src,
            payload_score_col,
            key_col=key_col,
            text_col=text_col,
            html_col=html_col,
            normalize=payload_dedup_normalize,
            scope_col=dedup_scope_col,
        )
        src = _obs(src, "payload_dedup")
    if neardup_threshold is not None:
        from .operators.dedup import cluster_keep_best, minhash_jaccard_estimate

        if html_col is not None and text_col not in src.columns:
            raise ValueError(
                "near-dup dedup shingles TEXT; with an extraction-deferred "
                "html_col run extraction first or drop neardup_threshold"
            )
        pairs = minhash_jaccard_estimate(
            src,
            key_col=key_col,
            text_col=text_col,
            threshold=neardup_threshold,
            max_bucket=neardup_max_bucket,
            scope_col=dedup_scope_col,
        )
        src = cluster_keep_best(src, pairs, payload_score_col, key_col=key_col)
        src = _obs(src, "neardup")
    if exclude_labels is not None:
        src = incremental_dedup(
            src, exclude_labels, key_col=key_col, text_col=text_col, html_col=html_col
        )
        src = _obs(src, "exclusion")
    labels = qc_pipeline(
        src, cfg, text_col=text_col, key_cols=[key_col], html_col=html_col
    ).filter(F.col("keep"))
    labels = _obs(labels, "qc_keep")
    if eval_df is not None:
        # shingle the post-exclusion survivors, not the raw batch: in the
        # re-crawl case stage 1 removes most rows, and hits on excluded
        # keys would be computed only to be discarded by the anti-join
        # cached: sharding adds two driver actions downstream; without the
        # cache each would re-run the corpus shingle explode (profiled 3x
        # the decontam cost at 100k docs)
        contaminated = _cached_contaminated(
            contamination_check(
                src, eval_df, key_col=key_col, text_col=text_col, eval_key=eval_key
            ).select(key_col)
        )
        labels = labels.join(F.broadcast(contaminated), key_col, "left_anti")
        labels = _obs(labels, "decontam")
    labels = labels.withColumn(
        "split", dataset_split_expr(key_col, fractions=split_fractions)
    )
    if shard_bytes is not None:
        # shard_range_width=None auto-scales the range table from the key
        # span (bounded driver collect even for xxhash64-derived keys)
        labels = assign_shards(
            labels,
            shard_bytes=shard_bytes,
            bytes_col="n_chars",
            key_col=key_col,
            range_width=shard_range_width,
        )
    return labels


def curate_from_labels(
    labels: DataFrame,
    eval_df: DataFrame | None = None,
    eval_key: str = "eval_id",
    key_col: str = "url",
    text_col: str = "scrubbed_text",
    shard_bytes: int | None = None,
    split_fractions: tuple[int, int] = (80, 10),
) -> DataFrame:
    """Committed labels store → curated training export (stages 3-5 of the
    funnel, for the lineage workflow where stages 1-2 — exclusion + QC —
    already ran under ``run_qc_with_lineage`` and sit in a resumable,
    audited label store).

    Decontamination shingles the SCRUBBED text by default — the bytes a
    training run would actually consume — so eval contamination surviving
    the scrub is still caught. A non-numeric ``key_col`` gets a
    deterministic ``shard_key = xxhash64(key)`` derived for sharding (the
    auto-scaled range table keeps the driver collect bounded; see
    ``assign_shards``); split stays on the original key, so split
    assignment is stable under re-sharding.

    Reference analog: the post-filter emit phase (``longQC.py:499-517``)
    where surviving reads are written for downstream use — here with the
    split/shard structure a 10^12-doc training pipeline needs.
    """
    from pyspark.sql import types as T

    out = labels.filter(F.col("keep"))
    if eval_df is not None:
        # contamination_check shingles one text_col name on both sides;
        # the eval set's text column (conventionally "text") is aliased to
        # the labels-side name
        ev = eval_df
        if text_col not in ev.columns and "text" in ev.columns:
            ev = ev.select(F.col(eval_key), F.col("text").alias(text_col))
        contaminated = _cached_contaminated(
            contamination_check(
                out, ev, key_col=key_col, text_col=text_col, eval_key=eval_key
            ).select(key_col)
        )
        out = out.join(F.broadcast(contaminated), key_col, "left_anti")
    out = out.withColumn("split", dataset_split_expr(key_col, fractions=split_fractions))
    if shard_bytes is not None:
        skey = key_col
        rw = None
        if not isinstance(out.schema[key_col].dataType, T.NumericType):
            out = out.withColumn("shard_key", F.xxhash64(key_col))
            skey = "shard_key"
            # The derived key is xxhash64 output, so its span IS the int64
            # domain: pass the width auto-scaling would derive (domain /
            # target_ranges) instead of letting assign_shards probe min/max
            # with an extra driver action. Shard assignment is range_width-
            # invariant (property-pinned in test_relational), so this only
            # removes a job, never changes a shard id.
            rw = 1 << 48
        out = assign_shards(
            out, shard_bytes=shard_bytes, bytes_col="n_chars", key_col=skey,
            range_width=rw,
        )
    return out


def funnel_counts(observe: dict) -> dict:
    """Turn a ``curate(observe=...)`` dict into the audit summary a run
    report wants: ordered ``{stage: {"n": rows_leaving, "dropped":
    rows_removed_by_stage}}``. Call AFTER an action on the curated frame
    (each ``Observation.get`` blocks until its metrics exist). Stage order
    is the funnel's; stages that didn't run are absent.
    """
    order = (
        "input",
        "hygiene",
        "payload_dedup",
        "neardup",
        "exclusion",
        "qc_keep",
        "decontam",
    )
    out: dict = {}
    prev = None
    for stage in order:
        if stage not in observe:
            continue
        n = int(observe[stage].get["n"])
        out[stage] = {"n": n, "dropped": (prev - n) if prev is not None else 0}
        prev = n
    return out
