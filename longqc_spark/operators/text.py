"""Text-analysis operators over a documents table.

Web-text analogs of the reference's per-record scalar kernels (§2.4): token
counting (M1), character-class quality signals (M2), document fingerprinting
(the minimizer idea, ``lqmap.c:236`` — min-hash of k-gram windows as a
1-value sketch), and language-ID (M4-shaped scoring) as a Spark stage usable
outside the full pipeline.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..models import langid_model


def token_stats(df: DataFrame, key_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token/char counts + quality ratios, all JVM-side (codegen)."""
    toks = F.split(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "), " ")
    alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    digits = F.length(F.regexp_replace(F.col(text_col), r"[^0-9]", ""))
    return df.select(
        F.col(key_col),
        F.length(text_col).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        (alpha / F.greatest(F.length(text_col), F.lit(1))).alias("alpha_frac"),
        (digits / F.greatest(F.length(text_col), F.lit(1))).alias("digit_frac"),
        (F.length(text_col) / F.greatest(F.size(toks), F.lit(1))).alias("chars_per_token"),
    )


def doc_fingerprint(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text", ngram: int = 5
) -> DataFrame:
    """Min-hash fingerprint: md5 over every word ``ngram``, keep the minimum —
    a 1-row sketch identifying near-identical docs cheaply (minimizer analog).
    md5 (not xxhash) so a DuckDB oracle can reproduce it exactly."""
    arr = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    n = F.size(arr)
    # guard: F.sequence(1, 0) would generate a DESCENDING [1, 0] — docs with
    # fewer than `ngram` tokens must yield an empty gram list instead
    grams = F.when(
        n >= ngram,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(ngram - 1)),
            lambda i: F.md5(F.array_join(F.slice(arr, i, ngram), " ").cast("binary")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(key_col),
        F.array_min(grams).alias("fingerprint"),
    ).filter(F.col("fingerprint").isNotNull())


def langid_table(df: DataFrame, key_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc language prediction (fastText-analog scorer) as a standalone
    stage — Arrow-batched, broadcast-free (model rebuilt per worker from
    embedded seeds, the `-d` index-reuse analog)."""
    out_schema = T.StructType(
        [
            df.schema[key_col],
            T.StructField("lang_pred", T.StringType()),
            T.StructField("lang_score", T.DoubleType()),
        ]
    )

    def compute(batches):
        lid = langid_model()
        for pdf in batches:
            preds, margins = lid.score_batch(pdf[text_col].fillna("").str.slice(0, 512))
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col].to_numpy(),
                    "lang_pred": preds,
                    "lang_score": margins,
                }
            )

    return df.select(key_col, text_col).mapInPandas(compute, schema=out_schema)


def hash_priority_sample(
    df: DataFrame, n: int, key_col: str = "doc_id", seed: int = 7, oracle_safe: bool = False
) -> DataFrame:
    """Deterministic, parallel-stable top-n sample (replaces the reference's
    scan-order reservoir, ``lq_utils.py:371-411`` — SURVEY.md §2.5 SA1):
    priority = hash(key, seed), take the n smallest. Same marginal
    distribution as a uniform sample, identical on any partitioning.

    ``oracle_safe`` uses md5-of-string priority (reproducible in DuckDB);
    the default uses xxhash64 (cheaper, JVM-side)."""
    if oracle_safe:
        prio = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(str(seed))).cast("binary"))
    else:
        prio = F.xxhash64(F.col(key_col), F.lit(seed))
    return (
        df.withColumn("prio", prio)
        .orderBy("prio", key_col)
        .limit(n)
        .drop("prio")
    )


def stratified_hash_sample(
    df: DataFrame,
    n_per_stratum: int,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 7,
    oracle_safe: bool = False,
) -> DataFrame:
    """Deterministic stratified sample: the n smallest hash-priorities WITHIN
    each stratum (``sampleBy`` with exact per-stratum counts instead of
    fractions, and parallel-stable like ``hash_priority_sample``). One
    window per stratum partition — a single hash-partition shuffle; no
    global sort, no driver involvement (the reference's per-platform
    subsampling, ``longQC.py:390-396``, done per key group)."""
    from pyspark.sql import Window

    if oracle_safe:
        prio = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(str(seed))).cast("binary"))
    else:
        prio = F.xxhash64(F.col(key_col), F.lit(seed))
    w = Window.partitionBy(stratum_col).orderBy("prio", key_col)
    return (
        df.withColumn("prio", prio)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("prio", "_rn")
    )


def weighted_priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str = "n_chars",
    key_col: str = "doc_id",
    seed: int = 11,
) -> DataFrame:
    """Weight-proportional deterministic sample — priority sampling
    (Duffield-Lund-Thorup): each record gets priority q = u / w where u is a
    deterministic per-key uniform and w its weight; the k SMALLEST
    priorities win, so inclusion probability rises with weight. The
    quality-weighted subset selection a training-data pipeline uses to
    up-sample high-value documents, as a drop-in sibling of
    ``hash_priority_sample`` (reference reservoir analog,
    ``lq_utils.py:371-411``).

    Exactness across engines: u is the first 8 md5 hex digits as an integer
    (reproducible in DuckDB via CAST('0x'||hex AS BIGINT)); q is ONE IEEE
    double division (correctly rounded, so bit-identical in any engine) —
    no transcendental functions. Plan: pure map + TakeOrderedAndProject
    (k rows to the driver, no global sort).

    Zero/NULL weights are excluded up front: a weight-proportional sample
    gives a weightless record probability 0 by definition — and under ANSI
    mode u/0 would otherwise abort the job (NULL would sort FIRST and
    always win, the exact inverse of the contract)."""
    df = df.filter(F.col(weight_col) > 0)
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f"#{seed}")).cast("binary")),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    q = u.cast("double") / F.col(weight_col).cast("double")
    return (
        df.withColumn("_q", q)
        .orderBy("_q", key_col)
        .limit(k)
        .drop("_q")
    )


def vocab_coverage(
    df: DataFrame,
    vocab_size: int = 100,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document out-of-vocabulary stats against the corpus's own top-N
    token vocabulary — the tokenizer-coverage health check (what fraction of
    a candidate corpus would an N-entry vocab explain?).

    Two jobs, both scale-right: (1) the vocab is a partial-agg token count +
    ``TakeOrderedAndProject`` (N rows to the driver — the n50_approx
    pattern); (2) per-doc OOV counting is a PURE MAP — the vocab rides into
    the plan as a literal array (broadcast-by-construction), membership via
    ``array_contains`` inside a JVM higher-order filter, zero shuffle on the
    corpus side (the decontaminate asymmetry, applied to vocabulary).
    → (key, n_tokens, n_oov, oov_frac). NULL text counts as an empty doc
    (n_tokens=0, oov_frac=0) — without the coalesce, size(NULL)=NULL rows
    would silently drop out of downstream averages."""
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda t: t != F.lit(""),
    )
    vocab_rows = (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(vocab_size)
        .collect()
    )
    vocab = F.array(*[F.lit(r["token"]) for r in vocab_rows])
    n_tokens = F.size(toks)
    n_oov = F.size(F.filter(toks, lambda t: ~F.array_contains(vocab, t)))
    return df.select(
        F.col(key_col),
        n_tokens.cast("long").alias("n_tokens"),
        n_oov.cast("long").alias("n_oov"),
        (n_oov / F.greatest(n_tokens, F.lit(1))).alias("oov_frac"),
    )


def normalize_text_expr(text_col: str = "text"):
    """C4-style canonicalization for normalization-aware dedup, all JVM-side:
    lowercase → strip non-alphanumerics → collapse whitespace → trim. Two
    near-identical pages (case/punct/spacing differences) canonicalize to
    the same digest; patterns chosen to evaluate identically under Java
    regex and RE2 (DuckDB), so oracles reproduce the digest exactly."""
    c = F.lower(F.col(text_col))
    c = F.regexp_replace(c, r"[^a-z0-9 \n]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def dataset_split_expr(key_col: str = "doc_id", seed: str = "split", fractions=(80, 10)):
    """Deterministic train/val/test assignment: md5-derived percent bucket
    per key (cross-engine exact — the md5-hex-to-int trick), split at
    ``fractions`` = (train %, val %); remainder is test. The leakage-proof
    split a training pipeline needs: assignment is a pure function of the
    key, stable under any repartitioning or re-run."""
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f"#{seed}")).cast("binary")),
            1,
            8,
        ),
        16,
        10,
    ).cast("long") % 100
    train, val = fractions
    return (
        F.when(u < train, F.lit("train"))
        .when(u < train + val, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def domain_stats(
    labels: DataFrame,
    url_col: str = "url",
    min_docs: int = 5,
    max_drop_rate: float = 0.8,
) -> DataFrame:
    """Per-domain quality rollup + blocklist candidates — the crawl-side
    feedback loop of a web QC pipeline: domains whose documents
    overwhelmingly fail the rules are candidates for skipping at fetch time
    (the reference's per-platform summary rollup, ``longQC.py:390-396``,
    keyed by registrable host instead of platform).

    All JVM-side: host extracted with one regexp from the url (scheme
    case-insensitive and optional, port stripped), partial-agg groupBy
    (domain cardinality ≪ doc cardinality, classic map-side combine).
    → (domain, n_docs, n_keep, keep_rate, avg_perplexity,
    blocklist_candidate) for domains with ≥ ``min_docs``. URLs with no
    parseable host are dropped rather than pooled into a bogus
    empty-string pseudo-domain (which could otherwise surface as an
    unactionable blocklist row).
    """
    # lowercased host: the SAME identity blocklist_filter matches on —
    # case-varying crawl aliases of one domain must aggregate to one row,
    # or a junk domain could split below min_docs and evade the blocklist
    # candidates (and --emit-blocklist would write case-variant entries)
    domain = F.lower(
        F.regexp_extract(
            F.col(url_col), r"(?i)^(?:[a-z][a-z0-9+.-]*://)?([^/:?#]+)", 1
        )
    )
    return (
        labels.withColumn("domain", domain)
        .filter(F.col("domain") != "")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("keep")).alias("n_keep"),
            F.avg(F.col("keep").cast("double")).alias("keep_rate"),
            F.avg("perplexity").alias("avg_perplexity"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .withColumn(
            "blocklist_candidate", (1.0 - F.col("keep_rate")) > max_drop_rate
        )
        .orderBy("domain")
    )


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    n_total: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 23,
) -> DataFrame:
    """Deterministic training-mixture construction: draw ``n_total`` docs
    with per-source quotas ∝ ``weights`` (the data-mixing step every
    LLM pipeline runs — "60% web, 30% code, 10% books"). Within each source
    the md5-priority rule picks the quota's winners, so the mixture is
    stable under repartitioning and re-runs, and composes with the split/
    shard operators downstream.

    One hash-partition shuffle (window per source partition), no global
    sort — the ``stratified_hash_sample`` machinery with per-stratum quotas
    instead of a constant n. Sources absent from ``weights`` contribute
    nothing; a quota larger than a source's row count yields the whole
    source (capped, like any sampler).
    """
    # largest-remainder apportionment: floors first, then the leftover seats
    # go to the largest fractional remainders (name tie-break) — quotas sum
    # EXACTLY to n_total (round() would under/over-shoot on .5 ties: 0.5/0.5
    # at n=25 gives 12+12)
    total_w = sum(weights.values())
    raw = {s: n_total * w / total_w for s, w in weights.items()}
    quotas = {s: int(raw[s]) for s in raw}
    leftover = n_total - sum(quotas.values())
    for s in sorted(raw, key=lambda s: (-(raw[s] - quotas[s]), s))[:leftover]:
        quotas[s] += 1
    return _select_source_quota(df, quotas, source_col, key_col, seed)


def _select_source_quota(
    df: DataFrame,
    quotas: dict[str, int],
    source_col: str,
    key_col: str,
    seed: int,
) -> DataFrame:
    """Per-source md5-priority top-quota selection — the shared engine of
    ``mix_sources`` / ``mix_sources_temperature``. One hash-partition
    shuffle; the literal max-quota rank bound unlocks WindowGroupLimit."""
    from pyspark.sql import Window

    quota_col = F.element_at(
        F.create_map(*[F.lit(x) for kv in quotas.items() for x in kv]),
        F.col(source_col),
    )
    prio = F.md5(
        F.concat(F.col(key_col).cast("string"), F.lit(f"#{seed}")).cast("binary")
    )
    w = Window.partitionBy(source_col).orderBy("_prio", key_col)
    max_q = max(quotas.values(), default=0)
    return (
        df.filter(F.col(source_col).isin(list(quotas)))
        .withColumn("_prio", prio)
        .withColumn("_rn", F.row_number().over(w))
        # the LITERAL max-quota conjunct is what lets Catalyst derive a
        # WindowGroupLimit (partial per-group top-k BEFORE the shuffle —
        # only max_q candidates per source per partition move); the
        # map-lookup quota alone is not a recognizable rank bound, and
        # without the literal ALL selected-source rows would shuffle
        .filter((F.col("_rn") <= F.lit(max_q)) & (F.col("_rn") <= quota_col))
        .drop("_prio", "_rn")
    )


def temperature_quotas(
    mass: dict[str, float],
    caps: dict[str, int],
    n_total: int,
    alpha: float = 0.5,
) -> dict[str, int]:
    """Temperature-smoothed seat apportionment: quota_s ∝ mass_s^alpha
    (mT5/XLM-R multilingual sampling — alpha<1 flattens the source
    distribution so head sources stop drowning tail sources), capped at
    each source's row count with the surplus re-apportioned among the
    uncapped sources until no cap binds (≤ |sources| rounds).

    Seats are assigned by largest remainder over MICRO-QUANTIZED shares
    (``floor(share·1e6 + 0.5)`` — integer floors and remainders), so the
    apportionment is bit-exact across engines: a DuckDB oracle computing
    the same formula lands on the same quotas, with no dependence on
    float-summation order or libm pow rounding at the seat boundary.
    Pure driver-side arithmetic over |sources| entries.
    """
    quotas: dict[str, int] = {}
    remaining = {s for s in mass if caps.get(s, 0) > 0 and mass[s] > 0}
    n_left = n_total
    while remaining and n_left > 0:
        tot = sum(mass[s] ** alpha for s in sorted(remaining))
        rawu = {
            s: int(n_left * (mass[s] ** alpha) / tot * 1_000_000 + 0.5)
            for s in remaining
        }
        q = {s: rawu[s] // 1_000_000 for s in remaining}
        leftover = n_left - sum(q.values())
        for s in sorted(
            remaining, key=lambda s: (-(rawu[s] % 1_000_000), s)
        )[: max(leftover, 0)]:
            q[s] += 1
        over = {s for s in remaining if q[s] > caps[s]}
        if not over:
            quotas.update(q)
            return quotas
        for s in over:
            quotas[s] = caps[s]
            n_left -= caps[s]
        remaining -= over
    return quotas


def mix_sources_temperature(
    df: DataFrame,
    sources: list[str],
    n_total: int,
    alpha: float = 0.5,
    mass_col: str | None = None,
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 23,
) -> DataFrame:
    """Temperature-smoothed training-mixture construction: per-source
    quotas ∝ (source mass)^alpha instead of hand-set weights — the
    mT5-style sampling rule for corpora whose source sizes span orders of
    magnitude (alpha=1 reproduces proportional sampling; alpha→0
    approaches uniform). ``mass_col=None`` weighs sources by doc count;
    a column name (e.g. ``n_chars``) weighs by volume, the unit real
    mixtures are specified in.

    Two stages: (1) one partial-agg shuffle collects |sources| (count,
    mass) rows to the driver — driver-bounded like the IVF centroid
    sample and the shard range table; (2) ``temperature_quotas``
    (micro-quantized largest remainder, cap-and-redistribute) sizes the
    per-source quotas, and the shared md5-priority window selects the
    winners in one more hash-partition shuffle. Deterministic under
    re-runs and repartitioning; composes with split/shard downstream.

    Reference analog: the reference sizes its subsample per input batch
    from observed batch stats before plotting (``lq_nanopore.py:294``);
    here the observed per-source mass sizes the training mixture.
    """
    mass_expr = (
        F.count(F.lit(1)).cast("double")
        if mass_col is None
        else F.sum(F.col(mass_col).cast("double"))
    )
    stats = (
        df.filter(F.col(source_col).isin(list(sources)))
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("_n"), mass_expr.alias("_m"))
        .collect()
    )
    caps = {r[source_col]: int(r["_n"]) for r in stats}
    mass = {r[source_col]: float(r["_m"]) for r in stats}
    quotas = temperature_quotas(mass, caps, n_total, alpha)
    if not quotas:
        return df.filter(F.lit(False))
    return _select_source_quota(df, quotas, source_col, key_col, seed)


def mix_sources_token_budget(
    df: DataFrame,
    budgets: dict[str, int],
    count_col: str = "n_chars",
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 23,
    order_col: str | None = None,
) -> DataFrame:
    """Training-mixture construction by VOLUME budget, not doc count: per
    source, admit md5-priority winners while the running ``count_col`` total
    stays under that source's budget ("2B web tokens, 1B code tokens" — the
    unit every real mixture is specified in, since doc length varies by
    orders of magnitude across sources). A doc is admitted iff the budget
    was not yet exhausted BEFORE it (its own count may overshoot — the
    standard greedy-prefix rule, so the budget is met to within one doc and
    the selection is a deterministic prefix, stable under re-runs and
    repartitioning, composing with split/shard downstream like
    ``mix_sources``).

    One hash-partition shuffle (running-sum window per source, ordered by
    the md5 priority). Unlike the quota rank in ``mix_sources`` the bound is
    data-dependent, so no WindowGroupLimit pre-shuffle cut exists — the
    whole selected-source row set shuffles once and each source partition is
    sorted. At 10^12 docs over a handful of sources that per-source sort is
    the cost; the two-pass range-prefix-sum trick in ``assign_shards``
    (``relational.py``) applies verbatim if a source outgrows a partition —
    kept single-pass here because mixtures are built per-snapshot, where
    sources are the natural partition.

    Rows with a NULL ``count_col`` are excluded (their volume is undefined,
    so they can neither consume budget nor be admitted against it) — the
    running sum skips them and the NULL ``_before`` comparison drops them.

    ``order_col``: QUALITY-RANKED selection instead of the hash lottery —
    the budget is consumed in descending ``order_col`` order (NULLs last,
    md5-priority tie-break), i.e. "take the best docs of each source until
    its token budget is spent", the selection rule quality-filtered
    pipelines actually deploy. Same plan, one extra leading sort key.
    """
    from pyspark.sql import Window

    budget_col = F.element_at(
        F.create_map(*[F.lit(x) for kv in budgets.items() for x in kv]),
        F.col(source_col),
    )
    prio = F.md5(
        F.concat(F.col(key_col).cast("string"), F.lit(f"#{seed}")).cast("binary")
    )
    order = [F.col(order_col).desc_nulls_last()] if order_col else []
    w = Window.partitionBy(source_col).orderBy(*order, "_prio", key_col)
    running = F.sum(F.col(count_col).cast("bigint")).over(w)
    return (
        df.filter(F.col(source_col).isin(list(budgets)))
        .withColumn("_prio", prio)
        .withColumn("_before", running - F.col(count_col).cast("bigint"))
        .filter(F.col("_before") < budget_col)
        .drop("_prio", "_before")
    )


def split_leakage_report(
    df: DataFrame,
    split_col: str,
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """Cross-split contamination audit: texts whose (normalized) digest
    appears in MORE THAN ONE dataset split — the eval-integrity check run
    after any split assignment (a val/test doc with a train-side twin leaks
    the answer). The md5-percent split rule is leakage-proof only per KEY;
    distinct keys carrying duplicate payloads still straddle splits, which
    is exactly what this surfaces (and why dedup must precede splitting).

    Two partial-agg groupBys, both keyed on the digest (one exchange — the
    second groupBy is over ≤ |distinct digests| rows, and the final global
    rollup is a 1-row agg). → one row:
    (n_leaky_texts, n_docs_in_leaky, n_cross_split_excess) where excess =
    docs outside each leaky digest's majority split (the minimum deletions
    that would confine every text to one split; computed max-first so a
    50/50 straddle counts half).
    """
    digest = (
        F.md5(normalize_text_expr(text_col).cast("binary"))
        if normalize
        else F.md5(F.col(text_col).cast("binary"))
    )
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(digest.alias("_digest"), F.col(split_col).alias("_split"))
        # HashPartitioning(_digest) satisfies ClusteredDistribution for BOTH
        # downstream groupBys ((digest,split) then (digest)) — one exchange
        .repartition(F.col("_digest"))
    )
    per_digest_split = base.groupBy("_digest", "_split").agg(
        F.count(F.lit(1)).alias("_n")
    )
    # rows of per_digest_split are already distinct (digest,split) pairs, so
    # a plain count IS the distinct-split count (no countDistinct expand)
    per_digest = per_digest_split.groupBy("_digest").agg(
        F.count(F.lit(1)).alias("_n_splits"),
        F.sum("_n").alias("_n_docs"),
        F.max("_n").alias("_n_major"),
    )
    leaky = per_digest.filter(F.col("_n_splits") > 1)
    return leaky.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_leaky_texts"),
        F.coalesce(F.sum("_n_docs"), F.lit(0)).cast("bigint").alias("n_docs_in_leaky"),
        F.coalesce(F.sum(F.col("_n_docs") - F.col("_n_major")), F.lit(0))
        .cast("bigint")
        .alias("n_cross_split_excess"),
    )


# ---------------------------------------------------------------------------
# Encoding repair (ftfy-style mojibake fixing)
# ---------------------------------------------------------------------------
#
# Web crawls are full of text whose UTF-8 bytes were mis-decoded as
# Windows-1252 somewhere in the serving/archiving chain ("cafÃ©",
# "donâ€™t"). CCNet/C4-class pipelines repair this before any quality
# statistic is computed (otherwise char-class fractions, langid n-grams and
# dedup digests all see garbage). The repair table is DERIVED, not typed in:
# for every repairable codepoint we compute what its UTF-8 bytes look like
# under a "sloppy" cp1252 decode (cp1252 with the five undefined bytes
# falling back to their Latin-1/C1 identity — exactly the web's de-facto
# decoder), and the fix is the literal inverse replacement. One pass of the
# chain undoes exactly ONE level of mis-decoding; clean text is a fixed
# point (property-tested). Reference analog: the reference normalizes raw
# platform artifacts before computing stats (lq_utils.py:141-196's sequence
# sanitation); here the artifact is the web's encoding damage.

# repairable codepoints: the cp1252-visible punctuation block, the C1
# controls (never legitimate in text; appear as intermediates of deeper
# double-mojibake), NBSP, and the full Latin-1 supplement
_MOJIBAKE_CODEPOINTS: tuple[int, ...] = tuple(
    [
        0x20AC, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021, 0x02C6,
        0x2030, 0x0160, 0x2039, 0x0152, 0x017D, 0x2018, 0x2019, 0x201C,
        0x201D, 0x2022, 0x2013, 0x2014, 0x02DC, 0x2122, 0x0161, 0x203A,
        0x0153, 0x017E, 0x0178,
    ]
    + list(range(0x80, 0xA0))
    + [0xA0]
    + list(range(0xA1, 0x100))
)


def _sloppy_cp1252(bs: bytes) -> str:
    """Decode bytes the way damaged web pipelines do: cp1252, with the five
    bytes cp1252 leaves undefined (81 8D 8F 90 9D) passing through as their
    Latin-1/C1 codepoints (ftfy's "sloppy-windows-1252")."""
    out = []
    for b in bs:
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


def mojibake_pairs() -> list[tuple[str, str]]:
    """(damaged, repaired) literal pairs, 3-char sequences first so the
    chain never half-rewrites a longer sequence via a shorter one. The same
    ordered table drives the Spark expression AND the DuckDB oracle SQL, so
    parity is by construction."""
    pairs = [
        (_sloppy_cp1252(chr(cp).encode("utf-8")), chr(cp))
        for cp in _MOJIBAKE_CODEPOINTS
    ]
    return [p for p in pairs if len(p[0]) == 3] + [
        p for p in pairs if len(p[0]) == 2
    ]


def mojibake_lead_class() -> str:
    """Regex character class of every damaged sequence's FIRST char (the
    cp1252 faces of the UTF-8 lead bytes: Â Ã â Å Æ Ë ‚ ...). Used to gate
    the repair chain: a document with none of these chars is provably clean
    and skips all replaces with one regex scan."""
    leads = sorted({bad[0] for bad, _ in mojibake_pairs()})
    return "[" + "".join(leads) + "]"


def fix_mojibake_expr(text_col: str = "text", passes: int = 1):
    """Repair cp1252 mojibake as a pure JVM column expression: the ordered
    literal-replace chain from :func:`mojibake_pairs`, gated behind one
    regex scan for the damaged-sequence lead chars so clean documents (the
    overwhelming majority at corpus scale) pay a single pass over the
    string instead of ~150 ``indexOf`` scans.

    Each application of the chain undoes exactly one level of mis-decoding;
    ``passes=N`` repairs up to N nested levels (double-mojibake —
    "Ã¢â‚¬â„¢" — needs 2). Clean text is a fixed point at any ``passes``.
    Lead chars are legitimate in some languages (â in French), so the gate
    is a conservative superset; the chain itself only rewrites exact
    damaged sequences (a genuine "Ã©" bigram is linguistically improbable —
    the standard ftfy trade-off).

    Scale: pure map, fuses into the scan stage (no shuffle, stays in
    whole-stage codegen); at 10^12 docs the gate makes the chain's cost
    proportional to the DAMAGED fraction of the corpus.
    """
    if passes < 1:
        raise ValueError(f"passes must be >= 1, got {passes}")
    src = F.col(text_col) if isinstance(text_col, str) else text_col
    fixed = src
    for _ in range(passes):
        for bad, good in mojibake_pairs():
            fixed = F.replace(fixed, F.lit(bad), F.lit(good))
    return F.when(src.rlike(mojibake_lead_class()), fixed).otherwise(src)


def mojibake_marker_count(text_col: str = "text"):
    """Per-document count of damaged-sequence lead chars — the cheap
    mojibake-damage score (0 on provably clean text; an upper bound on the
    number of damaged sequences). Report-friendly: aggregate its mean/rate
    to track encoding health of a crawl over time."""
    cls = mojibake_lead_class()
    src = F.col(text_col) if isinstance(text_col, str) else text_col
    return (F.length(src) - F.length(F.regexp_replace(src, cls, ""))).cast(
        "bigint"
    )


def mojibake_chain_sql_chunks(chunk: int = 60, passes: int = 1) -> list[str]:
    """The EXACT DuckDB mirror of :func:`fix_mojibake_expr`'s replace chain
    (same ordered table), split into depth-bounded templates: DuckDB binds
    at most ~128 nested expressions, so the caller stages the chunks
    through CTEs — each element nests ≤ ``chunk`` ``replace()`` calls
    around the ``{x}`` placeholder (the previous stage's column). Apply the
    gate separately: ``CASE WHEN regexp_matches(orig, lead_class) THEN
    staged_result ELSE orig END``. Single quotes cannot occur in the table
    (every damaged char is >= U+0080), so literal quoting is safe."""
    out: list[str] = []
    pairs = mojibake_pairs() * passes
    for i in range(0, len(pairs), chunk):
        expr = "{x}"
        for bad, good in pairs[i : i + chunk]:
            expr = f"replace({expr}, '{bad}', '{good}')"
        out.append(expr)
    return out


def mojibake_marker_count_sql(expr: str) -> str:
    """DuckDB mirror of :func:`mojibake_marker_count`."""
    cls = mojibake_lead_class()
    return (
        f"CAST(length({expr}) - "
        f"length(regexp_replace({expr}, '{cls}', '', 'g')) AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection with Importance Resampling (Xie et al., 2023)
# ---------------------------------------------------------------------------
# Select raw-corpus documents that look like a small TARGET domain by
# importance weights over a hashed bag-of-ngrams feature space: two bucket
# count vectors (target vs raw), a per-bucket smoothed log-likelihood ratio,
# and a per-document weight = sum of ratios over its features. The web-scale
# sibling of the reference's spike-in control filtering (``longQC.py:553-592``
# selects reads that match a known control profile): score every record
# against a known-good profile, keep the best matches.


def dsir_feature_buckets(
    text_col: str = "text", n_buckets: int = 1024
):
    """Column: ``array<long>`` of hashed unigram+bigram feature buckets for a
    document — the DSIR feature map.

    Tokens are lowercased whitespace words; features are every token and
    every adjacent-token bigram, hashed into ``n_buckets`` via the first 15
    md5 hex digits (60-bit, exactly reproducible in DuckDB as
    ``('0x' || substr(md5(f), 1, 15))::BIGINT % n_buckets``). Pure JVM
    expression (split + higher-order transform/zip_with) — fuses into the
    scan stage, zero Python."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != F.lit(""),
    )

    def bucket(s):
        return F.pmod(
            F.conv(F.substring(F.md5(s.cast("binary")), 1, 15), 16, 10).cast("long"),
            F.lit(n_buckets),
        )

    # bigram slices use length max(n-1, 0) so 0/1-token docs yield empty
    # arrays instead of a negative slice length (no reliance on CASE
    # laziness inside codegen)
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    uni = F.transform(toks, bucket)
    big = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: bucket(F.concat(a, F.lit(" "), b)),
    )
    return F.concat(uni, big)


def dsir_logratio_table(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-bucket smoothed log-likelihood-ratio table
    ``(bucket, lr_micro)`` — the tiny learned "parameter vector" of DSIR.

    ``lr = ln((c_target+1)/(T+B)) - ln((c_raw+1)/(R+B))`` (add-one
    smoothing over B buckets), stored as MICRO-UNITS
    (``round(lr*1e6)`` as BIGINT) so downstream per-document sums are
    integer — order-independent and bit-identical across engines (the
    float-sum-associativity dodge). The count/total doubles entering
    ``ln`` are single exact int->double conversions + one IEEE division,
    so both engines feed ``ln`` the identical double (the
    ``score_drift`` parity argument).

    Scale: two partial-agg groupBys whose shuffles carry at most
    ``n_buckets`` rows each; totals ride back on 1-row broadcast
    cross-joins; output is B rows — collectable by design (DSIR's entire
    model is this vector)."""

    def counts(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(
                F.explode(dsir_feature_buckets(text_col, n_buckets)).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    t, r = counts(target, "_n_t"), counts(raw, "_n_r")
    tot_t = t.agg(F.coalesce(F.sum("_n_t"), F.lit(0)).alias("_tot_t"))
    tot_r = r.agg(F.coalesce(F.sum("_n_r"), F.lit(0)).alias("_tot_r"))
    allb = target.sparkSession.range(n_buckets).select(F.col("id").alias("bucket"))
    b = F.lit(float(n_buckets))
    p_t = (F.coalesce("_n_t", F.lit(0)) + 1) / (F.col("_tot_t") + b)
    p_r = (F.coalesce("_n_r", F.lit(0)) + 1) / (F.col("_tot_r") + b)
    return (
        allb.join(t, "bucket", "left")
        .join(r, "bucket", "left")
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_r))
        .select(
            "bucket",
            F.round((F.log(p_t) - F.log(p_r)) * 1e6)
            .cast("bigint")
            .alias("lr_micro"),
        )
    )


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-document DSIR importance weight over ``df`` (the raw corpus)
    against ``target`` (a small in-domain sample):
    ``(key, n_feats, w_micro)`` where ``w_micro`` is the integer
    micro-unit sum of bucket log-ratios over the document's features.

    The B-row log-ratio table is collected once (bounded by construction)
    and rides into the plan as a LITERAL array, so scoring is a PURE MAP
    over the corpus — zero corpus-side exchange, the ``vocab_coverage``
    literal-array pattern. NULL/empty text scores 0 (no features, not
    NULL — weightless, never dropped silently)."""
    lr_rows = dsir_logratio_table(target, df, text_col, n_buckets).collect()
    arr = [0] * n_buckets
    for r in lr_rows:
        arr[int(r["bucket"])] = int(r["lr_micro"])
    # one FOLDABLE array literal (F.lit of a list), not F.array of B
    # casts: CreateArray is re-evaluated wherever the expression appears —
    # inside the per-token aggregate lambda that would rebuild a B-element
    # array per token (O(tokens x B)); a Literal is built once
    lr_lit = F.lit(arr).cast("array<bigint>")
    feats = dsir_feature_buckets(text_col, n_buckets)
    w = F.aggregate(
        feats,
        F.lit(0).cast("bigint"),
        lambda acc, bkt: acc + F.element_at(lr_lit, (bkt + 1).cast("int")),
    )
    return df.select(
        F.col(key_col),
        F.size(feats).cast("long").alias("n_feats"),
        w.alias("w_micro"),
    )


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    k: int,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    gumbel_seed: int | None = None,
) -> DataFrame:
    """Top-``k`` DSIR selection from the raw corpus: the ``k`` documents
    most target-like by importance weight. ``gumbel_seed=None`` (default)
    is deterministic argmax — rank by ``(w_micro DESC, key)``;
    a seed switches to DSIR's Gumbel-top-k importance RESAMPLING:
    ``score = w_micro/1e6 + Gumbel(u_key)`` with a deterministic md5
    uniform per key (so the sample is exactly reproducible), rounded to
    6 dp with the key tiebreak.

    Plan: weight column is a pure map (see :func:`dsir_weights`), the
    selection is ``TakeOrderedAndProject`` — k rows to the driver, no
    global sort."""
    ww = dsir_weights(df, target, key_col, text_col, n_buckets)
    out = df.join(ww, key_col)
    if gumbel_seed is None:
        return out.orderBy(F.desc("w_micro"), F.asc(key_col)).limit(k)
    u_int = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(key_col).cast("string"), F.lit(f"#g{gumbel_seed}")
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    # u in (0,1) strictly: (u_int+1)/(2^32+1) — both ln() calls finite
    u = (u_int + 1).cast("double") / F.lit(float(2**32 + 1))
    score = F.round(F.col("w_micro") / 1e6 + (-F.log(-F.log(u))), 6)
    return (
        out.withColumn("_s", score)
        .orderBy(F.desc("_s"), F.asc(key_col))
        .limit(k)
        .drop("_s")
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity partition (head / middle / tail)
# ---------------------------------------------------------------------------


def perplexity_buckets(
    df: DataFrame,
    score_col: str,
    by_col: str = "lang",
    k: int = 3,
    key_col: str = "doc_id",
    sample_size: int | None = None,
) -> DataFrame:
    """Partition each ``by_col`` group (language) into ``k`` equal-size
    score bands — CCNet's head/middle/tail perplexity split (bucket 1 =
    lowest scores = head). The web analog of the reference's per-batch
    quality-band reporting (Q-score histogram bands, ``lq_nanopore.py``).

    Two paths:

    * ``sample_size=None`` — EXACT ``ntile(k)`` over
      ``(score, key)`` within each group: one window shuffle keyed by
      ``by_col``; groups parallelize across languages but one giant
      language serializes into a single task (fine at per-language
      volumes that fit a task; see the sampled path otherwise).
    * ``sample_size=m`` — CCNet's actual recipe: per-group boundaries are
      order statistics of a deterministic md5-priority sample of m docs
      per group (bounded collect = n_groups × m), and bucket assignment
      becomes a PURE MAP against the broadcast boundary table — no
      corpus-side shuffle at any group size, at the cost of
      sample-approximate (not exact-count) tertiles.

    → df columns + ``ppl_bucket`` (int, 1..k). NULL scores land in
    bucket k (worst band) rather than vanishing: an unscorable doc is
    tail by definition."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    s = F.col(score_col)
    if sample_size is None:
        w = Window.partitionBy(by_col).orderBy(
            F.col(score_col).asc_nulls_last(), F.col(key_col).asc()
        )
        return df.withColumn("ppl_bucket", F.ntile(k).over(w))
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit("#ppl")).cast("binary")),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    rw = Window.partitionBy(by_col).orderBy(u.asc(), F.col(key_col).asc())
    samp = (
        df.filter(s.isNotNull())
        .withColumn("_rn", F.row_number().over(rw))
        .filter(F.col("_rn") <= sample_size)
        .select(by_col, s.cast("double").alias("_s"))
        .collect()
    )
    by_vals: dict = {}
    for r in samp:
        by_vals.setdefault(r[by_col], []).append(r["_s"])
    rows = []
    for g, vals in sorted(by_vals.items(), key=lambda kv: str(kv[0])):
        vals.sort()
        m = len(vals)
        # boundary j (1..k-1) = the ceil(j*m/k)-th smallest sample value
        bounds = [vals[max(0, -(-j * m // k) - 1)] for j in range(1, k)]
        rows.append((g, bounds))
    spark = df.sparkSession
    bdf = spark.createDataFrame(rows, f"`{by_col}` string, _bounds array<double>")
    assign = F.when(
        s.isNull(), F.lit(k)
    ).otherwise(
        F.lit(1)
        + F.size(F.filter(F.col("_bounds"), lambda b: s.cast("double") > b))
    )
    return (
        df.join(F.broadcast(bdf), by_col, "left")
        .withColumn("ppl_bucket", F.coalesce(assign, F.lit(k)).cast("int"))
        .drop("_bounds")
    )


# ---------------------------------------------------------------------------
# Distributed n-gram LM training (CCNet trains its KenLM off-cluster;
# here the hashed 5-gram scorer is fit on Spark, bit-identical to a
# serial fit)
# ---------------------------------------------------------------------------


def ngram_lm_partial_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-(order, bucket) hashed n-gram counts of the corpus — the
    sufficient statistics of :class:`longqc_spark.models.HashedNgramLM`,
    computed distributed: each partition accumulates dense numpy count
    vectors over the flat token-hash stream (``np.add.at`` — the
    flat-stream kernel idiom), emits only its NONZERO entries, and one
    partial-agg shuffle (≤ orders × n_buckets rows per partition,
    independent of corpus size) sums them. N-grams never cross document
    boundaries — the same per-doc semantics ``token_logprobs_flat``
    scores with. NULL/empty texts contribute nothing."""
    from ..models import _LM_BUCKETS, _MAX_ORDER, hash_tokens, ngram_keys_all
    import numpy as np

    def part(batches):
        local = {o: np.zeros(_LM_BUCKETS, dtype=np.int64) for o in range(1, _MAX_ORDER + 1)}
        for pdf in batches:
            for text in pdf[text_col]:
                if not isinstance(text, str) or not text:
                    continue
                tokens = np.array(text.lower().split(), dtype=object)
                if tokens.size == 0:
                    continue
                hashes = hash_tokens(tokens)
                kall = ngram_keys_all(hashes, _MAX_ORDER)
                for o in range(1, _MAX_ORDER + 1):
                    if tokens.size >= o:
                        idx = (kall[o] % np.uint64(_LM_BUCKETS)).astype(np.int64)[o - 1 :]
                        np.add.at(local[o], idx, 1)
        frames = []
        for o, v in local.items():
            nz = np.flatnonzero(v)
            if nz.size:
                frames.append(
                    pd.DataFrame(
                        {"order": np.full(nz.size, o, dtype=np.int32), "bucket": nz.astype(np.int64), "n": v[nz]}
                    )
                )
        if frames:
            yield pd.concat(frames, ignore_index=True)

    rows = df.mapInPandas(part, "order int, bucket long, n long")
    return rows.groupBy("order", "bucket").agg(F.sum("n").alias("n"))


def train_ngram_lm(df: DataFrame, text_col: str = "text"):
    """Fit a :class:`~longqc_spark.models.HashedNgramLM` ON SPARK from a
    corpus DataFrame and return the model object — byte-identical counts
    to a serial per-document fit (asserted in tests), so the perplexity
    scorer can be trained on the very corpus being filtered (CCNet
    retrains its LM per language/snapshot) instead of the fixed seed
    artifact. The collected sufficient statistics are bounded by
    ``orders × n_buckets`` (the model size), never by corpus size."""
    from ..models import _LM_BUCKETS, _MAX_ORDER, HashedNgramLM
    import numpy as np

    agg = ngram_lm_partial_counts(df, text_col).collect()
    lm = HashedNgramLM.__new__(HashedNgramLM)
    lm.counts = [np.zeros(_LM_BUCKETS, dtype=np.float32) for _ in range(_MAX_ORDER + 1)]
    for r in agg:
        lm.counts[int(r["order"])][int(r["bucket"])] = float(r["n"])
    lm.totals = [float(c.sum()) for c in lm.counts]
    lm.vocab = max(1.0, float((lm.counts[1] > 0).sum()))
    return lm


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "zlib_ratio",
    level: int = 6,
) -> DataFrame:
    """Compression-ratio quality signal (the Pile/Gopher-family heuristic:
    template boilerplate deflates far below prose — near-duplicate nav
    text compresses to a fraction of its size — while gibberish/random
    strings deflate ABOVE prose; thresholding the ratio from both sides is
    a cheap one-pass repetition+entropy gate that needs no n-gram state).
    ratio = len(deflate(utf8)) / len(utf8); NULL and empty text → NULL
    (no bytes to measure — NULL-identity like the other hygiene signals).

    This is deliberately a PANDAS (Arrow-batched) UDF, not a JVM
    expression: deflate has no Catalyst equivalent — same placement as the
    html-extraction kernel (reference analog: the per-read GC/complexity
    accumulators of ``lq_utils.py:141-196``, one scalar per record from a
    byte-level scan). Pure map, fuses into the scan stage, no shuffle; at
    100 TB the cost is one deflate pass over input bytes, embarrassingly
    parallel."""
    if not 1 <= level <= 9:
        raise ValueError(f"zlib level must be in [1,9], got {level}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            if t is None:
                return None
            b = t.encode("utf-8")
            if not b:
                return None
            return len(zlib.compress(b, level)) / len(b)

        return s.map(one)

    return df.withColumn(out_col, _ratio(F.col(text_col)))


# Unicode ranges per writing system (the big contiguous blocks; enough to
# catch lang/script disagreement, which is block-level by nature).
SCRIPT_RANGES: dict[str, str] = {
    "latin": "A-Za-zÀ-ɏ",
    "cyrillic": "Ѐ-ӿ",
    "greek": "Ͱ-Ͽ",
    "arabic": "؀-ۿ",
    "devanagari": "ऀ-ॿ",
    "cjk": "぀-ヿ㐀-䶿一-鿿가-힯",
}

# ISO 639-1 → expected script for the languages the QC pipeline's langid
# emits; anything absent falls back to "no expectation" (mismatch NULL).
LANG_SCRIPT: dict[str, str] = {
    "en": "latin", "de": "latin", "fr": "latin", "es": "latin",
    "it": "latin", "pt": "latin", "nl": "latin", "pl": "latin",
    "ru": "cyrillic", "uk": "cyrillic", "bg": "cyrillic",
    "el": "greek", "ar": "arabic", "fa": "arabic", "hi": "devanagari",
    "zh": "cjk", "ja": "cjk", "ko": "cjk",
}


def script_char_count(text_col: str, script: str):
    """Chars of ``text_col`` inside ``script``'s Unicode ranges — a JVM
    strip-and-measure (no per-char Python)."""
    ranges = SCRIPT_RANGES[script]
    return F.length(
        F.regexp_replace(F.col(text_col), f"[^{ranges}]", "")
    )


def script_consistency(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    min_frac: float = 0.5,
) -> DataFrame:
    """Declared-language vs script-composition check → input +
    ``(script_frac, script_mismatch)``.

    ``script_frac`` = chars in the language's expected script ÷ letter
    chars overall (``\\p{L}`` — digits/punctuation/space don't vote);
    ``script_mismatch`` = frac < ``min_frac``. Both NULL when the
    language has no script expectation (not in :data:`LANG_SCRIPT`),
    the text is NULL, or it contains no letters — an empty page is not
    evidence of mislabeling.

    The standard langid sanity gate: n-gram language IDs confidently
    mislabel short or mixed pages, but a page claiming ``ru`` that is
    90% Latin letters is wrong regardless of the classifier's
    confidence. Pure scan-fused column expressions: one regexp strip
    per script present in the mapping plus one ``\\p{L}`` strip — no
    shuffle, no Python.

    Reference analog: the GC-content sanity histogram
    (``lq_nanopore.py`` GC stats) — a cheap composition statistic that
    flags records whose declared identity and measured composition
    disagree."""
    letters = F.length(F.regexp_replace(F.col(text_col), r"[^\p{L}]", ""))
    expected = None
    for lang, script in LANG_SCRIPT.items():
        hit = script_char_count(text_col, script)
        expected = (
            F.when(F.col(lang_col) == lang, hit)
            if expected is None
            else expected.when(F.col(lang_col) == lang, hit)
        )
    frac = F.when(
        letters > 0, F.round(expected / letters, 6)
    )  # NULL: unknown lang (expected NULL), no letters, or NULL text
    return df.withColumn("script_frac", frac).withColumn(
        "script_mismatch", F.col("script_frac") < F.lit(min_frac)
    )


def zipf_fit(
    df: DataFrame, text_col: str = "text", k: int = 200
) -> DataFrame:
    """Zipf rank-frequency fit over the corpus vocabulary — the classic
    corpus-health check (natural language sits near slope -1 on the
    log-log rank/frequency line; machine-generated or template-flooded
    corpora bend away from it, so a drifting slope/r² between crawl
    snapshots is an early spam alarm, the corpus-level complement of the
    per-doc repetition rules).

    → one row: n_terms, slope, intercept, r2 (OLS of ln(count) on
    ln(rank) over the top-``k`` terms, ties broken by token so rank order
    is engine-independent; outputs rounded to 6dp).

    Scale posture: one partial-agg token-count shuffle (the same exchange
    every vocab pass pays), then ``TakeOrdered`` for the top-k — no global
    sort of the vocabulary; the rank window runs on the k-row (driver-
    bounded, default 200) result, not the corpus. Reference analog: the
    rank-shaped read-length distribution fit (``lq_gamma.py`` via
    ``fits.py``), lifted to vocabulary statistics."""
    from pyspark.sql import Window

    toks = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    topk = counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(k)
    # single-partition window over <= k rows — bounded by construction
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    ranked = topk.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    # try_divide: a degenerate corpus (every count equal → zero y-variance,
    # or k=1 → zero x-variance) yields NULL, matching SQL corr()'s NULL
    # instead of an ANSI divide-by-zero
    slope = F.try_divide(F.covar_pop("x", "y"), F.var_pop("x"))
    r2 = F.try_divide(
        F.pow(F.covar_pop("x", "y"), 2), F.var_pop("x") * F.var_pop("y")
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round(F.avg("y") - slope * F.avg("x"), 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def segment_languages(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    sep: str = r"\n\n?",
    min_chars: int = 12,
) -> DataFrame:
    """CCNet-style PER-PARAGRAPH language segmentation: multilingual pages
    (boilerplate in one language wrapping content in another, bilingual
    articles) get per-segment language labels instead of one doc-level
    vote — the pre-step that lets a per-lang threshold cascade
    (``per_lang_thresholds``) and per-lang corpus routing operate on the
    RIGHT text. → one row per CONTIGUOUS same-language run:
    ``(key, seg_idx, lang, start_para, end_para, n_paras, n_chars)``.

    Shape: paragraph split + posexplode are scan-fused JVM; language ID
    is ONE Arrow pass over paragraphs (the same hashed-trigram model the
    doc-level pipeline uses, process-singleton per executor); the
    run-grouping window partitions by document (bounded by paragraphs per
    doc, never global). Paragraphs under ``min_chars`` chars inherit no
    vote ('und') and glue to neither side — they segment alone, keeping
    short separators from bridging two languages. Reference analog: the
    per-read windowed stat sweep (``lq_gcfrac.py:37-47``) — windows here
    are structural (paragraphs) rather than fixed-width."""
    import pandas as pd

    from pyspark.sql import Window, types as T

    from ..models import langid_model

    paras = df.select(
        F.col(key_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("para_idx", "para"),
    ).filter(F.trim(F.col("para")) != "")

    out_schema = T.StructType(
        [
            paras.schema[key_col],
            T.StructField("para_idx", T.IntegerType()),
            T.StructField("n_chars", T.IntegerType()),
            T.StructField("lang", T.StringType()),
        ]
    )

    def label(batches):
        model = langid_model()
        for pdf in batches:
            if not len(pdf):
                continue
            texts = pdf["para"].fillna("")
            preds, _ = model.score_batch(texts)
            lens = texts.str.len().to_numpy()
            preds[lens < min_chars] = "und"
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col].to_numpy(),
                    "para_idx": pdf["para_idx"].to_numpy(),
                    "n_chars": lens,
                    "lang": preds,
                }
            )

    labeled = paras.mapInPandas(label, schema=out_schema)
    w = Window.partitionBy(key_col).orderBy("para_idx")
    changed = (
        F.coalesce(F.lag("lang").over(w) != F.col("lang"), F.lit(True))
        | (F.col("lang") == "und")  # und paragraphs never extend a run
    ).cast("int")
    runs = labeled.withColumn("seg_idx", F.sum(changed).over(w) - 1)
    return (
        runs.groupBy(key_col, "seg_idx", "lang")
        .agg(
            F.min("para_idx").alias("start_para"),
            F.max("para_idx").alias("end_para"),
            F.count(F.lit(1)).alias("n_paras"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
        .orderBy(key_col, "seg_idx")
    )


def ngram_diversity(
    df: DataFrame, text_col: str = "text", max_n: int = 3
) -> DataFrame:
    """Corpus n-gram diversity (distinct-n): for n = 1..max_n, total and
    DISTINCT n-gram counts and their ratio — the standard text-diversity
    reading (low distinct-2/3 = template flood or degenerate generation;
    the corpus-level dual of the per-doc top-ngram repetition rules).
    → (n, total_ngrams, distinct_ngrams, distinct_ratio) ordered by n.

    ONE tokenize + explode pass for all n (optimization round 6; was one
    explode + count_distinct aggregate per n): every doc emits its full
    (n, gram) stream from a single concatenated struct array, and the
    exact distinct/total counts come from a two-level aggregate —
    partial-combined (n, g) counts, then per-n ``sum``/``count``. Still
    no Expand on the token stream (no stacked count_distincts — the
    profiler's documented trade-off), and the corpus is scanned and
    tokenized once instead of max_n times. Word n-grams over the usual
    lowercase whitespace contract."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    # Gram keys are 64-bit rolling hashes of the token hashes, not rebuilt
    # strings (optimization round 6): the counts are the ONLY output, and
    # distinct/total counts over hashed keys equal the string-gram counts
    # barring a 64-bit collision among a corpus's distinct grams
    # (p ~ D^2/2^65 — ~1e-6 at 100M distinct grams; same contract as the
    # hashed decontamination path, equality pytest-pinned vs a string-gram
    # reference). Construction is the unrolled rotate/zip_with combine from
    # ``contamination_hits``: rotations distribute over XOR, each leg is one
    # O(n) array pass, and no per-gram string is ever allocated — the
    # (n, gram) shuffle carries 8-byte longs instead of strings (guide
    # §2.3 shuffle fewer bytes, §1.2 per-task work).
    th = F.transform(toks, lambda t: F.xxhash64(t))

    def _rot(c, k: int):
        k %= 64
        if k == 0:
            return c
        return F.shiftleft(c, k).bitwiseOR(F.shiftrightunsigned(c, 64 - k))

    def _grams(n):
        if n == 1:
            return th
        m = F.size(th) - F.lit(n - 1)

        def leg(j):
            return F.transform(
                F.slice(th, j + 1, m), lambda t: _rot(t, 13 * (n - 1 - j))
            )

        acc = leg(0)
        for j in range(1, n):
            acc = F.zip_with(acc, leg(j), lambda x, y: x.bitwiseXOR(y))
        return F.when(m >= 1, acc).otherwise(F.array().cast("array<long>"))

    def _tag(n):
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))

    branches = [F.transform(_grams(n), _tag(n)) for n in range(1, max_n + 1)]
    pairs = df.select(F.explode(F.concat(*branches)).alias("p")).select(
        F.col("p.n").alias("n"), F.col("p.g").alias("g")
    )
    counts = pairs.groupBy("n", "g").agg(F.count(F.lit(1)).alias("c"))
    agg = counts.groupBy("n").agg(
        F.sum("c").alias("total_ngrams"),
        F.count(F.lit(1)).alias("distinct_ngrams"),
    )
    # an n with zero grams anywhere (e.g. empty corpus) must still emit
    # its (n, 0, 0, NULL) row, as the old per-n global aggregates did
    skeleton = df.sparkSession.createDataFrame(
        [(n,) for n in range(1, max_n + 1)], "n int"
    )
    return (
        skeleton.join(agg, "n", "left")
        .select(
            "n",
            F.coalesce(F.col("total_ngrams"), F.lit(0).cast("long")).alias(
                "total_ngrams"
            ),
            F.coalesce(F.col("distinct_ngrams"), F.lit(0).cast("long")).alias(
                "distinct_ngrams"
            ),
            F.round(
                F.try_divide(F.col("distinct_ngrams"), F.col("total_ngrams")), 6
            ).alias("distinct_ratio"),
        )
        .orderBy("n")
    )
