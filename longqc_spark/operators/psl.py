"""Public-suffix (eTLD+1) registrable-domain extraction.

Implements the publicsuffix.org list algorithm over a RULES TABLE the
caller supplies (no external fetch — tests/benchmarks seed a synthetic
subset): a rule is a dot-joined suffix, optionally with a leftmost
wildcard label (``*.ck`` — the wildcard matches exactly one label) or a
leading ``!`` marking an exception (``!www.ck`` — the named domain is
NOT a public suffix even though a wildcard says so). Prevailing rule:
any matching exception beats all, else the match with the most labels;
with no match the implicit ``*`` rule applies (public suffix = last
label). Public suffix = the prevailing rule's labels (minus the
leftmost for an exception); registrable domain (eTLD+1) = public
suffix + one more label, NULL when the host IS a public suffix.

Plan shape (the part that must survive 10^12 docs): the rule table is a
few thousand rows — broadcast; per-HOST work is a bounded candidate
explode (≤ 2 candidates per label: the literal suffix and its
wildcarded form), all JVM array ops. ``with_registrable_domain`` runs
the match once per DISTINCT host, then joins the host→eTLD+1 map back
to the corpus — web corpora have ~10^2-10^3 docs per host, so the
match input is orders of magnitude smaller than the corpus and the
only corpus-sized exchange is the final hash join on ``host``.

Reference analog: ``domain_expr`` (operators/web.py:62) documents the
host-grain approximation this replaces when per-SITE (not per-host)
caps/stats are wanted — the reference's per-group rollup grain choice
(lq_utils.py subsample grouping) is the same decision one level up.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# A deterministic synthetic PSL subset for tests/demos (the real list is
# ~10k rules and loads through the same parse).
PSL_MINI: tuple[str, ...] = (
    "com",
    "org",
    "net",
    "io",
    "uk",
    "co.uk",
    "gov.uk",
    "jp",
    "ac.jp",
    "*.ck",
    "!www.ck",
    "github.io",
)


def parse_psl_rules(spark: SparkSession, rules: tuple[str, ...] | list[str]) -> DataFrame:
    """Rule strings → ``(rule_key, n_labels, is_exception)``. The key an
    exception rule joins on is its text WITHOUT the ``!`` (it matches the
    same hosts the literal suffix would)."""
    rows = []
    for r in rules:
        r = r.strip().lower()
        if not r or r.startswith("//"):
            continue
        exc = r.startswith("!")
        key = r[1:] if exc else r
        rows.append((key, key.count(".") + 1, exc))
    return spark.createDataFrame(
        rows, "rule_key string, n_labels int, is_exception boolean"
    )


def host_expr(url_col: str = "url") -> Column:
    """Lowercased host of a URL (port and userinfo dropped); NULL when no
    ``scheme://host`` shape is present."""
    h = F.regexp_extract(
        F.lower(F.col(url_col)), r"^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/?#:]+)", 1
    )
    return F.when(h == "", None).otherwise(h)


def _suffix(labels: Column, n: Column, i: Column) -> Column:
    return F.array_join(F.slice(labels, n - i + 1, i), ".")


def public_suffix_map(hosts: DataFrame, rules: DataFrame, host_col: str = "host") -> DataFrame:
    """One row per input host → ``(host, public_suffix,
    registrable_domain)`` by the PSL algorithm. ``hosts`` should already
    be distinct; ``rules`` comes from :func:`parse_psl_rules` and is
    broadcast (the real list is ~10k rows)."""
    labels = F.split(F.col(host_col), r"\.")
    n = F.size(labels)
    # candidates: for each suffix length i, the literal last-i-labels
    # suffix and (i>=2) its wildcarded form "*.<last i-1 labels>".
    lit = F.transform(F.sequence(F.lit(1), n), lambda i: _suffix(labels, n, i))
    wc = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(2), n),
            lambda i: F.concat(F.lit("*."), _suffix(labels, n, i - 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    cand = (
        hosts.select(host_col, F.explode(F.concat(lit, wc)).alias("rule_key"))
        .join(F.broadcast(rules), "rule_key")
        .groupBy(host_col)
        .agg(
            F.max(
                F.struct(
                    F.col("is_exception"), F.col("n_labels"), F.col("rule_key")
                )
            ).alias("best")
        )
        .select(
            host_col,
            F.col("best.is_exception").alias("_exc"),
            F.col("best.n_labels").alias("_nl"),
        )
    )
    out = hosts.join(cand, host_col, "left")
    # exception rule: its suffix minus the leftmost label; no match: the
    # implicit "*" rule (last label).
    ps_n = (
        F.when(F.col("_exc"), F.col("_nl") - 1)
        .when(F.col("_nl").isNotNull(), F.col("_nl"))
        .otherwise(F.lit(1))
    )
    labels2 = F.split(F.col(host_col), r"\.")
    n2 = F.size(labels2)
    return out.select(
        host_col,
        _suffix(labels2, n2, ps_n).alias("public_suffix"),
        F.when(n2 >= ps_n + 1, _suffix(labels2, n2, ps_n + 1)).alias(
            "registrable_domain"
        ),
    )


def with_registrable_domain(
    df: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Corpus → corpus + ``(host, public_suffix, registrable_domain)``.

    The PSL match runs on DISTINCT hosts only; the corpus-sized step is
    one hash join on ``host`` (NULL-host rows pass through with NULL
    outputs rather than joining)."""
    tagged = df.withColumn("host", host_expr(url_col))
    hosts = tagged.select("host").where(F.col("host").isNotNull()).distinct()
    m = public_suffix_map(hosts, rules)
    return tagged.join(m, "host", "left")
