"""Summary report stage: batch aggregates → driver-side fits → decision
cascade → JSON (+ optional HTML).

Transplants LongQC's aggregate/model/decision/report phases (reference
``longQC.py:449-517`` aggregates, ``462-686`` JSON dict, ``787-824`` warn/
error cascade, ``826-831`` jinja2 HTML). All heavy computation is ONE Spark
aggregation pass + three ≤100-row collected histograms; fits run on
sufficient statistics or a bounded hash-priority sample — nothing large ever
reaches the driver.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, functions as F

from .config import DEFAULT_CONFIG, QCConfig
from .fits import gamma_mle, gmm_1d
from .operators.relational import histogram, n50_approx

# decision thresholds — the Q7-fraction warn/error analog
# (reference longQC.py:141-143: warn 0.65 / error 0.5)
KEEP_RATE_WARN = 0.5
KEEP_RATE_ERROR = 0.25
PII_RATE_WARN = 0.3
LANG_MISMATCH_WARN = 0.3


def summarize(labels: DataFrame, cfg: QCConfig = DEFAULT_CONFIG, sample_n: int = 10_000) -> dict[str, Any]:
    """labels (qc_pipeline output) → nested summary dict (JSON-ready)."""
    agg = labels.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("keep")).alias("n_keep"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_words").alias("total_words"),
        F.max("n_words").alias("longest_doc_words"),
        F.avg("n_words").alias("mean_words"),
        F.avg("mean_word_len").alias("mean_word_len"),
        F.avg("symbol_char_frac").alias("mean_symbol_frac"),
        F.avg("dup_line_frac").alias("mean_dup_line_frac"),
        F.avg("perplexity").alias("mean_perplexity"),
        F.expr("percentile(perplexity, 0.5)").alias("median_perplexity"),
        F.sum("pii_match_count").alias("total_pii_matches"),
        F.count_if(F.col("pii_match_count") > 0).alias("n_docs_with_pii"),
        F.sum("tox_match_count").alias("total_tox_matches"),
        # sufficient stats for the gamma fit (Minka needs mean + mean-log)
        F.avg(F.when(F.col("n_words") > 0, F.col("n_words"))).alias("len_mean"),
        F.avg(F.when(F.col("n_words") > 0, F.log("n_words"))).alias("len_meanlog"),
    ).collect()[0]

    n_docs = agg["n_docs"] or 0
    n_keep = agg["n_keep"] or 0

    # reasons histogram (A14 adapter-count-histogram analog)
    reasons = {
        r["reason"]: r["n"]
        for r in labels.select(F.explode("reasons").alias("reason"))
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # binned tables ARE the report payload (A11)
    len_hist = {
        int(r["bin"]): r["n"] for r in histogram(labels, "n_words", 50.0).collect()
    }
    ppl_hist = {
        int(r["bin"]): r["n"]
        for r in histogram(labels.filter(F.col("perplexity") < 20000), "perplexity", 500.0).collect()
    }
    lang_counts = {
        r["lang_pred"]: r["n"]
        for r in labels.groupBy("lang_pred").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # NXX via the bucketed two-pass (property-tested equal to the exact
    # window nxx): the summary is computed over the FULL labels table, so
    # the scale-safe path — no single-task global-sort window — is the one
    # production uses
    n50_rows = {
        int(r["pct"]): r["nxx"]
        for r in n50_approx(labels, "n_words", [0.5, 0.9]).collect()
    }

    # fits: gamma from sufficient stats (MF1); GMM on a bounded deterministic
    # sample of perplexities (MF2) — SA1-replacement sampling
    gamma_shape, gamma_scale = (
        gamma_mle(agg["len_mean"], agg["len_meanlog"]) if agg["len_mean"] else (0.0, 0.0)
    )
    ppl_sample = [
        r["perplexity"]
        for r in labels.select("perplexity")
        .orderBy(F.xxhash64("perplexity", F.lit(13)))
        .limit(sample_n)
        .collect()
    ]
    gmm = gmm_1d(ppl_sample, k=2) if len(ppl_sample) >= 10 else []

    keep_rate = n_keep / n_docs if n_docs else 0.0
    pii_rate = (agg["n_docs_with_pii"] or 0) / n_docs if n_docs else 0.0
    lang_ok = sum(v for k, v in lang_counts.items() if k in cfg.allowed_langs)
    lang_mismatch = 1.0 - lang_ok / n_docs if n_docs else 0.0

    warnings: dict[str, str] = {}
    errors: dict[str, str] = {}
    if keep_rate < KEEP_RATE_ERROR:
        errors["low_keep_rate"] = f"keep rate {keep_rate:.3f} < {KEEP_RATE_ERROR}"
    elif keep_rate < KEEP_RATE_WARN:
        warnings["low_keep_rate"] = f"keep rate {keep_rate:.3f} < {KEEP_RATE_WARN}"
    if pii_rate > PII_RATE_WARN:
        warnings["high_pii_rate"] = f"{pii_rate:.3f} of docs carried PII"
    if lang_mismatch > LANG_MISMATCH_WARN:
        warnings["high_lang_mismatch"] = f"{lang_mismatch:.3f} docs outside {cfg.allowed_langs}"

    return {
        "totals": {
            "n_docs": n_docs,
            "n_keep": n_keep,
            "keep_rate": keep_rate,
            "total_chars": agg["total_chars"],
            "total_words": agg["total_words"],
            "longest_doc_words": agg["longest_doc_words"],
            "mean_words": agg["mean_words"],
            "n50_words": n50_rows.get(50),
            "n90_words": n50_rows.get(90),
        },
        "quality": {
            "mean_word_len": agg["mean_word_len"],
            "mean_symbol_frac": agg["mean_symbol_frac"],
            "mean_dup_line_frac": agg["mean_dup_line_frac"],
            "mean_perplexity": agg["mean_perplexity"],
            "median_perplexity": agg["median_perplexity"],
        },
        "scrub": {
            "total_pii_matches": agg["total_pii_matches"],
            "n_docs_with_pii": agg["n_docs_with_pii"],
            "pii_rate": pii_rate,
            "total_tox_matches": agg["total_tox_matches"],
        },
        "langs": lang_counts,
        "reasons": reasons,
        "histograms": {"n_words_b50": len_hist, "perplexity_b500": ppl_hist},
        "fits": {
            "gamma_length": {"shape": gamma_shape, "scale": gamma_scale},
            "gmm_perplexity": gmm,
        },
        "warnings": warnings,
        "errors": errors,
    }


# stat-vector columns a run-over-run drift check watches by default: the
# continuous quality signals whose distribution shifting means the UPSTREAM
# corpus changed (scraper regression, spam wave), plus keep itself (a 0/1
# column PSI-bins cleanly) so decision drift is visible even when every
# individual signal moves sub-threshold.
DRIFT_METRICS: tuple[str, ...] = (
    "n_chars",
    "n_words",
    "mean_word_len",
    "symbol_char_frac",
    "alpha_char_frac",
    "stopword_count",
    "dup_line_frac",
    "perplexity",
    "keep",
)


def drift_report(
    prev_labels: DataFrame,
    new_labels: DataFrame,
    metrics: tuple[str, ...] = DRIFT_METRICS,
    n_bins: int = 10,
) -> DataFrame:
    """Run-over-run distribution drift: PSI of each stat-vector column
    between a PREVIOUS run's committed labels (the reference) and the
    current run's — the release-over-release QC-summary comparison a
    production filter pipeline alerts on (reference analog: eyeballing two
    batches' HTML report histograms, ``lq_nanopore.py:294-314``,
    mechanized). → ``(metric, psi, verdict)`` ordered by psi descending;
    verdicts use the standard PSI bands (<0.1 stable, <0.25 moderate,
    else major).

    Scale: one ``score_drift`` plan per metric — each is two partial-agg
    groupBys of ≤ ``n_bins`` rows; the k metric plans share the two label
    scans via Spark's scan reuse, and everything stays lazy until the
    caller collects."""
    from .operators.web import score_drift

    per_metric = []
    for m in metrics:
        if m not in prev_labels.columns or m not in new_labels.columns:
            continue
        a = prev_labels.select(F.col(m).cast("double").alias("_s"))
        b = new_labels.select(F.col(m).cast("double").alias("_s"))
        per_metric.append(
            score_drift(a, b, "_s", n_bins=n_bins).agg(
                F.lit(m).alias("metric"),
                F.round(F.sum("psi_term"), 6).alias("psi"),
            )
        )
    if not per_metric:
        raise ValueError(f"none of {metrics} present in both label tables")
    out = per_metric[0]
    for p in per_metric[1:]:
        out = out.unionByName(p)
    return out.select(
        "metric",
        "psi",
        F.when(F.col("psi") < 0.1, "stable")
        .when(F.col("psi") < 0.25, "moderate")
        .otherwise("major")
        .alias("verdict"),
    ).orderBy(F.col("psi").desc(), "metric")


def write_json_report(summary: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True, default=float)


_HTML_TPL = """<!doctype html><html><head><meta charset="utf-8">
<title>longqc-spark QC report</title></head><body>
<h1>Web-text QC summary</h1>
<h2>Decisions</h2>
{% if summary.errors %}<ul>{% for k, v in summary.errors.items() %}
<li style="color:red"><b>ERROR {{k}}</b>: {{v}}</li>{% endfor %}</ul>{% endif %}
{% if summary.warnings %}<ul>{% for k, v in summary.warnings.items() %}
<li style="color:orange"><b>WARN {{k}}</b>: {{v}}</li>{% endfor %}</ul>{% endif %}
{% if not summary.errors and not summary.warnings %}<p>all checks passed</p>{% endif %}
<h2>Totals</h2><table border="1">
{% for k, v in summary.totals.items() %}<tr><td>{{k}}</td><td>{{v}}</td></tr>{% endfor %}
</table>
<h2>Drop reasons</h2><table border="1">
{% for k, v in summary.reasons.items() %}<tr><td>{{k}}</td><td>{{v}}</td></tr>{% endfor %}
</table>
<h2>Languages</h2><table border="1">
{% for k, v in summary.langs.items() %}<tr><td>{{k}}</td><td>{{v}}</td></tr>{% endfor %}
</table>
</body></html>"""


def write_html_report(summary: dict, path: str) -> None:
    """Minimal HTML render (reference web_summary template analog)."""
    import jinja2

    html = jinja2.Template(_HTML_TPL).render(summary=summary)
    with open(path, "w") as f:
        f.write(html)
