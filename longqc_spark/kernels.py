"""Shared pure kernels: per-document stat vectors and the PII/toxicity scrub.

This module is the single source of truth for every per-document number the
engine computes — the analog of ``sdust.c`` being the only implementation of
the masked-fraction stats in the reference (``sdust.c:136-175``,
``lq_gcfrac.py:25-35``, ``lqutils.c:26-80``, ``lq_adapt.py:10-78``).

Both sides call these functions on pandas inputs:

* the Spark pipeline, inside Arrow-batched ``mapInPandas`` / pandas UDFs;
* the pure-pandas reference labeler (``labeler.py``).

Because the floats and scrubbed bytes are produced by literally the same
code, keep/drop F1 vs the reference labels is a structural identity and the
scrub output is byte-identical per url (BASELINE.json north_rule).

Everything operates on Arrow-sized batches; per-doc work uses
``collections.Counter``/numpy — no Spark-row-at-a-time Python anywhere.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd

from .config import STOPWORDS, TOX_WORDS, QCConfig
from .models import langid_model, ngram_lm

# ---------------------------------------------------------------------------
# Tokenization / char classes (fixed: both sides must agree exactly)
# ---------------------------------------------------------------------------

_ALPHA_RE = re.compile(r"[A-Za-zÀ-ÖØ-öø-ÿ]")
_SYMBOL_RE = re.compile(r"[^\w\s]", re.UNICODE)
_STOPWORD_SET = frozenset(STOPWORDS)

STAT_COLUMNS: tuple[str, ...] = (
    "n_chars",
    "n_words",
    "n_lines",
    "mean_word_len",
    "symbol_char_frac",
    "alpha_char_frac",
    "alpha_word_frac",
    "stopword_count",
    "dup_line_frac",
    "top_ngram_frac_2",
    "top_ngram_frac_3",
    "top_ngram_frac_4",
    "lang_pred",
    "lang_score",
    "logprob_mean",
    "perplexity",
    "frac_tokens_above_q",
)


def _top_ngram_frac(tokens: list[str], n: int) -> float:
    """Fraction of tokens covered by the single most frequent word n-gram
    (Gopher repetition signal; masked-fraction analog of sdust)."""
    m = len(tokens) - n + 1
    if m < 1 or len(tokens) == 0:
        return 0.0
    counts = Counter(tuple(tokens[i : i + n]) for i in range(m))
    top = counts.most_common(1)[0][1]
    if top <= 1:
        return 0.0
    return top * n / len(tokens)


def _dup_line_frac(text: str) -> float:
    """Fraction of non-empty lines that are repeats of an earlier line."""
    lines = [ln for ln in (s.strip() for s in text.split("\n")) if ln]
    if len(lines) <= 1:
        return 0.0
    return 1.0 - len(set(lines)) / len(lines)


def compute_stats(texts: pd.Series, q_threshold: float = -8.0) -> pd.DataFrame:
    """Per-document stat vector (FIXTURES.md §3 ``qc_stats`` shape minus the
    scrub counters, which the scrub kernel produces).

    Vectorized where pandas can (str.len / str.count); per-doc Counter work
    for the repetition stats; numpy-vectorized langid + LM scoring.
    """
    texts = texts.fillna("")
    lid = langid_model()
    lm = ngram_lm()

    n_chars = texts.str.len().astype("int64")
    n_words = texts.str.count(r"\S+").astype("int64")
    n_lines = (texts.str.count("\n") + 1).where(n_chars > 0, 0).astype("int64")
    alpha_chars = texts.str.count(_ALPHA_RE).astype("float64")
    symbol_chars = texts.str.count(_SYMBOL_RE).astype("float64")
    safe_chars = n_chars.replace(0, 1).astype("float64")

    mean_word_len = np.zeros(len(texts), dtype=np.float64)
    alpha_word_frac = np.zeros(len(texts), dtype=np.float64)
    stopword_count = np.zeros(len(texts), dtype=np.int64)
    dup_line = np.zeros(len(texts), dtype=np.float64)
    top2 = np.zeros(len(texts), dtype=np.float64)
    top3 = np.zeros(len(texts), dtype=np.float64)
    top4 = np.zeros(len(texts), dtype=np.float64)
    lang_pred = np.empty(len(texts), dtype=object)
    lang_score = np.zeros(len(texts), dtype=np.float64)
    logprob_mean = np.zeros(len(texts), dtype=np.float64)
    frac_above = np.zeros(len(texts), dtype=np.float64)

    for i, text in enumerate(texts.to_numpy()):
        tokens = text.split()
        if tokens:
            lens = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=len(tokens))
            mean_word_len[i] = lens.mean()
            alpha_word_frac[i] = sum(1 for t in tokens if _ALPHA_RE.search(t)) / len(tokens)
            low = [t.lower() for t in tokens]
            stopword_count[i] = sum(1 for t in low if t in _STOPWORD_SET)
            top2[i] = _top_ngram_frac(low, 2)
            top3[i] = _top_ngram_frac(low, 3)
            top4[i] = _top_ngram_frac(low, 4)
            lps = lm.token_logprobs(low)
            logprob_mean[i] = lps.mean()
            frac_above[i] = (lps > q_threshold).mean()
        else:
            logprob_mean[i] = -20.0
        dup_line[i] = _dup_line_frac(text)
        lang_pred[i], lang_score[i] = lid.score(text)

    return pd.DataFrame(
        {
            "n_chars": n_chars.to_numpy(),
            "n_words": n_words.to_numpy(),
            "n_lines": n_lines.to_numpy(),
            "mean_word_len": mean_word_len,
            "symbol_char_frac": (symbol_chars / safe_chars).to_numpy(),
            "alpha_char_frac": (alpha_chars / safe_chars).to_numpy(),
            "alpha_word_frac": alpha_word_frac,
            "stopword_count": stopword_count,
            "dup_line_frac": dup_line,
            "top_ngram_frac_2": top2,
            "top_ngram_frac_3": top3,
            "top_ngram_frac_4": top4,
            "lang_pred": lang_pred.astype(str),
            "lang_score": lang_score,
            "logprob_mean": logprob_mean,
            "perplexity": np.exp(-logprob_mean),
            "frac_tokens_above_q": frac_above,
        }
    )


# ---------------------------------------------------------------------------
# Scrub kernel (adapter-trim analog, reference lq_adapt.py:10-103)
# ---------------------------------------------------------------------------

# Compiled once per process; order is part of the spec (fixed cascade, like
# the reference's fixed 5'-then-3' trim order, longQC.py:314-320).
PII_PATTERNS: tuple[tuple[str, re.Pattern], ...] = (
    ("EMAIL", re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")),
    ("SSN", re.compile(r"\b\d{3}-\d{2}-\d{4}\b")),
    ("PHONE", re.compile(r"\b(?:\+?\d{1,2}[ .-])?(?:\(\d{3}\)|\d{3})[ .-]\d{3}[ .-]\d{4}\b")),
    ("IPV4", re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b")),
)

TOX_PATTERN: re.Pattern = re.compile(
    r"\b(?:" + "|".join(re.escape(w) for w in TOX_WORDS) + r")\b", re.IGNORECASE
)

SCRUB_COLUMNS: tuple[str, ...] = ("scrubbed_text", "pii_match_count", "tox_match_count")


def scrub_text(text: str, cfg: QCConfig) -> tuple[str, int, int, list[tuple[int, int, str]]]:
    """Rewrite one document; returns (scrubbed, n_pii, n_tox, spans).

    Spans are (start, end, kind) in ORIGINAL coordinates — the analog of the
    reference recording trimmed adapter positions (``longQC.py:348-357``).
    Replacement is a fixed tag per kind, applied in one pass per pattern in
    declaration order; byte-identical across both engines because this is the
    only implementation.
    """
    spans: list[tuple[int, int, str]] = []
    n_pii = 0
    n_tox = 0
    if cfg.scrub_pii:
        for kind, pat in PII_PATTERNS:
            for m in pat.finditer(text):
                spans.append((m.start(), m.end(), kind))
    # Overlapping spans: earlier start wins, then longer match; ties resolve
    # by pattern declaration order because sort is stable.
    if cfg.scrub_tox:
        for m in TOX_PATTERN.finditer(text):
            spans.append((m.start(), m.end(), "TOX"))
    if not spans:
        return text, 0, 0, []
    spans.sort(key=lambda s: (s[0], -(s[1] - s[0])))
    kept: list[tuple[int, int, str]] = []
    last_end = -1
    for s in spans:
        if s[0] >= last_end:
            kept.append(s)
            last_end = s[1]
    out: list[str] = []
    pos = 0
    for start, end, kind in kept:
        out.append(text[pos:start])
        out.append(f"<{kind}>")
        pos = end
        if kind == "TOX":
            n_tox += 1
        else:
            n_pii += 1
    out.append(text[pos:])
    return "".join(out), n_pii, n_tox, kept


def scrub_batch(texts: pd.Series, cfg: QCConfig) -> pd.DataFrame:
    """Batch scrub → DataFrame(scrubbed_text, pii_match_count, tox_match_count,
    scrub_spans)."""
    texts = texts.fillna("")
    scrubbed = np.empty(len(texts), dtype=object)
    n_pii = np.zeros(len(texts), dtype=np.int64)
    n_tox = np.zeros(len(texts), dtype=np.int64)
    span_col = np.empty(len(texts), dtype=object)
    for i, text in enumerate(texts.to_numpy()):
        s, p, t, spans = scrub_text(text, cfg)
        scrubbed[i] = s
        n_pii[i] = p
        n_tox[i] = t
        span_col[i] = [
            {"start": int(a), "end": int(b), "kind": k} for a, b, k in spans
        ]
    return pd.DataFrame(
        {
            "scrubbed_text": scrubbed,
            "pii_match_count": n_pii,
            "tox_match_count": n_tox,
            "scrub_spans": span_col,
        }
    )
