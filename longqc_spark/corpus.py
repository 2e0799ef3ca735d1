"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Schema = BASELINE.json input_hint exactly:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Seeded ``numpy.random.Generator`` only — same (seed, n_docs) always yields the
same bytes, independent of platform or process count, so tests, the oracle
labeler, and the two-parallelism bench all see identical input. Document
classes each stress one rule family (clean / short stub / boilerplate
repetition / symbol spam / wrong language / PII / toxicity / gibberish), with
jittered parameters so every class produces both keep and drop labels.
Host IDs are Zipf-skewed to exercise salted url-hash repartitioning.
"""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import pandas as pd

from .config import TOX_WORDS
from .kernels import extract_text_batch
from .models import SEED_TEXT

_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

# Generation vocabulary per language, derived from the embedded seed text —
# same distribution the LM/langid profiles were trained on, so "clean" docs
# score well and gibberish doesn't.
_VOCAB: dict[str, list[str]] = {
    lang: sorted(set(SEED_TEXT[lang].split()) - {"."}) for lang in SEED_TEXT
}

CLASSES: tuple[str, ...] = (
    "clean",
    "stub",
    "repetition",
    "symbol",
    "wrong_lang",
    "pii",
    "tox",
    "gibberish",
    "bullets",
    "ellipsis",
    "code",
)
# clean-heavy mixture, every other class present
_CLASS_P = np.array(
    [0.27, 0.09, 0.09, 0.09, 0.09, 0.09, 0.06, 0.09, 0.05, 0.05, 0.03]
)


def _sentence(rng: np.random.Generator, vocab: list[str], n_words: int) -> str:
    idx = rng.integers(0, len(vocab), size=n_words)
    return " ".join(vocab[i] for i in idx)


def _lines(rng: np.random.Generator, vocab: list[str], n_words: int) -> str:
    words_left = n_words
    out = []
    while words_left > 0:
        k = int(rng.integers(8, 16))
        k = min(k, words_left)
        out.append(_sentence(rng, vocab, k) + " .")
        words_left -= k
    return "\n".join(out)


def _gen_text(rng: np.random.Generator, cls: str) -> tuple[str, str]:
    """Return (text, claimed_lang) for one document of class ``cls``."""
    en = _VOCAB["en"]
    if cls == "clean":
        # range straddles min_words=50 so even "clean" yields a few drops
        n = int(rng.integers(45, 400))
        return _lines(rng, en, n), "en"
    if cls == "stub":
        # jitter across the min_words=50 boundary: some keep, some drop
        n = int(rng.integers(5, 80))
        return _lines(rng, en, n), "en"
    if cls == "repetition":
        n = int(rng.integers(60, 200))
        base = _lines(rng, en, n)
        lines = base.split("\n")
        # repeat one line r times; small r stays under the 0.30 threshold
        r = int(rng.integers(1, max(2, len(lines))))
        rep = [lines[int(rng.integers(0, len(lines)))]] * r
        all_lines = lines + rep
        rng.shuffle(all_lines)
        return "\n".join(all_lines), "en"
    if cls == "symbol":
        n = int(rng.integers(60, 200))
        base = _lines(rng, en, n)
        toks = base.split(" ")
        frac = float(rng.uniform(0.02, 0.35))
        k = int(len(toks) * frac)
        pos = rng.integers(0, len(toks), size=k)
        syms = ["#!!", "$$$", "%%%", "@@@", "&&&*"]
        for p in pos:
            toks[int(p)] = syms[int(rng.integers(0, len(syms)))]
        return " ".join(toks), "en"
    if cls == "wrong_lang":
        lang = ["de", "fr", "es"][int(rng.integers(0, 3))]
        n = int(rng.integers(60, 300))
        # claimed lang is usually en (langid must catch it); sometimes honest
        claimed = "en" if rng.random() < 0.8 else lang
        return _lines(rng, _VOCAB[lang], n), claimed
    if cls == "pii":
        n = int(rng.integers(60, 300))
        base = _lines(rng, en, n)
        toks = base.split(" ")
        k = int(rng.integers(1, 5))
        for _ in range(k):
            kind = int(rng.integers(0, 3))
            if kind == 0:
                ins = f"user{int(rng.integers(0, 999))}@mail{int(rng.integers(0, 99))}.example.com"
            elif kind == 1:
                ins = f"{int(rng.integers(100, 999))}-{int(rng.integers(100, 999))}-{int(rng.integers(1000, 9999))}"
            else:
                ins = ".".join(str(int(x)) for x in rng.integers(1, 255, size=4))
            toks.insert(int(rng.integers(0, len(toks) + 1)), ins)
        return " ".join(toks), "en"
    if cls == "tox":
        n = int(rng.integers(60, 300))
        base = _lines(rng, en, n)
        toks = base.split(" ")
        k = int(rng.integers(1, 4))
        for _ in range(k):
            w = TOX_WORDS[int(rng.integers(0, len(TOX_WORDS)))]
            toks.insert(int(rng.integers(0, len(toks) + 1)), w)
        return " ".join(toks), "en"
    if cls == "bullets":
        # jitter across max_bullet_line_frac=0.90: some keep, some drop
        n = int(rng.integers(60, 200))
        lines = _lines(rng, en, n).split("\n")
        frac = float(rng.uniform(0.75, 1.0))
        k = int(round(len(lines) * frac))
        pos = rng.permutation(len(lines))[:k]
        for p in pos:
            lines[int(p)] = "• " + lines[int(p)]
        return "\n".join(lines), "en"
    if cls == "ellipsis":
        # jitter across max_ellipsis_line_frac=0.30
        n = int(rng.integers(60, 200))
        lines = _lines(rng, en, n).split("\n")
        frac = float(rng.uniform(0.10, 0.55))
        k = int(round(len(lines) * frac))
        pos = rng.permutation(len(lines))[:k]
        for p in pos:
            lines[int(p)] = lines[int(p)].rstrip(" .") + "..."
        return "\n".join(lines), "en"
    if cls == "code":
        # C4 brace rule: k=0 keeps, k>0 drops
        n = int(rng.integers(60, 200))
        toks = _lines(rng, en, n).split(" ")
        k = int(rng.integers(0, 4))
        for _ in range(k):
            toks.insert(int(rng.integers(0, len(toks) + 1)), "{var}")
        return " ".join(toks), "en"
    # gibberish: random letter strings — unigram-hostile → high perplexity
    n = int(rng.integers(60, 200))
    alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = []
    for _ in range(n):
        ln = int(rng.integers(3, 12))
        words.append("".join(alphabet[rng.integers(0, 26, size=ln)]))
    return " ".join(words), "en"


# Realistic page chrome around the generated prose: script + style + comment
# noise the extractor must strip, one <p> per prose line. The ``text`` column
# is DEFINED as ``extract_text_batch(html)`` so the input_hint invariant
# (byte-identical extracted text per url) holds by construction and the F1
# gate + bench exercise real extraction work.
_HTML_HEAD = (
    '<html><head><script type="text/javascript">var t = "<p>not text</p>";'
    "</script><style>p { margin: 0 }</style>"
    "<!-- generator: longqc-corpus --></head><body>"
)
_HTML_FOOT = "</body></html>"


def _render_html(prose: str) -> bytes:
    body = "".join(f"<p>{ln}</p>" for ln in prose.split("\n"))
    return (_HTML_HEAD + body + _HTML_FOOT).encode("utf-8")


def generate_corpus(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Generate the documents_cc table as pandas (small scales only)."""
    rng = np.random.default_rng(seed)
    cls_idx = rng.choice(len(CLASSES), size=n_docs, p=_CLASS_P)
    # Zipf-skewed hosts (heavy-hitter analog of repetitive minimizers,
    # reference lqmap.c:166-173)
    hosts = np.minimum(rng.zipf(1.5, size=n_docs), 500)
    rows = []
    for i in range(n_docs):
        cls = CLASSES[cls_idx[i]]
        prose, lang = _gen_text(rng, cls)
        url = f"https://host{hosts[i]}.example/{cls}/p{i}"
        rows.append(
            (url, _EPOCH + dt.timedelta(seconds=int(i)), _render_html(prose), lang)
        )
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "lang"])
    pdf["text"] = extract_text_batch(pdf["html"])
    return pdf[["url", "warc_ts", "html", "text", "lang"]]


# bump when generation logic changes: write_corpus caches by filename, so the
# version suffix is what invalidates stale fixture parquets under data_cc/
_CORPUS_GEN = 3


def corpus_path(root: str, scale: str) -> str:
    return os.path.join(root, f"documents_cc_{scale}_g{_CORPUS_GEN}.parquet")


_SCALES = {"smoke": 1_000, "correctness": 10_000, "bench": 100_000, "scaling": 400_000}


def write_corpus(root: str, scale: str = "smoke", seed: int = 42) -> str:
    """Materialize a corpus parquet under ``root`` (idempotent)."""
    os.makedirs(root, exist_ok=True)
    path = corpus_path(root, scale)
    if not os.path.exists(path):
        pdf = generate_corpus(_SCALES[scale], seed=seed)
        # microsecond timestamps: Spark cannot read TIMESTAMP(NANOS).
        # small row groups: Spark parallelizes a parquet scan only at
        # row-group granularity — a single-group file is a 1-task scan.
        pdf.to_parquet(path, index=False, coerce_timestamps="us", row_group_size=4096)
    return path
