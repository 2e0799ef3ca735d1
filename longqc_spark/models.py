"""Deterministic, dependency-free model artifacts.

Two broadcastable numpy artifacts, the web-text analogs of LongQC's
precomputed lookup tables (q2p table, reference ``lqutils.c:26-58``) and the
pre-built minimap2 index reused across runs (reference ``longQC.py:266-277``):

* ``LangIdModel`` — fastText-style character-trigram linear scorer, profiles
  built at import from embedded seed paragraphs (public sample sentences).
* ``HashedNgramLM`` — KenLM-style hashed word n-gram (up to 5) count LM with
  stupid backoff; perplexity = exp(-mean token logprob).

Everything is pure numpy over hashed buckets; hashing uses ``zlib.crc32``
(stable across processes — Python's builtin ``hash`` is salted and must never
be used here). Both the Spark pandas UDFs and the pandas reference labeler
score through THIS module, which is what makes F1 a structural identity.
"""

from __future__ import annotations

import math
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# Embedded seed corpora (a few public-domain-style sentences per language).
# These train both the language-ID profiles and the English LM.
# ---------------------------------------------------------------------------

SEED_TEXT: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and runs into the green "
        "forest where the old river bends toward the quiet village . every "
        "morning the people walk to the market to buy bread milk and fresh "
        "fruit while children play near the stone bridge . history tells us "
        "that knowledge and patience build strong cities and good roads . "
        "the weather in the north is cold in winter but the summer brings "
        "long warm days and clear skies over the mountains . science helps "
        "us understand the world around us from the smallest seed to the "
        "largest star in the night sky . a good book and a cup of tea make "
        "the evening pass with ease and comfort for young and old alike ."
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und läuft in "
        "den grünen wald wo der alte fluss sich zum stillen dorf wendet . "
        "jeden morgen gehen die leute zum markt um brot milch und frisches "
        "obst zu kaufen während die kinder an der steinernen brücke spielen . "
        "die geschichte lehrt uns dass wissen und geduld starke städte und "
        "gute straßen bauen . das wetter im norden ist kalt im winter aber "
        "der sommer bringt lange warme tage und klaren himmel über den "
        "bergen . die wissenschaft hilft uns die welt zu verstehen ."
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et court "
        "dans la forêt verte où la vieille rivière se courbe vers le village "
        "tranquille . chaque matin les gens marchent au marché pour acheter "
        "du pain du lait et des fruits frais pendant que les enfants jouent "
        "près du pont de pierre . l histoire nous apprend que le savoir et "
        "la patience construisent des villes fortes et de bonnes routes . le "
        "temps au nord est froid en hiver mais l été apporte de longues "
        "journées chaudes et un ciel clair au dessus des montagnes ."
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso y corre hacia "
        "el bosque verde donde el viejo río se curva hacia el pueblo "
        "tranquilo . cada mañana la gente camina al mercado para comprar pan "
        "leche y fruta fresca mientras los niños juegan cerca del puente de "
        "piedra . la historia nos enseña que el conocimiento y la paciencia "
        "construyen ciudades fuertes y buenos caminos . el clima del norte "
        "es frío en invierno pero el verano trae días largos y cálidos y "
        "cielos claros sobre las montañas ."
    ),
}

LANGS: tuple[str, ...] = tuple(sorted(SEED_TEXT))


def _crc(data: bytes, seed: int = 0) -> int:
    return zlib.crc32(data, seed) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Language ID — hashed character-trigram multinomial profiles
# ---------------------------------------------------------------------------

_LID_BUCKETS = 1 << 16


class LangIdModel:
    """Per-language log-probability table over hashed char trigrams.

    score(text, lang) = mean over trigrams of log P(trigram | lang) with
    add-one smoothing in hashed space. Prediction = argmax; confidence =
    (best - second) margin, a fastText-confidence analog.
    """

    def __init__(self) -> None:
        self.langs = LANGS
        table = np.zeros((len(LANGS), _LID_BUCKETS), dtype=np.float64)
        for li, lang in enumerate(LANGS):
            idx = self._trigram_buckets(SEED_TEXT[lang])
            np.add.at(table[li], idx, 1.0)
            total = table[li].sum()
            table[li] = np.log((table[li] + 1.0) / (total + _LID_BUCKETS))
        self.logprob = table

    @staticmethod
    def _trigram_buckets(text: str) -> np.ndarray:
        b = (" " + text.lower() + " ").encode("utf-8", "ignore")
        n = len(b)
        if n < 3:
            return np.zeros(0, dtype=np.int64)
        # vectorized rolling 3-byte hash over the utf-8 bytes
        arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
        tri = arr[:-2] * 65536 + arr[1:-1] * 256 + arr[2:]
        # multiplicative hash into buckets (Knuth constant), deterministic
        return ((tri * 2654435761) & 0xFFFFFFFF) % _LID_BUCKETS

    def score(self, text: str) -> tuple[str, float]:
        """Return (predicted_lang, margin)."""
        idx = self._trigram_buckets(text)
        if idx.size == 0:
            return "und", 0.0
        means = self.logprob[:, idx].mean(axis=1)
        order = np.argsort(means)[::-1]
        best, second = order[0], order[1]
        return self.langs[int(best)], float(means[best] - means[second])


# ---------------------------------------------------------------------------
# Hashed n-gram LM (KenLM-style stand-in)
# ---------------------------------------------------------------------------

_LM_BUCKETS = 1 << 18
_BACKOFF = 0.4
_MAX_ORDER = 5
_POLY_K = np.uint64(2654435761)  # Knuth multiplicative constant
_MASK32 = np.uint64(0xFFFFFFFF)


def token_crcs(tokens: list[str]) -> np.ndarray:
    """Per-token crc32 values (the only per-token Python work in the LM)."""
    return np.fromiter(
        (_crc(t.encode("utf-8", "ignore")) for t in tokens),
        dtype=np.uint64,
        count=len(tokens),
    )


def ngram_buckets(crcs: np.ndarray, order: int) -> np.ndarray:
    """Vectorized polynomial hash of every ``order``-gram ending at position i.

    bucket[i] hashes tokens[i-order+1 .. i]; positions i < order-1 are invalid
    (caller masks them). hash = sum_j crc[i-j] * K^j  (mod 2^32).
    """
    n = crcs.shape[0]
    h = np.zeros(n, dtype=np.uint64)
    k = np.uint64(1)
    for j in range(order):
        if j == 0:
            h = (h + crcs) & _MASK32
        else:
            h[j:] = (h[j:] + crcs[:-j] * k) & _MASK32
        k = (k * _POLY_K) & _MASK32
    return (h % np.uint64(_LM_BUCKETS)).astype(np.int64)


class HashedNgramLM:
    """Count-based hashed 5-gram LM with stupid backoff (alpha=0.4).

    meanQ / per-base-quality analog (reference ``lqutils.c:26-58``): per-token
    logprob plays the role of per-base QV; ``frac_tokens_above`` mirrors the
    Q7-base-count kernel (reference ``lqutils.c:72-80``). All scoring is
    numpy-vectorized over hashed bucket lookups.
    """

    def __init__(self, train_text: str | None = None) -> None:
        text = train_text if train_text is not None else SEED_TEXT["en"]
        tokens = text.lower().split()
        crcs = token_crcs(tokens)
        # counts[k] holds k-gram counts (slot 0 unused)
        self.counts = [np.zeros(_LM_BUCKETS, dtype=np.float64) for _ in range(_MAX_ORDER + 1)]
        for order in range(1, _MAX_ORDER + 1):
            if len(tokens) >= order:
                idx = ngram_buckets(crcs, order)[order - 1 :]
                np.add.at(self.counts[order], idx, 1.0)
        self.totals = [float(c.sum()) for c in self.counts]
        self.vocab = max(1.0, float((self.counts[1] > 0).sum()))

    def token_logprobs(self, tokens: list[str]) -> np.ndarray:
        """Per-token log P(token | up to 4 preceding tokens), stupid backoff,
        fully vectorized: for each order 5..2, lp = log(c_k/c_{k-1}) where both
        counts are nonzero, else back off with log(alpha) penalty; final
        fallback is add-one-smoothed unigram."""
        n = len(tokens)
        if n == 0:
            return np.zeros(0, dtype=np.float64)
        crcs = token_crcs(tokens)
        buckets = {k: ngram_buckets(crcs, k) for k in range(1, _MAX_ORDER + 1)}
        log_alpha = math.log(_BACKOFF)
        uni = self.counts[1][buckets[1]]
        out = np.log((uni + 1.0) / (self.totals[1] + self.vocab))
        penalty = np.zeros(n, dtype=np.float64)
        resolved = np.zeros(n, dtype=bool)
        # context buckets for order k are the (k-1)-gram ending at i-1
        for order in range(_MAX_ORDER, 1, -1):
            num = self.counts[order][buckets[order]]
            ctx = np.zeros(n, dtype=np.float64)
            ctx[1:] = self.counts[order - 1][buckets[order - 1][:-1]]
            valid = np.arange(n) >= (order - 1)
            hit = (~resolved) & valid & (num > 0) & (ctx > 0)
            if hit.any():
                out[hit] = np.log(num[hit] / ctx[hit]) + penalty[hit]
                resolved |= hit
            penalty[(~resolved) & valid] += log_alpha
        out[~resolved] += penalty[~resolved]
        return out

    def doc_score(self, text: str, q_threshold: float = -8.0) -> tuple[float, float]:
        """Return (mean_logprob, frac_tokens_above_threshold)."""
        lps = self.token_logprobs(text.lower().split())
        if lps.size == 0:
            return -20.0, 0.0
        return float(lps.mean()), float((lps > q_threshold).mean())


# Module-level singletons, built once per process (per-executor lazy init is
# handled by module import caching inside UDF workers — the Spark analog of
# reusing the pre-built index, reference longQC.py:266-277).
_LANGID: LangIdModel | None = None
_LM: HashedNgramLM | None = None


def langid_model() -> LangIdModel:
    global _LANGID
    if _LANGID is None:
        _LANGID = LangIdModel()
    return _LANGID


def ngram_lm() -> HashedNgramLM:
    global _LM
    if _LM is None:
        _LM = HashedNgramLM()
    return _LM
