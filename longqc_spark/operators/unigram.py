"""SentencePiece-style unigram-LM tokenizer TRAINING (Kudo 2018) + Viterbi
encoding — the subword complement to the BPE trainer (``bpe.py``): instead
of greedy merges, a probabilistic piece inventory fit by EM over the
segmentation lattice, then pruned to the target vocabulary.

Distributed shape (the same working-set trick as BPE — the corpus is
scanned ONCE into a word-frequency table; a word seen 10^9 times is one
row with count 10^9):

* SEEDING is a pure-JVM substring explode over the word table (every
  substring of length 2..max_piece_len, score = Σ word count) + one
  partial-agg shuffle + ``orderBy().limit()`` (TakeOrdered, no global
  sort); single characters are seeded unconditionally so every word stays
  segmentable after any prune.
* Each EM round: piece log-probs ride a broadcast closure into ONE
  ``mapInPandas`` pass over the UNIQUE-word table (numpy-free per-word
  forward-backward — words are short, the table is the vocab, not the
  corpus), emitting per-piece expected counts MICRO-QUANTIZED to int64
  (``round(E·count·1e6)``). Summing integers makes the shuffle
  aggregation order-free, so the trainer is bit-reproducible across
  partitionings AND exactly matches a serial reference implementation —
  the same determinism contract as BPE's integer pair counts and
  ``temperature_quotas``' integer seats.
* M-step + prune are driver-side over ≤ |vocab| rows (vocab-bounded,
  like BPE's 1-row argmax): renormalize, keep all single chars + the
  top multi-char pieces by expected count (the standard scalable
  approximation of Kudo's loss-delta prune), shrinking by ``shrink``
  per round until ``vocab_size`` is reached.

Reference analog: the reference's iterated aggregate-then-threshold loop
over its k-mer table (``lq_adapt.py``) — here the iterated aggregate is
EM over the subword lattice.
"""

from __future__ import annotations

import math
from typing import Iterable

from pyspark.sql import DataFrame, functions as F

MICRO = 1_000_000


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, count): lowercased whitespace tokens, the same
    contract as ``bpe.word_counts`` (re-exported for symmetry)."""
    from .bpe import word_counts as _wc

    return _wc(df, text_col)


def seed_vocab(
    words: DataFrame, seed_size: int = 1000, max_piece_len: int = 8
) -> tuple[dict[str, int], dict[str, int]]:
    """Candidate inventory from the word-frequency table: all substrings
    of length 2..max_piece_len scored by Σ count (one JVM explode + one
    partial-agg shuffle + TakeOrdered top-``seed_size``), plus every
    single character (always kept — the coverage floor). Returns
    ``(pieces, chars)`` as piece→integer-score dicts (driver-bounded:
    ≤ seed_size + |alphabet| rows)."""
    subs = F.expr(
        "flatten(transform(sequence(1, char_length(word) - 1), "
        f"i -> transform(sequence(2, least({int(max_piece_len)}, "
        "char_length(word) - i + 1)), l -> substring(word, i, l))))"
    )
    multi = (
        words.filter(F.char_length("word") >= 2)
        .select(F.explode(subs).alias("piece"), "count")
        .groupBy("piece")
        .agg(F.sum("count").alias("score"))
        .orderBy(F.desc("score"), F.asc("piece"))
        .limit(int(seed_size))
        .collect()
    )
    chars = (
        words.select(
            F.explode(
                F.filter(F.split(F.col("word"), ""), lambda s: s != F.lit(""))
            ).alias("piece"),
            "count",
        )
        .groupBy("piece")
        .agg(F.sum("count").alias("score"))
        .collect()
    )
    return (
        {r["piece"]: int(r["score"]) for r in multi},
        {r["piece"]: int(r["score"]) for r in chars},
    )


def word_expected_counts(
    word: str, count: int, logp: dict[str, float], max_piece_len: int
) -> dict[str, int]:
    """Forward-backward over ONE word's segmentation lattice: expected
    number of occurrences of each piece under the unigram LM, times the
    word's corpus count, micro-quantized to int64. Shared verbatim by the
    distributed E-step and the serial reference trainer (the parity tests
    then exercise exactly the Spark plumbing around it)."""
    n = len(word)
    p = {s: math.exp(lp) for s, lp in logp.items()}
    # alpha[i] = total probability of segmenting word[:i]
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for j in range(1, n + 1):
        a = 0.0
        for i in range(max(0, j - max_piece_len), j):
            if alpha[i] > 0.0:
                pi = p.get(word[i:j])
                if pi is not None:
                    a += alpha[i] * pi
        alpha[j] = a
    z = alpha[n]
    if z <= 0.0:
        return {}
    beta = [0.0] * (n + 1)
    beta[n] = 1.0
    for i in range(n - 1, -1, -1):
        b = 0.0
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            if beta[j] > 0.0:
                pi = p.get(word[i:j])
                if pi is not None:
                    b += p[word[i:j]] * beta[j]
        beta[i] = b
    out: dict[str, int] = {}
    for i in range(n):
        if alpha[i] <= 0.0:
            continue
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            s = word[i:j]
            pi = p.get(s)
            if pi is not None and beta[j] > 0.0:
                e = alpha[i] * pi * beta[j] / z
                micro = int(e * count * MICRO + 0.5)
                if micro > 0:
                    out[s] = out.get(s, 0) + micro
    return out


def expected_counts(
    words: DataFrame, logp: dict[str, float], max_piece_len: int
) -> DataFrame:
    """Distributed E-step: one Arrow-batched pass over the unique-word
    table (piece log-probs ride the closure), one integer partial-agg
    shuffle → (piece, micro) with micro = Σ over words. Order-free by
    integer arithmetic."""

    def compute(batches: Iterable) -> Iterable:
        import pandas as pd

        for pdf in batches:
            acc: dict[str, int] = {}
            for word, count in zip(pdf["word"], pdf["count"]):
                for s, m in word_expected_counts(
                    word, int(count), logp, max_piece_len
                ).items():
                    acc[s] = acc.get(s, 0) + m
            yield pd.DataFrame(
                {"piece": list(acc.keys()), "micro": list(acc.values())}
            )

    return (
        words.mapInPandas(compute, schema="piece string, micro long")
        .groupBy("piece")
        .agg(F.sum("micro").alias("micro"))
    )


def _renormalize(micro: dict[str, int], chars: set[str]) -> dict[str, float]:
    """M-step: log-probs from integer expected counts. Single characters
    are floored at 1 micro so the coverage guarantee survives EM (a char
    expressed only through larger pieces must stay segmentable)."""
    kept = {s: m for s, m in micro.items() if m > 0 or s in chars}
    for c in chars:
        if kept.get(c, 0) <= 0:
            kept[c] = 1
    total = sum(kept.values())
    return {s: math.log(m / total) for s, m in kept.items()}


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 200,
    seed_size: int = 1000,
    max_piece_len: int = 8,
    em_iters: int = 2,
    shrink: float = 0.75,
    max_word_len: int = 48,
) -> list[tuple[str, float]]:
    """Train a unigram-LM subword vocabulary on the corpus; returns
    [(piece, logprob), ...] sorted by (logprob desc, piece) — the
    artifact a tokenizer ships. Deterministic and bit-reproducible (see
    module docstring). ``max_word_len`` drops pathological "words"
    (URLs, base64 runs) from TRAINING only — the standard guard; they
    still encode at inference through their characters."""
    words = (
        word_counts(df, text_col)
        .filter(F.char_length("word") <= int(max_word_len))
        .cache()
    )
    try:
        pieces, chars = seed_vocab(words, seed_size, max_piece_len)
        char_set = set(chars)
        # init: probs ∝ integer seed scores (substring mass for multi-char
        # pieces, corpus char counts for singles) — exact across engines
        scores = dict(pieces)
        for c, s in chars.items():
            scores[c] = scores.get(c, 0) + s
        total = sum(scores.values())
        logp = {s: math.log(v / total) for s, v in scores.items()}
        while True:
            for _ in range(max(1, em_iters)):
                rows = expected_counts(words, logp, max_piece_len).collect()
                micro = {r["piece"]: int(r["micro"]) for r in rows}
                logp = _renormalize(micro, char_set)
            multi = sorted(
                (s for s in logp if len(s) > 1),
                key=lambda s: (-micro.get(s, 0), s),
            )
            n_target_multi = max(int(vocab_size) - len(char_set), 0)
            if len(multi) <= n_target_multi:
                break
            keep = max(n_target_multi, int(len(multi) * shrink))
            if keep >= len(multi):
                keep = n_target_multi
            dropped = multi[keep:]
            for s in dropped:
                del logp[s]
            # prune changed the support: renormalize the survivors on
            # their current expected counts before the next EM round
            logp = _renormalize(
                {s: micro.get(s, 0) for s in logp}, char_set
            )
    finally:
        words.unpersist()
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int = 8
) -> list[str]:
    """Most-probable segmentation of one word (ties broken toward the
    LONGEST piece, then determinism by construction). Falls back to
    per-character pieces for any character outside the vocabulary."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    unk = min(logp.values(), default=-1.0) - 10.0  # OOV char penalty
    for j in range(1, n + 1):
        for i in range(max(0, j - max_piece_len), j):
            if best[i] == NEG:
                continue
            s = word[i:j]
            lp = logp.get(s)
            if lp is None and j - i == 1:
                lp = unk
            if lp is None:
                continue
            sc = best[i] + lp
            # strict > with i ascending prefers the SMALLEST i (longest
            # piece) on exact ties
            if sc > best[j]:
                best[j], back[j] = sc, i
    if best[n] == NEG:
        return list(word)
    out: list[str] = []
    j = n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    return out[::-1]


def vocab_table(spark, vocab: list[tuple[str, float]]) -> DataFrame:
    """Trained vocabulary as a DataFrame (rank, piece, logprob_micro) —
    the integer micro-quantized logprob keeps downstream golden pins and
    cross-run comparisons float-free."""
    rows = [
        (i, s, int(round(lp * MICRO))) for i, (s, lp) in enumerate(vocab)
    ]
    return spark.createDataFrame(
        rows, "rank int, piece string, logprob_micro long"
    )


def apply_unigram(
    df: DataFrame,
    vocab: list[tuple[str, float]],
    text_col: str = "text",
    out_col: str = "pieces",
    max_piece_len: int = 8,
) -> DataFrame:
    """Tokenize the corpus with the trained vocabulary: one Arrow-batched
    pass, per-task unique-word memo (the ``apply_bpe`` flat-stream
    pattern) → input columns + ``out_col`` array<string>."""
    import pandas as pd

    from pyspark.sql import types as T

    logp = dict(vocab)
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )

    def compute(batches: Iterable) -> Iterable:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            texts = pdf[text_col].fillna("").str.lower()
            encoded = []
            for t in texts:
                toks: list[str] = []
                for w in t.split():
                    enc = memo.get(w)
                    if enc is None:
                        enc = memo[w] = viterbi_segment(w, logp, max_piece_len)
                    toks.extend(enc)
                encoded.append(toks)
            yield pdf.assign(**{out_col: pd.Series(encoded, index=pdf.index)})

    return df.mapInPandas(compute, schema=out_schema)
