"""Unigram-LM tokenizer training (operators.unigram) vs brute-force lattice
enumeration and a serial reference trainer — EXACT vocabulary + micro-logprob
equality (the integer-quantized E-step makes the distributed sum order-free),
plus Viterbi optimality, coverage, and the Arrow-batched encoder.
"""

import collections
import math

import pytest
from pyspark.sql import functions as F

from longqc_spark.operators.unigram import (
    MICRO,
    apply_unigram,
    expected_counts,
    seed_vocab,
    train_unigram,
    viterbi_segment,
    vocab_table,
    word_counts,
    word_expected_counts,
)


@pytest.fixture(scope="module")
def docs(spark, sf001):
    return spark.read.parquet(f"{sf001}/documents.parquet")


def _all_segs(word, pieces, maxlen):
    """Every segmentation of ``word`` into vocabulary pieces."""
    if word == "":
        yield []
        return
    for ln in range(1, min(maxlen, len(word)) + 1):
        head = word[:ln]
        if head in pieces:
            for rest in _all_segs(word[ln:], pieces, maxlen):
                yield [head] + rest


def test_word_expected_counts_vs_enumeration():
    """Forward-backward expectation == brute-force enumeration over all
    segmentations, to within 1 micro of rounding."""
    logp = {
        "a": math.log(0.3),
        "b": math.log(0.2),
        "ab": math.log(0.35),
        "ba": math.log(0.1),
        "bab": math.log(0.05),
    }
    word, count = "abab", 7
    p = {s: math.exp(lp) for s, lp in logp.items()}
    segs = list(_all_segs(word, set(p), 3))
    assert len(segs) > 3  # the lattice is non-trivial
    z = sum(math.prod(p[s] for s in seg) for seg in segs)
    brute = collections.Counter()
    for seg in segs:
        w = math.prod(p[s] for s in seg) / z
        for s in seg:
            brute[s] += w
    got = word_expected_counts(word, count, logp, 3)
    for s, e in brute.items():
        assert abs(got[s] - int(e * count * MICRO + 0.5)) <= 1, s
    assert set(got) == {s for s, e in brute.items() if e * count * MICRO >= 0.5}


def _serial_train(
    texts, vocab_size, seed_size, max_piece_len, em_iters=2, shrink=0.75,
    max_word_len=48,
):
    """Serial mirror of train_unigram: pure-python seeding + the same EM /
    prune recurrence over a dict — shares only the per-word lattice kernel
    and the M-step, so the comparison exercises exactly the Spark plumbing
    (substring-explode seeding, integer shuffle sums, broadcast closure)."""
    from longqc_spark.operators.unigram import _renormalize

    wc = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            if w and len(w) <= max_word_len:
                wc[w] += 1
    multi = collections.Counter()
    chars = collections.Counter()
    for w, c in wc.items():
        for ch in w:
            chars[ch] += c
        for i in range(len(w) - 1):
            for ln in range(2, min(max_piece_len, len(w) - i) + 1):
                multi[w[i : i + ln]] += c
    top = sorted(multi.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    scores = dict(top)
    for ch, c in chars.items():
        scores[ch] = scores.get(ch, 0) + c
    total = sum(scores.values())
    logp = {s: math.log(v / total) for s, v in scores.items()}
    char_set = set(chars)
    while True:
        for _ in range(max(1, em_iters)):
            micro = collections.Counter()
            for w, c in wc.items():
                for s, m in word_expected_counts(w, c, logp, max_piece_len).items():
                    micro[s] += m
            logp = _renormalize(micro, char_set)
        mlist = sorted(
            (s for s in logp if len(s) > 1), key=lambda s: (-micro.get(s, 0), s)
        )
        n_target = max(vocab_size - len(char_set), 0)
        if len(mlist) <= n_target:
            break
        keep = max(n_target, int(len(mlist) * shrink))
        if keep >= len(mlist):
            keep = n_target
        for s in mlist[keep:]:
            del logp[s]
        logp = _renormalize({s: micro.get(s, 0) for s in logp}, char_set)
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def test_train_unigram_matches_serial_reference(spark, docs):
    texts = [
        r["text"]
        for r in docs.filter(F.col("text").isNotNull()).select("text").collect()
    ]
    want = _serial_train(texts, vocab_size=80, seed_size=200, max_piece_len=5)
    got = train_unigram(
        docs.filter(F.col("text").isNotNull()),
        vocab_size=80,
        seed_size=200,
        max_piece_len=5,
    )
    assert [s for s, _ in got] == [s for s, _ in want]
    # micro-quantized logprobs identical (integer E-step ⇒ bit-equal probs)
    for (gs, gl), (ws, wl) in zip(got, want):
        assert int(round(gl * MICRO)) == int(round(wl * MICRO)), gs
    # repartition-stable (order-free integer sums)
    again = train_unigram(
        docs.filter(F.col("text").isNotNull()).repartition(7),
        vocab_size=80,
        seed_size=200,
        max_piece_len=5,
    )
    assert again == got


def test_seed_vocab_matches_python(spark):
    rows = [("the cat sat on the mat",), ("the cat ran",)]
    df = spark.createDataFrame(rows, "text string")
    pieces, chars = seed_vocab(word_counts(df), seed_size=10, max_piece_len=3)
    ref_multi = collections.Counter()
    ref_chars = collections.Counter()
    wc = collections.Counter(w for r in rows for w in r[0].split())
    for w, c in wc.items():
        for ch in w:
            ref_chars[ch] += c
        for i in range(len(w) - 1):
            for ln in range(2, min(3, len(w) - i) + 1):
                ref_multi[w[i : i + ln]] += c
    top10 = dict(sorted(ref_multi.items(), key=lambda kv: (-kv[1], kv[0]))[:10])
    assert pieces == top10
    assert chars == dict(ref_chars)


def test_viterbi_is_optimal_and_covering():
    logp = {
        "a": math.log(0.2),
        "b": math.log(0.1),
        "c": math.log(0.05),
        "ab": math.log(0.3),
        "bc": math.log(0.25),
        "abc": math.log(0.1),
    }
    for word in ("abcabc", "aabbcc", "cab", "abcb"):
        seg = viterbi_segment(word, logp, max_piece_len=3)
        assert "".join(seg) == word
        best = max(
            (sum(logp[s] for s in sg) for sg in _all_segs(word, set(logp), 3)),
        )
        assert abs(sum(logp[s] for s in seg) - best) < 1e-12
    # OOV characters fall back to singles, coverage never breaks
    assert "".join(viterbi_segment("axb", logp, 3)) == "axb"


def test_apply_unigram_matches_direct(spark):
    rows = [("the cat sat",), ("a cab ran",), (None,)]
    df = spark.createDataFrame(rows, "text string")
    vocab = _serial_train(
        [r[0] for r in rows if r[0]], vocab_size=30, seed_size=50, max_piece_len=4
    )
    out = {
        tuple(r["pieces"])
        for r in apply_unigram(df, vocab, max_piece_len=4).collect()
    }
    logp = dict(vocab)
    direct = {
        tuple(
            p
            for w in (t or "").lower().split()
            for p in viterbi_segment(w, logp, 4)
        )
        for t, in rows
    }
    assert out == direct
    # expected_counts plumbing: distributed == serial on the same table
    wc = word_counts(df.filter(F.col("text").isNotNull()))
    dist = {
        r["piece"]: r["micro"]
        for r in expected_counts(wc, logp, 4).collect()
    }
    ser = collections.Counter()
    for r in wc.collect():
        for s, m in word_expected_counts(r["word"], r["count"], logp, 4).items():
            ser[s] += m
    assert dist == dict(ser)


def test_vocab_table_schema(spark):
    t = vocab_table(spark, [("ab", -1.5), ("a", -2.25)])
    rows = t.collect()
    assert [r["piece"] for r in rows] == ["ab", "a"]
    assert [r["logprob_micro"] for r in rows] == [-1_500_000, -2_250_000]
