"""Distributed BPE training (operators.bpe) vs a pure-python reference
trainer — EXACT merge-list equality on any corpus, plus the greedy-merge
semantics, determinism under repartitioning, and the encoder round-trip.
"""

import collections

import pytest
from pyspark.sql import functions as F

from longqc_spark.operators.bpe import (
    END_OF_WORD,
    apply_bpe,
    encode_word,
    learn_bpe,
    merges_table,
    word_counts,
)


def _ref_learn_bpe(texts, n_merges, min_count=2):
    """Sennrich et al. 2016 reference trainer (serial, dict-based), with
    the same (count DESC, left, right) tie-break."""
    vocab = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(w) + (END_OF_WORD,)] += 1
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for p in zip(syms[:-1], syms[1:]):
                pairs[p] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (l, r), _ = best
        merges.append((l, r))
        new_vocab = collections.Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = new_vocab
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest new low",
    "the newer the lower the wider",
]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_matches_reference_trainer_exactly(spark):
    got = learn_bpe(_docs(spark), n_merges=25)
    assert got == _ref_learn_bpe(TEXTS, 25)
    assert len(got) > 5  # the fixture genuinely trains a vocabulary


def test_greedy_left_to_right_merge(spark):
    # 'aaaa</w>' under merge (a,a) must become [aa, aa, </w>] (greedy
    # left-to-right pairing), never [aa, a, a, </w>] — visible in the
    # rank-2/3 merges: (aa,</w>) ties (aa,aa) at count 3 and wins the
    # lexicographic tie-break ('<' sorts before 'a'), then (aa, aa</w>)
    # closes the word. The non-greedy rewrite would have left singleton
    # 'a' symbols and learned (a,</w>) instead.
    corpus = ["aaaa aaaa aaaa"]
    got = learn_bpe(_docs(spark, corpus), n_merges=3)
    assert got == [("a", "a"), ("aa", END_OF_WORD), ("aa", "aa" + END_OF_WORD)]
    assert got == _ref_learn_bpe(corpus, 3)


def test_partitioning_invariant(spark):
    docs = _docs(spark)
    assert learn_bpe(docs.repartition(7), n_merges=12) == learn_bpe(
        docs.coalesce(1), n_merges=12
    )


def test_min_count_stops_early(spark):
    # every word unique → every pair count 1 → nothing reaches min_count=2
    assert learn_bpe(_docs(spark, ["abc xyz"]), n_merges=10) == []


def test_encoder_roundtrip_and_apply(spark):
    docs = _docs(spark)
    merges = learn_bpe(docs, n_merges=20)
    ranks = {p: i for i, p in enumerate(merges)}
    # encoding then stripping markers reconstructs the word
    for w in ("lowest", "newer", "the", "unseen"):
        toks = encode_word(w, ranks)
        assert "".join(toks).replace(END_OF_WORD, "") == w
    out = apply_bpe(docs, merges).orderBy("doc_id").collect()
    for row in out:
        expect = []
        for w in row.text.lower().split():
            expect.extend(encode_word(w, ranks))
        assert row.bpe_tokens == expect
    # the artifact table carries ranks in training order
    mt = merges_table(spark, merges).orderBy("rank").collect()
    assert [(r.left, r.right) for r in mt] == merges


def test_word_counts_contract(spark):
    rows = {
        (r.word, r["count"])
        for r in word_counts(_docs(spark, ["A a  b", "a"])).collect()
    }
    assert rows == {("a", 3), ("b", 1)}
