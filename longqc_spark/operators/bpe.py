"""Distributed BPE tokenizer TRAINING (Sennrich et al. 2016) + encoding.

An LLM data pipeline doesn't just count tokens — it trains the tokenizer
on the corpus it curated. BPE training is the canonical iterative
aggregation: per round, count adjacent-symbol pairs over the word-
frequency table (weighted by word count), merge the most frequent pair
everywhere, repeat. The word-frequency table — not the corpus — is the
working set (the standard trick: a word seen 10^9 times is ONE row with
count 10^9), so every round is one partial-agg shuffle over the vocab
plus a 1-row driver argmax; the merge rewrite is a pure JVM
higher-order-function fold (no Python in the loop).

Scale posture:
* corpus → word counts: one explode + partial-agg shuffle (the same
  exchange every vocab pass pays); the result is cached — the corpus is
  scanned ONCE regardless of n_merges.
* per merge round: pair explode + partial-agg shuffle over the vocab,
  ``orderBy().limit(1)`` (TakeOrdered, no global sort), one collected
  row. Driver round-trips are inherent to the argmax recurrence — the
  same structure any distributed BPE/WordPiece trainer has.
* the symbol-array rewrite is ``F.aggregate`` (left-to-right greedy
  non-overlapping merge, the reference semantics) — JVM codegen, zero
  Python; ``localCheckpoint(eager=False)`` per round keeps the plan
  constant-size across rounds (the resolve_redirects pattern).

Reference analog: the reference's adapter-composition scan builds its
k-mer table once and iterates threshold decisions on the aggregate
(``lq_adapt.py``); here the iterated aggregate learns the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

END_OF_WORD = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, count): the working set BPE trains on. Lowercased
    whitespace tokens, the same contract as every other vocab pass."""
    return (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _initial_symbols(word: Column) -> Column:
    # split('ab', '') → ['a','b'] on Spark 3.4+ (no trailing empty); the
    # filter keeps the expression safe across versions
    return F.concat(
        F.filter(F.split(word, ""), lambda s: s != F.lit("")),
        F.array(F.lit(END_OF_WORD)),
    )


def _merge_expr(syms: Column, left: str, right: str) -> Column:
    """Greedy LEFT-TO-RIGHT non-overlapping merge of the pair
    (left, right) in a symbol array — the reference BPE semantics
    ('aaaa' with pair (a,a) → [aa, aa], not [aa, a, a]) — as a pure JVM
    fold: push each symbol, or fuse it with the accumulator tail when the
    tail is `left` and it is `right`. A just-fused tail only re-fuses if
    it EQUALS `left` again, which is exactly the greedy rescan rule."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_count: int = 2,
    min_word_count: int = 1,
) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges on the corpus; returns the ordered
    merge list [(left, right), ...]. Deterministic: the argmax tie-breaks
    on (count DESC, left, right). Stops early when no pair reaches
    ``min_count``.

    ``min_word_count`` thresholds the TRAINING DICTIONARY (the standard
    practice: hapax words carry ~zero pair mass but dominate the vocab of
    a web corpus — the 4M-doc synth corpus has 36M unique words of which
    the vast majority are singletons; keeping them multiplies the
    per-round working set for no signal). 1 = exact Sennrich semantics
    (every word participates); 2+ = the production setting."""
    spark = df.sparkSession
    words = word_counts(df, text_col)
    if min_word_count > 1:
        words = words.filter(F.col("count") >= min_word_count)
    words = words.cache()
    cur = words.select("count", _initial_symbols(F.col("word")).alias("syms"))
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            pairs = (
                cur.select(
                    "count",
                    F.explode(
                        F.expr(
                            "transform(slice(syms, 1, size(syms) - 1), "
                            "(s, i) -> struct(s AS l, syms[i + 1] AS r))"
                        )
                    ).alias("p"),
                )
                .groupBy("p.l", "p.r")
                .agg(F.sum("count").alias("n"))
                .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not pairs or pairs[0]["n"] < min_count:
                break
            left, right = pairs[0]["l"], pairs[0]["r"]
            merges.append((left, right))
            # constant-size plan per round; reassigning `cur` drops the
            # only reference to the previous round's checkpoint, whose
            # blocks the ContextCleaner then releases asynchronously —
            # at most a couple of vocab-sized RDDs are live at once (an
            # unpersisted local checkpoint cannot be recomputed, so an
            # EAGER release before the next materialization would be a
            # correctness bug, not an optimization)
            cur = cur.select(
                "count", _merge_expr(F.col("syms"), left, right).alias("syms")
            ).localCheckpoint(eager=False)
    finally:
        words.unpersist()
    return merges


def merges_table(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """Learned merges as a DataFrame (rank, left, right, merged) — the
    artifact a tokenizer ships."""
    rows = [(i, l, r, l + r) for i, (l, r) in enumerate(merges)]
    return spark.createDataFrame(rows, "rank int, left string, right string, merged string")


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference BPE encoder for ONE word: repeatedly apply the lowest-
    rank applicable merge (the standard inference rule, identical to the
    training rewrite's greedy left-to-right scan per merge)."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best, best_rank = None, None
        for pair in zip(syms[:-1], syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = pair, r
        if best is None:
            break
        left, right = best
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize the corpus with learned merges: the merge ranks ride a
    broadcast closure into ONE Arrow-batched pass, and the per-batch
    encoder memoizes by UNIQUE word (a per-task dict) so a word repeated
    10^6 times in a task is encoded once — the flat-stream pattern the
    stat kernels use. → input columns + ``out_col`` array<string>."""
    import pandas as pd

    from pyspark.sql import types as T

    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )

    def compute(batches):
        memo: dict[str, list[str]] = {}  # per-task unique-word cache
        for pdf in batches:
            texts = pdf[text_col].fillna("").str.lower()
            encoded = []
            for t in texts:
                toks: list[str] = []
                for w in t.split():
                    enc = memo.get(w)
                    if enc is None:
                        enc = memo[w] = encode_word(w, ranks)
                    toks.extend(enc)
                encoded.append(toks)
            yield pdf.assign(**{out_col: pd.Series(encoded, index=pdf.index)})

    return df.mapInPandas(compute, schema=out_schema)
