"""Interpolated Kneser-Ney bigram LM — distributed estimation + scoring,
fully in-plan and SQL-replayable (the "KenLM-style" estimator behind
perplexity quality scoring, complementing the hashed stupid-backoff model
in ``models.HashedNgramLM`` with the real smoothing arithmetic).

Every KN quantity is an integer aggregate of the bigram table:

* c(w1,w2)            — bigram count
* c(w1·), N1+(w1·)    — left-context total + distinct continuations
* N1+(·w2)            — distinct left contexts (the continuation count)
* N, V2               — distinct bigram types, distinct continuation types
* n1, n2              — bigram count-of-counts (→ discount D = n1/(n1+2n2))

so the model is deterministic and a DuckDB oracle replays it exactly; the
only floats are the final ``log()`` calls, micro-quantized to int64
(``floor(x·1e6 + 0.5)``) like ``temperature_quotas`` / the unigram
trainer, which keeps every downstream aggregate integer-exact.

Smoothing (interpolated KN, one discount; Chen & Goodman 1999):

  P(w2|w1) = (c(w1,w2) - D)/c(w1·) + D·N1+(w1·)/c(w1·) · Pc(w2)

with the continuation distribution add-one smoothed over the observed
continuation types plus one UNK slot, so unseen and unknown words score
deterministically:

  Pc(w2) = (N1+(·w2) + 1) / (N + V2 + 1)     UNK: 1/(N + V2 + 1)

  unseen pair, known w1 :  P = D·N1+(w1·)/c(w1·) · Pc(w2)
  unknown w1            :  P = Pc(w2)

(D falls back to 0.5 on a degenerate corpus with no singleton/doubleton
bigrams — n1 + 2·n2 = 0 — where the Good-Turing estimate is undefined.)

Scale posture: tokenize+bigram-explode is pure JVM (split + transform —
zero Python); ONE exchange hash-partitions by w1 and is reused by the
(w1,w2) groupBy (HashPartitioning(w1) satisfies the clustered
distribution) AND the per-w1 window aggregates; the continuation side is
one more vocab-sized exchange keyed w2; the count-of-counts/normalizer
aggregates are 1-row broadcast scalars. Scoring joins the probe corpus's
bigrams against the vocab-sized model tables (shuffle joins on
(w1,w2)/w1/w2 — AQE broadcasts them when the vocab fits).

Reference analog: the reference's per-base QV model is a fixed table the
scan scores against (``lqutils.c:26-58``); here the table is estimated
from the corpus itself with the standard LM smoothing.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window, functions as F

from .quant import MICRO, micro_quantize as _qz, ws_tokens

BOS, EOS = "<s>", "</s>"


def doc_bigrams(
    df: DataFrame, text_col: str = "text", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Corpus → one row per in-doc bigram (w1, w2), with ``<s>``/``</s>``
    sentence boundaries per document (KenLM's convention — every token
    incl. ``</s>`` is scored, conditioned on a real left context). Pure
    JVM: split + transform/explode, no Python. NULL texts contribute
    nothing; an empty text is the single bigram (<s>, </s>)."""
    toks = F.concat(
        F.array(F.lit(BOS)), ws_tokens(text_col), F.array(F.lit(EOS))
    )
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(*keep_cols, toks.alias("_toks"))
        .select(
            *keep_cols,
            F.explode(
                F.expr(
                    "transform(slice(_toks, 1, size(_toks) - 1), "
                    "(t, i) -> struct(t AS w1, _toks[i + 1] AS w2))"
                )
            ).alias("b"),
        )
        .select(*keep_cols, "b.w1", "b.w2")
    )


def kn_bigram_lm(
    df: DataFrame, text_col: str = "text", counts_cache: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Estimate the interpolated-KN bigram model. Returns four plans:

    * ``pair``  : (w1, w2, logp_micro) — seen-bigram log-probs
    * ``ctx``   : (w1, lambda_micro)   — log backoff mass
      λ(w1) = D·N1+(w1·)/c(w1·) for unseen continuations of a known w1
    * ``cont``  : (w2, logpc_micro)    — smoothed continuation log Pc(w2)
    * ``consts``: 1 row (unk_logpc_micro) — the UNK slot of Pc

    (an unknown w1 scores as Pc(w2) alone; an unknown w2 uses the UNK
    slot.) All model tables are vocab-bounded, not corpus-bounded.

    ``counts_cache=True``: persist the bigram-count table DISK_ONLY —
    exchange reuse does NOT span Spark actions, so a caller that runs a
    separate action per returned table (e.g. the CLI writing all four to
    parquet) would otherwise re-pay the corpus tokenize+shuffle per
    table. DISK_ONLY, not localCheckpoint/MEMORY_AND_DISK: the count
    table is vocab-sized (tens of millions of hapax-dominated rows at a
    few million docs) and storing it in unified memory while the final
    aggregation still runs starves execution memory — measured as an
    AGGREGATE_OUT_OF_MEMORY abort at 4M docs in a 32-thread single JVM.
    One-action consumers (the oracled query joins everything back into a
    single plan) keep the default. Blocks are released by the
    ContextCleaner when the plans are garbage-collected."""
    big = doc_bigrams(df, text_col).repartition(F.col("w1"))
    # HashPartitioning(w1) satisfies the (w1,w2) clustering ⇒ the groupBy
    # and the per-w1 window both reuse this single exchange
    pair_c = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    if counts_cache:
        pair_c = pair_c.persist(StorageLevel.DISK_ONLY)
    w = Window.partitionBy("w1")
    ctx_stats = pair_c.withColumn("c1", F.sum("c").over(w)).withColumn(
        "n1plus", F.count(F.lit(1)).over(w)
    )
    # count-of-counts → discount; type totals → continuation normalizer
    # (one global aggregate, broadcast as a 1-row scalar side)
    disc = pair_c.agg(
        F.count_if(F.col("c") == 1).cast("double").alias("n1"),
        F.count_if(F.col("c") == 2).cast("double").alias("n2"),
        F.count(F.lit(1)).cast("double").alias("n_types"),
        F.countDistinct("w2").cast("double").alias("v2"),
    ).withColumn(
        "d",
        F.when(
            F.col("n1") + 2.0 * F.col("n2") > 0.0,
            F.col("n1") / (F.col("n1") + 2.0 * F.col("n2")),
        ).otherwise(F.lit(0.5)),
    )
    znorm = F.col("n_types") + F.col("v2") + 1.0
    cont_c = pair_c.groupBy("w2").agg(
        F.count(F.lit(1)).cast("double").alias("n_left")
    )
    cont = cont_c.crossJoin(F.broadcast(disc)).select(
        "w2", _qz(F.log((F.col("n_left") + 1.0) / znorm)).alias("logpc_micro")
    )
    consts = disc.select(_qz(F.log(1.0 / znorm)).alias("unk_logpc_micro"))
    joined = ctx_stats.crossJoin(F.broadcast(disc)).join(
        cont_c.withColumnRenamed("n_left", "_nl"), "w2"
    )
    pc = (F.col("_nl") + 1.0) / znorm
    lam = F.col("d") * F.col("n1plus") / F.col("c1")
    pair = joined.select(
        "w1",
        "w2",
        _qz(F.log((F.col("c") - F.col("d")) / F.col("c1") + lam * pc)).alias(
            "logp_micro"
        ),
    )
    ctx = (
        ctx_stats.groupBy("w1")
        .agg(F.first("c1").alias("c1"), F.first("n1plus").alias("n1plus"))
        .crossJoin(F.broadcast(disc))
        .select(
            "w1",
            _qz(F.log(F.col("d") * F.col("n1plus") / F.col("c1"))).alias(
                "lambda_micro"
            ),
        )
    )
    return pair, ctx, cont, consts


def kn_score(
    probe: DataFrame,
    pair: DataFrame,
    ctx: DataFrame,
    cont: DataFrame,
    consts: DataFrame,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Score a probe corpus against a trained KN bigram model: per doc,
    the integer sum of per-token micro log-probs + the token/backoff
    split — Σ of int64 is exact, so per-doc and corpus-level rollups stay
    bit-stable.

    Scale posture (the round-5 ≥2× rework): the naive shape — three left
    joins of the per-occurrence gram stream against the model tables on
    three DIFFERENT keys ((w1,w2), w1, w2) — shuffles the corpus-sized
    stream three times. Instead the per-gram log-prob is a pure function
    of the bigram TYPE, so score the types once: distinct probe types
    (map-side partial distinct — the exchange carries per-partition
    type counts, far below the stream), the three model joins run on
    that vocab-bounded type table (which also semi-join-prunes the model
    tables to the probe's vocabulary — the decontaminate move), and the
    gram stream pays ONE equi-join on (w1,w2) against the unified
    type-score table (AQE broadcasts it outright when the probe
    vocabulary fits) before the per-doc rollup's map-side partial
    aggregation collapses it to one row per doc per partition. Measured
    at 4M docs: 2.1× (294.9 s vs 622.5 s, 13.6k vs 6.4k docs/s —
    BENCH_CORPUS.json kn_bigram_lm.score_sec; the synthetic corpus is
    hapax-heavy, 48M types from ~230M grams, so the type-table reduction
    is ~5×; a natural-language corpus reduces further).
    Bit-identical to the old shape — the lp expression is evaluated on
    the same int64 micro values, once per type instead of per
    occurrence, and Σ lp = Σ cnt·lp exactly in int64."""
    grams = doc_bigrams(probe, text_col, keep_cols)
    types = grams.select("w1", "w2").distinct()
    pc_eff = F.coalesce(F.col("logpc_micro"), F.col("unk_logpc_micro"))
    tscore = (
        types.join(pair, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .join(cont, ["w2"], "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "w1",
            "w2",
            F.coalesce(
                F.col("logp_micro"), F.col("lambda_micro") + pc_eff, pc_eff
            ).alias("_lp"),
            F.col("logp_micro").isNull().alias("_backoff"),
        )
    )
    # inner join: every probe type is present in tscore by construction
    return (
        grams.join(tscore, ["w1", "w2"])
        .groupBy(*keep_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("_lp").cast("bigint").alias("sum_logp_micro"),
            F.count_if(F.col("_backoff")).cast("bigint").alias("n_backoff"),
        )
    )


def doc_trigrams(
    df: DataFrame, text_col: str = "text", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Corpus → one row per in-doc trigram (u, v, w) with DOUBLE-``<s>``
    left padding (every real token, incl. ``</s>``, gets a full 2-token
    context — KenLM's convention). Pure JVM. An empty text is the single
    trigram (<s>, <s>, </s>)."""
    toks = F.concat(
        F.array(F.lit(BOS), F.lit(BOS)), ws_tokens(text_col), F.array(F.lit(EOS))
    )
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(*keep_cols, toks.alias("_toks"))
        .select(
            *keep_cols,
            F.explode(
                F.expr(
                    "transform(slice(_toks, 1, size(_toks) - 2), "
                    "(t, i) -> struct(t AS u, _toks[i + 1] AS v, "
                    "_toks[i + 2] AS w))"
                )
            ).alias("g"),
        )
        .select(*keep_cols, "g.u", "g.v", "g.w")
    )


def kn_trigram_lm(
    df: DataFrame, text_col: str = "text", counts_cache: bool = False
) -> dict[str, DataFrame]:
    """Modified-interpolated-KN TRIGRAM model: the recursion

      P3(w|u,v) = (c3−D3)/c3(uv·) + D3·N1+(uv·)/c3(uv·) · P2(w|v)
      P2(w|v)   = (ĉ2−D2)/ĉ2(v·) + D2·N1+(v·)/ĉ2(v·) · Pc(w)

    where ĉ2(v,w) = N1+(·vw) is the CONTINUATION count (distinct left
    contexts — the modified-KN lower-order correction, not raw bigram
    counts) and Pc is the add-one smoothed continuation unigram with an
    UNK slot (same convention as ``kn_bigram_lm``). EVERY quantity
    derives from ONE corpus-sized aggregate — the trigram count table —
    so the estimator pays one exchange keyed (u,v,w) plus vocab-bounded
    rollups; discounts D3/D2 are count-of-count scalars (0.5 on a
    degenerate corpus). Log-probs micro-quantized int64 throughout.

    Returns {'tri': (u,v,w,logp3_micro), 'ctx3': (u,v,lambda3_micro),
    'bi': (v,w,logp2_micro), 'ctx2': (v,lambda2_micro),
    'cont': (w,logpc_micro), 'consts': 1 row (unk_logpc_micro)} — the
    6-table artifact ``kn_trigram_score`` consumes."""
    # Type-level cost note (ADVICE r5): scoring works on DISTINCT n-gram
    # types, so the measured 2.1x win over per-occurrence scoring assumes
    # grams:types well above 1 (the 4M synth corpus sits near 5:1). On an
    # all-hapax corpus the type table approaches the gram stream itself
    # and the rework degrades to roughly the old cost plus the distinct
    # shuffle — expected behavior, not a regression.
    c3 = (
        doc_trigrams(df, text_col)
        .repartition(F.col("u"), F.col("v"))
        .groupBy("u", "v", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if counts_cache:
        # multi-action callers (CLI/bench writing the 6 tables) pay the
        # corpus trigram shuffle ONCE — see kn_bigram_lm's docstring
        c3 = c3.persist(StorageLevel.DISK_ONLY)
    w3 = Window.partitionBy("u", "v")
    tri_stats = c3.withColumn("c3ctx", F.sum("c").over(w3)).withColumn(
        "n3plus", F.count(F.lit(1)).over(w3)
    )
    # continuation bigrams: ĉ2(v,w) = distinct u preceding (v,w); rows of
    # c3 are distinct (u,v,w), so a plain count per (v,w) IS the distinct-u
    # count (no countDistinct Expand)
    b2 = c3.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c2"))
    w2 = Window.partitionBy("v")
    bi_stats = b2.withColumn("c2ctx", F.sum("c2").over(w2)).withColumn(
        "n2plus", F.count(F.lit(1)).over(w2)
    )
    # continuation unigram: N1+(·w) over the (v,w) type table
    cc1 = b2.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("n_left"))
    disc = (
        c3.agg(
            F.count_if(F.col("c") == 1).cast("double").alias("n1_3"),
            F.count_if(F.col("c") == 2).cast("double").alias("n2_3"),
        )
        .crossJoin(
            b2.agg(
                F.count_if(F.col("c2") == 1).cast("double").alias("n1_2"),
                F.count_if(F.col("c2") == 2).cast("double").alias("n2_2"),
                F.count(F.lit(1)).cast("double").alias("n_types"),
                F.countDistinct("w").cast("double").alias("v1"),
            )
        )
        .select(
            F.when(
                F.col("n1_3") + 2.0 * F.col("n2_3") > 0.0,
                F.col("n1_3") / (F.col("n1_3") + 2.0 * F.col("n2_3")),
            ).otherwise(F.lit(0.5)).alias("d3"),
            F.when(
                F.col("n1_2") + 2.0 * F.col("n2_2") > 0.0,
                F.col("n1_2") / (F.col("n1_2") + 2.0 * F.col("n2_2")),
            ).otherwise(F.lit(0.5)).alias("d2"),
            (F.col("n_types") + F.col("v1") + 1.0).alias("z"),
        )
    )
    cont = cc1.crossJoin(F.broadcast(disc)).select(
        "w", _qz(F.log((F.col("n_left") + 1.0) / F.col("z"))).alias("logpc_micro")
    )
    consts = disc.select(
        _qz(F.log(1.0 / F.col("z"))).alias("unk_logpc_micro")
    )
    # P2 closed form per seen (v,w): its own continuation Pc(w) is seen by
    # construction (ĉ2(v,w) ≥ 1 ⇒ N1+(·w) ≥ 1)
    bi_j = bi_stats.crossJoin(F.broadcast(disc)).join(
        cc1.withColumnRenamed("n_left", "_nl"), "w"
    )
    pc = (F.col("_nl") + 1.0) / F.col("z")
    lam2 = F.col("d2") * F.col("n2plus") / F.col("c2ctx")
    bi = bi_j.select(
        "v",
        "w",
        _qz(
            F.log((F.col("c2") - F.col("d2")) / F.col("c2ctx") + lam2 * pc)
        ).alias("logp2_micro"),
    )
    ctx2 = (
        bi_stats.groupBy("v")
        .agg(F.first("c2ctx").alias("c2ctx"), F.first("n2plus").alias("n2plus"))
        .crossJoin(F.broadcast(disc))
        .select(
            "v",
            _qz(F.log(F.col("d2") * F.col("n2plus") / F.col("c2ctx"))).alias(
                "lambda2_micro"
            ),
        )
    )
    # P3 closed form per seen (u,v,w): (v,w) is seen by construction, so
    # P2 takes its seen form — join the full P2 ingredients in
    tri_j = (
        tri_stats.crossJoin(F.broadcast(disc))
        .join(
            b2.withColumnRenamed("c2", "_c2"), ["v", "w"]
        )
        .join(
            bi_stats.groupBy("v").agg(
                F.first("c2ctx").alias("_c2ctx"),
                F.first("n2plus").alias("_n2plus"),
            ),
            "v",
        )
        .join(cc1.withColumnRenamed("n_left", "_nl"), "w")
    )
    p2_val = (F.col("_c2") - F.col("d2")) / F.col("_c2ctx") + (
        F.col("d2") * F.col("_n2plus") / F.col("_c2ctx")
    ) * ((F.col("_nl") + 1.0) / F.col("z"))
    lam3 = F.col("d3") * F.col("n3plus") / F.col("c3ctx")
    tri = tri_j.select(
        "u",
        "v",
        "w",
        _qz(
            F.log((F.col("c") - F.col("d3")) / F.col("c3ctx") + lam3 * p2_val)
        ).alias("logp3_micro"),
    )
    ctx3 = (
        tri_stats.groupBy("u", "v")
        .agg(F.first("c3ctx").alias("c3ctx"), F.first("n3plus").alias("n3plus"))
        .crossJoin(F.broadcast(disc))
        .select(
            "u",
            "v",
            _qz(F.log(F.col("d3") * F.col("n3plus") / F.col("c3ctx"))).alias(
                "lambda3_micro"
            ),
        )
    )
    return {
        "tri": tri, "ctx3": ctx3, "bi": bi, "ctx2": ctx2,
        "cont": cont, "consts": consts,
    }


def kn_trigram_score(
    probe: DataFrame,
    model: dict[str, DataFrame],
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Score a probe corpus against the 6-table trigram model: the
    backoff chain nests the bigram rule once —

      inner = coalesce(p2, λ2 + pc_eff, pc_eff)       (the bigram tiers)
      lp    = coalesce(p3, λ3 + inner, inner)         (the trigram tiers)

    (an unseen (u,v) context carries backoff weight 1 — no λ3 term — the
    KenLM rule; same for unseen v.) Integer micro sums per doc; reports
    how many tokens resolved at each tier.

    Same type-level rework as :func:`kn_score`: the per-gram log-prob is
    a pure function of the trigram TYPE, so the five model joins run on
    the distinct probe (u,v,w) table — semi-join-pruning every model
    table to the probe vocabulary — and the corpus-sized gram stream
    pays ONE (u,v,w) equi-join against the unified type-score table
    instead of five shuffles on five different keys."""
    grams = doc_trigrams(probe, text_col, keep_cols)
    types = grams.select("u", "v", "w").distinct()
    pc_eff = F.coalesce(F.col("logpc_micro"), F.col("unk_logpc_micro"))
    inner = F.coalesce(
        F.col("logp2_micro"), F.col("lambda2_micro") + pc_eff, pc_eff
    )
    lp = F.coalesce(F.col("logp3_micro"), F.col("lambda3_micro") + inner, inner)
    tscore = (
        types.join(model["tri"], ["u", "v", "w"], "left")
        .join(model["ctx3"], ["u", "v"], "left")
        .join(model["bi"], ["v", "w"], "left")
        .join(model["ctx2"], ["v"], "left")
        .join(model["cont"], ["w"], "left")
        .crossJoin(F.broadcast(model["consts"]))
        .select(
            "u",
            "v",
            "w",
            lp.alias("_lp"),
            F.col("logp3_micro").isNotNull().alias("_t3"),
            (
                F.col("logp3_micro").isNull() & F.col("logp2_micro").isNotNull()
            ).alias("_t2"),
            (
                F.col("logp3_micro").isNull() & F.col("logp2_micro").isNull()
            ).alias("_t1"),
        )
    )
    return (
        grams.join(tscore, ["u", "v", "w"])
        .groupBy(*keep_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("_lp").cast("bigint").alias("sum_logp_micro"),
            F.count_if(F.col("_t3")).cast("bigint").alias("n_tri_hits"),
            F.count_if(F.col("_t2")).cast("bigint").alias("n_bi_hits"),
            F.count_if(F.col("_t1")).cast("bigint").alias("n_uni_hits"),
        )
    )
