"""Multinomial Naive Bayes text classifier — trained and applied entirely
in-plan (pure Catalyst aggregation + joins, zero Python, no sampling cap).

The fastText-classifier pattern of quality_filter pipelines at its
Spark-native extreme: because multinomial-NB training IS a token count
(sufficient statistics = per-(token, class) counts), the model trains on
the FULL corpus in one partial-agg shuffle — unlike the stat-vector
models in ``mlquality.py`` (pyspark.ml fits on a bounded hash-priority
sample), there is no training-set cap to outgrow at 10^12 docs.

Arithmetic contract (the repo-wide determinism pattern): all sufficient
statistics are integers; per-token log-likelihood ratios and the class
prior are micro-quantized int64 (``floor(x·1e6 + 0.5)``), so per-doc
scores are exact integer sums and a DuckDB oracle replays training AND
inference bit-exactly. Add-one smoothing over the vocabulary plus one
UNK slot (unknown tokens at inference score the smoothed-zero ratio).

Scale posture: training = token explode (pure JVM) → one groupBy(token)
shuffle → vocab-bounded conditional counts; the normalizers ride a 1-row
broadcast. Inference = token explode → left join against the
vocab-bounded LLR table (AQE broadcasts it when it fits) → one
groupBy(doc) shuffle. No driver collects anywhere.

Reference analog: the reference's threshold decision layer
(``longQC.py:787-824``) is the fixed-rule ancestor of this trained
decision layer, the same relationship ``mlquality.py`` documents.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F

from .quant import MICRO, micro_quantize as _qz, ws_tokens as _toks


# log(1e6) micro-pinned: the prior sentinel for a degenerate single-class
# training set (log-odds would be ±inf; Spark's non-ANSI divide would NULL
# it silently instead). Large enough to dominate any realistic evidence
# sum, finite so integer arithmetic stays exact. Same constant in the
# serial reference and any SQL twin.
ONE_CLASS_PRIOR_MICRO = 13_815_511  # floor(ln(1e6)·1e6 + 0.5)


def nb_train(
    df: DataFrame, label_col: str, text_col: str = "text",
    counts_cache: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Fit the classifier on ``label_col`` (boolean). Returns two plans:

    * ``llr``   : (token, llr_micro) — micro-quantized
      log P(token|pos) − log P(token|neg), add-one smoothed
    * ``consts``: 1 row (prior_micro, unk_llr_micro) — the class-prior
      log-ratio and the unknown-token ratio

    NULL-text rows contribute nothing (mirrored by the SQL oracle). A
    degenerate single-class training set pins the prior at
    ±``ONE_CLASS_PRIOR_MICRO`` (ln 1e6) instead of silently NULLing the
    log-odds — every prediction then follows the one observed class
    unless token evidence overwhelms it. ``counts_cache=True``
    persists the token-count table DISK_ONLY for callers that run
    separate actions per returned table — see ``knlm.kn_bigram_lm`` for
    why disk-only and not a memory checkpoint."""
    base = df.filter(F.col(text_col).isNotNull())
    tok = base.select(
        F.col(label_col).alias("_y"), F.explode(_toks(text_col)).alias("token")
    )
    cnt = tok.groupBy("token").agg(
        F.count_if(F.col("_y")).cast("double").alias("np"),
        F.count_if(~F.col("_y")).cast("double").alias("nn"),
    )
    if counts_cache:
        cnt = cnt.persist(StorageLevel.DISK_ONLY)
    tot = cnt.agg(
        F.sum("np").alias("tp"),
        F.sum("nn").alias("tn"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    # add-one smoothing over V observed types + 1 UNK slot
    zp = F.col("tp") + F.col("v") + 1.0
    zn = F.col("tn") + F.col("v") + 1.0
    llr = cnt.crossJoin(F.broadcast(tot)).select(
        "token",
        _qz(
            F.log((F.col("np") + 1.0) / zp) - F.log((F.col("nn") + 1.0) / zn)
        ).alias("llr_micro"),
    )
    prior = base.agg(
        F.count_if(F.col(label_col)).cast("double").alias("dp"),
        F.count_if(~F.col(label_col)).cast("double").alias("dn"),
    )
    prior_col = (
        F.when(
            (F.col("dp") > 0.0) & (F.col("dn") > 0.0),
            _qz(F.log(F.col("dp") / F.col("dn"))),
        )
        .when(F.col("dp") > 0.0, F.lit(ONE_CLASS_PRIOR_MICRO))
        .otherwise(F.lit(-ONE_CLASS_PRIOR_MICRO))
        .cast("long")
    )
    consts = prior.crossJoin(tot).select(
        prior_col.alias("prior_micro"),
        _qz(F.log(zn / zp)).alias("unk_llr_micro"),
    )
    return llr, consts


def nb_predict(
    df: DataFrame,
    llr: DataFrame,
    consts: DataFrame,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Score a corpus: per doc, integer sum of token LLRs (UNK fallback)
    plus the prior → (keep_cols..., n_tokens, n_oov, score_micro, pred)
    with pred = score > 0. NULL texts are excluded (undefined evidence),
    matching training; a non-NULL but token-free text (empty or
    whitespace-only) still yields a row — zero evidence, prior-only
    score — so output rows = input docs with a text, not docs with a
    token (``explode_outer`` keeps the doc through the explode; its NULL
    token is NOT counted as OOV)."""
    grams = (
        df.filter(F.col(text_col).isNotNull())
        .select(*keep_cols, F.explode_outer(_toks(text_col)).alias("token"))
        .join(llr, ["token"], "left")
    )
    per_doc = grams.groupBy(*keep_cols).agg(
        F.count("token").cast("bigint").alias("n_tokens"),
        F.count_if(F.col("token").isNotNull() & F.col("llr_micro").isNull())
        .cast("bigint")
        .alias("n_oov"),
        F.sum("llr_micro").alias("_sum_known"),  # NULL-skipping int64 sum
    )
    return per_doc.crossJoin(F.broadcast(consts)).select(
        *keep_cols,
        "n_tokens",
        "n_oov",
        (
            F.col("prior_micro")
            + F.coalesce(F.col("_sum_known"), F.lit(0))
            + F.col("n_oov") * F.col("unk_llr_micro")
        )
        .cast("bigint")
        .alias("score_micro"),
        (
            F.col("prior_micro")
            + F.coalesce(F.col("_sum_known"), F.lit(0))
            + F.col("n_oov") * F.col("unk_llr_micro")
            > 0
        ).alias("pred"),
    )
