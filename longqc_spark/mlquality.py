"""Trained quality scorer over the QC stat vector (pyspark.ml).

The reference's decision layer is a fixed threshold cascade
(``longQC.py:787-824``). Production web-text pipelines typically ALSO run a
trained quality classifier (the fastText-classifier pattern) whose features
are exactly the per-doc stat vector this engine already computes. This
module closes that loop Spark-natively:

    labels = qc_pipeline(docs)                  # stat vector + rule labels
    model  = train_quality_model(labels)        # VectorAssembler + LogisticRegression
    scored = model.transform(labels)            # quality_prob per doc

Design notes for 10^12 docs:
* training runs on a bounded hash-priority sample (same SA1 replacement as
  everywhere else) — the fit never sees the full corpus;
* inference is a pure map (WholeStageCodegen'd linear algebra on already-
  computed columns) — no extra Arrow pass, no shuffle;
* the model is a tiny broadcast (n_features + 1 doubles), the ``-d``
  prebuilt-index analog (``longQC.py:266-277``).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import DecisionTreeClassifier, LogisticRegression
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame, functions as F

FEATURES = [
    "n_words",
    "mean_word_len",
    "symbol_char_frac",
    "alpha_char_frac",
    "alpha_word_frac",
    "stopword_count",
    "dup_line_frac",
    "top_ngram_frac_2",
    "top_ngram_frac_3",
    "top_ngram_frac_4",
    "bullet_line_frac",
    "ellipsis_line_frac",
    "lang_score",
    "logprob_mean",
    "perplexity",
    "tox_match_count",
    "brace_char_count",
    "frac_tokens_above_q",
    "n_chars",
    "n_lines",
]


def train_quality_model(
    labels: DataFrame,
    label_col: str = "keep",
    kind: str = "tree",
    max_depth: int = 10,
    sample_n: int | None = 100_000,
    seed: int = 7,
) -> PipelineModel:
    """Fit a quality model on the rule labels.

    ``kind="tree"`` (default): a decision tree — the rule cascade is an AND
    of axis-aligned thresholds, exactly a tree's hypothesis class, so the
    model recovers the cascade almost perfectly and its splits are readable
    back as thresholds. ``kind="lr"``: logistic regression, the calibrated-
    probability variant (a linear model cannot express the AND sharply —
    use it for ranking, not for reproducing keep/drop).

    Deterministic: fixed feature order, fixed seed, and a hash-priority
    bounded sample (``ORDER BY xxhash64 LIMIT n`` — parallel-stable, the SA1
    replacement) — same data in, same model out.
    """
    train = labels.withColumn("label", F.col(label_col).cast("double"))
    key = "url" if "url" in train.columns else train.columns[0]
    if sample_n is not None:
        train = train.orderBy(F.xxhash64(F.col(key), F.lit(seed))).limit(sample_n)
    # canonical single-partition, key-sorted layout: tree split selection
    # sums float impurity stats, and summation order varies with
    # partitioning — near-tie splits could flip. Training input is bounded
    # by design (sample_n, or a report-scale table), so one sorted partition
    # makes the fit structurally deterministic, not just empirically so.
    train = train.coalesce(1).sortWithinPartitions(key)
    if kind == "tree":
        clf = DecisionTreeClassifier(
            maxDepth=max_depth, featuresCol="features", labelCol="label", seed=seed
        )
    else:
        clf = LogisticRegression(
            maxIter=50, regParam=0.01, featuresCol="features", labelCol="label"
        )
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=FEATURES, outputCol="features", handleInvalid="keep"),
            clf,
        ]
    )
    return pipe.fit(train)


def score_quality(model: PipelineModel, labels: DataFrame) -> DataFrame:
    """Add ``quality_prob`` (P(keep)) + ``quality_pred``; drops the ml
    vector columns so the result stays a plain analytic table."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(labels)
    prob = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.withColumn("quality_prob", prob).withColumn(
        "quality_pred", F.col("prediction") == 1.0
    ).drop("features", "rawPrediction", "probability", "prediction", "label")
