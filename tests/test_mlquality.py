"""Trained quality scorer: pyspark.ml LR over the stat vector must learn the
rule cascade to high agreement, deterministically."""

from pyspark.sql import functions as F

from longqc_spark.mlquality import score_quality, train_quality_model
from longqc_spark.pipeline import qc_pipeline


def test_quality_model_learns_rules(spark, corpus_path):
    labels = qc_pipeline(spark.read.parquet(corpus_path), num_partitions=8).cache()
    model = train_quality_model(labels, sample_n=None)
    scored = score_quality(model, labels)
    assert "quality_prob" in scored.columns
    agg = scored.agg(
        F.avg((F.col("quality_pred") == F.col("keep")).cast("double")).alias("acc"),
        F.avg(F.when(F.col("keep"), F.col("quality_prob"))).alias("p_keep"),
        F.avg(F.when(~F.col("keep"), F.col("quality_prob"))).alias("p_drop"),
    ).collect()[0]
    assert agg["acc"] >= 0.95, agg
    assert agg["p_keep"] > agg["p_drop"] + 0.2, "probabilities must separate classes"

    # determinism: refit → identical tree (fixed feature order + seed)
    m2 = train_quality_model(labels, sample_n=None)
    strip_uid = lambda s: s.split("\n", 1)[1]  # first line carries the model uid
    assert strip_uid(model.stages[-1].toDebugString) == strip_uid(m2.stages[-1].toDebugString)
    labels.unpersist()
