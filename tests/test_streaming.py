"""Structured Streaming facade: AvailableNow micro-batches must reproduce the
batch tumbling-window aggregate exactly (the chunk-loop-as-micro-batch
equivalence, SURVEY.md §2.11)."""

import pandas as pd

from longqc_spark.streaming.occupancy import (
    interval_occupancy,
    stream_tumbling_counts,
    tumbling_counts,
)


def _stage_events_dir(spark, sf001, tmp_path) -> tuple[str, "object"]:
    """Streaming sources need a directory; write events as 4 files so
    maxFilesPerTrigger=1 yields several micro-batches."""
    events = spark.read.parquet(f"{sf001}/events.parquet")
    d = str(tmp_path / "events_dir")
    events.repartition(4).write.mode("overwrite").parquet(d)
    return d, events


def test_stream_matches_batch(spark, sf001, tmp_path):
    d, events = _stage_events_dir(spark, sf001, tmp_path)
    batch = tumbling_counts(events).toPandas()

    q = stream_tumbling_counts(spark, d, events.schema, query_name="occ_test")
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM occ_test")
        .toPandas()
        .sort_values(["win_start", "event_type"])
        .reset_index(drop=True)
    )
    assert len(got) == len(batch)
    pd.testing.assert_frame_equal(got, batch.reset_index(drop=True), check_like=True)


def test_stream_foreachbatch_parquet(spark, sf001, tmp_path):
    d, events = _stage_events_dir(spark, sf001, tmp_path)
    out = str(tmp_path / "occ_out")
    q = stream_tumbling_counts(spark, d, events.schema, out_dir=out)
    q.awaitTermination(120)
    final = spark.read.parquet(out + "/epoch=*")
    batch = tumbling_counts(events)
    # the last complete-mode epoch holds the full result
    last = sorted(int(p.split("=")[1]) for p in __import__("os").listdir(out) if p.startswith("epoch="))[-1]
    final = spark.read.parquet(f"{out}/epoch={last}")
    assert final.count() == batch.count()


def test_interval_occupancy(spark, sf001):
    events = spark.read.parquet(f"{sf001}/events.parquet")
    occ = interval_occupancy(events, cap_seconds=10).toPandas()
    assert (occ.n_active >= 1).all()
    # total active-seconds == sum of per-event (capped duration + 1)
    import pyspark.sql.functions as F

    expected = events.select(
        (F.least(F.col("value").cast("long"), F.lit(10)) + 1).alias("d")
    ).agg(F.sum("d")).collect()[0][0]
    assert occ.n_active.sum() == expected
