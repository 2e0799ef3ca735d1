"""Stream-stream join: watermarked, time-range-bounded inner join.

Completes the streaming operator matrix (SURVEY.md §2.11): tumbling/session
windows, stateful dedup, and the QC pipeline facade are covered elsewhere;
this is the two-input stateful operator — e.g. joining a click stream to the
purchase stream within an attribution window.

Semantics: inner stream-stream join emits a pair the moment both sides have
arrived; the watermarks bound how long each side's rows are HELD in the
state store waiting for late partners (state eviction, not result change),
so with AvailableNow draining a finite backlog the result equals the batch
join with the identical time-range predicate — which is exactly what the
test asserts.

At scale: state size ≈ (input rate × watermark horizon) per side, hash-
partitioned by the join key; the time-range condition must reference both
event times or Spark cannot bound state (it will warn and keep everything).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def _sides(events: DataFrame, left_type: str, right_type: str):
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    left = ev.filter(F.col("event_type") == left_type).select(
        F.col("user_id").alias("l_user"), F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event"),
    )
    right = ev.filter(F.col("event_type") == right_type).select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event"),
    )
    return left, right


def _join_cond(window: str = "10 minutes"):
    return (
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL '{window}'"))
    )


def attribution_join_batch(
    events: DataFrame, left_type: str = "click", right_type: str = "purchase",
    window: str = "10 minutes",
) -> DataFrame:
    """Batch twin (the oracle-checkable spec): right events within ``window``
    after a left event by the same user."""
    left, right = _sides(events, left_type, right_type)
    return left.join(right, _join_cond(window)).select(
        "l_user", "l_event", "r_event",
        F.unix_micros("l_ts").alias("l_us"), F.unix_micros("r_ts").alias("r_us"),
    )


def attribution_join_stream(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    schema,
    query_name: str = "attrib",
    watermark: str = "30 minutes",
    window: str = "10 minutes",
    left_type: str = "click",
    right_type: str = "purchase",
    max_files_per_trigger: int = 1,
):
    """Streaming twin: both sides are file streams with event-time
    watermarks; AvailableNow drains the backlog and terminates. Returns the
    StreamingQuery writing to an in-memory table ``query_name``."""
    def side(d):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(d)
        )

    left, _ = _sides(side(left_dir), left_type, right_type)
    _, right = _sides(side(right_dir), left_type, right_type)
    # each side needs its own watermark so BOTH state stores are bounded
    left = left.withWatermark("l_ts", watermark)
    right = right.withWatermark("r_ts", watermark)
    joined = left.join(right, _join_cond(window)).select(
        "l_user", "l_event", "r_event",
        F.unix_micros("l_ts").alias("l_us"), F.unix_micros("r_ts").alias("r_us"),
    )
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
