"""Windowed / streaming aggregations over the events table.

Reference analogs:
* A13 pore-occupancy time series (``lq_nanopore.py:294-325``): per-second
  count of active channels from per-record intervals → here, per-second
  active-event concurrency via ``explode(sequence(...))``.
* The chunk loop with running accumulators (``longQC.py:299-360``) is a
  hand-rolled micro-batch pipeline → here, a real Structured Streaming
  facade: ``Trigger.AvailableNow`` micro-batches with watermarked tumbling
  windows, exactly-once parquet append via ``foreachBatch``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def tumbling_counts(events: DataFrame, width: str = "1 minute") -> DataFrame:
    """Batch tumbling-window aggregate: per (window, event_type) count + sum.
    Same plan streaming uses — the batch twin is the oracle-checkable spec."""
    # TIMESTAMP_NTZ → TIMESTAMP (session TZ is UTC): watermarks require it,
    # and batch must match the streaming twin's types exactly
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        ev.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("win_start", "event_type")
    )


def interval_occupancy(
    events: DataFrame, duration_col: str = "value", cap_seconds: int = 60
) -> DataFrame:
    """Per-second concurrency (pore-occupancy analog): each event is active
    [ts, ts + min(duration, cap)); explode one row per active second, count
    per second. → (sec long, n_active long)."""
    start = F.floor(F.col("ts").cast("timestamp").cast("double")).cast("long")
    # clamp to [0, cap]: a negative duration would make sequence() descend
    dur = F.greatest(F.least(F.col(duration_col).cast("long"), F.lit(cap_seconds)), F.lit(0))
    return (
        events.select(F.explode(F.sequence(start, start + dur)).alias("sec"))
        .groupBy("sec")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("sec")
    )


def active_regions(
    events: DataFrame, min_active: int = 3, duration_col: str = "value", cap_seconds: int = 60
) -> DataFrame:
    """Maximal time regions with concurrency ≥ ``min_active`` — the full
    reliable-region sweep analog (reference ``lqutils.c:83-155``): endpoint
    events → running coverage (window sum) → gaps-and-islands grouping via
    lag + conditional cumsum. → (region_start, region_end, peak_active)."""
    from pyspark.sql import Window

    from pyspark.sql import Window as W

    start = F.floor(F.col("ts").cast("timestamp").cast("double")).cast("long")
    dur = F.greatest(F.least(F.col(duration_col).cast("long"), F.lit(cap_seconds)), F.lit(0))
    # ±1 endpoint events (the radix-sorted endpoint sweep, lqutils.c:95-153)
    deltas = events.select(
        F.explode(
            F.array(
                F.struct(start.alias("sec"), F.lit(1).alias("delta")),
                F.struct((start + dur + 1).alias("sec"), F.lit(-1).alias("delta")),
            )
        ).alias("e")
    ).select("e.sec", "e.delta")
    per_sec = deltas.groupBy("sec").agg(F.sum("delta").alias("d"))
    # running coverage at each change-point; the global orderBy window is a
    # single-task tail, fine at report scale (change points ≪ events); the
    # 10^12-row variant pre-aggregates per coarse time bucket first
    wo = W.orderBy("sec")
    wcum = wo.rowsBetween(W.unboundedPreceding, W.currentRow)
    allc = (
        per_sec.withColumn("active", F.sum("d").over(wcum))
        .withColumn("ok", (F.col("active") >= min_active).cast("int"))
        .withColumn("next_sec", F.lead("sec").over(wo))
        .withColumn(
            "island",
            F.sum(
                F.when(F.col("ok") != F.lag("ok", 1, 0).over(wo), 1).otherwise(0)
            ).over(wcum),
        )
    )
    # an ok-island spans [min(sec), first below-threshold change-point);
    # coverage holds constant between change points, so the island's last
    # row's next_sec IS the exclusive end
    return (
        allc.filter(F.col("ok") == 1)
        .groupBy("island")
        .agg(
            F.min("sec").alias("region_start"),
            F.max("next_sec").alias("region_end"),
            F.max("active").alias("peak_active"),
        )
        .drop("island")
        .orderBy("region_start")
    )


def stream_tumbling_counts(
    spark: SparkSession,
    input_dir: str,
    schema,
    width: str = "1 minute",
    watermark: str = "5 minutes",
    out_dir: str | None = None,
    query_name: str = "occupancy",
    output_mode: str = "complete",
):
    """Streaming twin of ``tumbling_counts``: parquet source micro-batched via
    AvailableNow, watermark for late data, memory sink (or exactly-once
    parquet append via foreachBatch when ``out_dir`` given).

    Returns the StreamingQuery; callers ``awaitTermination()`` (AvailableNow
    terminates when the backlog is drained).
    """
    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
    )
    agg = (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
    if out_dir is None:
        # complete = running totals (reference's cross-chunk accumulators);
        # append = finalize-on-watermark, where data later than the watermark
        # horizon is DROPPED and a window emits once, immutable — the posture
        # a production audit sink wants (tests/test_streaming.py proves the
        # late-drop semantics).
        return (
            agg.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # exactly-once: epoch-suffixed dir + atomic rename (Iceberg-commit
        # analog; a retried epoch overwrites its own dir, never duplicates)
        target = os.path.join(out_dir, f"epoch={epoch_id}")
        batch_df.write.mode("overwrite").parquet(target)

    return (
        agg.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
