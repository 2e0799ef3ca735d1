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


def test_watermark_drops_late_events(spark, tmp_path):
    """Append mode + watermark: events arriving after their window has been
    finalized (watermark passed the window end AND the state was evicted at a
    batch boundary — Spark's one-sided lateness guarantee) are DROPPED;
    out-of-order events whose window is still live are merged.

    Micro-batch schedule (2-minute watermark delay, 1-minute windows):
      batch 0: 10:00:10, 10:00:20, 10:05  → watermark advances to 10:03
      batch 1: 10:03:30, 10:06            → [10:00) window finalizes+emits;
                                            watermark advances to 10:04
      batch 2: 10:00:40, 10:02:40 (both older than finalized horizon →
               dropped), 10:10 (pushes final watermark so the 10:03/10:05/
               10:06 windows finalize before the stream drains)."""
    import datetime as dt
    import os

    def ts(m, s):
        return dt.datetime(2024, 1, 1, 10, m, s)

    d = str(tmp_path / "late_events")
    os.makedirs(d)
    batches = [
        [ts(0, 10), ts(0, 20), ts(5, 0)],
        [ts(3, 30), ts(6, 0)],
        [ts(0, 40), ts(2, 40), ts(10, 0)],
    ]
    for i, tss in enumerate(batches):
        f = os.path.join(d, f"f{i}.parquet")
        pd.DataFrame(
            {"ts": tss, "event_type": ["a"] * len(tss), "value": [1.0] * len(tss)}
        ).to_parquet(f, index=False, coerce_timestamps="us")
        # FileStreamSource admits files in modification-time order
        os.utime(f, (1_700_000_000 + i * 1000,) * 2)

    schema = spark.read.parquet(d).schema
    q = stream_tumbling_counts(
        spark,
        d,
        schema,
        width="1 minute",
        watermark="2 minutes",
        query_name="late_demo",
        output_mode="append",
    )
    q.awaitTermination()
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped == 2  # exactly the two post-finalization arrivals
    got = (
        spark.table("late_demo")
        .toPandas()
        .sort_values("win_start")
        .reset_index(drop=True)
    )
    # [10:00) n=2 (10:00:40 NOT counted), then one row per live window;
    # the 10:10 window never finalizes (append emits only after the
    # watermark passes the window end).
    assert [(w.minute, n) for w, n in zip(got.win_start, got.n)] == [
        (0, 2),
        (3, 1),
        (5, 1),
        (6, 1),
    ]


def test_stream_stream_join_matches_batch(spark, sf001, tmp_path):
    """Watermarked stream-stream inner join over two file streams must equal
    the batch join with the identical time-range predicate (AvailableNow
    drains a finite backlog; watermarks only bound state)."""
    from longqc_spark.streaming.joins import (
        attribution_join_batch,
        attribution_join_stream,
    )

    events = spark.read.parquet(f"{sf001}/events.parquet").filter("user_id < 300")
    ldir, rdir = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    events.filter("event_type = 'click'").repartition(3).write.parquet(ldir)
    events.filter("event_type = 'purchase'").repartition(2).write.parquet(rdir)

    want = (
        attribution_join_batch(events, window="12 hours")
        .toPandas()
        .sort_values(["l_event", "r_event"])
        .reset_index(drop=True)
    )
    assert len(want) > 10, "fixture must produce a non-trivial pair set"

    q = attribution_join_stream(
        spark,
        ldir,
        rdir,
        spark.read.parquet(ldir).schema,
        query_name="attrib_test",
        # events span 30 days and the staged files arrive in RANDOM time
        # order (repartition), so the watermark must cover the full span for
        # exact batch parity; a production feed is roughly time-ordered and
        # uses a horizon-sized delay (state eviction is the point there)
        watermark="40 days",
        window="12 hours",
    )
    assert q.awaitTermination(540), "stream must drain the backlog"
    got = (
        spark.sql("SELECT * FROM attrib_test")
        .toPandas()
        .sort_values(["l_event", "r_event"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)

    # bounded-state semantics: a watermark far smaller than the input's
    # time disorder EVICTS join state early → pairs are dropped, never
    # duplicated (the state-eviction contract, proven rather than assumed)
    q2 = attribution_join_stream(
        spark,
        ldir,
        rdir,
        spark.read.parquet(ldir).schema,
        query_name="attrib_small_wm",
        watermark="1 day",
        window="12 hours",
    )
    assert q2.awaitTermination(540)
    small = spark.sql("SELECT * FROM attrib_small_wm").toPandas()
    assert len(small) < len(want)
    merged = small.merge(want, on=list(want.columns), how="left", indicator=True)
    assert (merged["_merge"] == "both").all(), "emitted pairs are a subset"
