"""Stateful streaming sessionization (applyInPandasWithState) vs its batch
twin. Streaming emits CLOSED sessions (a gap observed after them); each
user's final session stays in state (flushed by timeout in a live stream, not
under AvailableNow), so the comparison excludes the last session per user."""

import pandas as pd
from pyspark.sql import functions as F

from longqc_spark.streaming.sessions import sessionize_batch, sessionize_stream

GAP = 3600.0


def test_stream_sessions_match_batch_closed(spark, sf001, tmp_path):
    events = spark.read.parquet(f"{sf001}/events.parquet").filter(F.col("user_id") < 50)
    # deterministic end-of-stream: one sentinel per user, 2 gaps past the last
    # real event — closes every real session inside the batch (the
    # processing-time timeout only fires in live streams, not AvailableNow)
    sentinel_ts = events.agg(F.max("ts")).collect()[0][0]
    sentinels = (
        events.select("user_id")
        .distinct()
        .select(
            F.lit(-1).alias("event_id"),
            (F.lit(sentinel_ts) + F.expr(f"INTERVAL {int(2 * GAP)} SECONDS")).alias("ts"),
            "user_id",
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("").alias("props"),
        )
    )
    d = str(tmp_path / "ev")
    events.unionByName(sentinels.select(events.columns)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)

    q = sessionize_stream(spark, d, events.schema, gap_seconds=GAP, query_name="sess_t")
    q.awaitTermination(180)
    sentinel_sec = sentinels.select(F.col("ts").cast("timestamp").cast("double")).collect()[0][0]
    got = (
        spark.sql("SELECT * FROM sess_t")
        .where(f"session_start < {sentinel_sec}")  # drop sentinel-only sessions
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )

    # batch twin over the REAL events == every session (sentinels closed all)
    batch = (
        sessionize_batch(events, gap_seconds=GAP)
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(batch)
    pd.testing.assert_frame_equal(
        got[["user_id", "session_start", "session_end", "n_events"]],
        batch[["user_id", "session_start", "session_end", "n_events"]],
        check_dtype=False,
    )
    # float sums: same per-session element sets; compare rounded
    assert (got.total_value.round(6) == batch.total_value.round(6)).all()


def test_batch_sessionization_properties(spark, sf001):
    events = spark.read.parquet(f"{sf001}/events.parquet").filter(F.col("user_id") < 50)
    s = sessionize_batch(events, gap_seconds=GAP).toPandas()
    assert (s.session_end >= s.session_start).all()
    assert (s.n_events >= 1).all()
    # sessions of one user never overlap and gaps between them exceed GAP
    for _, g in s.groupby("user_id"):
        g = g.sort_values("session_start")
        starts = g.session_start.to_numpy()[1:]
        ends = g.session_end.to_numpy()[:-1]
        assert (starts - ends > GAP).all()
    # event count preserved
    assert s.n_events.sum() == events.count()
