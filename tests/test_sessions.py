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


def test_tws_sessions_match_batch_closed(spark, sf001, tmp_path):
    """Same contract on Spark 4's transformWithStateInPandas engine: the TWS
    implementation must emit exactly the closed sessions the batch window
    twin computes (and therefore agree with the GroupState implementation).

    Gated on google.protobuf (the TWS state protocol dependency): present on
    standard Spark clusters, absent from this sandbox image. Verified r4:
    `import google.protobuf` → ModuleNotFoundError (no `google` namespace
    package at all in site-packages), and the image has no package-index
    network access (`pip download protobuf` → DNS resolution failure), so
    the gate cannot be lifted here; the GroupState twin runtime-covers the
    semantics and the processor logic is parity-tested below."""
    import pytest as _pytest

    _pytest.importorskip(
        "google.protobuf",
        reason="TWS state protocol needs google.protobuf: absent from image "
        "(ModuleNotFoundError: No module named 'google') and uninstallable "
        "offline (pip → '[Errno -2] Name or service not known')",
    )
    from longqc_spark.streaming.sessions import sessionize_stream_tws

    events = spark.read.parquet(f"{sf001}/events.parquet").filter(F.col("user_id") < 50)
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
    d = str(tmp_path / "ev_tws")
    events.unionByName(sentinels.select(events.columns)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)

    q = sessionize_stream_tws(spark, d, events.schema, gap_seconds=GAP, query_name="sess_tws")
    assert q.awaitTermination(300)
    sentinel_sec = sentinels.select(F.col("ts").cast("timestamp").cast("double")).collect()[0][0]
    got = (
        spark.sql("SELECT * FROM sess_tws")
        .where(f"session_start < {sentinel_sec}")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
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


def test_tws_processor_logic_matches_batch(spark, sf001):
    """The TWS runtime needs protobuf (absent here), but the processor's
    sessionization LOGIC is plain Python — drive _SessionProcessor directly
    with a fake ValueState, feed each user's events in micro-batch-sized
    chunks, and compare closed sessions against the batch window twin."""
    import numpy as np

    from longqc_spark.streaming.sessions import _SessionProcessor

    class FakeState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

        def clear(self):
            self.v = None

    class FakeHandle:
        def __init__(self):
            self.timers = []

        def listTimers(self):
            return list(self.timers)

        def deleteTimer(self, t):
            self.timers.remove(t)

        def registerTimer(self, t):
            self.timers.append(t)

    class FakeTimerValues:
        def getCurrentProcessingTimeInMs(self):
            return 0

    events = (
        spark.read.parquet(f"{sf001}/events.parquet")
        .filter(F.col("user_id") < 30)
        .select(
            "user_id",
            F.col("ts").cast("timestamp").cast("double").alias("sec"),
            "value",
        )
        .toPandas()
    )
    closed = []
    for uid, grp in events.groupby("user_id"):
        proc = _SessionProcessor(GAP)
        proc.state = FakeState()
        proc.handle = FakeHandle()
        tv = FakeTimerValues()
        grp = grp.sort_values("sec").reset_index(drop=True)
        # three uneven chunks = three micro-batches
        for chunk in np.array_split(grp, 3):
            if len(chunk):
                for out in proc.handleInputRows((uid,), iter([chunk]), tv):
                    closed.append(out)
        # each batch slides the flush timer: exactly one pending timer remains
        assert len(proc.handle.timers) == 1
        # the REAL timer branch flushes the open session and clears state —
        # parity with the GroupState twin's hasTimedOut path
        for out in proc.handleExpiredTimer((uid,), tv, None):
            closed.append(out)
        assert not proc.state.exists()
    got = (
        pd.concat(closed)
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    batch = (
        sessionize_batch(
            spark.read.parquet(f"{sf001}/events.parquet").filter(F.col("user_id") < 30),
            gap_seconds=GAP,
        )
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["user_id", "session_start", "session_end", "n_events"]],
        batch[["user_id", "session_start", "session_end", "n_events"]],
        check_dtype=False,
    )
