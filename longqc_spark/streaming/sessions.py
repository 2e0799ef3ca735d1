"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState``.

The reference's cross-chunk running accumulators (``longQC.py:294-360``:
``cum_n_seq``, adapter counters carried across the chunk loop) are exactly
per-key mutable state over a micro-batched stream. This operator groups
events per user, maintains (session_start, last_ts, n_events, total_value)
state, and emits a session row when the gap exceeds ``gap_seconds`` (or on
timeout). The batch twin (``sessionize_batch``) computes identical sessions
with a lag/cumsum window — used as the oracle in tests.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.DoubleType()),
        T.StructField("session_end", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start", T.DoubleType()),
        T.StructField("last_ts", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _accumulate_sessions(user_id, secs, values, prior, gap_seconds: float):
    """The ONE session fold shared by both stateful engines (GroupState and
    transformWithState): (prior state tuple or None, time-sorted rows) →
    (closed session rows, new open-session state). Pure, so the required
    exact agreement between the two streaming implementations and the batch
    window twin is structural."""
    if prior is not None:
        s, last, n, tot = prior
    else:
        s = last = None
        n, tot = 0, 0.0
    out = []
    for sec, value in zip(secs, values):
        if last is not None and sec - last > gap_seconds:
            out.append([user_id, s, last, n, tot])
            s, n, tot = sec, 0, 0.0
        if s is None:
            s = sec
        last = sec
        n += 1
        tot += float(value)
    return out, (s, last, n, tot)


def _session_fn(gap_seconds: float):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            s, last, n, tot = state.get
            state.remove()
            yield pd.DataFrame(
                [[user_id, s, last, n, tot]], columns=SESSION_SCHEMA.fieldNames()
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("sec")
        prior = state.get if state.exists else None
        out, new_state = _accumulate_sessions(
            user_id, rows["sec"], rows["value"], prior, gap_seconds
        )
        state.update(new_state)
        state.setTimeoutDuration(3_600_000)
        if out:
            yield pd.DataFrame(out, columns=SESSION_SCHEMA.fieldNames())

    return fn


def sessionize_stream(
    spark, input_dir: str, schema, gap_seconds: float = 300.0, query_name: str = "sessions"
):
    """Streaming sessionization: closed sessions are emitted as gaps appear;
    the final open session per user is flushed by processing-time timeout."""
    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
        .select(
            "user_id",
            F.col("ts").cast("timestamp").cast("double").alias("sec"),
            "value",
        )
    )
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            SESSION_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


class _SessionProcessor:
    """Spark 4 ``StatefulProcessor`` twin of ``_session_fn`` — same
    sessionization semantics on the new transformWithState engine (typed
    composite state handles, RocksDB-backed). Defined lazily-subclassable so
    importing this module never requires the streaming state classes."""

    # open sessions are flushed by a processing-time timer after this long
    # with no new events — the same 1-hour timeout the GroupState twin sets
    # via ``state.setTimeoutDuration`` (``_session_fn``), so the two stateful
    # engines agree on trailing sessions, not just gap-closed ones
    FLUSH_TIMEOUT_MS = 3_600_000

    def __init__(self, gap_seconds: float):
        self.gap = gap_seconds

    def init(self, handle) -> None:
        self.handle = handle
        self.state = handle.getValueState("sess", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        pdf = pd.concat(list(rows)).sort_values("sec")
        prior = self.state.get() if self.state.exists() else None
        out, new_state = _accumulate_sessions(
            user_id, pdf["sec"], pdf["value"], prior, self.gap
        )
        self.state.update(new_state)
        # slide the flush timer: drop any pending timer for this key, arm a
        # fresh one — mirrors setTimeoutDuration's reset-on-activity
        for t in list(self.handle.listTimers()):
            self.handle.deleteTimer(t)
        self.handle.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() + self.FLUSH_TIMEOUT_MS
        )
        if out:
            yield pd.DataFrame(out, columns=SESSION_SCHEMA.fieldNames())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        # flush-on-timeout twin of the ``state.hasTimedOut`` branch in
        # ``_session_fn``: emit the open session, clear state
        (user_id,) = key
        if self.state.exists():
            s, last, n, tot = self.state.get()
            self.state.clear()
            yield pd.DataFrame(
                [[user_id, s, last, n, tot]], columns=SESSION_SCHEMA.fieldNames()
            )

    def close(self) -> None:
        pass


def sessionize_stream_tws(
    spark, input_dir: str, schema, gap_seconds: float = 300.0, query_name: str = "sessions_tws"
):
    """Sessionization on Spark 4's ``transformWithStateInPandas`` — the
    successor API to applyInPandasWithState (explicit state handles, multiple
    typed states per key, timers, RocksDB state store). Emits the same
    closed-session rows as ``sessionize_stream``; tests assert all three
    implementations (batch window, GroupState, TWS) agree exactly.

    Requires the RocksDB state store provider (transformWithState's only
    backend) and ``google.protobuf`` on the worker Python (the TWS state
    protocol; ships with standard Spark deployments but is absent from this
    sandbox image — the test gates on it via ``importorskip``)."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf on the worker "
            "Python (TWS state protocol); use sessionize_stream "
            "(applyInPandasWithState) where it is unavailable"
        ) from e
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # transformWithState only runs on the RocksDB state store. Set it for
    # THIS query only: streaming queries snapshot the session conf at
    # start(), so restoring the previous provider immediately afterwards
    # keeps later GroupState/dedup streams on their original backend instead
    # of silently switching the whole session to RocksDB.
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev_prov = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        proc = type("SessionProcessorTWS", (_SessionProcessor, StatefulProcessor), {})(
            gap_seconds
        )
        events = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(input_dir)
            .select(
                "user_id",
                F.col("ts").cast("timestamp").cast("double").alias("sec"),
                "value",
            )
        )
        return (
            events.groupBy("user_id")
            # processingTime timeMode so the per-key flush timers registered
            # in handleInputRows actually fire (timeMode "none" never calls
            # handleExpiredTimer and open sessions would be retained forever)
            .transformWithStateInPandas(proc, SESSION_SCHEMA, "append", "processingTime")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        if prev_prov is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev_prov)


def sessionize_batch(events: DataFrame, gap_seconds: float = 300.0) -> DataFrame:
    """Batch twin (the spec): lag-gap change points → session ids → agg."""
    sec = F.col("ts").cast("timestamp").cast("double")
    w = Window.partitionBy("user_id").orderBy("sec")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = (
        events.select("user_id", sec.alias("sec"), "value")
        .withColumn("prev", F.lag("sec").over(w))
        .withColumn(
            "new_session",
            F.when(F.col("prev").isNull() | (F.col("sec") - F.col("prev") > gap_seconds), 1).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(wc))
    )
    return (
        marked.groupBy("user_id", "session_id")
        .agg(
            F.min("sec").alias("session_start"),
            F.max("sec").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .drop("session_id")
    )
