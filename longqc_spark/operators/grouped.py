"""Per-key reconstruction via grouped-map pandas UDF (SURVEY.md §2.12).

Reference analog: polymerase-read reconstruction (``lq_sequel.py:76-137``,
``construct_polread``): per zmw, sort segments by coordinates, stitch a
run-length "CIGAR-like" string, and aggregate segment stats. Here the same
shape over the events table: per user, sort by event time, collapse
consecutive same-type events into runs, emit the run-length trace string +
per-key aggregates.

Spark mapping: ``groupBy(key).applyInPandas`` — the grouped-map UDF is the
one Arrow mechanism the flat ``mapInPandas`` stat pass cannot replace,
because reconstruction needs ALL of a key's rows in one pandas frame. At
scale the shuffle is the group-by hash exchange; skewed keys (a bot user
with 10^8 events) are the reason the QC pipeline's salting guard exists —
callers cap per-key cardinality upstream or pre-aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def reconstruct_traces(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """events(user_id, event_id, ts, event_type, value) → one row per user:
    run-length trace ("click:3|view:1|..."), event/run counts, value total
    (integer cents — floor(value*100) — so cross-engine summation is exact).

    Deterministic: rows sorted by (ts, event_id) inside each group, so the
    result is independent of partitioning and input order. The output key
    column carries ``key_col``'s name and type (schema derived, not
    hardcoded).
    """
    key_type = events.schema[key_col].dataType.simpleString()
    schema = (
        f"{key_col} {key_type}, trace string, n_events long, n_runs long, total_cents long"
    )

    def rec(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        types = pdf["event_type"].to_numpy()
        new_run = np.r_[True, types[1:] != types[:-1]]
        run_types = types[new_run]
        counts = np.diff(np.r_[np.flatnonzero(new_run), len(types)])
        trace = "|".join(f"{t}:{c}" for t, c in zip(run_types, counts))
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "trace": [trace],
                "n_events": [len(pdf)],
                "n_runs": [len(run_types)],
                "total_cents": [int(np.floor(pdf["value"].to_numpy() * 100).sum())],
            }
        )

    # prune before the grouped shuffle: only the five needed columns cross
    # Arrow (events carries a wide props payload the kernel never reads)
    slim = events.select(key_col, "event_id", "ts", "event_type", "value")
    return slim.groupBy(key_col).applyInPandas(rec, schema=schema)
