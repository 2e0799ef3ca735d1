"""Temporal join operators Spark lacks natively: as-of join and range join.

Reference analog: chain formation (J3, ``chain.c:23-157``) joins each anchor
to its nearest predecessor within a band — exactly the as-of/range-join
shape. Spark has no native ASOF JOIN; the implementations below follow the
standard compositions (SURVEY.md §2.3 J3):

* ``asof_join`` — union the two streams tagged, sort per key, carry the last
  right-side row forward with a window ``last(..., ignorenulls)``; one
  shuffle on the key, no per-row Python. Semantics = DuckDB
  ``ASOF JOIN ... ON l.key = r.key AND l.ts >= r.ts`` (nearest earlier).
* ``range_join`` — equi-join on overlapping coarse buckets + exact predicate
  filter; bucket width bounds the fan-out (the band/bandwidth parameter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_vals: list[str],
) -> DataFrame:
    """For each left row, attach the latest right row with right.ts <= left.ts
    (per key). Nulls when no earlier right row exists."""
    l_tag = left.select(
        F.col(key), F.col(ts), F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_vals],
    )
    r_tag = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("_is_left"), *right_vals
    )
    merged = l_tag.unionByName(r_tag)
    # right rows sort before left rows at the same ts (asof is inclusive)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        key,
        ts,
        "_is_left",
        *[F.last(F.when(F.col("_is_left") == 0, F.col(c)), ignorenulls=True).over(w).alias(c) for c in right_vals],
        F.last(F.when(F.col("_is_left") == 0, F.col(ts)), ignorenulls=True).over(w).alias("matched_ts"),
    )
    return carried.filter(F.col("_is_left") == 1).drop("_is_left")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Join each point to every interval containing it ([start, end)).

    Intervals are exploded to the coarse buckets they overlap; points join on
    their bucket; the exact containment predicate filters. Fan-out per
    interval = ceil(len/width)+1 — choose width ≈ median interval length
    (the minimap2 band analog)."""
    i_b = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width),
                F.floor((F.col(end_col) - 1) / bucket_width),
            )
        ),
    )
    p_b = points.withColumn("_bucket", F.floor(F.col(point_col) / bucket_width))
    return (
        p_b.join(i_b, "_bucket")
        .filter((F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col)))
        .drop("_bucket")
    )
