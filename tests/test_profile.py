"""ANALYZE-style table profiler (relational.profile_table): one scan, one
single-row exchange, stack unpivot — and the approx/exact distinct-count
trade-off (HLL keeps Expand off the scan; exact is the oracle path).
"""

import pytest
from pyspark.sql import functions as F

from longqc_spark.operators.relational import profile_table


@pytest.fixture()
def tbl(spark):
    rows = [
        (1, "a", 1.5, None),
        (2, "bb", None, None),
        (2, None, 2.5, None),
        (None, "a", 2.5, None),
    ]
    return spark.createDataFrame(
        rows, "id long, s string, x double, dead string"
    )


def test_stats_exact(tbl):
    out = {r.column: r for r in profile_table(tbl, exact_distinct=True).collect()}
    assert set(out) == {"id", "s", "x", "dead"}
    i = out["id"]
    assert (i.dtype, i.n_rows, i.n_null, i.n_distinct) == ("bigint", 4, 1, 2)
    assert i.null_frac == 0.25
    assert (i.min_repr, i.max_repr) == ("1", "2")
    assert i.avg_repr_len == 1.0
    s = out["s"]
    assert (s.n_null, s.n_distinct, s.min_repr, s.max_repr) == (1, 2, "a", "bb")
    assert abs(s.avg_repr_len - 4 / 3) < 1e-6
    d = out["dead"]
    assert (d.n_null, d.null_frac, d.n_distinct) == (4, 1.0, 0)
    assert d.min_repr is None and d.avg_repr_len is None


def test_empty_table_null_frac_is_null(spark):
    empty = spark.createDataFrame([], "id long, s string")
    out = {r.column: r for r in profile_table(empty).collect()}
    assert out["id"].n_rows == 0 and out["id"].null_frac is None


def test_non_atomic_columns_skipped(spark):
    df = spark.createDataFrame(
        [(1, [1, 2], b"x")], "id long, arr array<int>, blob binary"
    )
    cols = [r.column for r in profile_table(df).collect()]
    assert cols == ["id"]
    with pytest.raises(ValueError):
        profile_table(df.select("arr"))


def test_one_scan_no_expand_in_approx_mode(tbl):
    plan = (
        profile_table(tbl)._jdf.queryExecution().executedPlan().toString()
    )
    # HLL partial aggregates: no Expand multiplying the scan, exactly one
    # aggregation exchange in the plan
    assert "Expand" not in plan
    # the exact path pays the Expand — the documented trade-off
    exact_plan = (
        profile_table(tbl, exact_distinct=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in exact_plan


def test_approx_agrees_on_small_cardinalities(tbl):
    # HLL is exact at these cardinalities — rows must agree with exact mode
    a = profile_table(tbl).orderBy("column").collect()
    b = profile_table(tbl, exact_distinct=True).orderBy("column").collect()
    assert a == b
