"""binned_median's two execution paths (round-6 optimization): the
size-adaptive rank-selection rewrite must agree bit-for-bit with the
original one-shuffle window-sort selection — including duplicate values,
NULLs (which sort first), and buckets whose quantile ranks run past the
bucket's row count."""

import random

import pytest
from pyspark.sql import Window, functions as F

from longqc_spark.operators.relational import _rank_select_quantiles, binned_median


def _window_reference(base):
    """The pre-round-6 selection: row_number window per bucket."""
    w = Window.partitionBy("bucket").orderBy("v")
    ranked = base.withColumn("r", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("bucket"))
    )
    aggs = [F.max("n").alias("n")]
    for p, name in ((0.5, "med"), (0.25, "q1"), (0.75, "q3")):
        h = (F.col("n") - 1) * F.lit(p)
        lo = F.floor(h) + 1
        aggs += [
            F.max(F.when(F.col("r") == lo, F.col("v"))).alias(f"_{name}_lo"),
            F.max(F.when(F.col("r") == lo + 1, F.col("v"))).alias(f"_{name}_hi"),
        ]
    return ranked.groupBy("bucket").agg(*aggs)


@pytest.mark.parametrize("seed", [3, 17])
def test_rank_select_matches_window_selection(spark, seed):
    rng = random.Random(seed)
    rows = []
    for i in range(4000):
        b = rng.randrange(5)
        # heavy duplicates + a NULL sprinkle
        v = None if rng.random() < 0.05 else round(rng.gauss(50 * b, 20), 1)
        rows.append((float(b * 10 + rng.random() * 9), v))
    df = spark.createDataFrame(rows, "bucket_src double, v double")
    base = df.select(
        F.floor(F.col("bucket_src") / F.lit(10.0)).cast("long").alias("bucket"),
        F.col("v"),
    )
    got = {
        r["bucket"]: tuple(r)[1:]
        for r in _rank_select_quantiles(base).orderBy("bucket").collect()
    }
    want = {
        r["bucket"]: tuple(r)[1:]
        for r in _window_reference(base).orderBy("bucket").collect()
    }
    assert got == want


def test_binned_median_single_row_and_all_null_buckets(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (25.0, None), (27.0, None)], "q double, v double"
    )
    out = {r["bucket"]: r for r in binned_median(df, "v", "q", 10.0).collect()}
    assert out[0]["n"] == 1 and out[0]["med"] == 5.0
    assert out[2]["n"] == 2 and out[2]["med"] is None
