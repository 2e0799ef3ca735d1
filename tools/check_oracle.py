"""Local stand-in for the driver's CORRECTNESS check: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.01, compare row count, column names, and order-insensitive values.

Usage: PYTHONPATH=/root/repo python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from longqc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def dtype_mismatches(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    """The driver's value-hash is dtype-sensitive: DuckDB HUGEINT (from
    ``sum(int)``) lands in pandas as float64/object while Spark's BIGINT is
    int64, so equal values still hash differently. Flag any column whose
    pandas dtype differs between engines — each hit needs a CAST in the
    oracle SQL (or a round on both sides).

    Width differences within one kind are fine (driver-verified: tpch_q7like
    was int32-vs-int64 in round 1 and hash-matched); only KIND differences
    (int vs float vs object) change the hashed representation."""
    kind = lambda s: {"u": "i"}.get(s.dtype.kind, s.dtype.kind)  # noqa: E731
    out = []
    for c in a.columns:
        if c in b.columns and kind(a[c]) != kind(b[c]):
            out.append(f"{c}: spark={a[c].dtype} duck={b[c].dtype}")
    return out


def values_match(a: pd.DataFrame, b: pd.DataFrame, tol: float = 0.0) -> bool:
    """Strict by default: the driver's value-hash comparison may be exact, so
    every query must produce BIT-IDENTICAL values in both engines (decimal
    sums / explicit rounding make that achievable)."""
    if a.shape != b.shape:
        return False
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce")
            bv = pd.to_numeric(bv, errors="coerce")
            if not ((av - bv).abs().fillna(0) <= tol * (1 + bv.abs().fillna(0))).all():
                return False
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                return False
    return True


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("oracle-check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time as _time

        t0 = _time.time()
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(got)} ({_time.time()-t0:.1f}s, no oracle)")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {e}")
            failures += 1
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(e.columns)}")
            failures += 1
        elif len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} vs {len(e)}")
            failures += 1
        elif not values_match(g, e):
            print(f"FAIL  {name}: value mismatch")
            print("  spark:", g.head(3).to_dict("records"))
            print("  duck :", e.head(3).to_dict("records"))
            failures += 1
        elif dm := dtype_mismatches(g, e):
            print(f"FAIL  {name}: dtype mismatch (driver hash would differ): {dm}")
            failures += 1
        else:
            print(f"ok    {name}: rows={len(g)} ({_time.time()-t0:.1f}s)")
    spark.stop()
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
