"""Extra measurement harness for optimization rounds (guide §1).

NOT part of the driver contract — ``bench.py`` stays frozen. This tool
isolates individual declared queries: times them with the same
methodology as bench.py (best of 2 ``.collect()`` after a warm-up
environment), optionally through the noop sink, and captures
``.explain("formatted")`` plans into ``plans/<tag>/<query>_<label>.txt``.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        [--plans plans/r06 --label before] [--noop] q1 q2 ...
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from longqc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--plans", default=None, help="dir to write explain output")
    ap.add_argument("--label", default="before", help="plan filename suffix")
    ap.add_argument("--noop", action="store_true", help="noop sink instead of collect")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("longqc-bench-extra", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    # mirror the frozen bench.py environment: it sets 16 MB splits before
    # the operator-query loop, so driver-side timings run under this conf
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in args.queries:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                qs[name](spark, SF_DIR).explain("formatted")
            with open(os.path.join(args.plans, f"{name}_{args.label}.txt"), "w") as f:
                f.write(buf.getvalue())
        best = float("inf")
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"{name:28s} {best:7.3f}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "noop": args.noop, "queries": timings}))


if __name__ == "__main__":
    main()
