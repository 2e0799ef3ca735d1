"""Scaling-efficiency evidence (BASELINE.md / north_rule).

The N→4N-executor criterion cannot use a real cluster in this sandbox; per
driver instruction it is evidenced by running the SAME job on the SAME input
at two parallelism levels. This script runs the QC pipeline over the 100k-doc
synthetic CC corpus at local[2] / local[8] / local[32] (steady-state: second
full pass timed), prints throughput for each, and computes efficiency for the
two N→4N pairs (2→8 and 8→32).

Context recorded alongside: this host is a 32-vCPU VM that stops scaling past ~8-16 cores — a pure-ALU spin
benchmark tops out at ~0.77 efficiency for 8→32, so 2→8 is the pair that
isolates the ENGINE's scaling from the host's ceiling.

Usage: PYTHONPATH=/root/repo python tools/bench_scaling.py [--out BENCH.md]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from longqc_spark.corpus import write_corpus  # noqa: E402
from longqc_spark.pipeline import qc_pipeline  # noqa: E402
from longqc_spark.session import get_spark  # noqa: E402

DATA_CC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data_cc")


def run_at(cores: int, path: str, passes: int = 3, job: str = "qc") -> tuple[float, int]:
    spark = get_spark(f"scale-{cores}", cores=cores)
    # production posture: the corpus is written with 4k-row groups, so the
    # SCAN parallelizes (~28 splits at 16 MB) and the pipeline needs no
    # repartition shuffle — the work decomposition is identical at every
    # parallelism level, exactly like a fixed table layout under a growing
    # executor fleet. (The salted repartition remains the skew guard for
    # poorly laid-out inputs; its cost is reported in BENCH.md.)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
    spark.sparkContext.setLogLevel("ERROR")
    cc = spark.read.parquet(path)
    n = cc.count()
    best = float("inf")
    for _ in range(passes):
        t0 = time.time()
        if job == "qc":
            qc_pipeline(cc, num_partitions=0).agg(
                F.count(F.lit(1)), F.count_if(F.col("keep"))
            ).collect()
        elif job == "lsh":
            # the second-heaviest production path: full MinHash-LSH near-dup
            # (signatures + banded join + Jaccard estimate)
            from longqc_spark.operators.dedup import minhash_jaccard_estimate

            minhash_jaccard_estimate(
                cc, key_col="url", threshold=0.5, max_bucket=500
            ).count()
        elif job == "funnel":
            # the user-facing composite (VERDICT r4 item 8): the full
            # curate() funnel — hygiene → QC rules → exact payload dedup →
            # guarded near-dup — not just its stages
            from longqc_spark.config import DEFAULT_CONFIG
            from longqc_spark.curation import curate

            curate(
                cc,
                cfg=DEFAULT_CONFIG,
                key_col="url",
                text_col="text",
                payload_dedup=True,
                neardup_threshold=0.8,
                neardup_max_bucket=200,
            ).count()
        else:
            raise ValueError(f"unknown job {job!r}")
        best = min(best, time.time() - t0)
    spark.stop()
    return best, n


def main() -> None:
    # 400k docs default: large enough that fixed per-job costs (scan, shuffle
    # setup, Arrow warmup) are <10% of wall even at the highest parallelism.
    # --docs 1000000 reproduces the 1M ladder in BENCH.md, where BOTH 4x
    # steps (2->8 and 8->32) clear 0.8 (bigger input saturates 32 threads).
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=None,
                    help="corpus size (default: the 400k scaling corpus)")
    ap.add_argument("--job", default="qc", choices=("qc", "lsh", "funnel"),
                    help="which job to scale: the QC pipeline (north-rule "
                         "default), the MinHash-LSH near-dup pass, or the "
                         "full curate() funnel")
    ap.add_argument("--levels", default="2,8,32",
                    help="comma-separated parallelism levels (e.g. 8,32 to "
                         "re-measure one N→4N pair in a short window, "
                         "minimizing co-tenant exposure)")
    args = ap.parse_args()
    if args.docs:
        import pandas as pd  # noqa: F401  (parquet writer path)

        from longqc_spark.corpus import corpus_path, generate_corpus

        path = corpus_path(DATA_CC, f"{args.docs // 1000}k")
        if not os.path.exists(path):
            generate_corpus(args.docs, seed=42).to_parquet(
                path, index=False, coerce_timestamps="us", row_group_size=4096
            )
    else:
        path = write_corpus(DATA_CC, "scaling")
    levels = tuple(int(x) for x in args.levels.split(","))
    # host-speed calibration BEFORE any JVM starts (same probe as
    # bench.py): the scaling ratio is epoch-relative on this shared VM,
    # so record what the host itself scaled to at the same core counts.
    from bench import host_probe

    probes = {}
    for c in levels:
        single, at_c = host_probe(c)
        probes.setdefault(1, single)
        probes[c] = at_c
    results = {}
    for cores in levels:
        sec, n = run_at(cores, path, job=args.job)
        results[cores] = {"sec": round(sec, 2), "docs_per_sec": round(n / sec, 1)}
        print(f"local[{cores}]: {sec:.2f}s  {n / sec:.0f} docs/s", flush=True)
    out = {
        "input": path,
        "n_docs": n,
        "job": args.job,
        "runs": results,
        "host_probe_mips": probes,
    }
    for lo, hi in zip(levels, levels[1:]):
        eff = results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"] / (hi / lo)
        out[f"efficiency_N{lo}_to_{hi}"] = round(eff, 3)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
