"""Size-stability benchmark: the heavy end-to-end paths at multi-million-doc
corpus sizes (the inductive evidence behind the 100-TB posture; numbers
recorded in BENCH.md).

Generates the corpus PARTITION-PARALLEL via the ccsynth Python Data Source
(seed-keyed per doc → bit-identical at any partition count), then times at
local[32]:

* full QC pipeline (scan-fused stats+scrub, best of 2 warm passes)
* MinHash-LSH near-dup over the whole corpus
* checkpointed lineage run (single-pass partitionBy write, 16 buckets)

Usage: PYTHONPATH=/root/repo python tools/bench_corpus_scale.py [--docs 4000000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from longqc_spark.ccsource import CCSynthDataSource  # noqa: E402
from longqc_spark.lineage import run_qc_with_lineage  # noqa: E402
from longqc_spark.operators.dedup import minhash_jaccard_estimate  # noqa: E402
from longqc_spark.pipeline import qc_pipeline  # noqa: E402
from longqc_spark.session import get_spark  # noqa: E402

DATA_CC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data_cc")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=4_000_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()
    spark = get_spark("corpus-scale", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))

    path = os.path.join(DATA_CC, f"documents_cc_{args.docs // 1_000_000}m")
    out = {"n_docs": args.docs, "cores": args.cores}
    if not os.path.exists(path):
        spark.dataSource.register(CCSynthDataSource)
        t0 = time.time()
        (
            spark.read.format("ccsynth")
            .option("n_docs", args.docs)
            .option("seed", 42)
            .option("num_partitions", 128)
            .load()
            .write.mode("overwrite")
            .parquet(path)
        )
        out["generate_sec"] = round(time.time() - t0, 1)

    docs = spark.read.parquet(path)
    best = float("inf")
    for i in range(3):  # pass 0 = warm-up
        t0 = time.time()
        qc_pipeline(docs, num_partitions=0).agg(
            F.count(F.lit(1)), F.count_if(F.col("keep"))
        ).collect()
        if i:
            best = min(best, time.time() - t0)
    out["qc_pipeline"] = {"sec": round(best, 1), "docs_per_sec": round(args.docs / best)}

    t0 = time.time()
    minhash_jaccard_estimate(docs, key_col="url", threshold=0.5).count()
    dt = time.time() - t0
    out["minhash_lsh"] = {"sec": round(dt, 1), "docs_per_sec": round(args.docs / dt)}

    tmp = tempfile.mkdtemp(prefix="qc_scale_")
    try:
        t0 = time.time()
        run_qc_with_lineage(docs, tmp, n_buckets=16)
        dt = time.time() - t0
        out["lineage_16buckets"] = {"sec": round(dt, 1), "docs_per_sec": round(args.docs / dt)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
