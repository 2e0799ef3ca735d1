"""Size-stability benchmark: the heavy end-to-end paths at multi-million-doc
corpus sizes (the inductive evidence behind the 100-TB posture; numbers
recorded in BENCH.md).

Generates the corpus PARTITION-PARALLEL via the ccsynth Python Data Source
(seed-keyed per doc → bit-identical at any partition count), then times at
local[32]:

* full QC pipeline (scan-fused stats+scrub, best of 2 warm passes)
* MinHash-LSH near-dup over the whole corpus
* checkpointed lineage run (single-pass partitionBy write, 16 buckets)

Also measures the SKEW-ADVERSARIAL posture (``--skew-docs N``): a corpus
where one boilerplate template fills 30% of all documents — the worst case
for banded LSH — run through the ``max_bucket``-guarded near-dup pipeline
and compared against a uniform corpus of the same size.

Emits ONE JSON line to stdout AND (``--out``, default
``BENCH_CORPUS.json`` at the repo root) a machine-readable record that
``tools/bench_compare.py`` can diff round-over-round — the 4M-doc numbers
get the same regression guardrail as the sf0.1 suite.

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


def boilerplate_docs(spark, n: int, flood_frac: float = 0.3):
    """Distributed skew-adversarial corpus: ``flood_frac`` of docs are ONE
    template; the rest get 30 deterministic pseudo-words (sha2-derived,
    JVM-side — no driver materialization)."""
    template = (
        "cookie consent required this website uses cookies to improve your "
        "experience please accept our policy terms and conditions apply "
        "all rights reserved contact us about privacy settings"
    )
    words = F.transform(
        F.sequence(F.lit(1), F.lit(30)),
        lambda i: F.substring(F.sha2(F.concat(F.col("id").cast("string"), i.cast("string")), 256), 1, 8),
    )
    return spark.range(n).select(
        F.col("id").alias("url"),
        F.when(F.pmod("id", 10) < int(flood_frac * 10), F.lit(template))
        .otherwise(F.concat_ws(" ", words))
        .alias("text"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=4_000_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--skew-docs", type=int, default=1_000_000)
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_CORPUS.json"),
    )
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

    if args.skew_docs:
        # skew-adversarial: 30% one-template flood vs uniform, same size,
        # guarded LSH (max_bucket bounds the flood bucket's fan-out)
        n = args.skew_docs
        for tag, frac in (("uniform", 0.0), ("skew30", 0.3)):
            df = boilerplate_docs(spark, n, flood_frac=frac).cache()
            df.count()
            best_t, pairs = float("inf"), 0
            for i in range(2):  # pass 0 = warm-up
                t0 = time.time()
                pairs = minhash_jaccard_estimate(
                    df, key_col="url", threshold=0.8, max_bucket=200
                ).count()
                best_t = min(best_t, time.time() - t0)
            out[f"lsh_{tag}_{n // 1_000_000}m"] = {
                "sec": round(best_t, 1),
                "docs_per_sec": round(n / best_t),
                "n_pairs": pairs,
            }
            df.unpersist()
        u = out[f"lsh_uniform_{n // 1_000_000}m"]["sec"]
        s = out[f"lsh_skew30_{n // 1_000_000}m"]["sec"]
        out["skew_over_uniform_ratio"] = round(s / u, 2)

    with open(args.out, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
