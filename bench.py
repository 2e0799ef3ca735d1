"""Benchmark harness (driver contract, TESTDATA.md / BASELINE.md).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries": {name: sec},
"sf", plus docs/sec throughput extras}.

The QC pipeline is also timed on the self-generated Common-Crawl-style
corpus (100k docs, deterministic seed) — the shape BASELINE.json's
north_rule grades. Scaling-efficiency evidence (local[8] vs local[32]) is
produced by tools/bench_scaling.py and recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from longqc_spark.config import DRIVER_DOCS_CONFIG  # noqa: E402
from longqc_spark.corpus import write_corpus  # noqa: E402
from longqc_spark.pipeline import qc_pipeline  # noqa: E402
from longqc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DATA_CC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data_cc")

BENCH_QUERIES = (
    "length_stats",
    "n50",
    "binned_median",
    "histogram",
    "rule_fractions",
    "anti_join",
    "union_split",
    "topk_tokens",
    "event_gaps",
    "exact_dedup",
    "per_dump_dedup",
    "session_window_native",
    "range_frame",
    "trace_reconstruct",
    "dup_spans",
    "tpch_q1",
    # round-2 operators
    "n50_approx",
    "fuzzy_scrub",
    "token_pmi",
    "mad_outliers",
    "decontaminate",
    # round-3 operators
    "incremental_dedup",
    "shard_assign",
    "keep_best_dedup",
    "pack_seqs",
    # round-4f/4g web-hygiene operators
    "c4_clean",
    "block_extract",
    "optout_filter",
    "lang_thresholds",
    "anchor_extract",
    "canonical_collapse",
    "page_meta",
    "zlib_quality",
    # round-4h WARC container + host graph + robots gate
    "warc_roundtrip",
    "link_graph",
    "host_rank",
    "robots_gate",
    "cdx_index",
    "etld1_domains",
    "mirror_hosts",
    "sitemap_coverage",
    "soft404_drop",
    "crawl_frontier",
    "host_boilerplate",
    "anchor_targets",
    "snapshot_churn",
    "script_check",
    # round-4j IR / corpus-forensics operators
    "bm25_search",
    "tfidf_terms",
    "host_entropy",
    # round-4j charset sniff / Zipf fit / perceptual media near-dup
    "charset_gate",
    "zipf_fit",
    "image_neardup",
    "audio_neardup",
    "ece_calibration",
    "ks_drift",
    "video_neardup",
    "profile_table",
    "segment_langs",
    "ngram_diversity",
    "host_hhi",
    "tpch_q4like",
    "tpch_q9like",
    "tpch_q21like",
    "kmeans_embed",
    "hash_tfidf",
    "cc_star",
    # round-5: LM / sketch / calibration family (cheap at sf0.1; the heavy
    # kn_trigram twin is measured at 4M docs in BENCH_CORPUS.json instead)
    "kn_bigram",
    "nb_classifier",
    "cms_tokens",
    "isotonic_fit",
    "containment_dup",
    "temperature_mix",
)


def host_probe(cores: int, iters: int = 20_000_000) -> tuple[float, float]:
    """In-run host-speed calibration (VERDICT r3 item 3): a pure-ALU spin
    with zero memory traffic, single-process and all-cores, in M iters/s.
    This shared VM drifts 1.2-1.6x between rounds (BENCH_r02 vs r03 showed a
    uniform offset on UNCHANGED queries); recording the probe beside the
    timings lets tools/bench_compare.py --normalize grade the CODE, not the
    VM epoch. Runs before the JVM starts so Spark itself can't skew it."""
    import multiprocessing as mp

    def one(procs: int) -> float:
        best = 0.0
        for _ in range(2):
            t0 = time.time()
            if procs == 1:
                _probe_spin(iters)
            else:
                with mp.Pool(procs) as pool:
                    pool.map(_probe_spin, [iters] * procs)
            best = max(best, procs * iters / (time.time() - t0))
        return round(best / 1e6, 2)

    return one(1), one(cores)


def _probe_spin(n: int) -> int:  # module-level: mp.Pool needs a picklable fn
    acc = 0
    for i in range(n):
        acc ^= i * 2654435761 & 0xFFFFFFFF
    return acc


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    probe_1, probe_all = host_probe(cores)
    spark = get_spark("longqc-bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    # Each pipeline runs once untimed (spawns python workers, JITs the
    # scan/shuffle/Arrow paths, loads page cache), then takes the BEST of two
    # timed passes: executors are long-lived in production, cold-start is not
    # docs/sec, and this shared VM's co-tenants can spike any single pass
    # 3-5x (BENCH.md) — min-of-2 warm passes is the steady-state estimator.
    def timed_pipeline(df, **kw) -> float:
        best = float("inf")
        for i in range(3):
            t0 = time.time()
            qc_pipeline(df, **kw).agg(
                F.count(F.lit(1)), F.count_if(F.col("keep"))
            ).collect()
            if i > 0:  # pass 0 is the untimed warm-up
                best = min(best, time.time() - t0)
        return best

    # -- QC pipeline over the driver documents table (docs/sec headline) --
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_docs = docs.count()
    timings["qc_pipeline_documents"] = timed_pipeline(
        docs, cfg=DRIVER_DOCS_CONFIG, key_cols=["doc_id"]
    )
    docs_per_sec_driver = n_docs / timings["qc_pipeline_documents"]

    # -- QC pipeline over the synthetic CC corpus (north_rule shape) --
    # Production posture (same as tools/bench_scaling.py): the corpus is
    # written with 4k-row row groups, so the scan parallelizes by itself —
    # skip the salted repartition (num_partitions=0) and size splits so all
    # cores get work (on a real Iceberg table, file layout does this).
    cc_path = write_corpus(DATA_CC, "bench")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    cc = spark.read.parquet(cc_path)
    n_cc = cc.count()
    timings["qc_pipeline_cc100k"] = timed_pipeline(cc, num_partitions=0)
    docs_per_sec_cc = n_cc / timings["qc_pipeline_cc100k"]

    # -- full funnel: html binary → text extraction → QC (north_star shape,
    # top of the Common-Crawl funnel included; extraction fused into the one
    # Arrow pass — one Python stage, one serialization of the wide column) --
    timings["qc_fullfunnel_cc100k"] = timed_pipeline(
        cc.drop("text"), num_partitions=0, html_col="html"
    )
    docs_per_sec_funnel = n_cc / timings["qc_fullfunnel_cc100k"]

    # -- dedup throughput: MinHash-LSH near-dup over a 20k-doc slice --
    from pyspark.sql import functions as SF

    from longqc_spark.operators.dedup import minhash_jaccard_estimate

    slice20k = cc.filter(SF.pmod(SF.xxhash64("url"), SF.lit(5)) == 0)
    n_slice = slice20k.count()
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        minhash_jaccard_estimate(slice20k, key_col="url", threshold=0.5).count()
        best = min(best, time.time() - t0)
    timings["minhash_lsh_20k"] = best
    dedup_docs_per_sec = n_slice / best

    # -- user-facing curation funnel (VERDICT r3 item 8): lineage-committed
    # QC run over the 100k corpus, then curated training export (decontam +
    # split + shard) from the committed labels — the longqc-spark
    # --curate-out CLI path end-to-end, cold (a lineage commit is a write
    # job; there is no warm steady state to amortize into) --
    import shutil
    import tempfile

    from longqc_spark.curation import curate_from_labels
    from longqc_spark.lineage import read_labels, run_qc_with_lineage

    eval_df = cc.orderBy("url").limit(200).select(
        F.row_number().over(Window.orderBy("url")).alias("eval_id"), "text"
    )
    tmp = tempfile.mkdtemp(prefix="bench_curate_")
    try:
        t0 = time.time()
        run_qc_with_lineage(cc, os.path.join(tmp, "run"), n_buckets=8)
        curate_from_labels(
            read_labels(spark, os.path.join(tmp, "run")),
            eval_df=eval_df,
            key_col="url",
            shard_bytes=500_000,
        ).write.mode("overwrite").parquet(os.path.join(tmp, "curated"))
        timings["qc_curate_cc100k"] = time.time() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # -- operator queries (steady-state: best of 2; first run pays the cold
    # single-row-group scan + JIT) --
    qs = entrymod.queries()
    for name in BENCH_QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, SF_DIR).collect()
            best = min(best, time.time() - t0)
        timings[name] = best

    spark.stop()
    out = {
        "metric": "total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": float(os.path.basename(SF_DIR.rstrip("/")).removeprefix("sf") or 0.1),
        "docs_per_sec_driver_table": round(docs_per_sec_driver, 1),
        "docs_per_sec_cc100k": round(docs_per_sec_cc, 1),
        "docs_per_sec_fullfunnel": round(docs_per_sec_funnel, 1),
        "dedup_docs_per_sec": round(dedup_docs_per_sec, 1),
        "cores": cores,
        # host-drift calibration (M iters/s): normalize round-over-round
        # deltas with tools/bench_compare.py --normalize
        "host_probe_mips_1": probe_1,
        "host_probe_mips_all": probe_all,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
