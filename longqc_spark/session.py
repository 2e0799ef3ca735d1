"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[N]`` but every conf is chosen for the 1000-executor
/ 100 TB target: AQE on (runtime re-plan + skew-join splitting), Arrow on
(the pandas-UDF boundary is the engine's hot path), UTC session timezone
(DuckDB-oracle comparability), shuffle partitions sized to cores locally —
on a real cluster AQE coalesces from a high initial number instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app: str = "longqc-spark", cores: int | None = None) -> SparkSession:
    cores = cores or cpu_count()
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 2048 measured ~30% faster than 4096 on the cc100k pipeline at
        # local[32] (interleaved A/B, med 2.9s vs 4.3s): finer batches give
        # better task granularity + serialize/compute overlap for wide text
        # columns crossing the Arrow boundary
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # shuffle/spill codec: lz4 (stock) unless overridden — zstd trades
        # ~15% CPU for ~1.5x smaller shuffle files, the right call when a
        # corpus-scale job is disk-bound (this sandbox: 68 GB free for
        # shuffle + DISK_ONLY pins; a real cluster sizes shuffle dirs
        # instead, which is why the default stays lz4)
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_IO_CODEC", "lz4"),
        )
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
