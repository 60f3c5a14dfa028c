"""SparkSession factory — the one place execution is configured (SURVEY.md §4.2).

Everything scale-relevant is declared here so a cluster deployment changes
configs, not code:

- AQE on (runtime shuffle coalescing, skew-join splitting, plan re-opt).
- Arrow on for the pandas-UDF extraction stages; bounded batch size so a
  Python worker never materializes more than ~10k rows per batch.
- shuffle.partitions sized ~2× local cores; on a 1000-executor cluster the
  documented formula is max(2 × totalCores, input_bytes / 128MB).
- UTC session TZ so timestamps round-trip exactly against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """In local[N] mode the driver JVM IS every executor, so the r1 fixed
    8g default was undersized for big-SF jobs on big boxes (the sf1 LSH
    self-join OOMed at 8g; verified green at this box's 31g default and at
    48g). Default to a quarter of physical RAM, clamped to [8g, 48g] — the
    upper clamp only bounds GC-pause territory; KGC_DRIVER_MEM overrides."""
    try:
        total_gb = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE") // (1 << 30)
    except (ValueError, OSError):
        return "8g"
    return f"{min(48, max(8, total_gb // 4))}g"


def get_spark(
    app_name: str = "kgc",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Local-scale skew thresholds: the planted hot activity concentrates
        # ~50MB in one join partition — far under the 256MB default, so AQE
        # would never split it. At cluster scale these scale with executor
        # memory; the ratios (factor 2, split target 16MB) are the design.
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("KGC_DRIVER_MEM", _default_driver_mem()))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Under spark-submit the driver JVM exists BEFORE this code runs, so the
    # builder's spark.driver.memory is silently ignored (only plain `python`
    # invocations get it applied — pyspark launches the JVM itself). Warn
    # loudly when the actual heap is far below the intended size; the fix is
    # `spark-submit --driver-memory <size>`.
    want_gb = int(os.environ.get("KGC_DRIVER_MEM", _default_driver_mem()).rstrip("g"))
    got = int(spark._jvm.Runtime.getRuntime().maxMemory())  # type: ignore[union-attr]
    if got < want_gb * (1 << 30) // 2:
        print(
            f"[kgc] WARNING: driver heap is {got / (1 << 30):.1f}g but this box wants "
            f"~{want_gb}g; under spark-submit pass --driver-memory {want_gb}g "
            "(session-builder memory conf cannot resize an already-started JVM)"
        )
    return spark
