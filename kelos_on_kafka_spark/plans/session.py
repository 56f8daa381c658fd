"""SparkSession construction with scale-appropriate defaults.

Single place where the engine's physical-execution knobs live: AQE with
skew-join handling, Arrow for all pandas-UDF exchange, shuffle
partitions sized to core count.  On a real cluster the same builder is
fed through ``spark-submit --py-files``; in this sandbox it runs
``local[$SPARK_GRAFT_CPUS]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "kelos-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    # Arrow-batched pandas stages allocate multi-MB buffers per batch;
    # glibc's default 128 KiB mmap threshold makes every one a fresh
    # mmap/munmap cycle, and the resulting guest page-fault storm
    # serializes across workers (measured 11x per-worker slowdown at 32
    # processes).  Raising the thresholds keeps freed blocks on the heap
    # for reuse.  Must be set before the JVM starts — Python workers
    # inherit the JVM's environment.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TOP_PAD_", "134217728")
    cpus = cpu_count()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or max(cpus, 8)),
        )
        # Let Catalyst re-plan at runtime: partition coalescing, skew-join
        # splitting — the explicit skew story for the 100 TB target.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # All Python exchange is Arrow-batched; no per-row Python anywhere
        # (BASELINE.json input_hint).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        # Smaller scan splits -> enough tasks to fill all cores even on
        # moderate inputs (default 128 MiB gave 26 tasks for 32 cores).
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.sql.session.timeZone", "UTC")
        # local[N] runs every executor thread inside the driver JVM, so
        # this IS the executor memory.  r07 measured BOTH directions on
        # the full 95-query bench at sf1.0 scale: 48g removes the spill
        # of the 60M+-key pair aggregates per-query, but the big heap
        # degrades the LONG session — the in-run drift sentinel rose
        # 3.3x by query ~75 and the whole set took 446s vs 308s at 8g
        # (GC of a grown heap + page-cache pressure cost more than the
        # spill it saved).  8g stays; override via SPARK_DRIVER_MEM for
        # single heavy jobs.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
