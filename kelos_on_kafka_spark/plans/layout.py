"""Partition-layout guards.

``fan_out`` protects compute-heavy projections (higher-order shingle
expressions, per-element hash chains, vector arithmetic) from running on
a near-empty partition layout: a small parquet scan arrives as 1-2
partitions, which serializes work that should saturate every core.  At
real scale (the 100 TB target) any scan already carries >= the cluster's
default parallelism in partitions, so the guard is a no-op there — the
round-robin shuffle only ever touches inputs small enough for it to be
irrelevant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` round-robin to the session's default
    parallelism iff it currently has fewer partitions than that (or the
    explicit ``min_partitions``)."""
    spark = df.sparkSession
    target = min_partitions or int(
        spark.conf.get("spark.default.parallelism", None)
        or spark.sparkContext.defaultParallelism
    )
    if df.isStreaming:
        # no partition probe on a streaming plan; micro-batch layout
        # follows the source's file/trigger split, and the stateful
        # stages repartition on their keys anyway
        return df
    # Estimate scan parallelism from the input-file count (public API;
    # no .rdd probe): each file yields >= 1 scan partition, so a plan
    # backed by >= target files is already wide enough.  Plans with no
    # file lineage (post-shuffle, in-memory) already carry
    # spark.sql.shuffle.partitions tasks — leave those alone.  At real
    # scale any corpus scan has far more files than cores and the guard
    # is a no-op; only genuinely tiny scans pay the round-robin.
    files = df.inputFiles()
    if not files:
        return df
    if len(files) >= target:
        return df
    return df.repartition(target)
