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
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.isStreaming:
        # no partition probe on a streaming plan (.rdd is illegal);
        # micro-batch layout follows the source's file/trigger split,
        # and the stateful stages repartition on their keys anyway
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
