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


def zorder_key(cols: list[str], bits: int = 16):
    """Z-order (Morton) key: interleave the low ``bits`` bits of N
    non-negative integer columns — rows close in the key are close in
    EVERY dimension, so sorting by it keeps parquet row-group min/max
    ranges tight on all N columns at once and multi-dimensional
    predicates skip row groups (the data-skipping layout Delta's
    OPTIMIZE ZORDER / Iceberg's sort orders apply; here as a pure
    Catalyst expression).  Callers quantize non-integer columns first
    (e.g. ``F.unix_micros(ts) / bucket``); ``bits * len(cols)`` must
    stay <= 63."""
    if bits * len(cols) > 63:
        raise ValueError(
            f"bits*len(cols) = {bits * len(cols)} exceeds a long (63)"
        )
    from pyspark.sql import functions as F

    key = F.lit(0).cast("long")
    for b in range(bits):
        for ci, c in enumerate(cols):
            bit = (
                F.shiftrightunsigned(F.col(c).cast("long"), b)
                .bitwiseAND(F.lit(1))
                .cast("long")
            )
            key = key + F.shiftleft(bit, b * len(cols) + ci)
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int | None = None,
    writer_options: dict | None = None,
) -> None:
    """Write ``df`` as parquet laid out in Z-order over ``cols``:
    range-partition on the Morton key (one key range per file) and sort
    within each partition, so every file's row groups carry tight
    min/max stats on all ``cols`` — scans filtering on any of them
    skip whole row groups/files.  One extra pass over the input (the
    range partitioner samples the key), paid once per snapshot like any
    OPTIMIZE/CLUSTER BY."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    n = n_files or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    writer = (
        df.withColumn("__zkey", zorder_key(cols, bits))
        .repartitionByRange(n, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
    )
    for k, v in (writer_options or {}).items():
        writer = writer.option(k, v)
    writer.parquet(path)
