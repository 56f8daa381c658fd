"""Exactly-once idempotent sink for the streaming outlier table.

``foreachBatch`` + dynamic partition overwrite: in append-mode stateful
streaming each window's rows are emitted exactly once (when the
watermark closes it), so a whole window always lands inside one
micro-batch.  Overwriting exactly the ``window_id`` partitions present
in the batch makes replays after a failure idempotent — re-running a
batch rewrites the same partitions with the same deterministic rows.
Swap the parquet write for an Iceberg ``overwritePartitions`` /
``MERGE`` in a cataloged deployment (config change, same semantics);
at 10^12-doc scale the partition key becomes (window_end hour, shard
range) to bound partition counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_outlier_stream(
    outliers: DataFrame,
    path: str,
    checkpoint: str,
    trigger: dict | None = None,
):
    """Start the exactly-once sink; returns the StreamingQuery."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_id")
            .parquet(path)
        )

    writer = (
        outliers.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
