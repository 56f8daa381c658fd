"""Per-partition lineage stamps and streaming metrics recorder
(plans/lineage.py)."""

import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kelos_on_kafka_spark.plans import lineage

SF = "/root/testdata/sf0.001"


def test_with_lineage_stamps_file_and_partition(spark):
    df = lineage.with_lineage(spark.read.parquet(f"{SF}/documents.parquet"))
    rows = df.select(lineage.PART_COL, lineage.FILE_COL).collect()
    assert all(r[lineage.FILE_COL].endswith(".parquet") for r in rows)
    assert all(r[lineage.PART_COL] >= 0 for r in rows)
    # every (row -> file) assignment is consistent: a partition maps to
    # exactly one file for a plain parquet scan
    per_part = (
        df.groupBy(lineage.PART_COL)
        .agg(F.count_distinct(lineage.FILE_COL).alias("nf"))
        .collect()
    )
    assert all(r["nf"] == 1 for r in per_part)


def test_partition_stats_sums_to_count(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").repartition(4)
    stats = lineage.partition_stats(df).collect()
    assert sum(r["n_rows"] for r in stats) == df.count()
    assert {r["part_id"] for r in stats} <= set(range(4))


def test_stream_metrics_recorder(spark, tmp_path):
    src = str(tmp_path / "src")
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                [1_000_000 + 10 * i for i in range(300)], unit="s"
            ),
            "user_id": [i % 7 for i in range(300)],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)

    from kelos_on_kafka_spark.streaming.relational import (
        stream_tumbling_counts,
    )

    rec = lineage.record_stream_metrics(spark)
    try:
        stream = (
            spark.readStream.schema("ts timestamp, user_id bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .observe("ingest", F.count(F.lit(1)).alias("rows_seen"))
        )
        out = stream_tumbling_counts(stream, ts_col="ts", pane="60 seconds")
        q = (
            out.writeStream.format("memory")
            .queryName("lineage_metrics_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener delivery is async; poll briefly
        for _ in range(60):
            if rec.batches and rec.terminated:
                break
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(rec)

    assert rec.started and rec.terminated
    assert len(rec.batches) >= 1
    s = rec.summary()
    assert s["total_input_rows"] == 300
    assert s["n_batches"] == len(rec.batches)
    assert s["p95_batch_ms"] >= s["p50_batch_ms"] >= 0
    # the tumbling agg is stateful: state rows must have been observed
    assert s["max_state_rows"] > 0
    # watermark advanced past the first pane
    assert s["last_watermark"] is not None
    # df.observe metrics surface per batch
    observed = sum(
        b["observed"].get("ingest", {}).get("rows_seen", 0)
        for b in rec.batches
    )
    assert observed == 300
