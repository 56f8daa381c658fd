#!/usr/bin/env python
"""Shard-count profile for the streaming KELOS path (VERDICT r03 #6).

Runs the same availableNow file-stream bench.py uses, at a sweep of
shard counts, min-of-K p95 trigger-execution per count, and prints one
JSON line.  The question it answers: at the bench input rate, where is
the crossover between the single-shard (reference-parity) configuration
and the sharded scale path — i.e. when does state-store commit overhead
per shard outweigh the clustering parallelism?

Usage: python BENCH/shard_profile.py [--shards 0 4 8 16 32] [--reps 2]
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

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("KELOS_BENCH_PAGES", "120000"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, nargs="+", default=[0, 4, 8, 16, 32])
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kelos_on_kafka_spark.config import KelosConfig
    from kelos_on_kafka_spark.functions.features import featurize_pages
    from kelos_on_kafka_spark.plans.session import get_spark
    from kelos_on_kafka_spark.sources.pages import synth_pages, to_spark_pages
    from kelos_on_kafka_spark.streaming.engine import kelos_stream
    from kelos_on_kafka_spark.streaming.sink import write_outlier_stream

    spark = get_spark(
        app_name="kelos-shard-profile",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    stream_pages = min(N_PAGES // 4, 60_000)
    sp_pdf = synth_pages(
        n=stream_pages,
        seed=7,
        pages_per_pane=max(stream_pages // 12, 1),
        start_epoch=1_700_000_000,
    )
    base = tempfile.mkdtemp(prefix="kelos_shard_profile_")
    src = f"{base}/src"
    os.makedirs(src)
    per_file = max(len(sp_pdf) // 12, 1)
    for i in range(0, len(sp_pdf), per_file):
        to_spark_pages(spark, sp_pdf.iloc[i : i + per_file]).coalesce(
            1
        ).write.mode("overwrite").parquet(f"{src}/f{i:08d}.parquet")
    stream = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
    )

    def run_once(shards: int, tag: str) -> tuple[int | None, float]:
        spts = featurize_pages(stream).select(
            F.abs(F.xxhash64("url")).alias("id"),
            F.col("warc_ts").alias("ts"),
            "features",
            *(
                [(F.abs(F.xxhash64("url")) % shards).alias("shard")]
                if shards
                else []
            ),
        )
        t0 = time.perf_counter()
        q = write_outlier_stream(
            kelos_stream(
                spts, KelosConfig(n=100), shard_col="shard" if shards else None
            ),
            f"{base}/sink_{tag}",
            f"{base}/ckpt_{tag}",
            trigger={"availableNow": True},
        )
        q.awaitTermination(300)
        wall = time.perf_counter() - t0
        durations = sorted(
            p["durationMs"].get("triggerExecution", 0) for p in q.recentProgress
        )
        if not durations:
            return None, wall
        p95 = durations[min(len(durations) - 1, int(0.95 * len(durations)))]
        return p95, wall

    run_once(0, "warmup")  # JIT / python-worker warm-up, not recorded
    results: dict[str, dict[str, float]] = {}
    for shards in args.shards:
        p95s, walls = [], []
        for rep in range(args.reps):
            p95, wall = run_once(shards, f"s{shards}_r{rep}")
            if p95 is not None:
                p95s.append(p95)
            walls.append(wall)
        results[str(shards)] = {
            "p95_ms_min": min(p95s) if p95s else None,
            "p95_ms_all": p95s,
            "wall_s_min": round(min(walls), 2),
        }
    shutil.rmtree(base, ignore_errors=True)
    print(
        json.dumps(
            {
                "stream_pages": stream_pages,
                "cpus": CPUS,
                "reps": args.reps,
                "by_shards": results,
            }
        )
    )


if __name__ == "__main__":
    main()
