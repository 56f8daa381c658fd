#!/usr/bin/env python
"""Per-query noop-isolated micro-bench + plan capture (guide §1.4/§1.5).

Times individual declared queries (and the bench.py fast variants)
against an arbitrary data dir with the noop sink, min-of-N, and can dump
``.explain('formatted')`` per query.  bench.py itself is FROZEN for
driver measurement; every extra number this round comes from here.

Usage:
  python BENCH/bench_extra.py --sf /tmp/sfx1 --reps 2 \
      --queries jaccard_prefix,ngram_jaccard \
      [--explain plans/r07 --suffix _before]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fast_variants(spark, sf_dir):
    from kelos_on_kafka_spark.operators import dedup as _dd
    from kelos_on_kafka_spark.operators import similarity as _sim

    docs_df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb_df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probe_ids = [
        r["vec_id"] for r in emb_df.select("vec_id").limit(8).collect()
    ]
    return {
        "simhash_fast": lambda: _dd.simhash64(docs_df, portable=False),
        "minhash_lsh_pairs_fast": lambda: _dd.lsh_candidate_pairs(
            _dd.minhash_signatures(docs_df, fast=True),
            n_bands=4,
            rows_per_band=4,
            portable=False,
        ),
        "knn_lsh_fast": lambda: _sim.lsh_bucketed_topk(
            emb_df, probe_ids, k=5, n_planes=8
        ),
        "ngram_jaccard_fast": lambda: _dd.ngram_jaccard_pairs(
            docs_df, hash_shingles=True
        ),
        "containment_fast": lambda: _dd.containment_pairs(
            docs_df, min_containment_pct=30, hash_shingles=True
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", required=True)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", default=None,
                    help="dir to write <query><suffix>.txt explain files")
    ap.add_argument("--suffix", default="")
    ap.add_argument("--no-time", action="store_true",
                    help="only capture plans, skip timed runs")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from kelos_on_kafka_spark.plans.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="kelos-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    fv = fast_variants(spark, args.sf)

    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    out: dict[str, float] = {}
    for name in names:
        make = (
            (lambda n=name: qs[n](spark, args.sf))
            if name in qs
            else fv[name]
        )
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            txt = make()._jdf.queryExecution().explainString(mode)
            with open(
                f"{args.explain}/{name}{args.suffix}.txt", "w"
            ) as f:
                f.write(txt)
        if args.no_time:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        best = float("inf")
        for _ in range(args.reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            make().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"  {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf_dir": args.sf, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
