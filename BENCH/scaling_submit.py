#!/usr/bin/env python
"""Two-cluster-size scaling measured through the LITERAL north-rule
invocation: ``spark-submit --py-files kelos.zip scripts/run_job.py``
at --master local[N] and local[4N] on the same parquet input.

Each run is a fresh spark-submit process; the timed quantity is the
job phase (session-ready -> action complete, printed by run_job
--bench), which excludes the per-process JVM startup a long-lived
cluster pays once.  Median of ``--repeats`` runs per size.

Usage: python BENCH/scaling_submit.py [--cpus 2 8] [--pages 1200000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_pkg(dst: str) -> None:
    with zipfile.ZipFile(dst, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "kelos_on_kafka_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


def _one_run(cpus: int, zpath: str, inp: str, out: str, shards: int) -> float:
    r = subprocess.run(
        [
            "spark-submit",
            "--master",
            f"local[{cpus}]",
            # the same execution knobs plans/session.py:get_spark sets —
            # on a cluster these ride in spark-defaults / submit flags
            "--conf",
            f"spark.sql.shuffle.partitions={max(2 * cpus, 8)}",
            "--conf",
            "spark.driver.memory=8g",
            "--conf",
            "spark.sql.files.maxPartitionBytes=33554432",
            "--conf",
            "spark.sql.execution.arrow.maxRecordsPerBatch=20000",
            "--conf",
            "spark.sql.session.timeZone=UTC",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zpath,
            os.path.join(REPO, "scripts", "run_job.py"),
            "--mode",
            "batch",
            "--bench",
            "--input",
            inp,
            "--output",
            out,
            "--shards",
            str(shards),
            "--top-n",
            "100",
        ],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        raise RuntimeError(f"spark-submit failed at local[{cpus}]")
    for line in r.stdout.splitlines():
        line = line.strip()
        if line.startswith('{"job_seconds"'):
            return json.loads(line)["job_seconds"]
    raise RuntimeError("no timing line in job output")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, nargs=2, default=[2, 8])
    ap.add_argument("--pages", type=int, default=1_200_000)
    ap.add_argument("--shards", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    path = f"/tmp/kelos_bench_pages_{args.pages}"
    from kelos_on_kafka_spark.plans.session import get_spark
    from kelos_on_kafka_spark.sources.pages import ensure_pages_parquet

    gen = get_spark(app_name="kelos-pagegen", master="local[32]")
    gen.sparkContext.setLogLevel("ERROR")
    ensure_pages_parquet(
        gen, args.pages, path, pages_per_pane=max(args.pages // 15, 1)
    )
    gen.stop()

    zpath = os.path.join(tempfile.mkdtemp(), "kelos.zip")
    _zip_pkg(zpath)

    results = []
    for cpus in args.cpus:
        outdir = tempfile.mkdtemp(prefix=f"kelos_submit_out_{cpus}_")
        # first run doubles as warm-up for the OS page cache
        runs = [
            _one_run(cpus, zpath, path, f"{outdir}/r{i}", args.shards)
            for i in range(args.repeats + 1)
        ][1:]
        runs.sort()
        med = runs[len(runs) // 2]
        rec = {
            "cpus": cpus,
            "pages": args.pages,
            "job_seconds_runs": runs,
            "job_seconds_median": med,
            "pages_per_sec": round(args.pages / med, 1),
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)

    lo, hi = results
    eff = (hi["pages_per_sec"] / lo["pages_per_sec"]) / (
        hi["cpus"] / lo["cpus"]
    )
    print(
        json.dumps(
            {
                "metric": "spark_submit_scaling_efficiency",
                "value": round(eff, 3),
                "from_cpus": lo["cpus"],
                "to_cpus": hi["cpus"],
            }
        )
    )


if __name__ == "__main__":
    main()
