"""North-rule invocation: the engine must run via
``spark-submit --py-files`` as a zipped package.  This drives
scripts/run_job.py batch mode through the real spark-submit binary on a
small page table and checks the outlier output shape."""

import os
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_batch_mode(spark, tmp_path):
    # package zip
    zpath = str(tmp_path / "kelos.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "kelos_on_kafka_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    # small page table (deterministic synth)
    from kelos_on_kafka_spark.sources.pages import (
        synth_pages,
        write_pages_parquet,
    )

    inp = str(tmp_path / "pages")
    write_pages_parquet(
        spark, synth_pages(n=3000, seed=9, pages_per_pane=500), inp,
        partitions=2,
    )

    out = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    r = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--py-files",
            zpath,
            os.path.join(REPO, "scripts", "run_job.py"),
            "--mode",
            "batch",
            "--input",
            inp,
            "--output",
            out,
            "--shards",
            "8",
            "--top-n",
            "10",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(tmp_path),  # away from the repo: the zip must suffice
    )
    assert r.returncode == 0, r.stderr[-3000:]

    got = spark.read.parquet(out)
    assert got.count() > 0
    cols = set(got.columns)
    assert {"shard", "window_id", "rank", "point_id", "klome"} <= cols


def test_spark_submit_span_dedup_mode(spark, tmp_path):
    """span-dedup mode through spark-submit: verdicts + per-doc summary
    + rewritten corpus land, and the summary agrees with the library
    computed in-process."""
    zpath = str(tmp_path / "kelos.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "kelos_on_kafka_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    from kelos_on_kafka_spark.sources.pages import (
        synth_pages,
        write_pages_parquet,
    )

    inp = str(tmp_path / "pages")
    write_pages_parquet(
        spark, synth_pages(n=400, seed=3, pages_per_pane=100), inp,
        partitions=2,
    )
    out = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    r = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--py-files",
            zpath,
            os.path.join(REPO, "scripts", "run_job.py"),
            "--mode",
            "span-dedup",
            "--span-tokens",
            "8",
            "--emit-clean",
            "--input",
            inp,
            "--output",
            out,
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]

    from pyspark.sql import functions as F

    from kelos_on_kafka_spark.operators.dedup import span_clean_docs

    summary = spark.read.parquet(f"{out}/doc_summary")
    clean = spark.read.parquet(f"{out}/clean")
    verdicts = spark.read.parquet(f"{out}/span_verdicts")
    docs = spark.read.parquet(inp).select(
        F.abs(F.xxhash64("url")).alias("doc_id"), "text"
    )
    want = sorted(map(tuple, span_clean_docs(docs, span_tokens=8).collect()))
    assert sorted(map(tuple, summary.collect())) == want
    assert clean.count() == summary.count()
    assert verdicts.where(F.col("is_dup")).count() > 0  # synth pages repeat


def test_spark_submit_clean_pipeline_mode(spark, tmp_path):
    """clean-pipeline mode through spark-submit: verdicts + clean
    corpus land, and the clean set equals the library chain computed
    in-process (quality keep -> dedup keepers -> deterministic
    sample)."""
    zpath = str(tmp_path / "kelos.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "kelos_on_kafka_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    from kelos_on_kafka_spark.sources.pages import (
        synth_pages,
        write_pages_parquet,
    )

    inp = str(tmp_path / "pages")
    write_pages_parquet(
        spark, synth_pages(n=400, seed=5, pages_per_pane=100), inp,
        partitions=2,
    )
    out = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    r = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--py-files",
            zpath,
            os.path.join(REPO, "scripts", "run_job.py"),
            "--mode",
            "clean-pipeline",
            "--sample-fraction",
            "0.5",
            "--input",
            inp,
            "--output",
            out,
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]

    from pyspark.sql import functions as F

    from kelos_on_kafka_spark.operators.dedup import exact_dup_groups
    from kelos_on_kafka_spark.operators.sampling import (
        deterministic_sample,
    )
    from kelos_on_kafka_spark.operators.textstats import filter_verdicts

    docs = spark.read.parquet(inp).select(
        F.abs(F.xxhash64("url")).alias("doc_id"), "text"
    )
    kept = docs.join(
        filter_verdicts(docs).where(F.col("keep")).select("doc_id"),
        "doc_id",
    )
    keepers = exact_dup_groups(kept).select(
        F.col("keeper_id").alias("doc_id")
    )
    want = sorted(
        r.doc_id
        for r in deterministic_sample(
            kept.join(keepers, "doc_id", "left_semi"), "doc_id", 0.5
        ).collect()
    )
    got = sorted(
        r.doc_id for r in spark.read.parquet(f"{out}/clean").collect()
    )
    assert got == want and len(got) > 0
    assert spark.read.parquet(f"{out}/verdicts").count() == docs.count()
