"""Physical-plan quality gates: predicate pushdown reaches the scans,
relational queries stay JVM-side (no Python eval in the plan), small
dimensions broadcast, and scans prune columns."""

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushes_filter_to_scan(spark):
    plan = _plan(entry_mod.q_pricing_summary(spark, SF))
    assert "PushedFilters: [" in plan
    assert "l_quantity" in plan.split("PushedFilters")[1][:200]


def test_relational_queries_have_no_python_stage(spark):
    for name in [
        "pane_agg",
        "sliding_window",
        "session_windows",
        "topn_per_pane",
        "interval_join",
        "dedup_exact",
        "token_stats",
        "quality_flags",
        "region_revenue",
        "pricing_summary",
        "semi_join",
        "knn_cosine",
        "knn_lsh",
        "knn_ivf",
        "embedding_near_dups",
        "minhash_sigs",
        "minhash_lsh_pairs",
        "simhash",
        "simhash_near_dups",
        "dedup_fingerprint",
        "lang_guess",
        "stopword_stats",
        "bpe_token_count",
        "winnow_fingerprints",
        "stream_tumbling",
        "stream_sliding",
        "stream_session",
        "salted_topn_docs",
        "skew_join_agg",
        "distinct_tokens",
        "asof_join",
        "cep_sequence",
        "rollup_panes",
        "domain_stats",
        "domain_cap",
        "span_dedup",
        "span_clean",
        "props_extract",
        "weighted_strat_cap",
        "funnel_steps",
        "norm_dedup",
        "cube_events",
        "snapshot_diff",
        "top_orders",
        "session_assign",
        "quality_verdicts",
        "hash_split",
        "stratified_cap",
        "det_sample",
        "value_percentiles",
        "media_exact_dups",
        "redact_pii",
        "repetition_stats",
        "contamination",
        "top_terms",
        "funnel_dropoff",
        "bigram_rarity",
        "incremental_dedup",
        "event_gaps",
        "bounce_rate",
        "cluster_sizes",
        "value_drift",
        "doc_chunks",
        "seq_packing",
        "scd2_dim",
        "cdc_state",
    ]:
        plan = _plan(entry_mod.queries()[name](spark, SF))
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan, name


def test_region_revenue_broadcasts_dimensions(spark):
    plan = _plan(entry_mod.q_region_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_scan_prunes_columns(spark):
    # token_stats touches only (lang, text): the lineitem-wide documents
    # scan must read exactly those
    plan = _plan(entry_mod.q_token_stats(spark, SF))
    scan = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in scan and "lang" in scan
    assert "source" not in scan and "n_chars" not in scan


def test_whole_stage_codegen_present(spark):
    # codegen'd spans print as "*(n) Operator" in the executed plan
    plan = _plan(entry_mod.q_pane_agg(spark, SF))
    assert "*(" in plan


def test_contamination_broadcasts_probe_side(spark):
    # one-pass shape: probe hash set broadcast into a left join whose
    # aggregation produces both counts; no shuffle carries strings
    plan = _plan(entry_mod.q_contamination(spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan


def test_kelos_config_rejects_unknown_kernel():
    import pytest as _pytest

    from kelos_on_kafka_spark.config import KelosConfig

    with _pytest.raises(ValueError, match="unknown kernel"):
        KelosConfig(kernel="epan")
    assert KelosConfig(kernel="epanechnikov").kernel == "epanechnikov"


def test_fan_out_counts_splits_of_large_files(spark, tmp_path):
    """A single large SPLITTABLE file is not one partition: with a
    small maxPartitionBytes the split estimate exceeds the target and
    fan_out must NOT repartition (that would reduce parallelism)."""
    from kelos_on_kafka_spark.plans import layout

    p = str(tmp_path / "wide")
    spark.range(200_000).selectExpr(
        "id", "repeat('x', 64) AS pad"
    ).coalesce(1).write.parquet(p)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    try:
        df = spark.read.parquet(p)
        out = layout.fan_out(df, min_partitions=4)
        assert out is df  # estimated splits >> 4 -> untouched plan
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_fan_out_models_bin_packing_of_tiny_files(spark, tmp_path):
    """ADVICE r4: >= target FILES does not mean >= target PARTITIONS —
    Spark bin-packs small files (cost = size + openCost, bins of
    maxSplitBytes with the bytes-per-core clamp).  With minPartitionNum
    pinned to 1 the clamp packs 8 tiny files into ~1 scan partition, so
    fan_out must widen despite the file count."""
    from kelos_on_kafka_spark.plans import layout

    p = str(tmp_path / "tiny8")
    spark.range(800).repartition(8).write.parquet(p)  # 8 tiny files
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    try:
        df = spark.read.parquet(p)
        assert len(df.inputFiles()) >= 8
        # model agrees with the planner: everything packs into ~1 bin
        est = layout._estimated_scan_partitions(spark, df.inputFiles(), 4)
        assert est < 4
        out = layout.fan_out(df, min_partitions=4)
        assert out is not df  # must repartition despite 8 >= 4 files
    finally:
        spark.conf.unset("spark.sql.files.minPartitionNum")


def test_fsutil_resolve_hint_and_local():
    import pytest as _pytest

    from kelos_on_kafka_spark.plans import fsutil

    fs, p = fsutil.resolve("/tmp/somewhere")
    assert p == "/tmp/somewhere"
    with _pytest.raises(RuntimeError, match="pyarrow cannot resolve"):
        fsutil.resolve("bogus-scheme://x/y")
