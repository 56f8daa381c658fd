"""Round-5 operators: bigram LM rarity, incremental snapshot dedup,
gap/outage detection, sessionized bounce rate, k-means assignment, and
distribution drift — semantics pinned on hand-computed fixtures (oracle
parity is covered separately by tests/test_entry_oracle.py)."""

import pytest
from pyspark.sql import functions as F


def test_bigram_rarity_hand_computed(spark):
    from kelos_on_kafka_spark.operators.lm import bigram_rarity

    docs = spark.createDataFrame(
        [
            (1, "a b c"),      # bigrams: "a b", "b c"
            (2, "a b"),        # bigram:  "a b"
            (3, "x"),          # no bigrams -> excluded
            (4, "  a   b  "),  # whitespace-normalized: "a b"
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r for r in bigram_rarity(docs).collect()
    }
    # corpus counts: "a b" x3, "b c" x1
    assert set(got) == {1, 2, 4}
    assert (got[1].n_bigrams, got[1].min_bigram_freq,
            got[1].sum_bigram_freq) == (2, 1, 4)
    assert got[1].mean_bigram_freq == 2.0
    assert (got[2].n_bigrams, got[2].min_bigram_freq) == (1, 3)
    assert (got[4].n_bigrams, got[4].min_bigram_freq) == (1, 3)


def test_incremental_dedup_statuses(spark):
    from kelos_on_kafka_spark.operators.dedup import incremental_dedup

    new = spark.createDataFrame(
        [(10, "seen-text"), (11, "fresh"), (12, "dup"), (13, "dup")],
        "doc_id long, text string",
    )
    old = spark.createDataFrame(
        [("x",)], "text string"
    ).select(F.md5("text").alias("digest")).union(
        spark.createDataFrame([("seen-text",)], "text string").select(
            F.md5("text").alias("digest")
        )
    )
    got = {r.doc_id: r.status for r in incremental_dedup(new, old).collect()}
    assert got == {10: "seen", 11: "keep", 12: "keep", 13: "batch_dup"}


def test_incremental_dedup_kept_set_equals_global_exact_dedup(spark):
    """The kept rows of (old ∪ new) exact dedup restricted to the new
    batch == incremental keep set (digests already old are 'seen')."""
    from kelos_on_kafka_spark.operators.dedup import (
        exact_dup_groups,
        incremental_dedup,
    )

    old_docs = spark.createDataFrame(
        [(i, f"t{i % 5}") for i in range(10)], "doc_id long, text string"
    )
    new_docs = spark.createDataFrame(
        [(100 + i, f"t{i % 8}") for i in range(16)],
        "doc_id long, text string",
    )
    old_digests = old_docs.select(F.md5("text").alias("digest"))
    inc = incremental_dedup(new_docs, old_digests)
    kept_inc = {r.doc_id for r in inc.where(F.col("status") == "keep").collect()}
    # global exact dedup over old+new, keepers restricted to new ids
    union = old_docs.unionByName(new_docs)
    keepers = {
        r.keeper_id
        for r in exact_dup_groups(union).collect()
        if r.keeper_id >= 100
    }
    assert kept_inc == keepers


def test_detect_gaps_strict_boundary(spark):
    from kelos_on_kafka_spark.operators.temporal import detect_gaps

    ev = spark.createDataFrame(
        [
            (1, 1, 0),
            (2, 1, 10_000_000),   # exactly min_gap after -> NOT a gap
            (3, 1, 30_000_001),   # 20.000001s after -> gap
            (4, 2, 0),            # single event -> no gap rows
        ],
        "event_id long, user_id long, ts_us long",
    ).select(
        "event_id", "user_id", F.timestamp_micros("ts_us").alias("ts")
    )
    got = detect_gaps(ev, "ts", ["user_id"], 10_000_000).collect()
    assert [(r.user_id, r.gap_start_us, r.gap_end_us, r.gap_us) for r in got] == [
        (1, 10_000_000, 30_000_001, 20_000_001)
    ]


def test_bounce_rate_day_attribution(spark):
    from kelos_on_kafka_spark.operators.webtext import bounce_rate

    DAY = 86_400_000_000
    ev = spark.createDataFrame(
        [
            # user 1, day 0: two events 10 min apart -> 1 session, no bounce
            (1, 1, 0),
            (2, 1, 600_000_000),
            # user 1, day 0: later single event (>30 min) -> bounce
            (3, 1, 3 * 3_600_000_000),
            # user 2: session STARTS on day 0, second event on day 1 ->
            # counts toward day 0 only
            (4, 2, DAY - 60_000_000),
            (5, 2, DAY + 60_000_000),
        ],
        "event_id long, user_id long, ts_us long",
    ).select(
        "event_id", "user_id", F.timestamp_micros("ts_us").alias("ts")
    )
    got = {r.day_id: r for r in bounce_rate(ev).collect()}
    assert set(got) == {0}
    assert got[0].n_sessions == 3 and got[0].n_bounces == 1
    assert got[0].bounce_pct == pytest.approx(1 / 3)


def test_kmeans_assign_matches_ivf_quantizer(spark):
    """kmeans_assign's cell per vector == the cell ivf_topk's corpus
    assignment computes (same quantizer, same tie-break)."""
    import numpy as np

    from kelos_on_kafka_spark.operators.similarity import (
        cluster_sizes,
        kmeans_assign,
    )

    rng = np.random.default_rng(5)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=4)]) for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assigned = kmeans_assign(emb, n_cells=4)
    got = {r.vec_id: r.cell_id for r in assigned.collect()}
    # every vector assigned exactly once; centroid vectors map to
    # themselves (cosine 1.0 with deterministic tie-break)
    assert len(got) == 40
    for i in range(4):
        assert got[i] == i
    sizes = {r.cell_id: r.n_vectors for r in cluster_sizes(emb, 4).collect()}
    assert sum(sizes.values()) == 40


def test_distribution_drift_clamps_and_shares(spark):
    from kelos_on_kafka_spark.plans.maintenance import distribution_drift

    a = spark.createDataFrame(
        [(-5.0,), (0.0,), (15.0,), (999.0,)], "v double"
    )
    b = spark.createDataFrame([(5.0,), (None,)], "v double")
    got = {
        r.bucket_id: r
        for r in distribution_drift(a, b, "v", 0.0, 100.0, 10).collect()
    }
    # -5 clamps to bucket 0, 999 clamps to bucket 9; NULL dropped
    assert got[0].n_a == 2 and got[0].n_b == 1
    assert got[1].n_a == 1 and got[1].n_b == 0
    assert got[9].n_a == 1
    assert got[0].share_a == pytest.approx(0.5)
    assert got[0].share_b == pytest.approx(1.0)
    assert got[1].share_b == 0.0


def test_chunk_documents_hand_computed(spark):
    from kelos_on_kafka_spark.operators.chunking import chunk_documents

    import hashlib

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x")], "doc_id long, text string"
    )
    got = sorted(
        (r.doc_id, r.chunk_idx, r.start_tok, r.n_tokens, r.chunk_md5)
        for r in chunk_documents(
            docs, chunk_tokens=3, stride=2
        ).collect()
    )
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    # doc 1 (7 tokens): starts 1,3,5,7 -> chunks abc cde efg g
    assert got == [
        (1, 0, 1, 3, md5("a b c")),
        (1, 1, 3, 3, md5("c d e")),
        (1, 2, 5, 3, md5("e f g")),
        (1, 3, 7, 1, md5("g")),
        (2, 0, 1, 1, md5("x")),
    ]
    with pytest.raises(ValueError, match="positive"):
        chunk_documents(docs, stride=0)


def test_pack_sequences_hand_computed(spark):
    from kelos_on_kafka_spark.operators.chunking import pack_sequences

    docs = spark.createDataFrame(
        [
            (1, "w " * 6, "s1"),    # 6 tokens (trailing space trimmed)
            (2, "w " * 3, "s1"),    # 3 tokens
            (3, "w " * 5, "s1"),    # 5 tokens
            (4, "w " * 2, "s2"),    # other shard packs independently
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r.doc_id: (r.part, r.n_tokens, r.seq_id, r.seq_offset)
        for r in pack_sequences(docs, max_tokens=8).collect()
    }
    # shard s1 cumulative starts: doc1@0, doc2@6, doc3@9
    assert got[1] == ("s1", 6, 0, 0)
    assert got[2] == ("s1", 3, 0, 6)
    assert got[3] == ("s1", 5, 1, 1)
    assert got[4] == ("s2", 2, 0, 0)


def test_scd2_apply_chains_versions(spark):
    from kelos_on_kafka_spark.plans.maintenance import MAX_LONG, scd2_apply

    cur = spark.createDataFrame(
        [(1, "gold", 0), (2, "silver", 0), (3, "bronze", 5)],
        "key long, attr string, valid_from_us long",
    )
    ch = spark.createDataFrame(
        [
            (1, "platinum", 100, 10),
            (1, "diamond", 200, 11),   # chained second change
            (4, "new", 50, 12),        # key unseen in current
        ],
        "key long, attr string, ts_us long, change_id long",
    )
    rows = sorted(
        map(tuple, scd2_apply(cur, ch).collect()),
    )
    assert rows == sorted(
        [
            (1, "gold", 0, 100, False),
            (1, "platinum", 100, 200, False),
            (1, "diamond", 200, MAX_LONG, True),
            (2, "silver", 0, MAX_LONG, True),
            (3, "bronze", 5, MAX_LONG, True),
            (4, "new", 50, MAX_LONG, True),
        ]
    )


def test_cdc_compact_last_op_wins_and_tombstones(spark):
    from kelos_on_kafka_spark.plans.maintenance import cdc_compact

    ev = spark.createDataFrame(
        [
            (1, 1, 10, "set", 1.0),
            (2, 1, 20, "set", 2.0),    # last op for key 1 -> survives
            (3, 2, 10, "set", 3.0),
            (4, 2, 30, "del", 0.0),    # tombstone -> key 2 gone
            (5, 3, 10, "del", 0.0),
            (6, 3, 10, "set", 4.0),    # same ts: higher id wins
        ],
        "event_id long, user_id long, ts_us long, op string, value double",
    ).select(
        "event_id", "user_id", F.timestamp_micros("ts_us").alias("ts"),
        "op", "value",
    )
    got = {
        r.key: (r.id, r.ts_us, r.value)
        for r in cdc_compact(
            ev, "user_id", "ts", "event_id",
            F.col("op") == "del", ["value"],
        ).collect()
    }
    assert got == {1: (2, 20, 2.0), 3: (6, 10, 4.0)}


def test_jaccard_prefix_identical_to_plain_form(spark):
    """Prefix filtering is LOSSLESS: identical (doc_a, doc_b, inter,
    union_n) rows to the uncapped inverted-index join at the same
    rational threshold, on real corpus data."""
    from kelos_on_kafka_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_prefix_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pre = sorted(
        map(
            tuple,
            ngram_jaccard_prefix_pairs(
                docs, jaccard_num=3, jaccard_den=10
            ).collect(),
        )
    )
    plain = sorted(
        map(
            tuple,
            ngram_jaccard_pairs(
                docs, min_jaccard_pct=30, max_doc_freq=10**9
            ).collect(),
        )
    )
    assert pre == plain and len(pre) > 0


def test_jaccard_prefix_prunes_hot_shingle_fanout(spark):
    """The scale claim, measured: on a boilerplate-heavy corpus (every
    doc shares one hot shingle) the FULL inverted-index join fans out
    quadratically on that shingle, while the rare-first prefix drops it
    from the index — candidate pairs collapse to (near) zero and the
    verified result still matches the plain form (here: empty, since
    one shared shingle is far below t)."""
    from pyspark.sql import functions as F

    from kelos_on_kafka_spark.operators.dedup import (
        _prefix_candidates,
        _shingles,
        ngram_jaccard_pairs,
        ngram_jaccard_prefix_pairs,
    )

    n_docs = 60
    # every doc: the same 3 leading words (one hot shingle) + 6 unique
    docs = spark.createDataFrame(
        [
            (
                i,
                "the quick fox "
                + " ".join(f"w{i}_{j}" for j in range(6)),
            )
            for i in range(n_docs)
        ],
        "doc_id long, text string",
    )
    sh = (
        docs.select(
            "doc_id", F.explode(_shingles("text", 3)).alias("shingle")
        )
        .where(F.col("shingle") != "")
        .distinct()
    )
    full_pair_fanout = (
        sh.select(F.col("doc_id").alias("a"), "shingle")
        .join(sh.select(F.col("doc_id").alias("b"), "shingle"), "shingle")
        .where(F.col("a") < F.col("b"))
        .count()
    )
    assert full_pair_fanout >= (n_docs * (n_docs - 1)) // 2  # 1770+
    n_cand = _prefix_candidates(sh, 5, 10).count()
    assert n_cand == 0  # hot shingle ranked last -> out of every prefix
    got = ngram_jaccard_prefix_pairs(
        docs, jaccard_num=5, jaccard_den=10
    ).collect()
    want = ngram_jaccard_pairs(
        docs, min_jaccard_pct=50, max_doc_freq=10**9
    ).collect()
    assert got == want == []


def test_stream_gap_monitor_closed_and_censored(spark, tmp_path):
    """Hand fixture: closed gaps emit with exact bounds; a key that
    goes silent emits ONE censored alert (gap_end_us = -1) at its last
    event once the watermark passes last + max_silence; boundary gap
    of exactly min_gap does NOT emit (strict >)."""
    import uuid

    from kelos_on_kafka_spark.streaming.gap_stream import (
        stream_gap_monitor,
    )

    BASE = 1_700_000_000
    MIN_GAP = 10_000_000   # 10 s
    rows = [
        (1, 1, 0),
        (2, 1, 10),           # exactly min_gap -> no gap (strict >)
        (3, 1, 31),           # 21 s gap -> closed row
        (4, 2, 5),            # single event -> censored only
    ]
    ev = spark.createDataFrame(
        [(e, u, BASE + s) for e, u, s in rows],
        "event_id long, user_id long, sec long",
    ).select(
        "event_id", F.timestamp_seconds("sec").alias("ts"), "user_id"
    )
    src = str(tmp_path / f"gap_{uuid.uuid4().hex[:8]}")
    ev.coalesce(1).sortWithinPartitions("ts", "event_id").write.parquet(
        f"{src}/f000"
    )
    for i, off in enumerate([40_000, 80_000]):  # two sentinels
        spark.createDataFrame(
            [(990 + i, BASE + off, -1)],
            "event_id long, sec long, user_id long",
        ).select(
            "event_id", F.timestamp_seconds("sec").alias("ts"), "user_id"
        ).coalesce(1).write.parquet(f"{src}/z{i}")
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long"
    ).option("maxFilesPerTrigger", 1).parquet(f"{src}/*")
    out = stream_gap_monitor(
        stream, "user_id", "ts", min_gap_us=MIN_GAP,
        max_silence_us=4 * MIN_GAP, watermark_delay="35000 seconds",
    )
    name = f"gap_{uuid.uuid4().hex[:10]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.key, r.gap_start_us - BASE * 1_000_000 if r.gap_us > 0
         else r.gap_start_us - BASE * 1_000_000, r.gap_end_us
         if r.gap_end_us < 0 else r.gap_end_us - BASE * 1_000_000,
         r.gap_us)
        for r in spark.table(name).where(F.col("key") >= 0).collect()
    )
    assert got == [
        (1, 10_000_000, 31_000_000, 21_000_000),   # the closed gap
        (1, 31_000_000, -1, -1),                   # key 1 went silent
        (2, 5_000_000, -1, -1),                    # key 2 went silent
    ]

    # unbounded/misconfigured silence guard
    with pytest.raises(ValueError, match="max_silence"):
        stream_gap_monitor(
            ev, "user_id", "ts", min_gap_us=10, max_silence_us=5
        )


def test_stream_cdc_pane_state_semantics(spark, tmp_path):
    """Per-pane CDC delta on a real stream: last op per (pane, key)
    wins, a tombstone suppresses its pane's row but a later pane's set
    re-emits the key."""
    import uuid

    from kelos_on_kafka_spark.streaming.relational import (
        stream_cdc_pane_state,
    )

    BASE = 1_700_006_400  # pane-aligned (div 3600)
    rows = [
        # pane 0: key 1 set twice (last wins), key 2 set then deleted
        (1, 1, 10, False, 1.0),
        (2, 1, 20, False, 2.0),
        (3, 2, 10, False, 3.0),
        (4, 2, 30, True, 0.0),
        # pane 1: key 2 set again -> re-emitted
        (5, 2, 3700, False, 5.0),
    ]
    ev = spark.createDataFrame(
        [(e, k, BASE + s, d, v) for e, k, s, d, v in rows],
        "event_id long, key long, sec long, is_del boolean, value double",
    ).select(
        "event_id", "key", F.timestamp_seconds("sec").alias("ts"),
        "is_del", "value",
    )
    src = str(tmp_path / f"scdc_{uuid.uuid4().hex[:8]}")
    ev.coalesce(1).sortWithinPartitions("ts", "event_id").write.parquet(
        f"{src}/data"
    )
    spark.createDataFrame(
        [(99, BASE + 40 * 3600, 0, False, 0.0)],
        "event_id long, sec long, key long, is_del boolean, value double",
    ).select(
        "event_id", F.timestamp_seconds("sec").alias("ts"),
        "key", "is_del", "value",
    ).coalesce(1).write.parquet(f"{src}/sentinel")
    stream = spark.readStream.schema(
        "event_id long, key long, ts timestamp, is_del boolean, value double"
    ).option("maxFilesPerTrigger", 1).parquet(f"{src}/*")
    out = stream_cdc_pane_state(
        stream, "key", "ts", "event_id", "is_del", ["value"],
        pane="1 hour", watermark="14400 seconds",
    )
    name = f"scdc_{uuid.uuid4().hex[:10]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (int(r.window_start.timestamp()) - BASE, r.key, r.id, r.value)
        for r in spark.table(name).collect()
        if int(r.window_start.timestamp()) < BASE + 30 * 3600
    )
    assert got == [
        (0, 1, 2, 2.0),       # last set in pane 0 wins
        (3600, 2, 5, 5.0),    # key 2 tombstoned in pane 0, back in pane 1
    ]


def test_stream_cdc_resume_from_checkpoint_exactly_once(spark, tmp_path):
    """Kill/resume for the streaming CDC op: phase 1 processes half the
    files into a parquet sink with a checkpoint; phase 2 restarts from
    the same checkpoint with the rest — the final delta table has no
    duplicate (pane, key) rows and equals the batch per-pane ranking."""
    import uuid

    from pyspark.sql.window import Window as Wd

    from kelos_on_kafka_spark.streaming.relational import (
        stream_cdc_pane_state,
    )

    BASE = 1_700_006_400
    rows = [
        (i, i % 5, BASE + (i * 311) % 7200, i % 7 == 0, float(i))
        for i in range(200)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, key long, sec long, is_del boolean, value double"
    ).select(
        "event_id", "key", F.timestamp_seconds("sec").alias("ts"),
        "is_del", "value",
    )
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    lo, hi = BASE, BASE + 7200
    mid = BASE + 3600
    ev.where(F.unix_micros("ts") < mid * 1_000_000).coalesce(1).write.parquet(
        f"{src}/f000"
    )

    def run_phase():
        stream = spark.readStream.schema(
            "event_id long, key long, ts timestamp, is_del boolean, value double"
        ).option("maxFilesPerTrigger", 1).parquet(f"{src}/*")
        out = stream_cdc_pane_state(
            stream, "key", "ts", "event_id", "is_del", ["value"],
            pane="30 minutes", watermark="7200 seconds",
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_phase()
    # phase 2: rest of the data + a far-future sentinel to close panes
    ev.where(F.unix_micros("ts") >= mid * 1_000_000).coalesce(1).write.parquet(
        f"{src}/f001"
    )
    spark.createDataFrame(
        [(9_999, 0, hi + 40 * 3600, False, 0.0)],
        "event_id long, key long, sec long, is_del boolean, value double",
    ).select(
        "event_id", "key", F.timestamp_seconds("sec").alias("ts"),
        "is_del", "value",
    ).coalesce(1).write.parquet(f"{src}/f002")
    run_phase()

    got_rows = [
        r
        for r in spark.read.parquet(sink).collect()
        if int(r.window_start.timestamp()) < hi + 3600
    ]
    pane_key = [(r.window_start, r.key) for r in got_rows]
    assert len(pane_key) == len(set(pane_key))  # exactly-once
    got = sorted(
        (int(r.window_start.timestamp()), r.key, r.id, r.value)
        for r in got_rows
    )
    w = Wd.partitionBy("pane", "key").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    want = sorted(
        (r.pane * 1800, r.key, r.event_id, r.value)
        for r in ev.withColumn(
            "pane", F.expr("unix_micros(ts) div 1800000000")
        )
        .withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (~F.col("is_del")))
        .collect()
    )
    assert got == want and len(got) > 0


def test_stream_chained_agg_matches_batch_double_grouping(spark, tmp_path):
    """The chained two-stage streaming rollup (real stream, two
    stateful operators) equals the batch pane->hour double grouping."""
    import uuid

    from kelos_on_kafka_spark.streaming.relational import (
        stream_chained_window_agg,
    )

    BASE = 1_700_000_000
    rows = [
        (i, BASE + (i * 137) % 7200, ("a", "b")[i % 2]) for i in range(400)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, sec long, event_type string"
    ).select(
        "event_id", F.timestamp_seconds("sec").alias("ts"), "event_type"
    )
    src = str(tmp_path / f"chain_{uuid.uuid4().hex[:8]}")
    ev.repartitionByRange(3, "ts").sortWithinPartitions(
        "ts", "event_id"
    ).write.parquet(f"{src}/data")
    spark.createDataFrame(
        [(999_999, BASE + 40 * 3600, "a")],
        "event_id long, sec long, event_type string",
    ).select(
        "event_id", F.timestamp_seconds("sec").alias("ts"), "event_type"
    ).coalesce(1).write.parquet(f"{src}/sentinel")
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string"
    ).option("maxFilesPerTrigger", 1).parquet(f"{src}/*")
    out = stream_chained_window_agg(
        stream, pane="10 minutes", coarse="1 hour",
        watermark="14400 seconds",
    )
    name = f"chain_{uuid.uuid4().hex[:10]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    res = spark.table(name).where(
        F.unix_micros("window_start")
        < (BASE + 30 * 3600) * 1_000_000
    )
    got = sorted(
        (r.window_start, r.event_type, r.n_panes, r.max_pane_count,
         r.sum_pane_count)
        for r in res.collect()
    )
    batch = (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("pc"))
        .groupBy(
            F.window(
                F.col("w.start") + F.expr("INTERVAL 5 minutes"), "1 hour"
            ).alias("cw"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_panes"),
            F.max("pc").alias("mx"),
            F.sum("pc").cast("long").alias("sm"),
        )
    )
    want = sorted(
        (r.cw.start, r.event_type, r.n_panes, r.mx, r.sm)
        for r in batch.collect()
    )
    assert got == want and len(got) > 0
