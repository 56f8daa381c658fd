"""Property-based invariants for the round-5 operators — randomized
corpora checked against independent pure-Python references, the same
strategy the funnel property test uses (SURVEY §5: the reference pins
semantics with brute-force recomputation)."""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

WORDS = ["a", "bb", "ccc", "dd", "e"]


doc_corpus = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=doc_corpus)
def test_chunking_covers_every_token_exactly(spark, corpus):
    """Chunk starts tile the doc: with stride <= chunk_tokens every
    token index is covered, start positions are the arithmetic
    progression, and every chunk digest equals the reference slice."""
    from kelos_on_kafka_spark.operators.chunking import chunk_documents

    ct, stride = 4, 3
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
        "doc_id long, text string",
    )
    rows = chunk_documents(
        docs, chunk_tokens=ct, stride=stride
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, ws in enumerate(corpus):
        toks = " ".join(ws).strip().split() or [""]
        got = sorted(by_doc[i], key=lambda r: r.start_tok)
        assert [r.start_tok for r in got] == list(
            range(1, len(toks) + 1, stride)
        )
        for r in got:
            ref = toks[r.start_tok - 1 : r.start_tok - 1 + ct]
            assert r.n_tokens == len(ref)
            assert r.chunk_md5 == hashlib.md5(
                " ".join(ref).encode()
            ).hexdigest()


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=doc_corpus, max_tokens=st.integers(min_value=1, max_value=9))
def test_packing_is_prefix_sum_consistent(spark, corpus, max_tokens):
    """seq_id/seq_offset are exactly the div/mod of the running token
    prefix sum in doc order within each shard; offsets < max_tokens;
    seq_id is monotone in doc order."""
    from kelos_on_kafka_spark.operators.chunking import pack_sequences

    docs = spark.createDataFrame(
        [
            (i, " ".join(ws), f"s{i % 2}")
            for i, ws in enumerate(corpus)
        ],
        "doc_id long, text string, source string",
    )
    rows = {
        r.doc_id: r
        for r in pack_sequences(docs, max_tokens=max_tokens).collect()
    }
    cum = {"s0": 0, "s1": 0}
    last_seq = {"s0": -1, "s1": -1}
    for i, ws in enumerate(corpus):
        part = f"s{i % 2}"
        n = len(" ".join(ws).strip().split() or [""])
        r = rows[i]
        assert r.n_tokens == n
        assert r.seq_id == cum[part] // max_tokens
        assert r.seq_offset == cum[part] % max_tokens
        assert 0 <= r.seq_offset < max_tokens
        assert r.seq_id >= last_seq[part]
        last_seq[part] = r.seq_id
        cum[part] += n


changelog = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # key
        st.integers(min_value=0, max_value=5),   # ts
        st.booleans(),                           # is_delete
        st.floats(min_value=0, max_value=9, allow_nan=False),
    ),
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(log=changelog)
def test_cdc_compact_equals_sequential_replay(spark, log):
    """Compacted state == replaying the changelog sequentially in
    (ts, id) order into a dict with delete semantics."""
    from kelos_on_kafka_spark.plans.maintenance import cdc_compact

    rows = [
        (eid, key, ts * 1_000_000, is_del, val)
        for eid, (key, ts, is_del, val) in enumerate(log)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, key long, ts_us long, is_del boolean, value double"
    ).select(
        "event_id", "key", F.timestamp_micros("ts_us").alias("ts"),
        "is_del", "value",
    )
    got = {
        r.key: (r.id, r.ts_us, r.value)
        for r in cdc_compact(
            df, "key", "ts", "event_id", F.col("is_del"), ["value"]
        ).collect()
    }
    state = {}
    for eid, key, ts_us, is_del, val in sorted(
        rows, key=lambda r: (r[2], r[0])
    ):
        if is_del:
            state.pop(key, None)
        else:
            state[key] = (eid, ts_us, val)
    # sequential replay applies deletes mid-stream; compaction keeps a
    # key iff its LAST op is not a delete — same final answer
    assert got == state


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.sampled_from(["p q", "p q r", "zz", "p p p", ""]),
        min_size=2,
        max_size=10,
    )
)
def test_incremental_dedup_partitions_batch(spark, texts):
    """Every new doc gets exactly one status; 'keep' docs have unique
    unseen digests; every batch_dup's digest has a keep keeper with a
    smaller id."""
    from kelos_on_kafka_spark.operators.dedup import incremental_dedup

    new = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    old = spark.createDataFrame(
        [("p q",)], "text string"
    ).select(F.md5("text").alias("digest"))
    rows = incremental_dedup(new, old).collect()
    assert len(rows) == len(texts)
    by_status = {}
    for r in rows:
        by_status.setdefault(r.status, []).append(r)
    seen_digest = hashlib.md5(b"p q").hexdigest()
    for r in by_status.get("seen", []):
        assert r.digest == seen_digest
    keeps = {r.digest: r.doc_id for r in by_status.get("keep", [])}
    assert len(keeps) == len(by_status.get("keep", []))  # unique digests
    for r in by_status.get("batch_dup", []):
        assert r.digest in keeps and keeps[r.digest] < r.doc_id
