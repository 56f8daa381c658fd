"""Approximate (Bloom-filter) windowed streaming dedup.

Exact streaming dedup (``relational.stream_dedup_exact`` /
``dropDuplicates``) keeps one state entry PER KEY — at 10^12 keys that
is the state store's capacity problem.  This operator keeps one
fixed-size Bloom filter per event-time pane instead: memory is
``n_bits/8`` bytes per open pane regardless of key cardinality, the
false-negative rate is zero (every true duplicate is dropped), and a
false positive drops a first occurrence with probability
``~(k * n / n_bits)^k`` — the classic approximate-membership trade
(cf. the sliding-window AMQ line of work, e.g. learned cuckoo filters,
SIGMOD 2023; PAPERS.md).

Determinism contract: the two base hashes are the engine's portable
md5 hashes computed as COLUMNS before the stateful stage, bit
positions are ``(h1 + i*h2) mod n_bits`` (double hashing), and rows
are processed in (ts, key-hash) order within a batch — so which row of
a duplicate set survives, and even which rare false positive fires,
is a pure function of the data, reproducible across runs, partitions
and engines.  State is evicted when the watermark passes the pane end
(EventTimeTimeout), like every stateful operator here.

Reference surface: the reference dedups nothing (KELOS windows are
pass-through), but its window-store eviction (stores fetch by time
range, FilterProcessorSupplier.java:42-43) is the same
pane-keyed-state-plus-eviction shape this generalizes.
"""

from __future__ import annotations

import pickle
from typing import Any, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

from kelos_on_kafka_spark.operators.dedup import _hash64

BLOOM_OUT_SCHEMA = StructType(
    [
        StructField("pane_id", LongType()),
        StructField("key_h1", LongType()),
        StructField("row_id", LongType()),
        StructField("ts_us", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("blob", BinaryType())])


def bloom_positions(h1: int, h2: int, n_bits: int, k: int) -> list[int]:
    """Double-hashed bit positions — shared by the operator and the
    pure-Python reference used in tests."""
    # force h2 odd so the probe sequence cycles through distinct slots
    step = h2 | 1
    return [(h1 + i * step) % n_bits for i in range(k)]


def _make_bloom_fn(n_bits: int, k: int, pane_us: int):
    n_words = (n_bits + 63) // 64

    def fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        pane = int(key[0])
        bits: np.ndarray = (
            pickle.loads(state.get[0])
            if state.exists
            else np.zeros(n_words, dtype=np.uint64)
        )
        out = {"pane_id": [], "key_h1": [], "row_id": [], "ts_us": []}
        if state.hasTimedOut:
            # watermark passed the pane end: no admissible row can
            # still arrive for it — drop the filter
            state.remove()
            return
        # Concatenate ALL Arrow chunks before the single sort: a pane's
        # batch arrives as multiple chunks above
        # spark.sql.execution.arrow.maxRecordsPerBatch rows, and a
        # per-chunk sort would make the surviving row (and which rare FP
        # fires) depend on the chunk split — the determinism contract
        # requires one global (ts, key-hash, row) order per pane/batch.
        chunks = [pdf for pdf in batches if not pdf.empty]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts_us", "key_h1", "row_id"]
            )
            for h1, h2, rid, ts in zip(
                pdf["key_h1"].astype("int64"),
                pdf["key_h2"].astype("int64"),
                pdf["row_id"].astype("int64"),
                pdf["ts_us"].astype("int64"),
            ):
                pos = bloom_positions(int(h1), int(h2), n_bits, k)
                words = [p >> 6 for p in pos]
                masks = [np.uint64(1 << (p & 63)) for p in pos]
                seen = all(
                    bits[w] & m for w, m in zip(words, masks)
                )
                if not seen:
                    for w, m in zip(words, masks):
                        bits[w] |= m
                    out["pane_id"].append(pane)
                    out["key_h1"].append(int(h1))
                    out["row_id"].append(int(rid))
                    out["ts_us"].append(int(ts))
        state.update((pickle.dumps(bits),))
        state.setTimeoutTimestamp(
            max(
                (pane + 1) * (pane_us // 1000),
                state.getCurrentWatermarkMs() + 1,
            )
        )
        if out["pane_id"]:
            yield pd.DataFrame(out)

    return fn


def stream_bloom_dedup(
    events: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    pane_seconds: int = 3600,
    n_bits: int = 1 << 20,
    k: int = 4,
    watermark_delay: str = "0 seconds",
    n_state_shards: int = 1,
) -> DataFrame:
    """Approximate first-occurrence-per-(pane, key) on a stream with
    O(n_bits) state per open pane.  Returns (pane_id, key_h1, row_id,
    ts_us) for each emitted (surviving) row; join ``row_id`` back to
    the source for payloads.

    Size ``n_bits`` for the per-pane key cardinality: FP probability
    ``~(k*n/n_bits)^k``; at n = 10^9 keys/pane, n_bits = 2^34 (2 GiB)
    gives ~3e-3 — or set ``n_state_shards`` > 1: the state key becomes
    (pane, key_h1 mod shards), giving ``shards`` independent n_bits
    filters per pane (capacity × shards, each state blob bounded, and
    the stateful stage parallelizes across shards within a pane).
    Correctness is unchanged for true duplicates (a key always lands in
    the same shard); FP behavior differs from the unsharded filter but
    remains a pure function of the data (sharding is by the portable
    key hash, so verdicts stay deterministic and engine-reproducible)."""
    if n_state_shards < 1:
        raise ValueError(f"n_state_shards must be >= 1, got {n_state_shards}")
    pane_us = pane_seconds * 1_000_000
    h1 = _hash64(F.col(key_col).cast("string"), 1)
    prepared = events.withWatermark(ts_col, watermark_delay).select(
        F.floor(F.unix_micros(F.col(ts_col)) / F.lit(pane_us))
        .cast("long")
        .alias("pane_id"),
        F.pmod(h1, F.lit(n_state_shards)).cast("long").alias("state_shard"),
        h1.alias("key_h1"),
        _hash64(F.col(key_col).cast("string"), 2).alias("key_h2"),
        F.col(id_col).cast("long").alias("row_id"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col(ts_col).alias("_event_ts"),
    )
    return prepared.groupBy("pane_id", "state_shard").applyInPandasWithState(
        _make_bloom_fn(n_bits, k, pane_us),
        outputStructType=BLOOM_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
