"""Deterministic streaming sampling: at most ``n`` rows per event-time
pane, chosen by portable-hash priority — the streaming form of
``sampling.stratified_cap`` (and, with an integer weight column, of
``weighted_stratified_cap``: the caller supplies the min-of-w priority
as a LONG column).

This is bounded-state reservoir sampling done deterministically:
state per open pane is the running ``n`` smallest (priority, row_id)
pairs — a row with priority above the current n-th can never enter the
final sample, so state is O(n), not O(events).  Priorities stay 64-bit
integers end to end (the top-N stream's double value column would
round 60-bit hashes); the emitted sample is a pure function of the
data, reproducible by the batch operator and an external SQL engine.

Emitted exactly once per pane when the watermark closes it, like
``topn_stream``.
"""

from __future__ import annotations

import pickle
from typing import Any, Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from kelos_on_kafka_spark.operators.dedup import _hash64

SAMPLE_SCHEMA = StructType(
    [
        StructField("pane_id", LongType()),
        StructField("sample_rank", IntegerType()),
        StructField("row_id", LongType()),
        StructField("priority", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("blob", BinaryType())])


def _make_sample_fn(n: int, pane_us: int):
    def fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        pane = int(key[0])
        best: List[Tuple[int, int]] = (
            pickle.loads(state.get[0]) if state.exists else []
        )
        if state.hasTimedOut:
            state.remove()
            if best:
                yield pd.DataFrame(
                    {
                        "pane_id": pane,
                        "sample_rank": range(1, len(best) + 1),
                        "row_id": [i for _, i in best],
                        "priority": [p for p, _ in best],
                    }
                )
            return
        for pdf in batches:
            if pdf.empty:
                continue
            for p, i in zip(
                pdf["priority"].astype("int64"),
                pdf["row_id"].astype("int64"),
            ):
                best.append((int(p), int(i)))
            best.sort()  # (priority asc, row_id asc) — total order
            del best[n:]
        state.update((pickle.dumps(best),))
        state.setTimeoutTimestamp(
            max(
                (pane + 1) * (pane_us // 1000),
                state.getCurrentWatermarkMs() + 1,
            )
        )

    return fn


def stream_pane_sample(
    events: DataFrame,
    id_col: str = "event_id",
    ts_col: str = "ts",
    n: int = 100,
    pane_seconds: int = 3600,
    seed: int = 0,
    priority_col: str | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """At most ``n`` rows per tumbling event-time pane, chosen by
    ascending portable md5 hash of the id (uniform, repartition- and
    engine-stable) — or by an explicit LONG ``priority_col`` (pass a
    min-of-w hash column for exact weighted sampling).  Returns
    (pane_id, sample_rank, row_id, priority), emitted on pane close;
    join ``row_id`` back to the source for payloads."""
    pane_us = pane_seconds * 1_000_000
    pri = (
        F.col(priority_col).cast("long")
        if priority_col
        else _hash64(F.col(id_col).cast("string"), seed)
    )
    prepared = events.withWatermark(ts_col, watermark_delay).select(
        F.floor(F.unix_micros(F.col(ts_col)) / F.lit(pane_us))
        .cast("long")
        .alias("pane_id"),
        pri.alias("priority"),
        F.col(id_col).cast("long").alias("row_id"),
        F.col(ts_col).alias("_event_ts"),
    )
    return prepared.groupBy("pane_id").applyInPandasWithState(
        _make_sample_fn(n, pane_us),
        outputStructType=SAMPLE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
