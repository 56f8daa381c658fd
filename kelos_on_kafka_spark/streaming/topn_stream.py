"""Streaming top-N per event-time window.

Spark's streaming mode forbids window (analytic) functions, so "the N
largest events per window" — the generic form of the KELOS engine's
final stage — has no built-in answer.  This operator keys the stateful
stage by pane id and keeps ONLY the running top-N in state (a bounded
candidate set: an event below the current N-th value can never enter
the final top-N, so state is O(n) per open pane, not O(events)).
When the watermark passes a pane's end the state times out, the pane's
ranking is emitted exactly once (append mode), and the state is
dropped.

Determinism: rank order is (value desc, id asc) — arrival order never
matters because the state keeps the best n under that total order.
"""

from __future__ import annotations

import pickle
from typing import Any, Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

TOPN_SCHEMA = StructType(
    [
        StructField("pane_id", LongType()),
        StructField("rank", IntegerType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("blob", BinaryType())])


def _make_topn_fn(n: int, pane_us: int, descending: bool):
    sign = -1.0 if descending else 1.0

    def fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        pane = int(key[0])
        best: List[Tuple[float, int]] = (
            pickle.loads(state.get[0]) if state.exists else []
        )
        if state.hasTimedOut:
            # watermark passed pane end: emit the ranking exactly once
            state.remove()
            if best:
                yield pd.DataFrame(
                    {
                        "pane_id": pane,
                        "rank": range(1, len(best) + 1),
                        "event_id": [i for _, i in best],
                        "value": [sign * v for v, _ in best],
                    }
                )
            return

        for pdf in batches:
            if pdf.empty:
                continue
            for v, i in zip(
                pdf["value"].astype("float64"), pdf["event_id"].astype("int64")
            ):
                best.append((sign * float(v), int(i)))
            # keep only the bounded candidate set, total order
            # (sign*value asc, id asc)
            best.sort()
            del best[n:]
        state.update((pickle.dumps(best),))
        # fire when the watermark passes this pane's end
        state.setTimeoutTimestamp(
            max((pane + 1) * (pane_us // 1000), state.getCurrentWatermarkMs() + 1)
        )

    return fn


def stream_topn_per_window(
    events: DataFrame,
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    n: int = 3,
    pane_seconds: int = 3600,
    descending: bool = True,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Append-mode streaming DataFrame of (pane_id, rank, event_id,
    value): the top-``n`` events per tumbling event-time pane, emitted
    once when the watermark closes the pane."""
    pane_us = pane_seconds * 1_000_000
    prepared = events.withWatermark(ts_col, watermark_delay).select(
        F.floor(F.unix_micros(F.col(ts_col)) / F.lit(pane_us))
        .cast("long")
        .alias("pane_id"),
        F.col(id_col).cast("long").alias("event_id"),
        F.col(value_col).cast("double").alias("value"),
        F.col(ts_col).alias("_event_ts"),
    )
    return prepared.groupBy("pane_id").applyInPandasWithState(
        _make_topn_fn(n, pane_us, descending),
        outputStructType=TOPN_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
