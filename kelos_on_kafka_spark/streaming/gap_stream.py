"""Streaming silence/outage monitor — the streaming twin of
``temporal.detect_gaps`` as an ``applyInPandasWithState`` operator.

Per key the state is ONE long (the last event time).  Two row kinds:

* CLOSED gaps: when a key's next event arrives more than ``min_gap_us``
  after the previous one, emit (key, gap_start_us, gap_end_us, gap_us)
  — exactly the batch operator's rows for in-order arrival.
* CENSORED silences: when the WATERMARK passes ``last_ts +
  max_silence_us`` with no newer event, emit (key, last_ts, -1, -1)
  and evict the state — the "source went quiet NOW" alert a monitor
  wants at silence time, not retroactively when (if) the feed resumes;
  it is also what bounds the state store (8 bytes/key, evicted after
  max_silence).

Determinism contract (the same one every staged driver stream uses): a
span-covering watermark delay means no timeout fires before all real
data is processed, so every real gap emits CLOSED and each key emits
exactly one final censored row when the end-of-stream sentinel advances
the watermark — byte-reproducible against a batch SQL oracle.  At
production delays the censored row fires mid-stream at the silence
threshold; a later resume then starts a fresh history (the gap spanning
the eviction is intentionally reported as the censored alert, not as a
closed gap).

Reference surface: the reference's EndOfWindowToken punctuation
(Main.java:147-160) is the same 'stream went silent' detection this
generalizes per key.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from kelos_on_kafka_spark.operators.windowing import epoch_us

OUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("gap_start_us", LongType()),
        StructField("gap_end_us", LongType()),
        StructField("gap_us", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("last_ts", LongType())])


def _make_fn(min_gap_us: int, max_silence_us: int):
    def fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (last_ts,) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [int(key[0])],
                    "gap_start_us": [int(last_ts)],
                    "gap_end_us": [-1],
                    "gap_us": [-1],
                }
            )
            return
        last = state.get[0] if state.exists else None
        chunks = [p for p in batches if not p.empty]
        rows: list[tuple[int, int, int, int]] = []
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts_us", "row_id"]
            )
            for ts in pdf["ts_us"].astype("int64"):
                ts = int(ts)
                if last is not None and ts - last > min_gap_us:
                    rows.append((int(key[0]), last, ts, ts - last))
                last = ts
        if last is not None:
            state.update((int(last),))
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max((last + max_silence_us) // 1000, wm + 1)
            )
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["key", "gap_start_us", "gap_end_us", "gap_us"],
            )

    return fn


def stream_gap_monitor(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    min_gap_us: int,
    max_silence_us: int | None = None,
    id_col: str = "event_id",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming per-key gap/outage detection: closed gaps as they are
    observed, censored silence alerts (gap_end_us = -1) when the
    watermark passes ``last_ts + max_silence_us``.  State is one long
    per live key, always bounded — ``max_silence_us`` defaults to
    ``min_gap_us`` x 4 and must be >= ``min_gap_us``."""
    if max_silence_us is None:
        max_silence_us = 4 * min_gap_us
    if max_silence_us < min_gap_us:
        raise ValueError("max_silence_us must be >= min_gap_us")
    prepared = events.withWatermark(ts_col, watermark_delay).select(
        F.col(key_col).cast("long").alias("key"),
        epoch_us(ts_col).alias("ts_us"),
        F.col(id_col).cast("long").alias("row_id"),
        F.col(ts_col).alias("_event_ts"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _make_fn(int(min_gap_us), int(max_silence_us)),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
