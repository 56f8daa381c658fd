"""Stateful streaming funnel — the streaming form of
``temporal.funnel_steps`` (leftmost-greedy k-step CEP) as an
``applyInPandasWithState`` operator.

Per key, the greedy chain state is just the k resolved step timestamps
(s0..s{k-1}, -1 while unresolved) — O(k) state per key.  Events are
processed in (event-time, row-id) order within each batch (all Arrow
chunks concatenated, one sort — the bloom-dedup determinism lesson), so
the incremental update reproduces the batch operator's greedy match
exactly for in-order event-time arrival.  A key emits AT MOST ONE row,
when its chain completes within the deadline; state is evicted by
EventTimeTimeout once the chain either completed or can no longer
complete (watermark past s0 + within), so unmatched keys do not leak
state — the bounded-state story a 10^12-key stream needs.

Reference surface: the reference has no CEP; its per-key stateful
stores + punctuation eviction (FilterProcessorSupplier.java:42-43) are
the same keyed-state-plus-horizon shape.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
)

from kelos_on_kafka_spark.operators.windowing import epoch_us


def _out_schema(k: int) -> StructType:
    return StructType(
        [StructField("key", LongType())]
        + [StructField(f"s{i}_us", LongType()) for i in range(k)]
        + [
            StructField("matched", BooleanType()),
            StructField("duration_us", LongType()),
        ]
    )


def _state_schema(k: int) -> StructType:
    # s0..s{k-1} (-1 = unresolved) + done flag (0/1)
    return StructType(
        [StructField(f"s{i}", LongType()) for i in range(k)]
        + [StructField("done", LongType())]
    )


def _make_funnel_fn(
    steps: list[str],
    within_us: int | None,
    max_age_us: int | None = None,
):
    k = len(steps)

    def fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # chain deadline passed (or emission done): drop the state
            state.remove()
            return
        vals = list(state.get) if state.exists else [-1] * k + [0]
        s, done = vals[:k], vals[k]
        chunks = [pdf for pdf in batches if not pdf.empty]
        out = None
        if chunks and not done:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts_us", "row_id"]
            )
            for tp, ts in zip(pdf["tp"], pdf["ts_us"].astype("int64")):
                # greedy: only the FIRST unresolved step can fill, and
                # only with a strictly later timestamp than its
                # predecessor — processing in ascending (ts, row_id)
                # order makes the first fill the min, i.e. exactly the
                # batch operator's leftmost-greedy chain
                for i in range(k):
                    if s[i] != -1:
                        continue
                    if tp == steps[i] and (i == 0 or int(ts) > s[i - 1]):
                        s[i] = int(ts)
                    break
                if s[k - 1] != -1:
                    dur = s[k - 1] - s[0]
                    if within_us is None or dur <= within_us:
                        out = pd.DataFrame(
                            {
                                "key": [int(key[0])],
                                **{f"s{i}_us": [s[i]] for i in range(k)},
                                "matched": [True],
                                "duration_us": [dur],
                            }
                        )
                    done = 1
                    break
        state.update(tuple(s) + (done,))
        wm = state.getCurrentWatermarkMs()
        if done:
            # emitted (or deadline-exceeded chain closed): clear on the
            # next watermark tick
            state.setTimeoutTimestamp(wm + 1)
        elif s[0] == -1:
            # chain not started — state holds nothing worth keeping
            state.setTimeoutTimestamp(wm + 1)
        elif within_us is not None or max_age_us is not None:
            # partial chain with a horizon: once the watermark passes
            # s0 + within no admissible event can complete it (deadline),
            # or past s0 + max_age the chain is abandoned by policy —
            # either way the state evicts, so partial chains cannot pin
            # the state store forever
            horizon = min(
                b for b in (within_us, max_age_us) if b is not None
            )
            state.setTimeoutTimestamp(max((s[0] + horizon) // 1000, wm + 1))
        # else: caller explicitly opted into unbounded state
        # (allow_unbounded_state=True) — a live partial chain persists
        if out is not None:
            yield out

    return fn


def stream_funnel(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_us: int | None = None,
    id_col: str = "event_id",
    watermark_delay: str = "0 seconds",
    max_age_us: int | None = None,
    allow_unbounded_state: bool = False,
) -> DataFrame:
    """Streaming leftmost-greedy funnel: emits one row per key WHEN its
    chain completes within the deadline — (key, s0_us..s{k-1}_us,
    matched=true, duration_us).  Exactly the ``matched`` rows of the
    batch ``funnel_steps`` for in-order event-time arrival (a test and
    the driver oracle pin this); unmatched keys emit nothing and their
    state is evicted once the deadline passes.

    State is BOUNDED BY DEFAULT: a partial chain's state evicts once
    the watermark passes ``s0 + min(within_us, max_age_us)``.  With
    neither bound set, a key that starts a chain but never completes it
    would pin its state store entry forever — an unbounded state store
    at 10^12-key scale — so that configuration raises unless the caller
    passes ``allow_unbounded_state=True`` explicitly.  ``max_age_us``
    abandons still-completable chains older than the age by policy
    (set it >= within_us to make it retention-only)."""
    if len(steps) < 2:
        raise ValueError("stream_funnel needs at least 2 steps")
    if within_us is None and max_age_us is None and not allow_unbounded_state:
        raise ValueError(
            "stream_funnel with neither within_us nor max_age_us keeps "
            "partial-chain state forever (unbounded state store); pass a "
            "bound, or allow_unbounded_state=True to opt in explicitly"
        )
    prepared = events.withWatermark(ts_col, watermark_delay).select(
        F.col(key_col).cast("long").alias("key"),
        epoch_us(ts_col).alias("ts_us"),
        F.col(type_col).alias("tp"),
        F.col(id_col).cast("long").alias("row_id"),
        F.col(ts_col).alias("_event_ts"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _make_funnel_fn(list(steps), within_us, max_age_us),
        outputStructType=_out_schema(len(steps)),
        stateStructType=_state_schema(len(steps)),
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
