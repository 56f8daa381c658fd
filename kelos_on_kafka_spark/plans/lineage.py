"""Per-partition lineage and metrics (north_rule: "per-partition
lineage + metrics").

Batch lineage: ``with_lineage`` stamps every row with the physical
partition that produced it and the source file it was scanned from, so
any output row of a 10^12-doc job traces back to (file, partition,
task attempt) without re-running anything.  ``partition_stats`` turns
the same ids into a balance/skew report (rows per partition — the first
thing to look at when one task straggles).

Streaming metrics: ``StreamMetricsRecorder`` is a
``StreamingQueryListener`` that keeps a bounded in-memory log of
per-micro-batch progress — input rows, processing rate, event-time
watermark, state-store rows — and summarizes p50/p95 batch durations.
The streaming engine's own per-window metrics columns
(n_window_points / n_clusters / n_candidates, streaming/engine.py) ride
in the data; this listener covers the query-level view the reference
exposes via Kafka Streams metrics.
"""

from __future__ import annotations

import math
from collections import deque
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import listener as _listener

PART_COL = "_part_id"
FILE_COL = "_input_file"


def with_lineage(df: DataFrame) -> DataFrame:
    """Stamp each row with its scan partition id and source file.

    Both are evaluated where the row is read (before any shuffle), so
    they record true scan lineage as long as this is applied directly
    over the source.  ``_input_file`` is empty for non-file sources
    (rate, memory, createDataFrame)."""
    return df.withColumn(PART_COL, F.spark_partition_id()).withColumn(
        FILE_COL, F.input_file_name()
    )


def partition_stats(df: DataFrame) -> DataFrame:
    """Rows per physical partition of ``df`` as (part_id, n_rows) —
    the skew/balance report.  Aggregation is map-side combinable: one
    row per partition reaches the final exchange."""
    return (
        df.select(F.spark_partition_id().alias("part_id"))
        .groupBy("part_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


class StreamMetricsRecorder(_listener.StreamingQueryListener):
    """Bounded per-batch metrics log for streaming queries.

    Attach with ``spark.streams.addListener(rec)``; read
    ``rec.batches`` (list of dicts) or ``rec.summary()``.  Keeps at most
    ``max_batches`` entries (deque) so a long-running query never grows
    driver memory."""

    def __init__(self, max_batches: int = 1000) -> None:
        self.batches: deque[dict[str, Any]] = deque(maxlen=max_batches)
        self.started: list[str] = []
        self.terminated: list[str] = []

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        state_rows = sum(s.numRowsTotal for s in p.stateOperators)
        state_updated = sum(s.numRowsUpdated for s in p.stateOperators)
        self.batches.append(
            {
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "input_rows_per_sec": p.inputRowsPerSecond,
                "processed_rows_per_sec": p.processedRowsPerSecond,
                "batch_duration_ms": p.batchDuration,
                "watermark": p.eventTime.get("watermark"),
                "state_rows_total": state_rows,
                "state_rows_updated": state_updated,
                # df.observe(...) metrics, keyed by observation name
                "observed": {
                    k: dict(v.asDict())
                    for k, v in (p.observedMetrics or {}).items()
                },
            }
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))

    # -- reporting ----------------------------------------------------------
    def summary(self) -> dict[str, Any]:
        durs = sorted(b["batch_duration_ms"] for b in self.batches)
        n = len(durs)

        def pct(q: float) -> int | None:
            if not n:
                return None
            return durs[max(0, math.ceil(q * n) - 1)]

        total_rows = sum(b["num_input_rows"] for b in self.batches)
        wms = [b["watermark"] for b in self.batches if b["watermark"]]
        return {
            "n_batches": n,
            "total_input_rows": total_rows,
            "p50_batch_ms": pct(0.50),
            "p95_batch_ms": pct(0.95),
            "max_state_rows": max(
                (b["state_rows_total"] for b in self.batches), default=0
            ),
            "last_watermark": max(wms) if wms else None,
        }


def record_stream_metrics(
    spark: SparkSession, max_batches: int = 1000
) -> StreamMetricsRecorder:
    """Create + attach a recorder; caller removes it with
    ``spark.streams.removeListener(rec)`` when done."""
    rec = StreamMetricsRecorder(max_batches)
    spark.streams.addListener(rec)
    return rec
