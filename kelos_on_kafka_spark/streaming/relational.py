"""Streaming relational operators — the engine's general CEP surface
(north_rule: tumbling/sliding/session windows, watermarks, stateful
join, exactly-once sink), expressed with Spark's built-in stateful
operators so Catalyst owns the state management.

These are thin, deliberate wrappers: the value is the declared
semantics (watermark columns, output modes, join bounds) and the tests
that pin them, not novel code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str | None = None,
    pane: str = "10 seconds",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Tumbling-window counts/sums (append mode: a window emits once,
    when the watermark passes its end)."""
    keys = [F.window(F.col(ts_col), pane).alias("win")]
    if key_col:
        keys.append(F.col(key_col))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *([F.col(key_col)] if key_col else []),
            "n_events",
        )
    )


def stream_sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    size: str = "30 seconds",
    slide: str = "10 seconds",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Sliding-window counts via Spark's native window duplication."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), size, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
        )
    )


def stream_session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap="30 seconds",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-key session windows with an inactivity gap; sessions emit once
    closed (watermark-driven).  ``gap`` may be a literal duration string
    or a Column expression for DYNAMIC per-event gaps (e.g. purchases
    hold a session open longer) — Spark's session_window accepts both,
    batch and streaming."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col), F.session_window(F.col(ts_col), gap).alias("sess")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def stream_windowed_distinct(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    pane: str = "1 hour",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Exact distinct count per tumbling window on a stream.

    ``count(distinct x)`` is illegal in streaming aggregations; the
    rewrite chains two stateful operators (Spark 3.4+): dedup on
    (window, key) — state evicted once the watermark passes the window —
    then a plain windowed count.  Same two-phase shape as the batch
    ``skew.two_phase_distinct`` (and it spreads a hot window across the
    (window, key) exchange for free)."""
    deduped = (
        events.withWatermark(ts_col, watermark)
        .select(
            F.window(F.col(ts_col), pane).alias("win"), F.col(key_col)
        )
        .dropDuplicates(["win", key_col])
    )
    return (
        deduped.groupBy("win")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_distinct",
        )
    )


def stream_dedup_exact(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication: emit the first occurrence of each
    key; duplicate state is evicted once the watermark passes (bounded
    state — the streaming counterpart of ``dedup.exact_dup_groups``'s
    keeper selection).  Uses ``dropDuplicatesWithinWatermark`` so two
    duplicates arriving within the watermark horizon dedupe even when
    their event times differ."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    watermark: str = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join bounded by an event-time interval — the
    stateful join whose state Spark evicts once the watermark passes the
    bound (right_ts in [left_ts, left_ts + within]).

    ``how='leftOuter'`` additionally emits unmatched left rows (right
    columns null) once the watermark passes ``left_ts + within`` — i.e.
    once no matching right row can still arrive.  Both sides must carry
    the watermark for the outer flush (the global watermark is the min
    across inputs)."""
    if how not in ("inner", "leftOuter"):
        raise ValueError(
            f"stream_interval_join supports inner/leftOuter, got {how!r}"
        )
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[left_key] == r[right_key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how)

def stream_chained_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    pane: str = "10 minutes",
    coarse: str = "1 hour",
    watermark: str = "0 seconds",
) -> DataFrame:
    """CHAINED stateful aggregation in one streaming query — the
    continuous-rollup shape (fine panes feeding a coarse rollup without
    an intermediate table): per-(pane, key) counts, then a second
    event-time window over the pane results (keyed on
    ``window_time(win)``, the Spark >= 3.4 multi-stateful-operator
    path) producing per-(coarse window, key) pane statistics —
    (window_start, window_end, key, n_panes, max_pane_count,
    sum_pane_count).  Both stages are watermark-driven append-mode
    aggregations; state is one open window per key per stage.

    At scale this halves the scan/shuffle cost of maintaining a
    second granularity: the coarse rollup consumes the fine
    aggregation's (tiny) output inside the same query plan instead of
    re-reading the raw stream."""
    fine = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), pane).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("pane_count"))
    )
    coarse_df = (
        fine.groupBy(
            F.window(F.window_time("win"), coarse).alias("cwin"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_panes"),
            F.max("pane_count").alias("max_pane_count"),
            F.sum("pane_count").alias("sum_pane_count"),
        )
    )
    return coarse_df.select(
        F.col("cwin.start").alias("window_start"),
        F.col("cwin.end").alias("window_end"),
        F.col(key_col),
        "n_panes",
        "max_pane_count",
        F.col("sum_pane_count").cast("long").alias("sum_pane_count"),
    )

def stream_cdc_pane_state(
    changelog: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    delete_col: str,
    payload_cols: list[str],
    pane: str = "1 hour",
    watermark: str = "0 seconds",
    emit_deletes: bool = False,
) -> DataFrame:
    """Streaming per-pane CDC compaction — the incremental twin of
    ``plans.maintenance.cdc_compact``: within each event-time pane,
    the LAST operation per key (by event time, id tiebreak) wins and
    is emitted when the watermark closes the pane; keys whose last
    in-pane op is a delete (``delete_col`` true) emit nothing.  The
    output is the per-pane upsert DELTA feed a downstream MERGE
    applies — (window_start, window_end, key, id, ts, payloads...).

    With ``emit_deletes=True`` tombstone-final keys are emitted too,
    carrying ``is_del = true`` — the full delta a MERGE sink needs to
    also DELETE keys from the materialized table
    (``streaming.sink.write_cdc_table_stream``); the default keeps the
    upsert-only shape the round-5 driver query pinned.

    State is one candidate row per open (pane, key): the arg-max is a
    declarative ``max_by`` over a (ts, id) struct inside the windowed
    aggregation, so Spark's own stateful agg owns the bookkeeping —
    no applyInPandasWithState, no Python in the plan."""
    base = changelog.withWatermark(ts_col, watermark)
    last = base.groupBy(
        F.window(F.col(ts_col), pane).alias("win"), F.col(key_col)
    ).agg(
        F.max_by(
            F.struct(
                F.col(id_col).alias("id"),
                F.col(ts_col).alias("ts"),
                F.col(delete_col).alias("is_del"),
                *[F.col(c) for c in payload_cols],
            ),
            F.struct(F.col(ts_col), F.col(id_col)),
        ).alias("last")
    )
    if not emit_deletes:
        last = last.where(~F.col("last.is_del"))
    return last.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        F.col(key_col),
        F.col("last.id").alias("id"),
        F.col("last.ts").alias("ts"),
        *[F.col(f"last.{c}").alias(c) for c in payload_cols],
        *([F.col("last.is_del").alias("is_del")] if emit_deletes else []),
    )
