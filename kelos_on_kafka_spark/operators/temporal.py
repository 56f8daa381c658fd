"""Temporal operators: as-of join and sequence-pattern detection — the
CEP surface beyond plain windows (north_rule: streaming/CEP engine).

Both are single-shuffle plans: the as-of join is a union + one window
pass (never a range self-join — at 10^12 rows a range join's
per-key cross product is the bottleneck; the union-window form is
O(n log n) per key and sorts once), and sequence detection is lag
chains over the same per-key ordering.  Hot keys funnel through one
task per key — at web scale the key is user/site-grained (millions of
keys), so the skew guard is key granularity, not salting (a per-key
total order cannot be salted).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from kelos_on_kafka_spark.operators.windowing import epoch_us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    how: str = "inner",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` per key (DuckDB/pandas ``ASOF JOIN``
    semantics, inclusive).

    Plan: tag both inputs, union, one window pass per key ordered by
    (ts, side) carrying the last non-null right payload forward, keep
    left rows.  Right rows must be unique per (key, right_ts) for a
    deterministic result (pre-dedup with a groupBy if not — same rule
    any ASOF engine imposes).

    ``tolerance_us`` drops matches older than the given horizon.
    ``how``: 'inner' keeps only matched left rows; 'left' keeps all
    (right columns null when unmatched)."""
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports inner/left, got {how!r}")
    payload = F.struct(
        epoch_us(right_ts).alias("__rts"),
        *[F.col(c) for c in right_cols],
    )
    r = right.select(
        *key_cols,
        epoch_us(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    left_cols = [c for c in left.columns]
    l = left.select(
        *[F.col(c) for c in left_cols],
        epoch_us(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    unioned = l.select(
        *key_cols,
        "__ts",
        "__side",
        "__payload",
        F.struct(*[F.col(c) for c in left_cols]).alias("__left"),
    ).unionByName(
        r.withColumn(
            "__left",
            F.lit(None).cast(
                l.select(
                    F.struct(*[F.col(c) for c in left_cols]).alias("x")
                ).schema["x"].dataType
            ),
        )
    )
    # right rows sort before left rows at equal ts (inclusive <=)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    ).where(F.col("__side") == 1)
    if tolerance_us is not None:
        carried = carried.withColumn(
            "__match",
            F.when(
                F.col("__ts") - F.col("__match.__rts") <= F.lit(tolerance_us),
                F.col("__match"),
            ),
        )
    if how == "inner":
        carried = carried.where(F.col("__match").isNotNull())
    return carried.select(
        *[F.col(f"__left.{c}").alias(c) for c in left_cols],
        *[F.col(f"__match.{c}").alias(c) for c in right_cols],
    )


def sequence_matches(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    pattern: list[str],
    within_us: int,
    id_col: str,
) -> DataFrame:
    """Strictly-consecutive sequence detection per key: emit one row per
    position where the last ``len(pattern)`` events (ordered by
    (ts, id)) are exactly ``pattern`` and the whole run spans at most
    ``within_us``.  Returns (key, start_id, end_id, start_ts_us,
    end_ts_us).

    This is the MATCH_RECOGNIZE core case (STRICT consecutive rows, no
    quantifiers); gaps-allowed "followed by" composes from the interval
    join (operators: stream_interval_join / q_interval_join)."""
    n = len(pattern)
    if n < 1:
        raise ValueError("pattern must be non-empty")
    df = events.select(
        key_col,
        F.col(id_col).alias("__id"),
        epoch_us(ts_col).alias("__ts_us"),
        F.col(type_col).alias("__type"),
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col("__ts_us").asc(), F.col("__id").asc()
    )
    cond = F.lit(True)
    for i, step in enumerate(reversed(pattern)):
        cond = cond & (F.lag("__type", i).over(w) == F.lit(step))
    span_ok = (
        F.col("__ts_us") - F.lag("__ts_us", n - 1).over(w)
    ) <= F.lit(within_us)
    return (
        df.withColumn("__hit", cond & span_ok)
        .withColumn("__start_id", F.lag("__id", n - 1).over(w))
        .withColumn("__start_ts", F.lag("__ts_us", n - 1).over(w))
        .where(F.col("__hit"))
        .select(
            F.col(key_col),
            F.col("__start_id").alias("start_id"),
            F.col("__id").alias("end_id"),
            F.col("__start_ts").alias("start_ts_us"),
            F.col("__ts_us").alias("end_ts_us"),
        )
    )


def absence_matches(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    first_type: str,
    absent_type: str,
    within_us: int,
    id_col: str,
) -> DataFrame:
    """Negation CEP — ``first_type`` events with NO ``absent_type``
    event for the same key within ``[ts, ts + within_us]``: the funnel
    drop-off query (clicks that never converted), the alerting pattern
    relational engines express as NOT EXISTS and CEP engines as
    ``A not followed by B within T``.

    Plan: no join and no NOT-EXISTS subquery — one window pass per key
    computes each event's next ``absent_type`` timestamp (min over the
    following frame), then a filter keeps rows where it is null or
    beyond the horizon.  Events are ordered (ts, is-first-type desc,
    id) so an ``absent_type`` at the SAME timestamp as the probe counts
    as within the (inclusive) interval.  One shuffle on the key — the
    same cost as the positive sequence query, and immune to the
    row-explosion a self-join on hot keys suffers.

    Returns (key, first_id, first_ts_us)."""
    df = events.select(
        key_col,
        F.col(id_col).alias("__id"),
        epoch_us(ts_col).alias("__ts_us"),
        (F.col(type_col) == F.lit(absent_type)).alias("__is_absent"),
        (F.col(type_col) == F.lit(first_type)).alias("__is_first"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(
            F.col("__ts_us").asc(),
            F.col("__is_absent").asc(),  # probes before same-ts absents
            F.col("__id").asc(),
        )
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = F.min(
        F.when(F.col("__is_absent"), F.col("__ts_us"))
    ).over(w)
    return (
        df.withColumn("__next_absent", nxt)
        .where(
            F.col("__is_first")
            & (
                F.col("__next_absent").isNull()
                | (F.col("__next_absent") > F.col("__ts_us") + F.lit(within_us))
            )
        )
        .select(
            key_col,
            F.col("__id").alias("first_id"),
            F.col("__ts_us").alias("first_ts_us"),
        )
    )


def gap_tolerant_matches(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    first_type: str,
    last_type: str,
    skip_type: str,
    within_us: int,
    id_col: str,
) -> DataFrame:
    """``A skip* Z`` pattern per key: emit every ``last_type`` event
    whose nearest preceding non-``skip_type`` event is a ``first_type``
    within ``within_us`` — the MATCH_RECOGNIZE quantifier case
    ``A B* Z`` (e.g. click, any number of scrolls, purchase), which
    strict-consecutive ``sequence_matches`` cannot express.

    Plan: one window pass per key — each row's latest preceding
    non-skip (type, ts, id) via ``last_value(... ignore nulls)`` over
    the preceding-exclusive frame, then a filter.  One shuffle on the
    key; no self-join.

    Returns (key, start_id, end_id, start_ts_us, end_ts_us)."""
    df = events.select(
        key_col,
        F.col(id_col).alias("__id"),
        epoch_us(ts_col).alias("__ts_us"),
        F.col(type_col).alias("__type"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("__ts_us").asc(), F.col("__id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_skip = F.when(
        F.col("__type") != F.lit(skip_type),
        F.struct(
            F.col("__type").alias("t"),
            F.col("__ts_us").alias("ts"),
            F.col("__id").alias("id"),
        ),
    )
    prev = F.last(non_skip, ignorenulls=True).over(w)
    return (
        df.withColumn("__prev", prev)
        .where(
            (F.col("__type") == F.lit(last_type))
            & F.col("__prev").isNotNull()
            & (F.col("__prev.t") == F.lit(first_type))
            & (F.col("__ts_us") - F.col("__prev.ts") <= F.lit(within_us))
        )
        .select(
            key_col,
            F.col("__prev.id").alias("start_id"),
            F.col("__id").alias("end_id"),
            F.col("__prev.ts").alias("start_ts_us"),
            F.col("__ts_us").alias("end_ts_us"),
        )
    )


def funnel_steps(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_us: int | None = None,
) -> DataFrame:
    """Generalized k-step funnel (leftmost-greedy CEP): per key, the
    earliest step-1 event, then the earliest step-2 event STRICTLY
    after it, and so on — the compiler behind the fixed 2-/3-step
    pattern operators (``sequence_matches``/``gap_tolerant_matches``
    cover the adjacency-constrained forms; this is the any-events-
    between product-analytics funnel for arbitrary length).

    Semantics (deterministic, engine-portable): greedy leftmost
    matching — step i's timestamp is ``min ts`` among events of
    ``steps[i]`` with ``ts > step_{i-1}_ts``; ``matched`` iff every
    step resolved and (when ``within_us``) the full chain fits in the
    horizon.  Greedy-with-deadline is the standard funnel-analytics
    contract; a non-greedy chain that would fit the horizon while the
    greedy one does not is NOT reported (documented limitation shared
    with every running-min funnel implementation).

    Returns one row per key that has at least one step-1 event:
    (key, s0_us..s{k-1}_us with -1 for unresolved, matched,
    duration_us with -1 when unmatched).

    Plan shape: ONE shuffle on the key; k chained window aggregates
    over the same partitioning (no self-joins — a k-way join funnel
    explodes on hot keys); final distinct collapses to one row per
    key, map-side combinable."""
    if len(steps) < 2:
        raise ValueError("funnel_steps needs at least 2 steps")
    w = Window.partitionBy(key_col).orderBy(F.col("_ts_us").asc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    df = events.select(
        F.col(key_col),
        epoch_us(ts_col).alias("_ts_us"),
        F.col(type_col).alias("_tp"),
    )
    names = []
    for i, step in enumerate(steps):
        cond = F.col("_tp") == step
        if i > 0:
            cond = cond & F.col(names[-1]).isNotNull() & (
                F.col("_ts_us") > F.col(names[-1])
            )
        name = f"_s{i}"
        df = df.withColumn(
            name, F.min(F.when(cond, F.col("_ts_us"))).over(w)
        )
        names.append(name)
    first, last = F.col(names[0]), F.col(names[-1])
    matched = last.isNotNull()
    if within_us is not None:
        matched = matched & (last - first <= F.lit(int(within_us)))
    return (
        df.where(first.isNotNull())
        .select(
            F.col(key_col),
            *[
                F.coalesce(F.col(n), F.lit(-1)).alias(f"s{i}_us")
                for i, n in enumerate(names)
            ],
            matched.alias("matched"),
            F.when(matched, last - first).otherwise(F.lit(-1)).alias(
                "duration_us"
            ),
        )
        .distinct()
    )


def detect_gaps(
    events: DataFrame,
    ts_col: str,
    key_cols: list[str],
    min_gap_us: int,
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key silence/outage detection: one row per gap where the
    key's next event arrives more than ``min_gap_us`` after the
    previous one — (keys..., gap_start_us, gap_end_us, gap_us).  The
    monitoring primitive for feed-health (a source going quiet) and the
    inverse of sessionization (its gaps are exactly the session
    boundaries under the same strict-> convention).

    One shuffle on the keys, one window pass (lead) — same cost shape
    as sessionization; nothing but (key, ts) ever moves.

    Reference surface: the reference detects closed windows via
    EndOfWindowToken punctuation (Main.java:147-160); a gap here is the
    batch view of the same 'stream went silent' condition."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("__ts_us").asc(), F.col(id_col).asc()
    )
    base = events.select(
        *key_cols, F.col(id_col), epoch_us(ts_col).alias("__ts_us")
    )
    nxt = base.withColumn("__next_us", F.lead("__ts_us").over(w))
    return (
        nxt.where(
            F.col("__next_us").isNotNull()
            & (F.col("__next_us") - F.col("__ts_us") > min_gap_us)
        )
        .select(
            *key_cols,
            F.col("__ts_us").alias("gap_start_us"),
            F.col("__next_us").alias("gap_end_us"),
            (F.col("__next_us") - F.col("__ts_us")).alias("gap_us"),
        )
    )


def rolling_stats(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    trail_us: int = 3_600_000_000,
) -> DataFrame:
    """Per-event TRAILING time-range aggregates: for every event, the
    count / sum / mean of ``value_col`` over the key's events in the
    inclusive interval ``[ts - trail_us, ts]`` — the rolling feature
    primitive (request-rate, spend-velocity, rolling engagement) of a
    time-series feature pipeline.

    One RANGE-framed window pass: shuffle on the key, sort by event
    time, then Spark's window operator streams the sorted run keeping
    only the frame's rows buffered (bounded by events-per-key-per-
    trail window, not per key).  At 10^12 events the single shuffle
    carries (key, ts_us, value) triples only; hot keys funnel through
    one task each — the skew guard is key granularity (user/site), as
    for every per-key total order (see module docstring).

    Engine-portable numerics: the sum runs in DECIMAL(18,2) and is
    cast to double at the end (the repo-wide aggregate convention);
    count is exact BIGINT; the mean is ONE double division of those
    two — no float accumulation anywhere, so an ANSI-SQL twin
    (``RANGE BETWEEN trail PRECEDING AND CURRENT ROW``) matches
    bit-for-bit.  RANGE frames include all ts peers on both engines,
    so ties need no ordering tiebreak."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("__ts_us"))
        .rangeBetween(-trail_us, Window.currentRow)
    )
    n = F.count(F.lit(1)).over(w)
    s = (
        F.sum(F.col(value_col).cast("decimal(18,2)"))
        .over(w)
        .cast("double")
    )
    return (
        df.select(
            F.col(id_col),
            F.col(key_col),
            epoch_us(ts_col).alias("__ts_us"),
            F.col(value_col),
        )
        .select(
            id_col,
            key_col,
            F.col("__ts_us").alias("ts_us"),
            n.alias("n_trail"),
            s.alias("sum_trail"),
            (s / n.cast("double")).alias("avg_trail"),
        )
    )
