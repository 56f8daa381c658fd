"""Window operators: tumbling panes, pane-composed sliding windows, and
session windows — the engine's generic event-time surface (north_rule:
tumbling/sliding/session windows).

All expressions are built-in Catalyst functions (JVM-side, codegen'd);
pane ids are integer microsecond arithmetic so results are exactly
reproducible in any SQL engine (the DuckDB oracles in
``__spark_entry__.py`` use the same integer math).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def epoch_us(ts_col: str) -> Column:
    """Wall-clock epoch microseconds, independent of the session
    timezone for TIMESTAMP_NTZ columns (parquet event times read as NTZ
    under Spark 4): microseconds since the NTZ epoch.  Matches DuckDB's
    ``epoch_us`` on naive timestamps exactly."""
    return F.expr(
        "timestampdiff(MICROSECOND, "
        f"CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ), CAST({ts_col} AS TIMESTAMP_NTZ))"
    )


def pane_id(ts_col: str, pane_seconds: int) -> Column:
    """Epoch-aligned tumbling pane id: ``epoch_us(ts) div pane_us``.
    Integer division — no float rounding."""
    return F.expr(
        f"timestampdiff(MICROSECOND, CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ), "
        f"CAST({ts_col} AS TIMESTAMP_NTZ)) div {pane_seconds * 1_000_000}"
    )


def with_pane(df: DataFrame, ts_col: str, pane_seconds: int, out: str = "pane_id") -> DataFrame:
    return df.withColumn(out, pane_id(ts_col, pane_seconds))


def explode_to_sliding_windows(
    df: DataFrame,
    pane_col: str = "pane_id",
    panes_per_window: int = 3,
    out: str = "window_id",
) -> DataFrame:
    """Pane -> sliding-window expansion: a row in pane p belongs to the
    windows closing at panes p .. p+panes-1 (the reference synthesizes
    sliding windows from tumbling panes the same way, README.md:63-79).
    This is the same xN row duplication Spark's own sliding ``window()``
    performs — the deliberate, bounded cost of sliding semantics."""
    offsets = F.array(*[F.lit(i) for i in range(panes_per_window)])
    return df.withColumn("_off", F.explode(offsets)).withColumn(
        out, F.col(pane_col) + F.col("_off")
    ).drop("_off")


def session_windows(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap_seconds: int,
) -> DataFrame:
    """Per-key session windows with the given inactivity gap, via Spark's
    built-in ``session_window`` (works in batch and streaming).  Returns
    one row per session: keys + session_start_us / session_end_us /
    n_events (integer microseconds for cross-engine exactness)."""
    ntz_epoch = "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ)"
    grouped = df.groupBy(
        *key_cols, F.session_window(F.col(ts_col), f"{gap_seconds} seconds")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(
            f"timestampdiff(MICROSECOND, {ntz_epoch}, CAST(min({ts_col}) AS TIMESTAMP_NTZ))"
        ).alias("session_start_us"),
        F.expr(
            f"timestampdiff(MICROSECOND, {ntz_epoch}, CAST(max({ts_col}) AS TIMESTAMP_NTZ))"
        ).alias("session_last_us"),
    )
    return grouped.select(
        *key_cols, "session_start_us", "session_last_us", "n_events"
    )
