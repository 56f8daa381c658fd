"""Semi-structured (JSON) column operators.

Event/page payloads at web scale carry a JSON properties blob; the
pipeline needs typed extraction WITHOUT a Python stage.  Spark-side
extraction uses the built-in JSON path expressions (codegen; for a
fixed schema prefer ``from_json`` which vectorizes the parse once per
row) — the extracted value then behaves like any other column
(pushdown-friendly once materialized, integer-exact aggregates).

Reference surface: none (the reference's payloads are binary-packed
doubles, InputDataSerde) — this belongs to the web-pipeline
generalization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def json_long(col: str, field: str) -> Column:
    """Top-level integer field of a JSON object column (NULL when
    missing/unparseable) — ``get_json_object`` path extraction."""
    return F.get_json_object(F.col(col), f"$.{field}").cast("long")


def props_stats(
    df: DataFrame,
    group_col: str = "event_type",
    props_col: str = "props",
    field: str = "k",
) -> DataFrame:
    """Typed-extraction rollup: per ``group_col``, integer stats of a
    JSON field — the 'parse once, aggregate relationally' shape (one
    hash aggregation; no Python, no shuffle of the raw JSON text)."""
    v = json_long(props_col, field)
    return (
        df.select(F.col(group_col).alias("grp"), v.alias("v"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("v").alias("n_with_field"),
            F.sum("v").cast("long").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
    )
