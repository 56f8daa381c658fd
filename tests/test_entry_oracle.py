"""Driver-contract mirror: run every ``queries()`` entry on Spark and its
``oracle_sql()`` on DuckDB over the same parquet tables (sf0.001 for
speed; the driver uses sf0.01) and compare row count, column names and
order-insensitive values — the same gate CORRECTNESS_r{N}.json records."""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _driver_canon(df: pd.DataFrame) -> pd.DataFrame:
    """Byte-compatible with the driver's _canon: sort columns by name,
    then sort_values over the RAW values — array/map columns raise
    TypeError here exactly like they do in the driver's gate."""
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), ignore_index=True)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = _driver_canon(df)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


def _values_equal(a, b) -> bool:
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return a == b
    return str(a) == str(b)


# The driver's gate hashes the stringified canonical frame, so an int64
# column on one engine vs float64 on the other breaks the hash even when
# every value compares numerically equal ("1" vs "1.0" — exactly what
# sank session_assign in r04: DuckDB windowed sum -> HUGEINT -> pandas
# float64 vs Spark bigint).  Numeric value equality (above) PLUS
# dtype-family equality (below) together imply string-repr equality,
# which is what the driver actually hashes.
_KIND_FAMILY = {"i": "int", "u": "int", "f": "float", "b": "bool"}


def _dtype_family(s: pd.Series) -> str:
    return _KIND_FAMILY.get(s.dtype.kind, "other")


ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_duckdb_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(ORACLES[name]).df()

    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: rows {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), name

    dtype_mism = [
        (c, str(spark_pdf[c].dtype), str(duck_pdf[c].dtype))
        for c in spark_pdf.columns
        if _dtype_family(spark_pdf[c]) != _dtype_family(duck_pdf[c])
    ]
    assert not dtype_mism, (
        f"{name}: dtype-family drift (spark vs oracle) {dtype_mism} — "
        "the driver's byte-strict hash WILL fail on this even if values "
        "are numerically identical; cast the oracle output column"
    )

    a = _normalize(spark_pdf)
    b = _normalize(duck_pdf)
    mism = []
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not _values_equal(x, y):
                mism.append((col, i, x, y))
                if len(mism) > 5:
                    break
    assert not mism, f"{name}: {mism[:5]}"


def test_mirror_catches_dtype_drift(ddb):
    """Mutation guard for the r04 session_assign failure mode: an
    UNCAST DuckDB windowed sum comes back float64 (HUGEINT -> pandas)
    and must trip the dtype-family check; the committed CAST(... AS
    BIGINT) oracle must come back int-family."""
    uncast = ddb.execute(
        "SELECT sum(x) OVER (ORDER BY x) AS s FROM (VALUES (1),(2)) t(x)"
    ).df()
    assert _dtype_family(uncast["s"]) == "float"  # the driver-breaking shape
    fixed = ddb.execute(
        "SELECT CAST(sum(x) OVER (ORDER BY x) AS BIGINT) AS s "
        "FROM (VALUES (1),(2)) t(x)"
    ).df()
    assert _dtype_family(fixed["s"]) == "int"
    assert "CAST" in ORACLES["session_assign"].upper().split("SESSION_SEQ")[0]


def test_rows_only_queries_run(spark):
    names = set(entry_mod.queries()) - set(ORACLES)
    assert "kelos_topn" in names
    for name in names:
        df = entry_mod.queries()[name](spark, SF_DIR)
        pdf = df.toPandas()
        assert len(pdf) >= 0, name
        # the driver canonicalizes rows-only results too: every column
        # must be scalar-sortable or the driver records an error
        _driver_canon(pdf)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"window_id", "rank", "point_id", "klome", "density"} <= set(
        df.columns
    )
