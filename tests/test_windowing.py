"""Session-window boundary-convention pins.

Spark's ``session_window`` MERGES an event that lands at exactly
``prev_ts + gap`` into the open session (for both static and dynamic
gap expressions) — empirically pinned here, because the repo's session
oracles must encode the SAME convention (``diff > gap`` starts a new
session, not ``>=``) or they latently mismatch on boundary-exact data.
ADVICE r4 flagged the two conventions disagreeing; this fixture is the
arbiter (the dynamic-gap oracles had it right, the static ones were
flipped to strict ``>``)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from kelos_on_kafka_spark.operators import windowing

GAP_S = 10
US = 1_000_000


@pytest.fixture()
def boundary_df(spark):
    # 3 events: t=0, t=exactly 0+gap (must merge), t=2*gap+1us (new)
    rows = [
        (1, 100, 0),
        (1, 101, GAP_S * US),
        (1, 102, 2 * GAP_S * US + 1),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts_us long"
    ).select(
        "user_id", "event_id", F.timestamp_micros("ts_us").alias("ts")
    )


def test_builtin_session_window_merges_at_exact_boundary(spark, boundary_df):
    out = (
        boundary_df.groupBy(
            "user_id", F.session_window("ts", f"{GAP_S} seconds").alias("w")
        )
        .count()
        .orderBy("w.start")
        .collect()
    )
    assert [r["count"] for r in out] == [2, 1]


def test_dynamic_gap_builtin_same_boundary(spark, boundary_df):
    gap = F.when(F.col("user_id") >= 0, F.lit(f"{GAP_S} seconds"))
    out = (
        boundary_df.groupBy(
            "user_id", F.session_window("ts", gap).alias("w")
        )
        .count()
        .orderBy("w.start")
        .collect()
    )
    assert [r["count"] for r in out] == [2, 1]


def test_session_windows_operator_matches_builtin(spark, boundary_df):
    out = (
        windowing.session_windows(boundary_df, "ts", ["user_id"], GAP_S)
        .orderBy("session_start_us")
        .collect()
    )
    assert [r.n_events for r in out] == [2, 1]


def test_assign_session_ids_matches_builtin(spark, boundary_df):
    out = (
        windowing.assign_session_ids(
            boundary_df, "ts", ["user_id"], GAP_S, "event_id"
        )
        .orderBy("ts_us")
        .collect()
    )
    # boundary event 101 stays in session 1; 102 opens session 2
    assert [(r.event_id, r.session_seq) for r in out] == [
        (100, 1),
        (101, 1),
        (102, 2),
    ]


def test_session_boundary_property_random_with_exact_collisions(spark):
    """Randomized parity incl. PLANTED exact-boundary gaps: Spark's
    session_window vs the strict-> islands formulation on DuckDB must
    agree on every session's (start, n_events) — the class of input the
    testdata never produces (sub-second timestamps) but real data can."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        # gaps in units of GAP_S/2 seconds: 0, exactly GAP_S, multiples
        steps=st.lists(
            st.integers(min_value=0, max_value=5), min_size=1, max_size=12
        )
    )
    def run(steps):
        ts, rows = 0, []
        for i, s in enumerate(steps):
            ts += s * (GAP_S // 2) * US  # s==2 -> EXACT gap boundary
            rows.append((1, 100 + i, ts))
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts_us long"
        ).select(
            "user_id", "event_id", F.timestamp_micros("ts_us").alias("ts")
        )
        got = sorted(
            (r["w"].start, r["n"])
            for r in df.groupBy(
                "user_id",
                F.session_window("ts", f"{GAP_S} seconds").alias("w"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        con = duckdb.connect()
        vals = ", ".join(f"({u}, {e}, {t})" for u, e, t in rows)
        want = con.execute(
            f"""
            WITH e(user_id, event_id, ts_us) AS (VALUES {vals}),
            o AS (
              SELECT *, lag(ts_us) OVER (PARTITION BY user_id
                          ORDER BY ts_us, event_id) AS p FROM e
            ), f AS (
              SELECT user_id, ts_us,
                     CASE WHEN p IS NULL OR ts_us - p > {GAP_S * US}
                          THEN 1 ELSE 0 END AS ns FROM o
            ), s AS (
              SELECT user_id, ts_us,
                     sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us
                                   ROWS UNBOUNDED PRECEDING) AS sid
              FROM f
            )
            SELECT min(ts_us) AS start_us, count(*) AS n
            FROM s GROUP BY user_id, sid ORDER BY 1
            """
        ).fetchall()
        con.close()
        got_us = [
            (int(w.timestamp() * 1_000_000), n) for w, n in got
        ]
        assert got_us == [(s, n) for s, n in want]

    run()


def test_oracle_islands_formulation_matches_builtin():
    """The strict-> islands SQL (the shape every static session oracle
    now uses) reproduces the builtin's boundary behavior on DuckDB."""
    con = duckdb.connect()
    out = con.execute(
        f"""
        WITH e(user_id, event_id, ts_us) AS (
          VALUES (1, 100, 0), (1, 101, {GAP_S * US}),
                 (1, 102, {2 * GAP_S * US + 1})
        ), o AS (
          SELECT user_id, ts_us,
                 lag(ts_us) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id) AS prev_us
          FROM e
        ), f AS (
          SELECT user_id, ts_us,
                 CASE WHEN prev_us IS NULL
                           OR ts_us - prev_us > {GAP_S * US}
                      THEN 1 ELSE 0 END AS new_s
          FROM o
        ), s AS (
          SELECT user_id, ts_us,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM f
        )
        SELECT sid, count(*) AS n FROM s GROUP BY sid ORDER BY sid
        """
    ).fetchall()
    con.close()
    assert out == [(1, 2), (2, 1)]
