"""Temporal operators (operators/temporal.py): as-of join semantics vs
pandas merge_asof, and sequence-pattern detection goldens."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kelos_on_kafka_spark.operators import temporal


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = pd.DataFrame(
        {
            "sym": ["a", "a", "a", "b", "b", "c"],
            "ts": pd.to_datetime([10, 25, 31, 5, 40, 7], unit="s"),
            "trade_id": [1, 2, 3, 4, 5, 6],
        }
    )
    quotes = pd.DataFrame(
        {
            "sym": ["a", "a", "a", "b", "b"],
            "ts": pd.to_datetime([5, 25, 30, 10, 38], unit="s"),
            "px": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    return (
        spark.createDataFrame(trades),
        spark.createDataFrame(quotes),
        trades,
        quotes,
    )


def _expected_asof(trades, quotes, tolerance=None):
    kw = {"tolerance": pd.Timedelta(seconds=tolerance)} if tolerance else {}
    m = pd.merge_asof(
        trades.sort_values("ts"),
        quotes.sort_values("ts"),
        on="ts",
        by="sym",
        direction="backward",
        allow_exact_matches=True,
        **kw,
    )
    return {
        int(r.trade_id): (None if pd.isna(r.px) else float(r.px))
        for r in m.itertuples()
    }


def test_asof_left_matches_pandas(spark, trades_quotes):
    st, sq, trades, quotes = trades_quotes
    got = temporal.asof_join(
        st, sq, ["sym"], "ts", "ts", ["px"], how="left"
    ).collect()
    want = _expected_asof(trades, quotes)
    assert {r["trade_id"]: r["px"] for r in got} == want
    assert len(got) == len(trades)


def test_asof_inner_drops_unmatched(spark, trades_quotes):
    st, sq, trades, quotes = trades_quotes
    got = temporal.asof_join(
        st, sq, ["sym"], "ts", "ts", ["px"], how="inner"
    ).collect()
    want = {
        k: v for k, v in _expected_asof(trades, quotes).items() if v is not None
    }
    assert {r["trade_id"]: r["px"] for r in got} == want


def test_asof_exact_timestamp_is_inclusive(spark, trades_quotes):
    st, sq, *_ = trades_quotes
    got = {
        r["trade_id"]: r["px"]
        for r in temporal.asof_join(
            st, sq, ["sym"], "ts", "ts", ["px"], how="inner"
        ).collect()
    }
    # trade 2 at t=25 matches quote at exactly t=25
    assert got[2] == 2.0


def test_asof_tolerance(spark, trades_quotes):
    st, sq, trades, quotes = trades_quotes
    got = temporal.asof_join(
        st,
        sq,
        ["sym"],
        "ts",
        "ts",
        ["px"],
        how="left",
        tolerance_us=5_000_000,
    ).collect()
    want = _expected_asof(trades, quotes, tolerance=5)
    assert {r["trade_id"]: r["px"] for r in got} == want


def test_sequence_matches_golden(spark):
    ev = pd.DataFrame(
        {
            "user": [1, 1, 1, 1, 2, 2, 2],
            "ts": pd.to_datetime([10, 20, 30, 400, 10, 20, 21], unit="s"),
            "typ": ["a", "b", "c", "c", "a", "b", "b"],
            "eid": [1, 2, 3, 4, 5, 6, 7],
        }
    )
    sdf = spark.createDataFrame(ev)
    got = temporal.sequence_matches(
        sdf, "user", "ts", "typ", ["a", "b", "c"], within_us=60_000_000,
        id_col="eid",
    ).collect()
    # user 1: events 1,2,3 = a,b,c within 20 s -> one match; the later c
    # (eid 4) is 380 s after b -> b,c,c never matches and a,b,c spans too
    # long anyway.  user 2: a,b,b -> no match.
    assert [(r["user"], r["start_id"], r["end_id"]) for r in got] == [
        (1, 1, 3)
    ]
    assert got[0]["start_ts_us"] == 10_000_000
    assert got[0]["end_ts_us"] == 30_000_000


def test_sequence_single_step(spark):
    ev = pd.DataFrame(
        {
            "user": [1, 1],
            "ts": pd.to_datetime([10, 20], unit="s"),
            "typ": ["x", "y"],
            "eid": [1, 2],
        }
    )
    got = temporal.sequence_matches(
        spark.createDataFrame(ev), "user", "ts", "typ", ["y"],
        within_us=10**9, id_col="eid",
    ).collect()
    assert [(r["start_id"], r["end_id"]) for r in got] == [(2, 2)]


def test_absence_matches_planted_cases(spark):
    """Negation CEP: same-ts purchase counts (inclusive interval),
    in-horizon purchase suppresses, beyond-horizon does not, other
    users never interfere."""
    from kelos_on_kafka_spark.operators.temporal import absence_matches

    rows = [
        # (event_id, user, sec, type)
        (1, 1, 100, "click"),      # purchase at 200 (in 1h) -> suppressed
        (2, 1, 200, "purchase"),
        (3, 2, 100, "click"),      # purchase at same ts -> suppressed
        (4, 2, 100, "purchase"),
        (5, 3, 100, "click"),      # purchase 2h later -> drop-off
        (6, 3, 100 + 7200, "purchase"),
        (7, 4, 100, "click"),      # no purchase at all -> drop-off
        (8, 5, 50, "purchase"),    # purchase BEFORE click -> drop-off
        (9, 5, 100, "click"),
    ]
    ev = spark.createDataFrame(
        [(e, u, float(s), t) for e, u, s, t in rows],
        "event_id long, user_id long, sec double, event_type string",
    ).select(
        "event_id", "user_id", "event_type",
        F.timestamp_seconds("sec").alias("ts"),
    )
    got = sorted(
        (r.user_id, r.first_id)
        for r in absence_matches(
            ev, "user_id", "ts", "event_type",
            "click", "purchase", 3_600_000_000, "event_id",
        ).collect()
    )
    assert got == [(3, 5), (4, 7), (5, 9)]


def test_gap_tolerant_matches_planted_cases(spark):
    """A view* Z: views between click and purchase are skipped; any
    other intervening non-skip type breaks the match; horizon bounds."""
    from kelos_on_kafka_spark.operators.temporal import gap_tolerant_matches

    rows = [
        (1, 1, 100, "click"), (2, 1, 110, "view"), (3, 1, 120, "view"),
        (4, 1, 130, "purchase"),                      # match 1->4
        (5, 2, 100, "click"), (6, 2, 110, "error"),
        (7, 2, 120, "purchase"),                      # error breaks it
        (8, 3, 100, "click"), (9, 3, 100 + 90000, "purchase"),  # >24h
        (10, 4, 100, "purchase"),                     # no preceding A
    ]
    ev = spark.createDataFrame(
        [(e, u, float(s), t) for e, u, s, t in rows],
        "event_id long, user_id long, sec double, event_type string",
    ).select(
        "event_id", "user_id", "event_type",
        F.timestamp_seconds("sec").alias("ts"),
    )
    got = sorted(
        (r.user_id, r.start_id, r.end_id)
        for r in gap_tolerant_matches(
            ev, "user_id", "ts", "event_type",
            "click", "purchase", "view", 86_400_000_000, "event_id",
        ).collect()
    )
    assert got == [(1, 1, 4)]


def test_funnel_steps_leftmost_greedy(spark):
    """Hand-built chains: full match, partial (missing tail), deadline
    miss, and the documented greedy limitation (a later start that
    would fit the horizon is not used)."""
    from kelos_on_kafka_spark.operators.temporal import funnel_steps

    rows = [
        # user 1: A@10 B@20 C@30 — full match, duration 20s
        (1, 10, "A"), (1, 20, "B"), (1, 30, "C"),
        # user 2: A@10 B@20, no C — unmatched, s2 = -1
        (2, 10, "A"), (2, 20, "B"),
        # user 3: B@5 A@10 C@20 — B before A does not count; no B after
        (3, 5, "B"), (3, 10, "A"), (3, 20, "C"),
        # user 4: A@10 B@20 C@200 — chain resolves but misses within=60s
        (4, 10, "A"), (4, 20, "B"), (4, 200, "C"),
        # user 5: greedy limitation — A@10 B@20 ... C@100 misses 60s,
        # though A@50 B@60 C@100 would fit; greedy anchors at A@10
        (5, 10, "A"), (5, 20, "B"), (5, 50, "A"), (5, 60, "B"), (5, 100, "C"),
        # user 6: no A at all — not emitted
        (6, 10, "B"), (6, 20, "C"),
    ]
    ev = spark.createDataFrame(
        [(u, 1_700_000_000 + s, t) for u, s, t in rows],
        "user_id long, sec long, event_type string",
    ).select(
        "user_id",
        F.timestamp_seconds("sec").alias("ts"),
        "event_type",
    )
    out = {
        r.user_id: (r.s0_us, r.s1_us, r.s2_us, r.matched, r.duration_us)
        for r in funnel_steps(
            ev, "user_id", "ts", "event_type", ["A", "B", "C"],
            within_us=60_000_000,
        ).collect()
    }
    base = 1_700_000_000 * 1_000_000

    def us(s):
        return base + s * 1_000_000

    assert out[1] == (us(10), us(20), us(30), True, 20_000_000)
    assert out[2] == (us(10), us(20), -1, False, -1)
    assert out[3] == (us(10), -1, -1, False, -1)
    assert out[4] == (us(10), us(20), us(200), False, -1)
    assert out[5] == (us(10), us(20), us(100), False, -1)
    assert 6 not in out
    assert len(out) == 5


def test_funnel_steps_repartition_stable_and_validates(spark):
    from kelos_on_kafka_spark.operators.temporal import funnel_steps

    rows = [
        (i % 9, 1_700_000_000 + i, ("A", "B", "C", "D")[i % 4])
        for i in range(200)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, sec long, event_type string"
    ).select(
        "user_id", F.timestamp_seconds("sec").alias("ts"), "event_type"
    )
    a = sorted(map(tuple, funnel_steps(
        ev, "user_id", "ts", "event_type", ["A", "B", "C"]
    ).collect()))
    b = sorted(map(tuple, funnel_steps(
        ev.repartition(7, "sec"), "user_id", "ts", "event_type",
        ["A", "B", "C"],
    ).collect()))
    assert a == b and len(a) == 9
    with pytest.raises(ValueError, match="at least 2"):
        funnel_steps(ev, "user_id", "ts", "event_type", ["A"])


@settings(max_examples=8, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 5),            # user
            st.integers(0, 400),          # sec offset
            st.sampled_from("ABCD"),      # type
        ),
        min_size=0,
        max_size=60,
    ),
    within=st.sampled_from([None, 50_000_000, 200_000_000]),
)
def test_funnel_steps_property_vs_python_reference(spark, events, within):
    """Leftmost-greedy funnel == an independent Python reference on
    random event streams (any users, any orderings, with/without a
    deadline)."""
    from kelos_on_kafka_spark.operators.temporal import funnel_steps

    rows = [
        (i, u, 1_700_000_000 + s, t) for i, (u, s, t) in enumerate(events)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, sec long, event_type string"
    ).select(
        "event_id",
        "user_id",
        F.timestamp_seconds("sec").alias("ts"),
        "event_type",
    )
    got = {
        r.user_id: (r.s0_us, r.s1_us, r.s2_us, r.matched, r.duration_us)
        for r in funnel_steps(
            ev, "user_id", "ts", "event_type", ["A", "B", "C"],
            within_us=within,
        ).collect()
    }
    # pure-python greedy reference
    by_user = {}
    for _i, u, sec, t in rows:
        by_user.setdefault(u, []).append((sec * 1_000_000, t))
    want = {}
    for u, evs in by_user.items():
        evs.sort()
        s = [None, None, None]
        steps = ["A", "B", "C"]
        for ts, t in evs:
            for i in range(3):
                if s[i] is None:
                    if t == steps[i] and (i == 0 or (s[i - 1] is not None and ts > s[i - 1])):
                        s[i] = ts
                    break
        if s[0] is None:
            continue
        matched = s[2] is not None and (
            within is None or s[2] - s[0] <= within
        )
        want[u] = (
            s[0],
            s[1] if s[1] is not None else -1,
            s[2] if s[2] is not None else -1,
            matched,
            (s[2] - s[0]) if matched else -1,
        )
    assert got == want


def test_rolling_stats_trailing_range(spark):
    """Inclusive [ts-trail, ts] frame, per-key isolation, NULL values
    skipped by sum but counted by n_trail, tie peers all in-frame."""
    from kelos_on_kafka_spark.operators.temporal import rolling_stats

    rows = [
        # user 0: 10s, 1800s, 3610s (trails back to 10s inclusive)
        (1, 10, 0, 1.0),
        (2, 1800, 0, 2.5),
        (3, 3610, 0, 4.0),
        # user 1: NULL value still counted in n_trail
        (4, 100, 1, 7.0),
        (5, 100, 1, None),  # tie peer: same ts, both see both
    ]
    df = spark.createDataFrame(
        rows, "event_id long, sec long, user_id long, value double"
    ).select(
        "event_id",
        F.timestamp_seconds("sec").alias("ts"),
        "user_id",
        "value",
    )
    got = {
        r.event_id: (r.n_trail, r.sum_trail, r.avg_trail)
        for r in rolling_stats(df).collect()
    }
    assert got[1] == (1, 1.0, 1.0)
    assert got[2] == (2, 3.5, 1.75)
    assert got[3] == (3, 7.5, 2.5)
    assert got[4] == (2, 7.0, 3.5)
    assert got[5] == got[4]  # RANGE peers share the frame
