"""Unit tests for sliding-window pane aggregation (reference:
AggregationProcessorSupplier.java:34-82, Cluster.java:123-144)."""

import numpy as np

from kelos_on_kafka_spark.core import (
    PaneStats,
    ShardState,
    aggregate_window,
    carry_from_window,
)


def _pane(size, ls, mins, maxs, centroid):
    return PaneStats(
        size=size,
        linear_sums=np.array(ls, dtype=float),
        mins=np.array(mins, dtype=float),
        maxs=np.array(maxs, dtype=float),
        centroid=np.array(centroid, dtype=float),
    )


def test_first_pane_forwarded_as_is():
    st = ShardState()
    pane = _pane(2, [2.0], [0.9], [1.1], [1.0])
    out = aggregate_window(st, {1: pane}, 3)
    assert list(out) == [1]
    wc = out[1]
    assert wc.size == 2
    np.testing.assert_array_equal(wc.centroid, [1.0])
    assert len(st.pane_states[1]) == 1


def test_empty_first_pane_dropped():
    st = ShardState()
    out = aggregate_window(st, {1: _pane(0, [0.0], [0.0], [0.0], [5.0])}, 3)
    assert out == {}
    assert 1 not in st.pane_states


def test_merge_order_new_pane_first_then_oldest_to_newest():
    # Q9: aggregate = merge(new) then previous oldest->newest.
    st = ShardState()
    a = _pane(1, [1.0], [1.0], [1.0], [1.0])
    b = _pane(1, [2.0], [2.0], [2.0], [2.0])
    c = _pane(1, [4.0], [4.0], [4.0], [4.0])
    aggregate_window(st, {1: a}, 3)
    aggregate_window(st, {1: b}, 3)
    out = aggregate_window(st, {1: c}, 3)
    wc = out[1]
    # fold: copy(c) -> +a -> +b : LS = 4+1+2, size 3
    assert wc.size == 3
    np.testing.assert_allclose(wc.linear_sums, [7.0])
    np.testing.assert_allclose(wc.centroid, [7.0 / 3])
    np.testing.assert_array_equal(wc.mins, [1.0])
    np.testing.assert_array_equal(wc.maxs, [4.0])


def test_eviction_keeps_last_three_panes():
    st = ShardState()
    for v in [1.0, 2.0, 4.0, 8.0]:
        out = aggregate_window(
            st, {1: _pane(1, [v], [v], [v], [v])}, 3
        )
    wc = out[1]
    # window after 4th pane = panes 2,3,4 -> LS = 8+2+4
    assert wc.size == 3
    np.testing.assert_allclose(wc.linear_sums, [14.0])
    assert len(st.pane_states[1]) == 3


def test_zero_pane_copy_then_nonzero_merge():
    # A size-0 pane merged with one historical non-zero pane: the zero pane
    # is copied first (stale centroid included) then overwritten wholesale
    # by the non-zero copy branch.
    st = ShardState()
    aggregate_window(st, {1: _pane(2, [2.0], [0.9], [1.1], [1.0])}, 3)
    out = aggregate_window(st, {1: _pane(0, [0.0], [0.0], [0.0], [1.0])}, 3)
    wc = out[1]
    assert wc.size == 2
    np.testing.assert_array_equal(wc.mins, [0.9])  # zeros NOT min-merged
    np.testing.assert_array_equal(wc.maxs, [1.1])


def test_single_nonzero_carried_pane_keeps_stale_centroid():
    # Q8-centroid: window whose only non-zero pane came from a carried
    # cluster keeps that pane's stale (mixed-history) centroid.
    st = ShardState()
    aggregate_window(st, {1: _pane(4, [4.0], [0.9], [1.1], [1.0])}, 3)
    aggregate_window(st, {1: _pane(0, [0.0], [0.0], [0.0], [1.0])}, 3)
    aggregate_window(st, {1: _pane(0, [0.0], [0.0], [0.0], [1.0])}, 3)
    # pane 4: first pane (size 4) evicted; only the new pane is non-zero
    stale = _pane(1, [1.3], [0.0], [1.3], [5.3 / 5])  # carried-pane shape
    out = aggregate_window(st, {1: stale}, 3)
    wc = out[1]
    assert wc.size == 1
    np.testing.assert_allclose(wc.centroid, [5.3 / 5])  # stale, NOT LS/size


def test_tombstone_after_three_empty_panes():
    st = ShardState()
    aggregate_window(st, {1: _pane(1, [1.0], [1.0], [1.0], [1.0])}, 3)
    z = lambda: _pane(0, [0.0], [0.0], [0.0], [1.0])
    out2 = aggregate_window(st, {1: z()}, 3)
    out3 = aggregate_window(st, {1: z()}, 3)
    assert out2[1].size == 1 and out3[1].size == 1
    out4 = aggregate_window(st, {1: z()}, 3)  # first pane evicted -> empty
    assert 1 not in out4
    assert 1 not in st.pane_states  # tombstoned


def test_carry_from_window():
    st = ShardState()
    out = aggregate_window(st, {1: _pane(2, [2.0], [0.9], [1.1], [1.0])}, 3)
    carry = carry_from_window(out)
    assert carry[1].size == 2
    np.testing.assert_array_equal(carry[1].linear_sums, [2.0])
    np.testing.assert_array_equal(carry[1].centroid, [1.0])
