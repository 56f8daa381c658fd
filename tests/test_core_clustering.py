"""Unit tests for greedy pane clustering (reference:
ClusteringProcessorSupplier.java:35-124, Cluster.java:112-152)."""

import numpy as np
import pytest

from kelos_on_kafka_spark.core import CarryCluster, cluster_pane


def test_new_cluster_ids_start_at_one():
    ids = np.array([0])
    X = np.array([[0.0, 0.0]])
    assign, panes = cluster_pane(ids, X, {}, 0.25, 20)
    assert list(assign) == [1]  # id 0 never assigned (SURVEY Q5)
    assert list(panes) == [1]
    assert panes[1].size == 1
    np.testing.assert_array_equal(panes[1].centroid, [0.0, 0.0])
    np.testing.assert_array_equal(panes[1].mins, [0.0, 0.0])


def test_threshold_is_strict_less_than():
    # p2 lands exactly at distance == threshold from c1's centroid -> new
    # cluster (ClusteringProcessorSupplier.java:56 uses strict <)
    ids = np.array([0, 1, 2, 3])
    X = np.array([[0.0, 0.0], [0.1, 0.0], [0.3, 0.0], [0.2, 0.0]])
    assign, panes = cluster_pane(ids, X, {}, 0.25, 20)
    # p0 -> new c1; p1 joins c1 (dist .1); centroid (0.05, 0)
    # p2: dist to c1 = .25 == threshold -> new c2 at (.3, 0)
    # p3: dist c1=.15, c2=.1 -> joins c2
    assert list(assign) == [1, 1, 2, 2]
    assert panes[1].size == 2
    assert panes[2].size == 2
    np.testing.assert_allclose(panes[2].centroid, [0.25, 0.0])
    np.testing.assert_array_equal(panes[1].maxs, [0.1, 0.0])


def test_tie_goes_to_lowest_cluster_id():
    ids = np.array([0, 1, 2])
    X = np.array([[0.0, 0.0], [1.0, 0.0], [0.5, 0.0]])
    assign, _ = cluster_pane(ids, X, {}, 1.0, 20)
    # p1 at distance exactly 1.0 -> not < 1.0 -> new cluster 2
    # p2 equidistant (.5) from both -> first minimum in ascending-id
    # iteration wins -> cluster 1
    assert list(assign) == [1, 2, 1]


def test_points_processed_in_ascending_id_order():
    # Order dependence: processing (0,0) then (0.2,0) then (0.4,0) chains
    # into one cluster only if the middle point comes second.
    ids = np.array([2, 0, 1])  # unsorted input
    X = np.array([[0.4, 0.0], [0.0, 0.0], [0.2, 0.0]])
    assign, panes = cluster_pane(ids, X, {}, 0.25, 20)
    # sorted by id: (0,0)->c1; (0.2,0) dist .2 -> joins c1 (centroid .1);
    # (0.4,0) dist .3 -> new c2.
    # assign is in ascending-id order
    assert list(assign) == [1, 1, 2]


def test_carry_over_q8_semantics():
    # Carried cluster: size/LS seeded from window aggregate, mins/maxs
    # zero-initialised (Cluster.java:44-45), centroid = aggregate centroid.
    carry = {
        1: CarryCluster(
            size=3,
            linear_sums=np.array([3.0]),
            centroid=np.array([1.0]),
        )
    }
    ids = np.array([10])
    X = np.array([[1.1]])
    assign, panes = cluster_pane(ids, X, carry, 0.25, 20)
    assert list(assign) == [1]
    p = panes[1]
    assert p.size == 1  # pane delta: 4 - 3
    np.testing.assert_allclose(p.linear_sums, [4.1 - 3.0])
    # Q8: mins/maxs include the zero initialisation
    np.testing.assert_array_equal(p.mins, [0.0])
    np.testing.assert_array_equal(p.maxs, [1.1])
    # centroid is the mixed full-history centroid (4.1/4), not pane-local
    np.testing.assert_allclose(p.centroid, [4.1 / 4])


def test_carried_cluster_without_points_still_emitted():
    carry = {
        5: CarryCluster(
            size=2,
            linear_sums=np.array([10.0]),
            centroid=np.array([5.0]),
        )
    }
    ids = np.array([7])
    X = np.array([[0.0]])  # far away -> new cluster
    assign, panes = cluster_pane(ids, X, carry, 0.25, 20)
    assert list(assign) == [6]  # new id = max(existing)+1
    assert set(panes) == {5, 6}
    p5 = panes[5]
    assert p5.size == 0
    np.testing.assert_array_equal(p5.linear_sums, [0.0])
    np.testing.assert_array_equal(p5.centroid, [5.0])  # stale aggregate


def test_new_ids_continue_after_carry():
    carry = {
        3: CarryCluster(
            size=1, linear_sums=np.array([0.0]), centroid=np.array([0.0])
        )
    }
    ids = np.array([0, 1])
    X = np.array([[10.0], [20.0]])
    assign, _ = cluster_pane(ids, X, carry, 0.25, 20)
    assert list(assign) == [4, 5]


def test_empty_pane_emits_carried_clusters():
    carry = {
        2: CarryCluster(
            size=1, linear_sums=np.array([1.0]), centroid=np.array([1.0])
        )
    }
    assign, panes = cluster_pane(
        np.empty(0, dtype=np.int64), np.empty((0, 1)), carry, 0.25, 20
    )
    assert len(assign) == 0
    assert panes[2].size == 0
