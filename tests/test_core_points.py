"""Unit tests for the point-level stages (reference:
FilterProcessorSupplier.java, KNearestPointsProcessorSupplier.java,
PointDensityEstimationProcessorSupplier.java,
PointPruningProcessorSupplier.java)."""

import math

import numpy as np

from kelos_on_kafka_spark.core import (
    DOUBLE_MAX,
    MixedEntry,
    WindowCluster,
    estimate_point_densities,
    filter_candidates,
    knn_points,
    point_pruning,
)


def _wc(cid, centroid, size=1, density=0.0):
    c = np.array(centroid, dtype=float)
    return WindowCluster(
        cluster_id=cid,
        size=size,
        linear_sums=c * size,
        centroid=c,
        mins=c.copy(),
        maxs=c.copy(),
        density=density,
    )


def _kernel(x, h):
    return math.exp(-(x * x) / (2 * h * h)) / (math.sqrt(2 * math.pi) * h)


def test_filter_semi_join_on_flags():
    pids = np.array([10, 11, 12, 13])
    cids = np.array([1, 2, 1, 3])  # cluster 3 was dropped upstream
    X = np.array([[0.0], [1.0], [0.1], [9.0]])
    flags = {1: True, 2: False}
    cands = filter_candidates(pids, cids, X, flags)
    assert list(cands) == [10, 12]
    np.testing.assert_array_equal(cands[12], [0.1])


def test_point_knn_excludes_cluster_with_same_id():
    # Q6: a cluster whose id equals the candidate's point id is skipped
    # (ownIndex in calculateKNearestNeighbors).
    survivors = {1: _wc(1, [0.0]), 2: _wc(2, [0.5]), 7: _wc(7, [0.1])}
    cands = {7: np.array([0.0])}
    knn = knn_points(cands, survivors, k=3)
    assert list(knn[7]) == [1, 2, 0]  # cluster 7 excluded, zero-padded


def test_point_density_hand_computed_q2():
    # candidate at 0.0 with 2 neighbor clusters at 1.0 and 3.0
    survivors = {1: _wc(1, [1.0], density=0.9), 2: _wc(2, [3.0], density=0.8)}
    cands = {50: np.array([0.0])}
    knn = {50: np.array([1, 2, 0, 0], dtype=np.int64)}
    out = estimate_point_densities(cands, knn, survivors)
    # k=2 (padding 0 not in store), pointWeight=1/2
    # mean = ((1+3)/2)/2 = 1.0                     (Q2: /k twice)
    # var = ((1-1)^2 + (3-1)^2)/2 = 2 ; std=sqrt(2)
    h = 1.06 * math.sqrt(2.0) * 2 ** (-0.5)
    dens = (_kernel(1.0, h) + _kernel(3.0, h)) * 0.5
    assert out[50].density == dens
    assert out[50].is_candidate
    # clusters pass through untouched
    assert out[1].density == 0.9 and not out[1].is_candidate


def test_point_density_phantom_point_zero_q5():
    # Candidate with id 0 exists; another candidate's zero-padded knn ids
    # resolve to it — and each duplicate padding slot counts once.
    survivors = {1: _wc(1, [1.0], density=0.9)}
    cands = {0: np.array([0.2]), 60: np.array([0.0])}
    knn = {
        0: np.array([1, 0, 0], dtype=np.int64),
        60: np.array([1, 0, 0], dtype=np.int64),  # 0s -> candidate 0 twice
    }
    out = estimate_point_densities(cands, knn, survivors)
    # candidate 60's kNNs = [c1, cand0, cand0] -> k=3
    # (sequential accumulation in kNN order, mirroring the Java loops)
    k = 3
    w = 1.0 / k
    cents = [1.0, 0.2, 0.2]
    mean = 0.0
    for c in cents:
        mean += c * w
    mean /= k
    var = 0.0
    for c in cents:
        var += (c - mean) ** 2 * w
    h = 1.06 * math.sqrt(var) * k ** (-0.5)
    dens = 0.0
    for c in cents:
        dens += _kernel(abs(0.0 - c), h) * w
    # np.exp (SIMD) vs math.exp (libm) may differ by 1 ULP — transcendental
    # bit-parity is unattainable across libms (Java's Math.exp is a third
    # implementation); assert to within 4 ULP.
    np.testing.assert_allclose(out[60].density, dens, rtol=1e-15)
    # candidate 0's own knn = [c1, itself, itself] (lookup of id 0 finds
    # candidate 0 in the mixed buffer) -> k=3 as well
    assert 0 in out


def test_mixed_store_collision_cluster_wins_q6():
    # Candidate point id 1 collides with cluster id 1: cluster overwrites
    # (clusters are put after candidates).
    survivors = {1: _wc(1, [5.0], density=0.7), 2: _wc(2, [6.0], density=0.6)}
    cands = {1: np.array([0.0]), 30: np.array([5.5])}
    knn = {
        1: np.array([2, 0], dtype=np.int64),
        30: np.array([1, 2], dtype=np.int64),
    }
    out = estimate_point_densities(cands, knn, survivors)
    # candidate 1 was overwritten by cluster 1 -> passes through as cluster
    assert not out[1].is_candidate
    assert out[1].density == 0.7
    assert out[30].is_candidate


def test_candidate_with_one_neighbor_dropped():
    survivors = {1: _wc(1, [1.0], density=0.9)}
    cands = {40: np.array([0.0])}
    knn = {40: np.array([1, 0, 0], dtype=np.int64)}
    out = estimate_point_densities(cands, knn, survivors)
    assert 40 not in out  # kNNs.size() <= 1 -> continue (:62-64)
    assert 1 in out


def test_point_pruning_klome_and_topn():
    store = {
        1: MixedEntry(np.array([0.0]), 0.50, False),  # cluster
        2: MixedEntry(np.array([1.0]), 0.40, False),  # cluster
        10: MixedEntry(
            np.array([0.1]), 0.01, True, np.array([1, 2], dtype=np.int64)
        ),
        11: MixedEntry(
            np.array([0.9]), 0.45, True, np.array([1, 2], dtype=np.int64)
        ),
        12: MixedEntry(
            np.array([0.5]), 0.30, True, np.array([1, 2], dtype=np.int64)
        ),
    }
    out = point_pruning(store, n=2)
    # mean = (.5+.4)/2 = .45 ; std = sqrt((.5-.45)^2+(.4-.45)^2) (no /n, Q2)
    # computed with the exact float ops of the Java loop
    mean = (0.50 + 0.40) / 2
    std = math.sqrt((0.50 - mean) ** 2 + (0.40 - mean) ** 2)
    kl = {pid: (d - mean) / std for pid, d in [(10, 0.01), (11, 0.45), (12, 0.30)]}
    assert [o.point_id for o in out] == [10, 12]
    assert out[0].klome == kl[10]
    assert out[1].klome == kl[12]
    assert out[0].rank == 1 and out[1].rank == 2
    np.testing.assert_array_equal(out[0].features, [0.1])


def test_point_pruning_zero_stddev_gives_double_max():
    store = {
        1: MixedEntry(np.array([0.0]), 0.5, False),
        2: MixedEntry(np.array([1.0]), 0.5, False),
        10: MixedEntry(
            np.array([0.1]), 0.3, True, np.array([1, 2], dtype=np.int64)
        ),
    }
    out = point_pruning(store, n=5)
    assert out[0].klome == DOUBLE_MAX


def test_point_pruning_no_existing_knn_gives_double_max():
    # empty lookup -> mean NaN but variance loop never runs -> std 0 -> MAX
    store = {
        10: MixedEntry(
            np.array([0.1]), 0.3, True, np.array([99], dtype=np.int64)
        ),
    }
    out = point_pruning(store, n=5)
    assert out[0].klome == DOUBLE_MAX


def test_point_pruning_tiebreak_by_point_id():
    store = {
        1: MixedEntry(np.array([0.0]), 0.5, False),
        2: MixedEntry(np.array([1.0]), 0.4, False),
        21: MixedEntry(
            np.array([0.3]), 0.2, True, np.array([1, 2], dtype=np.int64)
        ),
        20: MixedEntry(
            np.array([0.3]), 0.2, True, np.array([1, 2], dtype=np.int64)
        ),
    }
    out = point_pruning(store, n=1)
    assert out[0].point_id == 20  # documented deviation Q10
