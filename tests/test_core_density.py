"""Unit tests for KNN, cluster KDE and KLOME pruning (reference:
KNearestClusterProcessorSupplier.java, DensityEstimationProcessorSupplier.java,
PruningProcessorSupplier.java).  Expected values are computed with an
independent literal transcription of the Java formulas."""

import math

import numpy as np

from kelos_on_kafka_spark.core import (
    DOUBLE_MAX,
    WindowCluster,
    estimate_cluster_densities,
    gaussian_kernel,
    knn_clusters,
    prune_clusters,
)


def _wc(cid, centroid, size=1, mins=None, maxs=None):
    c = np.array(centroid, dtype=float)
    return WindowCluster(
        cluster_id=cid,
        size=size,
        linear_sums=c * size,
        centroid=c,
        mins=np.array(mins, dtype=float) if mins is not None else c.copy(),
        maxs=np.array(maxs, dtype=float) if maxs is not None else c.copy(),
    )


def _kernel(x, h):
    # GaussianKernel.java:11-16, literal
    return math.exp(-(x * x) / (2 * h * h)) / (math.sqrt(2 * math.pi) * h)


def test_gaussian_kernel_matches_java_formula():
    assert gaussian_kernel(0.0, 1.0) == 1.0 / math.sqrt(2 * math.pi)
    assert gaussian_kernel(1.5, 0.7) == _kernel(1.5, 0.7)
    # h == 0 -> NaN in Java (0/0), replicate
    assert np.isnan(gaussian_kernel(0.0, 0.0))
    assert np.isnan(gaussian_kernel(2.0, 0.0))


def test_knn_sorted_by_distance_then_id_zero_padded():
    wcs = {
        1: _wc(1, [0.0]),
        2: _wc(2, [1.0]),
        3: _wc(3, [3.0]),
        4: _wc(4, [-1.0]),  # ties with cluster 2 at distance 1 from c1
    }
    knn_clusters(wcs, k=3)
    # c1: dists -> 2:1.0, 3:3.0, 4:1.0 ; tie (2,4) -> lower id first
    assert list(wcs[1].knn_ids) == [2, 4, 3]
    # c3: 2:2.0, 1:3.0, 4:4.0
    assert list(wcs[3].knn_ids) == [2, 1, 4]
    # K=3 but only 3 others -> no padding here; check padding with K=5
    knn_clusters(wcs, k=5)
    assert list(wcs[1].knn_ids) == [2, 4, 3, 0, 0]  # Q5 zero padding


def test_cluster_density_hand_computed():
    # 1-D, K=2: c1 at 0 with [min,max]=[-0.1, 0.1], c2 at 1, c3 at 3.
    wcs = {
        1: _wc(1, [0.0], size=2, mins=[-0.1], maxs=[0.1]),
        2: _wc(2, [1.0], size=1),
        3: _wc(3, [3.0], size=1),
    }
    knn_clusters(wcs, k=2)
    assert list(wcs[1].knn_ids) == [2, 3]
    out = estimate_cluster_densities(wcs)
    assert set(out) == {1, 2, 3}

    # Hand computation for c1 (DensityEstimationProcessorSupplier.java):
    # knns = [c2, c3]; k=2; weights = [0.5, 0.5]
    # mean = (1*0.5 + 3*0.5)/2 = 1.0           (Q1: extra /k)
    # var  = (1-1)^2*.5 + (3-1)^2*.5 = 2 ; std = sqrt(2)
    # bw   = 1.06*sqrt(2)*2^(-1/2) = 1.06      (Q3: d+1 exponent, d=1)
    h = 1.06 * math.sqrt(2.0) * 2 ** (-1.0 / 2)
    radius = max(0.0 - (-0.1), 0.1 - 0.0)
    dens = _kernel(1.0, h) * 0.5 + _kernel(3.0, h) * 0.5
    minb = _kernel(1.0 + radius, h) * 0.5 + _kernel(3.0 + radius, h) * 0.5
    maxb = _kernel(1.0 - radius, h) * 0.5 + _kernel(3.0 - radius, h) * 0.5
    assert out[1].density == dens
    assert out[1].min_density_bound == minb
    assert out[1].max_density_bound == maxb


def test_cluster_weights_are_size_proportional():
    wcs = {
        1: _wc(1, [0.0], size=1),
        2: _wc(2, [1.0], size=3),
        3: _wc(3, [2.0], size=1),
    }
    knn_clusters(wcs, k=2)
    out = estimate_cluster_densities(wcs)
    # c1 knns = [2, 3]: weights = [3/4, 1/4]
    mean = (1.0 * 0.75 + 2.0 * 0.25) / 2
    var = (1.0 - mean) ** 2 * 0.75 + (2.0 - mean) ** 2 * 0.25
    h = 1.06 * math.sqrt(var) * 2 ** (-0.5)
    dens = _kernel(1.0, h) * 0.75 + _kernel(2.0, h) * 0.25
    assert out[1].density == dens


def test_clusters_with_fewer_than_two_neighbors_dropped():
    wcs = {1: _wc(1, [0.0]), 2: _wc(2, [1.0])}
    knn_clusters(wcs, k=5)
    out = estimate_cluster_densities(wcs)
    # each has exactly 1 neighbor -> both dropped (:49-51)
    assert out == {}


def test_prune_dominance_counts_and_flags():
    # Build 3 survivors with hand-set densities/bounds and knn ids.
    wcs = {
        1: _wc(1, [0.0], size=60),
        2: _wc(2, [1.0], size=50),
        3: _wc(3, [2.0], size=1),
    }
    knn_clusters(wcs, k=2)
    for cid, (dens, lo, hi) in {
        1: (5.0, 4.0, 6.0),
        2: (5.2, 4.5, 6.5),
        3: (0.1, 0.05, 0.2),
    }.items():
        wcs[cid].density = dens
        wcs[cid].min_density_bound = lo
        wcs[cid].max_density_bound = hi

    flags = prune_clusters(wcs, n=100)

    # Hand KLOME (PruningProcessorSupplier.java:44-68):
    # c1: knn [2,3] -> mean=(5.2+0.1)/2=2.65 ; var=(5.2-2.65)^2+(0.1-2.65)^2
    #     std=sqrt(13.005) (Q2: no /n) ; low=(4-2.65)/std, high=(6-2.65)/std
    std1 = math.sqrt((5.2 - 2.65) ** 2 + (0.1 - 2.65) ** 2)
    lo1, hi1 = (4.0 - 2.65) / std1, (6.0 - 2.65) / std1
    # c2: knn [1,3] -> mean=2.55 ; std=sqrt((5-2.55)^2+(0.1-2.55)^2)
    std2 = math.sqrt((5.0 - 2.55) ** 2 + (0.1 - 2.55) ** 2)
    lo2, hi2 = (4.5 - 2.55) / std2, (6.5 - 2.55) / std2
    # c3: knn [2,1] -> mean=5.1 ; std=sqrt((5.2-5.1)^2+(5-5.1)^2)
    std3 = math.sqrt(0.1**2 + 0.1**2)
    lo3, hi3 = (0.05 - 5.1) / std3, (0.2 - 5.1) / std3
    # counts[j] = sum of size_i where hi_i < lo_j
    lows, highs = [lo1, lo2, lo3], [hi1, hi2, hi3]
    sizes = [60, 50, 1]
    counts = [
        sum(sizes[i] for i in range(3) if highs[i] < lows[j])
        for j in range(3)
    ]
    # c3's high (≈ -34) is far below c1/c2 lows -> counts ~ [1, 1, 0]
    assert counts == [1, 1, 0]
    assert flags == {1: True, 2: True, 3: True}

    # With N <= 1 clusters 1 and 2 must be pruned
    flags_small = prune_clusters(wcs, n=1)
    assert flags_small == {1: False, 2: False, 3: True}


def test_prune_no_existing_knn_gives_nan_and_keeps_cluster():
    wc = _wc(1, [0.0], size=5)
    wc.knn_ids = np.zeros(3, dtype=np.int64)  # only padding -> no lookups
    wc.density, wc.min_density_bound, wc.max_density_bound = 1.0, 0.5, 1.5
    flags = prune_clusters({1: wc}, n=0)
    # NaN klome -> all comparisons false -> count 0 < N? N=0 -> 0<0 false
    assert flags == {1: False}
    flags = prune_clusters({1: wc}, n=1)
    assert flags == {1: True}
