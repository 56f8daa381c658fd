"""Epanechnikov kernel option (core.KERNELS / KelosConfig.kernel).

The reference ships only the Gaussian product kernel
(GaussianKernel.java:11-16); the Epanechnikov kernel is an extension —
so there is no Java parity target.  Instead: kernel values are pinned
against hand-computed constants, the cluster-KDE stage is checked
against an independent in-test reimplementation, and the Spark batch
engine must reproduce the NumPy oracle under the new kernel exactly
(same plumbing assertion as the Gaussian suite)."""

import numpy as np
import pytest

from kelos_on_kafka_spark import core
from kelos_on_kafka_spark.config import KelosConfig
from kelos_on_kafka_spark.operators.kelos_batch import detect_outliers
from kelos_on_kafka_spark.sources.points import gmm_points, to_spark_points


def test_kernel_values_hand_computed():
    e = core._epanechnikov_raw
    assert e(np.float64(0.0), np.float64(1.0)) == 0.75
    assert e(np.float64(0.5), np.float64(1.0)) == 0.75 * 0.75
    assert e(np.float64(1.0), np.float64(1.0)) == 0.0
    assert e(np.float64(1.5), np.float64(1.0)) == 0.0
    assert e(np.float64(1.0), np.float64(2.0)) == 0.75 * 0.75 / 2.0
    # compact support: h == 0 contributes 0, never NaN
    with np.errstate(divide="ignore", invalid="ignore"):
        assert e(np.float64(0.0), np.float64(0.0)) == 0.0
        assert e(np.float64(1.0), np.float64(0.0)) == 0.0


def test_cluster_kde_matches_independent_reimplementation():
    """estimate_cluster_densities under the Epanechnikov kernel equals
    a straight-line reimplementation of the density formula (weights,
    Q1 /k mean, bandwidth, product kernel) written independently here."""
    centroids = np.array([[0.0, 0.0], [1.0, 0.5], [0.5, 1.5], [2.0, 2.0]])
    sizes = [3, 2, 4, 1]
    wcs = {}
    for i, (c, s) in enumerate(zip(centroids, sizes), start=1):
        wcs[i] = core.WindowCluster(
            cluster_id=i,
            size=s,
            linear_sums=c * s,
            centroid=c.copy(),
            mins=c - 0.1,
            maxs=c + 0.1,
        )
    core.knn_clusters(wcs, k=3)
    got = core.estimate_cluster_densities(
        {i: wcs[i] for i in wcs}, core.KERNELS["epanechnikov"]
    )

    def epan(x, h):
        h = core._EPAN_BW_FACTOR * h  # canonical-bandwidth rescaling
        with np.errstate(divide="ignore", invalid="ignore"):
            u = x / h
            return np.where(np.abs(u) <= 1.0, 0.75 * (1.0 - u * u) / h, 0.0)

    for cid, cl in got.items():
        nbrs = [int(i) for i in wcs[cid].knn_ids if int(i) in wcs]
        k = len(nbrs)
        ns = np.array([wcs[j].size for j in nbrs], dtype=np.float64)
        nc = np.stack([wcs[j].centroid for j in nbrs])
        w = ns / ns.sum()
        mean = (nc * w[:, None]).sum(axis=0) / k
        var = ((nc - mean) ** 2 * w[:, None]).sum(axis=0)
        bw = 1.06 * np.sqrt(var) * k ** (-1.0 / (nc.shape[1] + 1))
        dens = 0.0
        for j in range(k):
            diff = np.abs(wcs[cid].centroid - nc[j])
            dens += np.prod(epan(diff, bw)) * w[j]
        assert cl.density == pytest.approx(dens, rel=1e-12)


CFG_E = KelosConfig(
    pane_seconds=10,
    panes_per_window=3,
    distance_threshold=0.25,
    k=20,
    n=20,
    kernel="epanechnikov",
)


def test_batch_engine_matches_oracle_under_epanechnikov(spark):
    pdf = gmm_points(
        n=600,
        seed=42,
        elements_per_window=600,
        panes_per_window=CFG_E.panes_per_window,
        pane_seconds=CFG_E.pane_seconds,
    )
    feats = np.stack([np.asarray(f) for f in pdf["features"]])
    results = core.run_stream(
        pdf["id"].to_numpy(),
        pdf["ts"].to_numpy(),
        feats,
        pane_seconds=CFG_E.pane_seconds,
        panes_per_window=CFG_E.panes_per_window,
        threshold=CFG_E.distance_threshold,
        k=CFG_E.k,
        n=CFG_E.n,
        kernel="epanechnikov",
    )
    expected = {
        r.pane_id: [(o.rank, o.point_id, o.klome, o.density) for o in r.outliers]
        for r in results
        if r.outliers
    }
    got_rows = (
        detect_outliers(to_spark_points(spark, pdf), CFG_E)
        .orderBy("window_id", "rank")
        .collect()
    )
    got = {}
    for row in got_rows:
        got.setdefault(row.window_id, []).append(
            (row["rank"], row.point_id, row.klome, row.density)
        )
    assert set(got) == set(expected)
    for w in expected:
        assert got[w] == expected[w], f"window {w} mismatch"
    # the option is live: the Gaussian run ranks at least one window
    # differently (densities change, so KLOME ordering shifts)
    gauss = core.run_stream(
        pdf["id"].to_numpy(),
        pdf["ts"].to_numpy(),
        feats,
        pane_seconds=CFG_E.pane_seconds,
        panes_per_window=CFG_E.panes_per_window,
        threshold=CFG_E.distance_threshold,
        k=CFG_E.k,
        n=CFG_E.n,
    )
    gauss_d = {
        r.pane_id: [(o.rank, o.point_id, o.klome, o.density) for o in r.outliers]
        for r in gauss
        if r.outliers
    }
    assert gauss_d != expected
