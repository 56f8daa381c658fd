"""ANN operators: trained-quantizer IVF correctness properties.

(The deterministic-quantizer IVF, exact cosine, and LSH paths are
oracle-checked through the driver gate; these tests pin the trained
path, which has no SQL oracle because k-means centroids are not
reproducible in an external engine.)"""

import pytest
from pyspark.sql import functions as F

from kelos_on_kafka_spark.operators import similarity

SF = "/root/testdata/sf0.001"
PROBES = [3, 11, 27, 42]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").localCheckpoint(
        True
    )


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    return out


def test_trained_centroids_shape(emb):
    cents = similarity.train_ivf_centroids(emb, n_cells=4, seed=7)
    dim = len(emb.select("embedding").first()["embedding"])
    assert len(cents) == 4
    assert all(len(c) == dim for c in cents)


def test_ivf_full_probe_equals_exact(spark, emb):
    """nprobe == n_cells scans every cell: the IVF result must equal
    exact brute-force top-k."""
    cents = similarity.train_ivf_centroids(emb, n_cells=4, seed=7)
    exact = _topk_sets(similarity.cosine_topk(emb, PROBES, k=5))
    full = _topk_sets(
        similarity.ivf_topk(emb, PROBES, k=5, nprobe=4, centroids=cents)
    )
    assert full == exact


def test_trained_ivf_recall_reasonable(spark, emb):
    cents = similarity.train_ivf_centroids(emb, n_cells=4, seed=7)
    exact = _topk_sets(similarity.cosine_topk(emb, PROBES, k=5))
    approx = _topk_sets(
        similarity.ivf_topk(emb, PROBES, k=5, nprobe=2, centroids=cents)
    )
    recalls = [
        len(approx.get(p, set()) & exact[p]) / len(exact[p]) for p in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.5


def test_pq_trained_recall_vs_exact(spark):
    """PQ with KMeans-trained codebooks: recall@5 against exact L2
    top-5 is well above chance on the clustered embeddings (and the
    encode/ADC plumbing is the same the oracle-checked literal-codebook
    query uses)."""
    from kelos_on_kafka_spark.operators.similarity import (
        pq_topk,
        train_pq_codebooks,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    books = train_pq_codebooks(emb, m=8, k_sub=16, max_iter=5)
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8
    probes = list(range(10))
    approx = pq_topk(emb, probes, books, k=5, rerank=50)
    got = {}
    for r in approx.collect():
        got.setdefault(r.probe_id, set()).add(r.neighbor_id)

    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    recall_n = 0
    for p in probes:
        pv = mat[ids == p][0]
        d2 = ((mat - pv) ** 2).sum(axis=1)
        d2[ids == p] = np.inf
        exact = set(ids[np.argsort(d2, kind="stable")[:5]].tolist())
        recall_n += len(exact & got[p])
    recall = recall_n / (5 * len(probes))
    assert recall >= 0.7, recall  # chance level is ~5/500 = 0.01
    # and without re-ranking the raw ADC shortlist is still far above
    # chance (the oracle-checked mode)
    raw = pq_topk(emb, probes, books, k=5)
    got_raw = {}
    for r in raw.collect():
        got_raw.setdefault(r.probe_id, set()).add(r.neighbor_id)
    raw_n = 0
    for p in probes:
        pv = mat[ids == p][0]
        d2 = ((mat - pv) ** 2).sum(axis=1)
        d2[ids == p] = np.inf
        exact = set(ids[np.argsort(d2, kind="stable")[:5]].tolist())
        raw_n += len(exact & got_raw[p])
    assert raw_n / (5 * len(probes)) >= 0.1
