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
