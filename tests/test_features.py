"""Feature extraction: determinism, byte-identical text per url, d=4,
anomaly separation (SURVEY.md §5 invariant test)."""

import numpy as np
import pandas as pd
import pytest

from kelos_on_kafka_spark.functions.features import (
    FEATURE_DIM,
    extract_text_pandas,
    featurize_pages,
    page_features_pandas,
)
from kelos_on_kafka_spark.sources.pages import synth_pages, to_spark_pages


def test_extract_text_is_pure_function_of_bytes():
    html = pd.Series(
        [b"<html><body><p>Hello  world</p><a href='/x'>l</a></body></html>"]
    )
    t1 = extract_text_pandas(html)
    t2 = extract_text_pandas(html.copy())
    assert t1[0] == t2[0] == "Hello world l"


def test_generator_is_deterministic_per_url():
    a = synth_pages(n=200, seed=5)
    b = synth_pages(n=200, seed=5)
    assert (a["url"] == b["url"]).all()
    assert (a["text"] == b["text"]).all()
    assert all(x == y for x, y in zip(a["html"], b["html"]))


def test_features_dim_and_determinism():
    pdf = synth_pages(n=100, seed=3)
    f1 = page_features_pandas(pdf["text"], pdf["html"].apply(bytes.decode))
    f2 = page_features_pandas(pdf["text"], pdf["html"].apply(bytes.decode))
    assert all(len(v) == FEATURE_DIM for v in f1)
    assert all(tuple(x) == tuple(y) for x, y in zip(f1, f2))


def test_anomalies_separate_in_feature_space():
    pdf = synth_pages(n=2000, seed=11, anomaly_rate=0.02)
    feats = np.array(
        list(page_features_pandas(pdf["text"], pdf["html"]))
    )
    kinds = pdf["kind"].to_numpy()
    normal = feats[(kinds == "article") | (kinds == "listing") | (kinds == "stub")]
    farm = feats[kinds == "linkfarm"]
    garbage = feats[kinds == "garbage"]
    assert len(farm) and len(garbage)
    centroid = normal.mean(axis=0)
    d_norm = np.linalg.norm(normal - centroid, axis=1)
    d_farm = np.linalg.norm(farm - centroid, axis=1)
    d_garb = np.linalg.norm(garbage - centroid, axis=1)
    # planted anomalies sit far outside the bulk
    assert d_farm.min() > np.quantile(d_norm, 0.99)
    assert d_garb.min() > np.quantile(d_norm, 0.99)


def test_jvm_featurizer_matches_pandas_featurizer(spark):
    pdf = synth_pages(n=400, seed=17)
    sdf = to_spark_pages(spark, pdf)
    a = (
        featurize_pages(sdf, jvm=True)
        .select("url", "features")
        .orderBy("url")
        .collect()
    )
    b = (
        featurize_pages(sdf, jvm=False)
        .select("url", "features")
        .orderBy("url")
        .collect()
    )
    for ra, rb in zip(a, b):
        assert tuple(ra.features) == tuple(rb.features), ra.url
    # JVM variant has no Python stage in the plan
    plan = (
        featurize_pages(sdf, jvm=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan


def test_spark_featurize_matches_local_and_is_order_stable(spark):
    pdf = synth_pages(n=300, seed=9)
    sdf = to_spark_pages(spark, pdf)
    out = (
        featurize_pages(sdf)
        .select("url", "features")
        .orderBy("url")
        .collect()
    )
    # local reference computation
    local = page_features_pandas(pdf["text"], pdf["html"])
    by_url = dict(zip(pdf["url"], local))
    for row in out:
        assert tuple(row.features) == tuple(by_url[row.url]), row.url
    # parallelism independence: 1 partition vs 8 partitions
    out8 = (
        featurize_pages(sdf.repartition(8))
        .select("url", "features")
        .orderBy("url")
        .collect()
    )
    assert [tuple(r.features) for r in out] == [
        tuple(r.features) for r in out8
    ]
