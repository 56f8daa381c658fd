"""Empty-input hardening: every round-3 operator on a zero-row frame
returns an empty (or well-defined) result with the right schema — no
crashes on the empty partitions a real pipeline constantly produces."""

import pytest
from pyspark.sql import functions as F

from kelos_on_kafka_spark.operators import dedup, sampling, textstats
from kelos_on_kafka_spark.operators.temporal import (
    absence_matches,
    gap_tolerant_matches,
)


@pytest.fixture()
def empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string"
    )


@pytest.fixture()
def empty_events(spark):
    return spark.createDataFrame(
        [], "event_id long, user_id long, event_type string, ts timestamp"
    )


def test_text_ops_on_empty(spark, empty_docs):
    assert textstats.repetition_stats(empty_docs).count() == 0
    assert (
        textstats.contamination(empty_docs, empty_docs).count() == 0
    )
    assert textstats.top_terms_tfidf(empty_docs).count() == 0
    assert textstats.corpus_report(empty_docs).count() == 0


def test_dedup_ops_on_empty(spark, empty_docs):
    assert dedup.dedup_decisions(empty_docs).count() == 0
    assert dedup.simhash_near_dup_pairs(empty_docs, max_hamming=0).count() == 0


def test_temporal_ops_on_empty(spark, empty_events):
    assert (
        absence_matches(
            empty_events, "user_id", "ts", "event_type",
            "click", "purchase", 1_000_000, "event_id",
        ).count()
        == 0
    )
    assert (
        gap_tolerant_matches(
            empty_events, "user_id", "ts", "event_type",
            "click", "purchase", "view", 1_000_000, "event_id",
        ).count()
        == 0
    )


def test_sampling_ops_on_empty(spark):
    df = spark.createDataFrame([], "doc_id long, wt int")
    assert sampling.weighted_priority_sample(df, "doc_id", "wt", 5).count() == 0


def test_pq_on_empty(spark):
    from kelos_on_kafka_spark.operators.similarity import (
        md5_codebooks,
        pq_topk,
    )

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    books = md5_codebooks(seed=43, m=4, k_sub=8, subdim=16)
    assert pq_topk(emb, [0, 1], books, k=5).count() == 0
    assert pq_topk(emb, [0, 1], books, k=5, rerank=10).count() == 0
