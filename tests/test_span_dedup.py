"""C4-style span-level dedup (dedup.span_fingerprints /
span_dedup_verdicts / span_clean_docs)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from kelos_on_kafka_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    # span_tokens=4: doc 1 spans: [a b c d], [e f g h]; doc 2 repeats
    # doc 1's second span then adds its own; doc 3 repeats doc 2's tail
    # and doc 1's first span; doc 4 is short (one partial span)
    rows = [
        (1, "a b c d e f g h"),
        (2, "e f g h x y z w"),
        (3, "x y z w a b c d"),
        (4, "q r"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_fingerprints_shape(docs):
    fps = dedup.span_fingerprints(docs, span_tokens=4).collect()
    got = {(r.doc_id, r.span_idx): (r.span, r.span_h) for r in fps}
    assert got[(1, 0)][0] == "a b c d"
    assert got[(1, 1)][0] == "e f g h"
    assert got[(4, 0)][0] == "q r"  # partial tail span kept
    assert (5, 0) not in got  # empty text yields no spans
    assert got[(1, 0)][1] == hashlib.md5(b"a b c d").hexdigest()


def test_span_dedup_verdicts_first_occurrence_keeps(docs):
    v = {
        (r.doc_id, r.span_idx): (r.keeper_doc, r.keeper_idx, r.is_dup)
        for r in dedup.span_dedup_verdicts(docs, span_tokens=4).collect()
    }
    assert v[(1, 0)] == (1, 0, False)
    assert v[(1, 1)] == (1, 1, False)
    assert v[(2, 0)] == (1, 1, True)   # "e f g h" first seen at doc 1
    assert v[(2, 1)] == (2, 1, False)
    assert v[(3, 0)] == (2, 1, True)   # "x y z w" first seen at doc 2
    assert v[(3, 1)] == (1, 0, True)   # "a b c d" first seen at doc 1
    assert v[(4, 0)] == (4, 0, False)


def test_span_clean_docs_rebuild(docs):
    got = {
        r.doc_id: (r.n_spans, r.n_kept, r.clean_md5)
        for r in dedup.span_clean_docs(docs, span_tokens=4).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert got[1] == (2, 2, md5("a b c d e f g h"))
    assert got[2] == (2, 1, md5("x y z w"))
    assert got[3] == (2, 0, md5(""))  # everything was seen before
    assert got[4] == (1, 1, md5("q r"))
    assert 5 not in got


def test_span_dedup_repartition_stable(docs):
    base = sorted(
        map(tuple, dedup.span_dedup_verdicts(docs, span_tokens=4).collect())
    )
    shuf = sorted(
        map(
            tuple,
            dedup.span_dedup_verdicts(
                docs.repartition(5, "text"), span_tokens=4
            ).collect(),
        )
    )
    assert base == shuf


def test_span_clean_docs_precomputed_verdicts_path_agrees(spark, docs):
    recompute = sorted(
        map(tuple, dedup.span_clean_docs(docs, span_tokens=4).collect())
    )
    v = dedup.span_dedup_verdicts(docs, span_tokens=4, with_span=True)
    fed = sorted(
        map(
            tuple,
            dedup.span_clean_docs(docs, span_tokens=4, verdicts=v).collect(),
        )
    )
    assert fed == recompute
