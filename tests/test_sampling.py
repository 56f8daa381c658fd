"""Deterministic sampling operators (operators/sampling.py):
partitioning-invariance, nesting, split totality, per-key caps."""

import pytest
from pyspark.sql import functions as F

from kelos_on_kafka_spark.operators import sampling

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").localCheckpoint(
        True
    )


def test_sample_invariant_under_repartition(spark, docs):
    a = {
        r["doc_id"]
        for r in sampling.deterministic_sample(docs, "doc_id", 0.3).collect()
    }
    b = {
        r["doc_id"]
        for r in sampling.deterministic_sample(
            docs.repartition(7, "lang"), "doc_id", 0.3
        ).collect()
    }
    assert a == b
    assert 0 < len(a) < docs.count()


def test_samples_nest_by_fraction(spark, docs):
    small = {
        r["doc_id"]
        for r in sampling.deterministic_sample(
            docs, "doc_id", 0.1, seed=5
        ).collect()
    }
    big = {
        r["doc_id"]
        for r in sampling.deterministic_sample(
            docs, "doc_id", 0.4, seed=5
        ).collect()
    }
    assert small <= big
    assert len(small) < len(big)


def test_hash_split_total_and_disjoint(spark, docs):
    out = sampling.hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n = docs.count()
    assert sum(counts.values()) == n  # every row assigned exactly once
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"]
    assert counts["train"] > counts["test"]
    # roughly proportional (50 docs: generous tolerance)
    assert counts["train"] / n > 0.6


def test_stratified_cap_bounds_each_key(spark, docs):
    out = sampling.stratified_cap(docs, ["lang"], "doc_id", n=5)
    per_key = out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= 5 for r in per_key)
    # stable under repartition
    again = sampling.stratified_cap(
        docs.repartition(9), ["lang"], "doc_id", n=5
    )
    key = lambda rows: sorted(
        (r["lang"], r["sample_rank"], r["doc_id"]) for r in rows
    )
    assert key(out.collect()) == key(again.collect())


def test_split_bounds_are_oracle_literal_exact():
    """ADVICE r02: float-accumulated bounds can drift a ulp off the
    decimal literal a hand-written oracle uses (0.1 + 0.2 != 0.3);
    split_bounds accumulates exactly (Fraction) and rounds once, so
    each bound is the double nearest the true cumulative weight and
    ``repr(bound)`` is safe to paste into an oracle."""
    assert 0.1 + 0.2 != 0.3  # the float hazard being guarded against
    bounds = sampling.split_bounds({"train": 0.8, "val": 0.1, "test": 0.1})
    assert bounds == [("train", 0.8), ("val", 0.9)]
    assert repr(bounds[1][1]) == "0.9"
    # the drift case: nine 0.1 weights accumulated in float give
    # 0.8999999999999999, but the exact cumulative sum rounds to 0.9 —
    # split_bounds produces the 0.9 an oracle author would write
    ws = {chr(97 + i): 0.1 for i in range(10)}
    b2 = sampling.split_bounds(ws)
    assert sum([0.1] * 9) == 0.8999999999999999  # float accumulation
    assert b2[8][1] == 0.9  # exact accumulation, literal-safe


def _py_weighted_priority(ids_weights, seed=7):
    import hashlib

    def h64(s):
        return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)

    return {
        i: min(h64(f"{i}:{j}") for j in range(w)) for i, w in ids_weights
    }


def test_weighted_sample_matches_python_reference(spark):
    rows = [(1, 1), (2, 4), (3, 2), (4, 8), (5, 1)]
    df = spark.createDataFrame(rows, "doc_id long, wt int")
    got = {
        r.doc_id: r.priority
        for r in sampling.weighted_priority_sample(
            df, "doc_id", "wt", n=3
        ).collect()
    }
    ref = _py_weighted_priority(rows)
    want = dict(sorted(ref.items(), key=lambda kv: (kv[1], kv[0]))[:3])
    assert got == want
    # stable under repartitioning
    again = {
        r.doc_id: r.priority
        for r in sampling.weighted_priority_sample(
            df.repartition(5), "doc_id", "wt", n=3
        ).collect()
    }
    assert again == got


def test_weighted_priority_is_proportional():
    """Pure-Python statistical check of the scheme itself (no Spark):
    over many seeds, the top-1 pick lands on a weight-4 item ~4x as
    often as a weight-1 item."""
    import hashlib

    wins = {1: 0, 2: 0}
    n_seeds = 400
    for seed in range(n_seeds):
        def h64(s):
            return int(
                hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16
            )
        p1 = min(h64(f"a:{j}") for j in range(4))   # weight 4
        p2 = min(h64(f"b:{j}") for j in range(1))   # weight 1
        wins[1 if p1 < p2 else 2] += 1
    frac = wins[1] / n_seeds
    assert 0.72 <= frac <= 0.88  # expected 4/5 = 0.8


def test_weighted_stratified_cap_equals_per_stratum_sample(spark):
    """weighted_stratified_cap == weighted_priority_sample applied
    independently per stratum (same priorities, same picks), and it
    caps every stratum."""
    import pandas as pd

    from kelos_on_kafka_spark.operators.sampling import (
        weighted_priority_sample,
        weighted_stratified_cap,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": range(120),
            "lang": [("en", "de", "fr")[i % 3] for i in range(120)],
            "wt": [1 + (i % 5) for i in range(120)],
        }
    )
    df = spark.createDataFrame(pdf)
    capped = weighted_stratified_cap(df, ["lang"], "doc_id", "wt", n=7)
    rows = capped.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append((r.priority, r.doc_id, r.sample_rank))
    assert set(by_lang) == {"en", "de", "fr"}
    for lang, entries in by_lang.items():
        assert len(entries) == 7
        assert sorted(e[2] for e in entries) == list(range(1, 8))
        want = sorted(
            (r.priority, r.doc_id)
            for r in weighted_priority_sample(
                df.where(df.lang == lang), "doc_id", "wt", n=7
            ).collect()
        )
        assert sorted((p, d) for p, d, _ in entries) == want
    # repartition-stable
    again = sorted(
        (r.lang, r.doc_id, r.sample_rank)
        for r in weighted_stratified_cap(
            df.repartition(9, "doc_id"), ["lang"], "doc_id", "wt", n=7
        ).collect()
    )
    assert again == sorted((r.lang, r.doc_id, r.sample_rank) for r in rows)
