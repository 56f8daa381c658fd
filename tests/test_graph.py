"""Integer PageRank: hand-computed fixpoint steps, edge hygiene, and
partitioning invariance."""

from pyspark.sql import functions as F

from kelos_on_kafka_spark.operators.graph import pagerank_integer


def _ranks(df):
    return {r.node: r.rank for r in df.collect()}


def test_pagerank_hand_computed_three_iterations(spark):
    # a->b, a->c, b->c, c->a; scale 1e6, damping 85/100, base 150000
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")],
        "src string, dst string",
    )
    got = _ranks(pagerank_integer(edges, iterations=3))
    # worked by hand, floor division at every step:
    # r1 = {a: 1_000_000, b: 575_000, c: 1_425_000}
    # r2 = {a: 1_361_250, b: 575_000, c: 1_063_750}
    # r3 = {a: 1_054_187, b: 728_531, c: 1_217_281}
    assert got == {"a": 1_054_187, "b": 728_531, "c": 1_217_281}


def test_pagerank_edge_hygiene_and_dangling(spark):
    # duplicate edges collapse, self-loops drop, NULLs drop; node d is
    # dangling (in-edge only) — it still gets ranked, its mass leaks
    edges = spark.createDataFrame(
        [
            ("a", "b"), ("a", "b"), ("a", "a"),
            ("b", "d"), (None, "a"), ("b", None),
        ],
        "src string, dst string",
    )
    got = _ranks(pagerank_integer(edges, iterations=1))
    # effective edges: a->b, b->d; outdeg a=1, b=1
    # inc: b=1_000_000, d=1_000_000, a=0
    assert got == {"a": 150_000, "b": 1_000_000, "d": 1_000_000}


def test_pagerank_partitioning_invariance(spark):
    rows = [
        (f"n{i % 13}", f"n{(i * 7 + 3) % 13}") for i in range(60)
    ]
    edges = spark.createDataFrame(rows, "src string, dst string")
    a = _ranks(pagerank_integer(edges, iterations=3))
    b = _ranks(
        pagerank_integer(edges.repartition(7, "dst"), iterations=3)
    )
    assert a == b
    assert sum(a.values()) > 0
