"""Property-based check: salted operators are result-identical to their
plain forms on arbitrary (skewed) inputs — the salt may only move rows.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kelos_on_kafka_spark.plans import skew

# rows: (id, key from a tiny alphabet -> guaranteed hot keys, score)
ROWS = st.lists(
    st.tuples(
        st.integers(0, 10**6),
        st.sampled_from(["hot", "hot", "hot", "warm", "cold"]),
        st.integers(-1000, 1000),
    ),
    min_size=1,
    max_size=80,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS, n_salts=st.integers(1, 7), n=st.integers(1, 4))
def test_salted_topn_equals_plain(spark, rows, n_salts, n):
    df = spark.createDataFrame(rows, "id long, key string, score long")
    got = skew.salted_topn(
        df, ["key"], "score", n=n, n_salts=n_salts, tiebreak_col="id"
    )
    w = Window.partitionBy("key").orderBy(F.col("score").desc(), F.col("id"))
    want = df.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= n
    )
    cols = ["key", "rank", "id", "score"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS, n_salts=st.integers(1, 6))
def test_salted_join_equals_plain(spark, rows, n_salts):
    df = spark.createDataFrame(rows, "id long, key string, score long")
    dim = spark.createDataFrame(
        [("hot", 1), ("cold", 2)], "key string, mult int"
    )
    got = skew.salted_join(
        df, dim, on=["key"], n_salts=n_salts, salt_cols=["id"], how="left"
    )
    want = df.join(dim, "key", "left")
    cols = ["key", "id", "mult"]
    assert sorted(
        map(tuple, got.select(*cols).collect())
    ) == sorted(map(tuple, want.select(*cols).collect()))
