"""Salted skew operators (plans/skew.py): every salted variant must be
result-identical to the plain relational query it spreads out — the salt
moves rows, never values."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kelos_on_kafka_spark.plans import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # 2000 rows, 95% on one hot key — the distribution salting exists for
    df = spark.range(2000).select(
        F.col("id"),
        F.when(F.col("id") % 20 == 0, F.concat(F.lit("k"), F.col("id") % 7))
        .otherwise(F.lit("hot"))
        .alias("key"),
        (F.col("id") * 37 % 1009).alias("score"),
        (F.col("id") % 11).alias("val"),
    )
    return df.localCheckpoint(True)


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_topn_matches_plain_window(spark, skewed):
    got = skew.salted_topn(
        skewed,
        key_cols=["key"],
        order_col="score",
        n=5,
        n_salts=8,
        tiebreak_col="id",
    )
    w = Window.partitionBy("key").orderBy(F.col("score").desc(), F.col("id"))
    want = (
        skewed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
    )
    cols = ["key", "rank", "id", "score"]
    assert _rows(got, cols) == _rows(want, cols)


def test_salted_topn_ascending(spark, skewed):
    got = skew.salted_topn(
        skewed,
        key_cols=["key"],
        order_col="score",
        n=3,
        n_salts=4,
        descending=False,
        tiebreak_col="id",
    )
    w = Window.partitionBy("key").orderBy(F.col("score").asc(), F.col("id"))
    want = (
        skewed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
    )
    cols = ["key", "rank", "id"]
    assert _rows(got, cols) == _rows(want, cols)


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", 10), ("k0", 1), ("k3", 3)], "key string, mult int"
    )
    got = skew.salted_join(skewed, dim, on=["key"], n_salts=6, salt_cols=["id"])
    want = skewed.join(dim, "key")
    cols = ["key", "id", "mult"]
    assert _rows(got, cols) == _rows(want, cols)


def test_salted_join_left_keeps_unmatched(spark, skewed):
    dim = spark.createDataFrame([("k1", 5)], "key string, mult int")
    got = skew.salted_join(
        skewed, dim, on=["key"], n_salts=4, salt_cols=["id"], how="left"
    )
    want = skewed.join(dim, "key", "left")
    cols = ["key", "id", "mult"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.where(F.col("mult").isNull()).count() > 0


def test_salted_join_rejects_outer(spark, skewed):
    dim = spark.createDataFrame([("hot", 1)], "key string, mult int")
    with pytest.raises(ValueError):
        skew.salted_join(skewed, dim, on=["key"], how="full")


def test_two_phase_distinct_matches_count_distinct(spark, skewed):
    got = skew.two_phase_distinct(skewed, ["key"], "val", "n_vals")
    want = skewed.groupBy("key").agg(
        F.count_distinct("val").alias("n_vals")
    )
    cols = ["key", "n_vals"]
    assert _rows(got, cols) == _rows(want, cols)


def test_salted_join_shuffles_on_key_and_salt(spark, skewed):
    """The point of the salt: the exchange must hash on (key, salt), not
    key alone — assert the partitioning expressions in the plan."""
    dim = spark.createDataFrame([("hot", 1)], "key string, mult int")
    # at test scale the dim side broadcasts (no exchange at all); force
    # the shuffle path to observe the salted partitioning
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            skew.salted_join(
                skewed, dim, on=["key"], n_salts=4, salt_cols=["id"]
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    import re

    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("key" in p and "__salt" in p for p in parts), plan


def test_salted_join_rejects_key_derived_salt(spark, skewed):
    """ADVICE r02: a salt derived only from the join keys is constant
    per key — zero skew spreading — so it is rejected, not silently
    accepted."""
    dim = spark.createDataFrame([("hot", 1)], "key string, mult int")
    with pytest.raises(ValueError, match="salt_cols"):
        skew.salted_join(skewed, dim, on=["key"], salt_cols=["key"])


def test_salted_join_rejects_keys_only_big_side_default(spark, skewed):
    """ADVICE r03: when the big side carries ONLY the join-key columns,
    the derived default salt is per-key-constant too — same silent
    no-op the explicit-salt guard rejects, so the default path must
    raise as well."""
    dim = spark.createDataFrame([("hot", 1)], "key string, mult int")
    with pytest.raises(ValueError, match="salt"):
        skew.salted_join(skewed.select("key"), dim, on=["key"])


def test_salted_join_default_salt_spreads_and_matches(spark, skewed):
    """Default (no salt_cols): salt derives from all big-side columns —
    result identical to the plain join, and the hot key occupies more
    than one salt value."""
    dim = spark.createDataFrame(
        [("hot", 1), ("cold", 2)], "key string, mult int"
    )
    got = skew.salted_join(skewed, dim, on=["key"], n_salts=8)
    want = skewed.join(dim, "key")
    cols = ["key", "id", "mult"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )
    n_salts_used = (
        skew.with_salt(skewed, 8, list(skewed.columns))
        .where(F.col("key") == "hot")
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_salts_used > 1
