"""JSON extraction operators (operators/semistruct.py)."""

from kelos_on_kafka_spark.operators import semistruct


def test_json_long_extraction_and_nulls(spark):
    rows = [
        (1, '{"k": 7}'),
        (2, '{"k": 0, "other": "x"}'),
        (3, '{"other": 1}'),   # field missing -> NULL
        (4, "not json"),       # unparseable -> NULL
        (5, None),             # NULL blob -> NULL
    ]
    df = spark.createDataFrame(rows, "id long, props string")
    got = {
        r.id: r.v
        for r in df.select(
            "id", semistruct.json_long("props", "k").alias("v")
        ).collect()
    }
    assert got == {1: 7, 2: 0, 3: None, 4: None, 5: None}


def test_props_stats_rollup(spark):
    rows = [
        ("a", '{"k": 1}'),
        ("a", '{"k": 5}'),
        ("a", '{"nope": 1}'),
        ("b", '{"k": 10}'),
    ]
    df = spark.createDataFrame(rows, "event_type string, props string")
    got = {
        r.grp: (r.n_rows, r.n_with_field, r.sum_v, r.min_v, r.max_v)
        for r in semistruct.props_stats(df).collect()
    }
    assert got == {"a": (3, 2, 6, 1, 5), "b": (1, 1, 10, 10, 10)}
