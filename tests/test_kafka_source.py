"""Kafka record parsing (no broker in the sandbox: the parse functions
run on batch DataFrames with Kafka's exact record shape)."""

import json
import struct

import pytest

from pyspark.sql import functions as F

from kelos_on_kafka_spark.sources.kafka import parse_point_records


def _records(spark, rows):
    return spark.createDataFrame(
        rows, schema="key binary, value binary, timestamp timestamp"
    )


def test_parse_json_records(spark):
    import datetime

    ts = datetime.datetime(2024, 1, 1, 0, 0, 10)
    rows = [
        (
            str(i).encode(),
            json.dumps({"id": i, "features": [0.5 * i, -1.25, 3.0]}).encode(),
            ts,
        )
        for i in range(5)
    ]
    out = parse_point_records(_records(spark, rows), "json").orderBy("id").collect()
    assert [r.id for r in out] == list(range(5))
    assert out[3].features == [1.5, -1.25, 3.0]
    assert out[0].ts == ts


def test_parse_reference_binary_records(spark):
    """The reference's wire format: big-endian int32 key, big-endian
    float64 array value (InputProducer.java:67 + ArrayListSerializer)."""
    import datetime

    ts = datetime.datetime(2024, 1, 1, 0, 0, 20)
    vecs = [[0.25, -3.5], [1.0e-3, 2.0], [-0.0, 7.125]]
    rows = [
        (
            struct.pack(">i", i + 41),
            b"".join(struct.pack(">d", v) for v in vec),
            ts,
        )
        for i, vec in enumerate(vecs)
    ]
    out = (
        parse_point_records(_records(spark, rows), "reference")
        .orderBy("id")
        .collect()
    )
    assert [r.id for r in out] == [41, 42, 43]
    for r, vec in zip(out, vecs):
        assert r.features == vec  # bit-exact IEEE754 round-trip


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError):
        parse_point_records(_records(spark, []), "protobuf")


def _points(spark):
    import math

    rows = [
        (7, [0.25, -3.5, 1.0e-300]),
        (123456, [-0.0, math.inf, 7.125]),
        (0, [math.nan, 1.0, -2.0]),
    ]
    return spark.createDataFrame(
        [(i, None, v) for i, v in rows],
        schema="id long, ts timestamp, features array<double>",
    )


@pytest.mark.parametrize("fmt", ["json", "reference"])
def test_serialize_parse_round_trip(spark, fmt):
    """serialize_point_records is the exact inverse of
    parse_point_records (bit-level for the reference layout, incl. NaN
    raw bits and signed zero)."""
    from kelos_on_kafka_spark.sources.kafka import serialize_point_records

    pts = _points(spark)
    wire = serialize_point_records(pts, fmt).withColumn(
        "timestamp", F.lit(None).cast("timestamp")
    )
    back = parse_point_records(wire, fmt).orderBy("id").collect()
    want = sorted(pts.collect(), key=lambda r: r.id)
    assert [r.id for r in back] == [r.id for r in want]
    for b, w in zip(back, want):
        for x, y in zip(b.features, w.features):
            if x != x:  # NaN
                assert y != y
            else:
                assert x == y and str(x) == str(y)  # catches -0.0 vs 0.0


def test_reference_key_layout_matches_struct_pack(spark):
    from kelos_on_kafka_spark.sources.kafka import serialize_point_records

    wire = (
        serialize_point_records(_points(spark), "reference")
        .orderBy(F.length("key"))
        .collect()
    )
    keys = sorted(bytes(r.key) for r in wire)
    assert keys == sorted(
        struct.pack(">i", i) for i in (7, 123456, 0)
    )
    # value layout: concatenated 8-byte big-endian doubles
    by_key = {bytes(r.key): bytes(r.value) for r in wire}
    assert by_key[struct.pack(">i", 7)] == b"".join(
        struct.pack(">d", v) for v in (0.25, -3.5, 1.0e-300)
    )
