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
