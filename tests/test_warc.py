"""WARC segment parsing (sources/warc.py): synthetic ISO-28500 records
round-trip through the pure parser and the Spark operator, gzip framing
and malformed-record resync included."""

import gzip

import pytest
from pyspark.sql import functions as F

from kelos_on_kafka_spark.sources import warc


def _record(url: str, date: str, payload: bytes, wtype: str = "response"):
    head = (
        b"WARC/1.0\r\n"
        + f"WARC-Type: {wtype}\r\n".encode()
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"WARC-Date: {date}\r\n".encode()
        + f"Content-Length: {len(payload)}\r\n".encode()
        + b"\r\n"
    )
    return head + payload + b"\r\n\r\n"


def _segment(n=5, prefix="https://ex.org/p"):
    out = b""
    for i in range(n):
        out += _record(
            f"{prefix}{i}",
            f"2024-01-0{(i % 9) + 1}T00:00:0{i % 10}Z",
            f"<html>page {i}</html>".encode(),
            wtype="response" if i % 2 == 0 else "request",
        )
    return out


def test_pure_parser_roundtrip():
    recs, bad = warc.parse_warc_bytes(_segment(6))
    assert bad == 0 and len(recs) == 6
    assert recs[0]["url"] == "https://ex.org/p0"
    assert recs[0]["payload"] == b"<html>page 0</html>"
    assert recs[0]["warc_type"] == "response"
    assert recs[1]["warc_type"] == "request"
    assert recs[5]["content_length"] == len(b"<html>page 5</html>")


def test_pure_parser_gzip_and_damage_resync():
    good = _segment(3)
    # splice damage between two valid records: parser must resync
    damaged = good + b"GARBAGE NOT A RECORD\r\n" + _record(
        "https://ex.org/tail", "2024-02-01T00:00:00Z", b"<html>t</html>"
    )
    recs, bad = warc.parse_warc_bytes(damaged)
    assert len(recs) == 4 and bad == 1
    assert recs[3]["url"] == "https://ex.org/tail"
    # gzip framing
    recs_gz, bad_gz = warc.parse_warc_bytes(gzip.compress(good))
    assert bad_gz == 0
    assert [r["url"] for r in recs_gz] == [r["url"] for r in warc.parse_warc_bytes(good)[0]]


def test_spark_operator_explodes_segments(spark):
    rows = [("seg-a", _segment(4)), ("seg-b", gzip.compress(_segment(3, "https://b.org/q")))]
    df = spark.createDataFrame(rows, "path string, content binary")
    out = warc.parse_warc_segments(df)
    got = out.collect()
    assert len(got) == 7
    by_seg = {}
    for r in got:
        by_seg.setdefault(r.segment_id, []).append(r)
    assert len(by_seg["seg-a"]) == 4 and len(by_seg["seg-b"]) == 3
    assert all(r.payload.startswith(b"<html>") for r in got)

    pages = warc.warc_to_pages(out)
    prows = pages.collect()
    # responses only: ceil(4/2) + ceil(3/2)
    assert len(prows) == 2 + 2
    assert all(p.warc_ts is not None for p in prows)
    assert {c for c in pages.columns} == {"url", "warc_ts", "html"}


def test_spark_operator_surfaces_bad_record_counts(spark):
    """VERDICT r4 #7: the operator itself must quantify skipped
    records — every row carries its segment's segment_bad_records total, and an
    all-damage segment emits one __audit__ sentinel so its count
    survives."""
    good = _segment(3)
    damaged = (
        _segment(2, "https://d.org/x")
        + b"GARBAGE NOT A RECORD\r\n"
        + _record(
            "https://d.org/tail", "2024-02-01T00:00:00Z", b"<html>t</html>"
        )
        + b"TRAILING JUNK WITH NO MARKER"
    )
    all_bad = b"NOT WARC AT ALL"
    df = spark.createDataFrame(
        [("clean", good), ("dmg", damaged), ("junk", all_bad)],
        "path string, content binary",
    )
    out = warc.parse_warc_segments(df)
    per_seg = {
        r.segment_id: r
        for r in out.groupBy("segment_id")
        .agg(
            F.max("segment_bad_records").alias("bad"),
            F.count(F.lit(1)).alias("rows"),
        )
        .collect()
    }
    assert per_seg["clean"].bad == 0 and per_seg["clean"].rows == 3
    assert per_seg["dmg"].bad == 2 and per_seg["dmg"].rows == 3
    # all-damage segment: one audit sentinel row, nothing else
    assert per_seg["junk"].bad == 1 and per_seg["junk"].rows == 1
    sent = out.where(
        F.col("warc_type") == warc.AUDIT_SENTINEL_TYPE
    ).collect()
    assert [s.segment_id for s in sent] == ["junk"]
    assert sent[0].record_idx == -1 and sent[0].url is None
    # sentinels never reach the page table
    assert (
        warc.warc_to_pages(out)
        .where(F.col("url").isNull())
        .count()
        == 0
    )


def test_pages_flow_into_feature_extraction(spark):
    from kelos_on_kafka_spark.functions.features import featurize_pages

    df = spark.createDataFrame(
        [("seg", _segment(6))], "path string, content binary"
    )
    pages = warc.warc_to_pages(warc.parse_warc_segments(df)).withColumn(
        "text", F.col("html").cast("string")
    ).withColumn("lang", F.lit("en"))
    feats = featurize_pages(pages)
    rows = feats.collect()
    assert len(rows) == 3
    assert all(len(r.features) > 0 for r in rows)
