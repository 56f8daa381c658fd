"""WARC (Web ARChive, ISO 28500) record parsing — the Common-Crawl
ingestion seam: crawl archives arrive as concatenated WARC records in
large binary segments; this turns a DataFrame of such segments into the
engine's page-table shape ``(url, warc_ts, html, ...)``.

Format handled (the subset Common Crawl emits): each record is

    WARC/1.0\\r\\n
    <Header-Name>: <value>\\r\\n ...          (WARC-Target-URI,
    WARC-Date, WARC-Type, Content-Length, ...)
    \\r\\n
    <Content-Length bytes of payload>\\r\\n\\r\\n

Parsing is per-segment imperative byte work, so it runs in
``mapInPandas`` (Arrow-batched; one Python pass per segment — the same
boundary the multimodal decoders use).  Everything downstream is
ordinary relational: the emitted table joins/filters/dedups like any
page table.  Gzip member framing (Common Crawl stores one gzip member
per record) is handled when the segment starts with the gzip magic.

Scale shape: segments are the parallelism unit (Common Crawl's ~1 GB
WARC files → one task each under binaryFile/blob sources); records
never shuffle during parsing — the explode happens inside the map, and
malformed records are skipped with a per-segment error count rather
than failing the job (crawl archives always contain damage).

Reference surface: none (the reference reads pre-vectorized CSV,
InputProducer.java:40-68); this is the web-corpus generalization's
ingestion layer.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("segment_id", StringType()),
        StructField("record_idx", LongType()),
        StructField("warc_type", StringType()),
        StructField("url", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", BinaryType()),
        # per-SEGMENT malformed-record count, stamped on every row of
        # the segment (constant within a segment — the segment_ prefix
        # says so: aggregate with max()/any_value() per segment, never
        # sum() over rows); a segment whose records are ALL malformed
        # emits one __audit__ sentinel row so the count is never
        # silently lost
        StructField("segment_bad_records", LongType()),
    ]
)

AUDIT_SENTINEL_TYPE = "__audit__"

_GZIP_MAGIC = b"\x1f\x8b"


def _split_members(blob: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip blob, or pass through
    plain bytes."""
    if not blob.startswith(_GZIP_MAGIC):
        return blob
    out = io.BytesIO()
    with gzip.GzipFile(fileobj=io.BytesIO(blob)) as gz:
        # GzipFile reads across members transparently
        while True:
            chunk = gz.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
    return out.getvalue()


def parse_warc_bytes(blob: bytes) -> tuple[list[dict], int]:
    """Parse one segment's bytes into record dicts; returns
    (records, n_malformed).  Pure function — unit-testable without
    Spark, and the single implementation the Spark operator wraps."""
    data = _split_members(blob)
    records: list[dict] = []
    bad = 0
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            bad += 1
            nxt = data.find(b"WARC/", pos + 1)
            if nxt == -1:
                break
            pos = nxt
            continue
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end == -1:
            bad += 1
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            if b":" in line:
                k, _, v = line.partition(b":")
                headers[k.decode("ascii", "replace").strip().lower()] = (
                    v.decode("utf-8", "replace").strip()
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            bad += 1
            pos = hdr_end + 4
            continue
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end > n:
            bad += 1
            break
        records.append(
            {
                "record_idx": len(records),
                "warc_type": headers.get("warc-type", ""),
                "url": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "content_length": clen,
                "payload": data[body_start:body_end],
            }
        )
        pos = body_end
    return records, bad


def parse_warc_segments(
    segments: DataFrame,
    id_col: str = "path",
    blob_col: str = "content",
) -> DataFrame:
    """Explode a DataFrame of WARC segments (e.g. from
    ``spark.read.format('binaryFile')``) into one row per WARC record.
    Malformed records are skipped (resynchronizing on the next
    ``WARC/`` marker) and COUNTED: every emitted row carries its
    segment's ``segment_bad_records`` total, and a segment that parses to zero
    records but nonzero damage emits one ``warc_type='__audit__'``
    sentinel row (record_idx=-1, null url/payload) so no corruption is
    silently dropped — ``groupBy(segment_id).max(segment_bad_records)`` is the
    corpus damage audit.  ``warc_to_pages`` filters to
    ``warc_type='response'`` so sentinels never reach the page table."""
    import pyspark.sql.functions as F

    src = segments.select(
        F.col(id_col).cast("string").alias("segment_id"),
        F.col(blob_col).alias("blob"),
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for seg_id, blob in zip(pdf["segment_id"], pdf["blob"]):
                recs, bad = parse_warc_bytes(bytes(blob))
                for r in recs:
                    r["segment_id"] = seg_id
                    r["segment_bad_records"] = bad
                    rows.append(r)
                if not recs and bad:
                    rows.append(
                        {
                            "segment_id": seg_id,
                            "record_idx": -1,
                            "warc_type": AUDIT_SENTINEL_TYPE,
                            "url": None,
                            "warc_date": None,
                            "content_length": 0,
                            "payload": None,
                            "segment_bad_records": bad,
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)[
                    [f.name for f in WARC_SCHEMA.fields]
                ]

    return src.mapInPandas(parse, schema=WARC_SCHEMA)


def warc_to_pages(records: DataFrame) -> DataFrame:
    """Project WARC response records into the engine's page-table shape
    ``(url, warc_ts, html)`` — feed ``functions.features.featurize_pages``
    (text extraction happens there; at deployment plug the real HTML →
    text step into that seam)."""
    import pyspark.sql.functions as F

    return records.where(F.col("warc_type") == "response").select(
        "url",
        F.to_timestamp(F.col("warc_date")).alias("warc_ts"),
        F.col("payload").alias("html"),
    )
