"""Multimodal plumbing: binary payload columns, typed metadata, stubbed
decode with real Arrow batch shapes, frame sampling with lineage."""

import hashlib

import numpy as np
import pytest

from pyspark.sql import functions as F

from kelos_on_kafka_spark.operators.multimodal import (
    _decode_audio,
    _decode_image,
    attach_media_metadata,
    extract_image_features,
    sample_video_frames,
)


@pytest.fixture()
def media(spark):
    rows = [
        (i, "image", bytes(hashlib.sha256(str(i).encode()).digest() * 8))
        for i in range(20)
    ]
    return spark.createDataFrame(
        rows, schema="asset_id long, media_type string, payload binary"
    )


def test_metadata_is_jvm_side_and_exact(spark, media):
    out = attach_media_metadata(media).orderBy("asset_id").collect()
    for r in out:
        assert r.n_bytes == 256
        assert r.checksum == hashlib.md5(bytes(r.payload)).hexdigest()
    # no Python stage in the plan: metadata are built-in expressions
    plan = attach_media_metadata(media)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEvalPython" not in plan


def test_image_features_deterministic_shape(spark, media):
    out = extract_image_features(media).orderBy("asset_id").collect()
    assert len(out) == 20
    for r in out:
        assert 64 <= r.width <= 64 + 255
        assert 64 <= r.height <= 64 + 255
        assert len(r.embedding) == 8
        assert all(0.0 <= v <= 1.0 for v in r.embedding)
    # determinism + parallelism independence
    out8 = (
        extract_image_features(media.repartition(8))
        .orderBy("asset_id")
        .collect()
    )
    assert [(r.width, r.height, tuple(r.embedding)) for r in out] == [
        (r.width, r.height, tuple(r.embedding)) for r in out8
    ]


def test_image_decode_matches_local_stub(spark, media):
    row = media.orderBy("asset_id").first()
    w, h, emb = _decode_image(bytes(row.payload))
    got = (
        extract_image_features(media)
        .where(F.col("asset_id") == row.asset_id)
        .first()
    )
    assert (got.width, got.height) == (w, h)
    assert tuple(got.embedding) == tuple(emb)


def test_frame_sampling_lineage(spark, media):
    frames = sample_video_frames(media, every_ms=500, max_frames=4)
    rows = frames.orderBy("asset_id", "frame_index").collect()
    per_asset = {}
    for r in rows:
        per_asset.setdefault(r.asset_id, []).append(r)
    assert set(per_asset) == set(range(20))
    for aid, fr in per_asset.items():
        assert [f.frame_index for f in fr] == list(range(len(fr)))
        assert [f.frame_ts_ms for f in fr] == [
            i * 500 for i in range(len(fr))
        ]
        assert all(len(bytes(f.frame)) == 32 for f in fr)


def test_audio_decode_is_deterministic_and_digest_derived():
    sr, dur, n, spec = _decode_audio(b"\x00\x01")
    assert (sr, dur, n) == _decode_audio(b"\x00\x01")[:3]
    assert sr in (8000, 16000, 22050, 44100)
    assert 100 <= dur <= 100 + 0xFFFF
    assert n == sr * dur // 1000
    assert len(spec) == 8 and all(0.0 <= v <= 1.0 for v in spec)
    digest = hashlib.sha256(b"\x00\x01").digest()
    assert sr == (8000, 16000, 22050, 44100)[digest[0] % 4]
    assert dur == 100 + (digest[1] << 8 | digest[2])


def test_extract_audio_features_plumbing(spark, media):
    from kelos_on_kafka_spark.operators.multimodal import (
        extract_audio_features,
    )

    out = extract_audio_features(media).orderBy("asset_id").collect()
    assert len(out) == 20
    for row in out:
        payload = bytes(
            hashlib.sha256(str(row.asset_id).encode()).digest() * 8
        )
        sr, dur, n, spec = _decode_audio(payload)
        assert (row.sample_rate, row.duration_ms, row.n_samples) == (
            sr,
            dur,
            n,
        )
        assert tuple(row.spectrum) == tuple(spec)
