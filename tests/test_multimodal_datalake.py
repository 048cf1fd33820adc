"""Multimodal plumbing + datalake translation tests."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from redpanda_spark.engine import TopicConfig, TopicEngine
from redpanda_spark.functions.multimodal import (
    audio_metadata,
    frame_sample,
    image_features,
    image_metadata,
)
from redpanda_spark.sources.datalake import translate_json_topic, write_datalake


def media_df(spark, n=6):
    rows = [Row(media_id=i, payload=bytes([i]) * (50 + i)) for i in range(n)]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_image_metadata_schema_and_determinism(spark):
    df = media_df(spark)
    out1 = image_metadata(df).collect()
    out2 = image_metadata(df).collect()
    assert len(out1) == 6
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))  # deterministic
    r = out1[0]
    assert r["width"] == 8 and r["height"] == 8 and r["channels"] == 3
    assert len(r["sha256"]) == 64


def test_image_features(spark):
    out = image_features(media_df(spark)).collect()
    assert len(out) == 6
    for r in out:
        assert 0.0 <= r["mean_luma"] <= 255.0
        assert 0.0 <= r["edge_density"] <= 1.0


def test_audio_metadata(spark):
    out = audio_metadata(media_df(spark)).collect()
    for r in out:
        assert r["sample_rate"] == 16000
        assert r["n_samples"] == 16
        assert r["duration_s"] == 0.001


def test_frame_sample_expands_rows(spark):
    out = frame_sample(media_df(spark, 3), every_n=2, n_frames=4).collect()
    assert len(out) == 12  # 3 media × 4 frames
    idxs = sorted({r["frame_idx"] for r in out})
    assert idxs == [0, 2, 4, 6]
    assert all(isinstance(bytes(r["frame"]), bytes) for r in out)


def test_null_payloads_skipped(spark):
    df = spark.createDataFrame(
        [Row(media_id=1, payload=b"x" * 10), Row(media_id=2, payload=None)],
        "media_id long, payload binary",
    )
    assert image_metadata(df).count() == 1


def test_datalake_translation_roundtrip(spark, tmp_path):
    engine = TopicEngine(spark, str(tmp_path / "topics"))
    engine.create_topic("ev", TopicConfig(partitions=2))
    import json

    recs = [
        Row(
            key=f"u{i}".encode(),
            value=json.dumps(
                {"event_id": f"e{i}", "user_id": i, "event_type": "view", "amount": i * 1.5}
            ).encode(),
        )
        for i in range(8)
    ]
    engine.produce(
        "ev",
        spark.createDataFrame(recs, "key binary, value binary").withColumn(
            "timestamp", F.to_timestamp(F.lit("2024-01-01 10:30:00"))
        ),
    )
    typed = translate_json_topic(
        engine.log("ev"),
        "event_id string, user_id long, event_type string, amount double",
    )
    rows = typed.collect()
    assert len(rows) == 8
    r = rows[0]
    assert r["redpanda"]["offset"] is not None and r["redpanda"]["key"] is not None
    assert r["event_type"] == "view"
    assert str(r["_hour"]) == "2024-01-01 10:00:00"

    out = str(tmp_path / "lake")
    write_datalake(typed, out)
    back = spark.read.parquet(out)
    assert back.count() == 8
    assert "_hour" in back.columns  # partition column survives


def test_image_resize_layout(spark):
    from redpanda_spark.functions.multimodal import image_resize

    df = media_df(spark)
    out = image_resize(df, width=4, height=4).collect()
    assert len(out) == 6
    for r in out:
        assert r["width"] == 4 and r["height"] == 4
        assert len(bytes(r["pixels"])) == 4 * 4 * 3  # HxWxC uint8
    # deterministic
    again = image_resize(df, width=4, height=4).collect()
    assert sorted(bytes(r["pixels"]) for r in out) == sorted(
        bytes(r["pixels"]) for r in again
    )
