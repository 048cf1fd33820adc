"""Multimodal plumbing + datalake translation tests."""

from __future__ import annotations

import numpy as np
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


# -- real-codec golden tests -------------------------------------------------


def _png_encode(arr, filters):
    """Minimal straight-line PNG writer (test-only): one filter type per
    scanline, spec-computed filtered bytes — so the decoder under test is
    checked against independently constructed real PNG bytes."""
    import struct
    import zlib

    h, w, c = arr.shape
    color = {1: 0, 3: 2, 4: 6}[c]
    a32 = arr.astype(np.int32)
    raw = b""
    for y in range(h):
        f = filters[y % len(filters)]
        row = a32[y].reshape(-1)
        prev = a32[y - 1].reshape(-1) if y else np.zeros(w * c, np.int32)
        left = np.concatenate([np.zeros(c, np.int32), row[:-c]])
        upleft = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
        if f == 0:
            filt = row
        elif f == 1:
            filt = row - left
        elif f == 2:
            filt = row - prev
        elif f == 3:
            filt = row - (left + prev) // 2
        else:  # paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = row - pred
        raw += bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes()

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decode_png_real_bytes_all_filters():
    from redpanda_spark.functions.multimodal import decode_png

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        png = _png_encode(arr, filters)
        got = decode_png(png)
        assert got.shape == (5, 4, 3)
        assert np.array_equal(got, arr), f"filters={filters}"
    # grayscale path
    g = rng.integers(0, 256, size=(3, 7, 1), dtype=np.uint8)
    assert np.array_equal(decode_png(_png_encode(g, [4, 2])), g)


def test_decode_wav_real_bytes():
    import io
    import wave

    from redpanda_spark.functions.multimodal import decode_wav

    t = np.arange(800)
    left = (np.sin(2 * np.pi * 440 * t / 8000) * 20000).astype("<i2")
    right = (np.cos(2 * np.pi * 440 * t / 8000) * 10000).astype("<i2")
    inter = np.empty(1600, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(inter.tobytes())
    samples, sr = decode_wav(buf.getvalue())
    assert sr == 8000 and len(samples) == 800
    expect = (left.astype(np.float32) + right.astype(np.float32)) / 2 / 32768.0
    assert np.allclose(samples, expect, atol=1e-6)


def test_image_metadata_with_real_png_fixture(spark):
    """The mm_image_metadata operator run over an actual PNG payload
    reports its true geometry — proving the Spark path decodes real
    bytes, not just the deterministic fake."""
    from redpanda_spark.functions.multimodal import image_metadata, image_resize

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    png = _png_encode(arr, [0, 1, 2, 3, 4])
    media = spark.createDataFrame(
        [(1, bytearray(png))], "media_id long, payload binary"
    )
    row = image_metadata(media).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (9, 6, 3)
    assert row["format"] == "png"
    import hashlib

    assert row["sha256"] == hashlib.sha256(png).hexdigest()
    rz = image_resize(media, width=3, height=2).collect()[0]
    got = np.frombuffer(rz["pixels"], dtype=np.uint8).reshape(2, 3, 3)
    yi = (np.arange(2) * 6 // 2).astype(int)
    xi = (np.arange(3) * 9 // 3).astype(int)
    assert np.array_equal(got, arr[yi][:, xi])


def test_audio_metadata_with_real_wav_fixture(spark):
    import io
    import wave

    from redpanda_spark.functions.multimodal import audio_metadata

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(np.zeros(3200, dtype="<i2").tobytes())
    wav = buf.getvalue()
    media = spark.createDataFrame(
        [(7, bytearray(wav))], "media_id long, payload binary"
    )
    row = audio_metadata(media).collect()[0]
    assert row["sample_rate"] == 16000
    assert row["n_samples"] == 3200
    assert abs(row["duration_s"] - 0.2) < 1e-9


def test_y4m_roundtrip_real_bytes():
    import numpy as np

    from redpanda_spark.functions.multimodal import decode_y4m, encode_y4m

    frames = [np.arange(64, dtype=np.uint8).reshape(8, 8) + i for i in range(5)]
    payload = encode_y4m(frames, fps=(30, 1))
    out, w, h, fps, cs = decode_y4m(payload)
    assert (w, h, fps, cs) == (8, 8, (30, 1), "mono")
    assert len(out) == 5
    for i, f in enumerate(out):
        assert f == frames[i].tobytes()


def test_y4m_420_frame_sizing_and_errors():
    import pytest

    from redpanda_spark.functions.multimodal import decode_y4m

    # 4:2:0 chroma: frame blob = w*h*3/2; default colorspace when no C tag
    y = bytes(range(16))  # 4x4 luma
    uv = bytes(8)  # two 2x2 chroma planes (4 bytes each)
    p = b"YUV4MPEG2 W4 H4 F25:1\nFRAME\n" + y + uv
    frames, w, h, fps, cs = decode_y4m(p)
    assert (w, h, cs) == (4, 4, "420jpeg")
    assert frames == [y + uv]
    with pytest.raises(ValueError):
        decode_y4m(b"RIFF not a y4m")
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W4 H4\nFRAME\n" + y)  # truncated 420 frame
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W4 H4 Cmono\nXXXXX\n" + y)  # bad marker


def test_frame_sample_real_y4m(spark):
    import numpy as np
    from pyspark.sql import Row

    from redpanda_spark.functions.multimodal import encode_y4m, frame_sample

    frames = [np.full((2, 3), 10 * i, dtype=np.uint8) for i in range(6)]
    df = spark.createDataFrame(
        [Row(media_id=7, payload=bytearray(encode_y4m(frames)))]
    )
    out = {r["frame_idx"]: bytes(r["frame"]) for r in
           frame_sample(df, every_n=2, n_frames=2).collect()}
    # real plane bytes at sampled indices 0 and 2, capped at n_frames=2
    assert set(out) == {0, 2}
    assert out[0] == frames[0].tobytes()
    assert out[2] == frames[2].tobytes()


def test_video_metadata_real_y4m(spark):
    import numpy as np
    from pyspark.sql import Row

    from redpanda_spark.functions.multimodal import encode_y4m, video_metadata

    payload = encode_y4m([np.zeros((4, 6), dtype=np.uint8)] * 3, fps=(24, 1))
    df = spark.createDataFrame([Row(media_id=1, payload=bytearray(payload))])
    r = video_metadata(df).first()
    assert (r["width"], r["height"], r["n_frames"]) == (6, 4, 3)
    assert (r["fps_num"], r["fps_den"], r["colorspace"]) == (24, 1, "mono")


def test_audio_metadata_real_wav(spark):
    import numpy as np
    from pyspark.sql import Row

    from redpanda_spark.functions.multimodal import audio_metadata, encode_wav

    samples = (np.arange(4000) % 100 - 50).astype("<i2")
    df = spark.createDataFrame(
        [Row(media_id=3, payload=bytearray(encode_wav(samples, 16000)))]
    )
    r = audio_metadata(df).first()
    assert (r["sample_rate"], r["n_samples"]) == (16000, 4000)
    assert abs(r["duration_s"] - 0.25) < 1e-9


def test_video_metadata_corrupt_payload_is_null_row(spark):
    from pyspark.sql import Row

    from redpanda_spark.functions.multimodal import video_metadata

    df = spark.createDataFrame(
        [Row(media_id=1, payload=bytearray(b"not a y4m stream"))]
    )
    r = video_metadata(df).first()
    assert r["media_id"] == 1
    assert all(
        r[c] is None
        for c in ("width", "height", "n_frames", "fps_num", "fps_den", "colorspace")
    )


def test_jpeg_codec_roundtrip():
    import numpy as np

    from redpanda_spark.functions.jpeg_codec import decode_jpeg, encode_jpeg

    # smooth grayscale survives q95 exactly
    gray = np.tile(np.arange(16, dtype=np.uint8) * 16, (16, 1))
    out = decode_jpeg(encode_jpeg(gray, quality=95))
    assert out.shape == (16, 16, 1)
    assert np.abs(out[..., 0].astype(int) - gray.astype(int)).max() <= 1

    # flat RGB regions, non-multiple-of-8 dims
    img = np.zeros((24, 40, 3), dtype=np.uint8)
    img[:12] = [200, 30, 30]
    img[12:] = [20, 60, 220]
    out = decode_jpeg(encode_jpeg(img, quality=92))
    assert out.shape == (24, 40, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4

    # random noise: lossy but bounded mean error, odd dims stress padding
    rng = np.random.default_rng(7)
    noisy = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noisy, quality=85))
    assert out.shape == (17, 23, 3)
    assert np.abs(out.astype(int) - noisy.astype(int)).mean() < 16


def test_image_metadata_real_jpeg(spark):
    import numpy as np
    from pyspark.sql import Row

    from redpanda_spark.functions.jpeg_codec import encode_jpeg
    from redpanda_spark.functions.multimodal import image_metadata

    img = np.full((10, 14, 3), 77, dtype=np.uint8)
    df = spark.createDataFrame(
        [Row(media_id=5, payload=bytearray(encode_jpeg(img)))]
    )
    r = image_metadata(df).first()
    assert (r["width"], r["height"], r["channels"], r["format"]) == (14, 10, 3, "jpeg")


def test_encode_png_roundtrips_through_decoder():
    import numpy as np

    from redpanda_spark.functions.multimodal import decode_png, encode_png

    rng = np.random.RandomState(3)
    gray = rng.randint(0, 256, (12, 11), dtype=np.uint8)
    rgb = rng.randint(0, 256, (7, 9, 3), dtype=np.uint8)
    out_g = decode_png(encode_png(gray))
    assert out_g.squeeze().tolist() == gray.tolist()
    out_rgb = decode_png(encode_png(rgb))
    assert out_rgb.tolist() == rgb.tolist()


def test_image_near_dups_perceptual(spark):
    """dHash dedup: exact copies pair at hamming 0, a uniformly
    brightened copy still pairs (gradient signs survive), unrelated
    patterns don't pair."""
    import numpy as np

    from redpanda_spark.functions.multimodal import encode_png, image_near_dups

    rng = np.random.RandomState(11)
    base = rng.randint(0, 200, (32, 32), dtype=np.uint8)
    other = rng.randint(0, 200, (32, 32), dtype=np.uint8)
    bright = np.clip(base.astype(int) + 30, 0, 255).astype(np.uint8)
    rows = [
        (1, bytearray(encode_png(base))),
        (2, bytearray(encode_png(base))),       # exact dup of 1
        (3, bytearray(encode_png(bright))),     # perceptual dup of 1
        (4, bytearray(encode_png(other))),      # unrelated
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dups(media, max_hamming=4).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_audio_near_dups_gain_invariant(spark):
    """Envelope fingerprint: a volume-scaled copy of a clip pairs with
    the original at hamming 0; an unrelated clip doesn't pair."""
    import numpy as np

    from redpanda_spark.functions.multimodal import audio_near_dups, encode_wav

    rng = np.random.RandomState(4)
    sr = 8000
    t = np.arange(sr * 2) / sr
    # amplitude-modulated tone -> distinctive energy envelope
    env = 0.2 + 0.8 * np.abs(np.sin(2 * np.pi * 1.3 * t))
    a = (np.sin(2 * np.pi * 440 * t) * env * 0.5).astype(np.float32)
    quiet = (a * 0.25).astype(np.float32)  # gain-scaled copy
    other = (rng.randn(sr * 2) * 0.3).astype(np.float32)
    rows = [
        (1, bytearray(encode_wav(a, sr))),
        (2, bytearray(encode_wav(quiet, sr))),
        (3, bytearray(encode_wav(other, sr))),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_near_dups(media, max_hamming=4).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 2
    assert not any(3 in p for p in pairs)
