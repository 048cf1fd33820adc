"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design: media payloads are `binary` columns; decode / feature-extract /
resize / frame-sample run as Arrow-batched functions over ``mapInPandas``
so each executor processes whole record batches without driver involvement.
The Spark-side plumbing (schemas, batch iteration, partitioning) is real
and tested; the actual codec calls are stubbed behind ``_decode_image`` /
``_decode_audio`` (the container has no PIL/ffmpeg) with a deterministic
fake used by tests — swap the stub for the real library in production.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = (
    "media_id long, width int, height int, channels int, format string, sha256 string"
)
AUDIO_META_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, duration_s double, sha256 string"
)
IMAGE_FEATURES_SCHEMA = "media_id long, mean_luma double, edge_density double"
FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame png binary".replace(
    " png", ""
)


def _decode_image(payload: bytes) -> np.ndarray:
    """Decode image bytes → HxWxC uint8 array.

    STUB: no image codec in this container. Real deployments replace this
    with PIL/opencv. The deterministic fake derives an 8x8x3 array from the
    payload hash so tests exercise the full Spark path with stable values.
    """
    h = hashlib.sha256(payload).digest()
    side = 8
    arr = np.frombuffer((h * ((side * side * 3) // len(h) + 1))[: side * side * 3],
                        dtype=np.uint8)
    return arr.reshape(side, side, 3).copy()


def _decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """STUB audio decode → (mono float32 samples, sample_rate). Deterministic
    fake: 16 samples derived from the payload hash; production swaps in
    soundfile/ffmpeg."""
    h = hashlib.sha256(payload).digest()
    samples = np.frombuffer(h[:16], dtype=np.uint8).astype(np.float32) / 255.0
    return samples, 16000


def image_metadata(media: DataFrame, id_col: str = "media_id", bin_col: str = "payload") -> DataFrame:
    """(media_id, width, height, channels, format, sha256) per image."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[bin_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                arr = _decode_image(b)
                rows.append(
                    (
                        int(mid),
                        arr.shape[1],
                        arr.shape[0],
                        arr.shape[2],
                        _sniff_format(b),
                        hashlib.sha256(b).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "channels", "format", "sha256"],
            )

    return media.select(id_col, bin_col).mapInPandas(gen, IMAGE_META_SCHEMA)


def image_features(media: DataFrame, id_col: str = "media_id", bin_col: str = "payload") -> DataFrame:
    """Cheap visual features (mean luma, edge density) per image — the
    feature-extraction stage of a pretraining pipeline."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[bin_col]):
                if payload is None:
                    continue
                arr = _decode_image(bytes(payload)).astype(np.float32)
                luma = float(
                    (0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]).mean()
                )
                gy, gx = np.gradient(arr.mean(axis=2))
                edge = float((np.hypot(gx, gy) > 16).mean())
                rows.append((int(mid), round(luma, 6), round(edge, 6)))
            yield pd.DataFrame(rows, columns=["media_id", "mean_luma", "edge_density"])

    return media.select(id_col, bin_col).mapInPandas(gen, IMAGE_FEATURES_SCHEMA)


def audio_metadata(media: DataFrame, id_col: str = "media_id", bin_col: str = "payload") -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[bin_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                samples, sr = _decode_audio(b)
                rows.append(
                    (
                        int(mid),
                        sr,
                        len(samples),
                        round(len(samples) / sr, 6),
                        hashlib.sha256(b).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_samples", "duration_s", "sha256"],
            )

    return media.select(id_col, bin_col).mapInPandas(gen, AUDIO_META_SCHEMA)


def frame_sample(
    media: DataFrame,
    every_n: int = 2,
    n_frames: int = 4,
    id_col: str = "media_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Video frame sampling: emit every ``every_n``-th frame (stub frames are
    hash-derived slices — the flatMap row-expansion shape is the real part)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[bin_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                total = n_frames * every_n
                for i in range(0, total, every_n):
                    frame = hashlib.sha256(b + struct.pack("<i", i)).digest()
                    rows.append((int(mid), i, frame))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return media.select(id_col, bin_col).mapInPandas(gen, FRAME_SAMPLE_SCHEMA)


RESIZE_SCHEMA = "media_id long, width int, height int, pixels binary"


def image_resize(
    media: DataFrame,
    width: int = 4,
    height: int = 4,
    id_col: str = "media_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Decode → nearest-neighbor resize → raw pixel bytes, Arrow-batched.

    The resize kernel is pure numpy (index-grid sampling) on the decoded
    array, so the same code path serves the real decoder; production swaps
    `_decode_image` and (optionally) a higher-quality interpolator. Output
    pixels are C-order uint8 HxWxC bytes — the tensor-ready layout a
    training pipeline shuffles into batches.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[bin_col]):
                if payload is None:
                    continue
                arr = _decode_image(bytes(payload))
                h0, w0 = arr.shape[:2]
                yi = (np.arange(height) * h0 // height).astype(np.int64)
                xi = (np.arange(width) * w0 // width).astype(np.int64)
                out = arr[yi][:, xi]
                rows.append((int(mid), width, height, out.tobytes()))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "pixels"])

    return media.select(id_col, bin_col).mapInPandas(gen, RESIZE_SCHEMA)


def _sniff_format(b: bytes) -> str:
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if b[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if b[:4] == b"RIFF":
        return "riff"
    return "unknown"
