"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed through Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing — schemas, batch shapes, partition sizing, UDF
signatures — is real and tested; the codec calls themselves are STUBBED
(`NotImplementedError` or a deterministic fake) because no image/audio
libraries exist in this environment. Swap `_decode_image_real` etc. with
Pillow/torchaudio/PyAV on a real cluster; nothing else changes.

Scale notes: binary payloads dominate I/O — keep them in their own column so
column pruning skips them unless the stage needs bytes; repartition by size
budget (``target_batch_mb``) before decode so one Arrow batch stays within
executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("format", T.StringType()),
])

AUDIO_META_SCHEMA = T.StructType([
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("format", T.StringType()),
])


def _decode_image_real(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "image codec not available in this environment — plug Pillow/cv2 here")


def _decode_image_fake(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Deterministic stand-in: pixels derived from the payload digest, so
    downstream feature math is real and reproducible."""
    digest = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
    return rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)


def image_features(
    df: DataFrame, *, payload_col: str = "payload", meta_col: str = "meta",
    use_fake_codec: bool = True,
) -> DataFrame:
    """Decode → per-channel mean/std + 8-bucket luminance histogram.

    One mapInPandas pass; output drops the payload (features only), so the
    binary column never shuffles.
    """
    schema = (
        f"{', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields if f.name != payload_col)}, "
        "chan_mean array<double>, chan_std array<double>, lum_hist array<double>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, stds, hists = [], [], []
            for payload, meta in zip(pdf[payload_col], pdf[meta_col]):
                if use_fake_codec:
                    img = _decode_image_fake(
                        payload, meta["width"], meta["height"], meta["channels"])
                else:
                    img = _decode_image_real(payload)
                px = img.reshape(-1, img.shape[-1]).astype(np.float64)
                means.append(px.mean(axis=0))
                stds.append(px.std(axis=0))
                lum = px.mean(axis=1)
                hist, _ = np.histogram(lum, bins=8, range=(0, 256))
                hists.append(hist / max(len(lum), 1))
            out = pdf.drop(columns=[payload_col]).copy()
            out["chan_mean"] = means
            out["chan_std"] = stds
            out["lum_hist"] = hists
            yield out

    return df.mapInPandas(run, schema)


def resize_images(
    df: DataFrame, *, payload_col: str = "payload", meta_col: str = "meta",
    target: tuple[int, int] = (64, 64), use_fake_codec: bool = True,
) -> DataFrame:
    """Decode → nearest-neighbor resize → re-emit raw bytes + updated meta.
    Demonstrates the binary-in/binary-out stage shape."""
    schema = df.schema.simpleString()[7:-1]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        th, tw = target
        for pdf in batches:
            payloads, metas = [], []
            for payload, meta in zip(pdf[payload_col], pdf[meta_col]):
                if use_fake_codec:
                    img = _decode_image_fake(
                        payload, meta["width"], meta["height"], meta["channels"])
                else:
                    img = _decode_image_real(payload)
                ys = (np.arange(th) * img.shape[0] // th)
                xs = (np.arange(tw) * img.shape[1] // tw)
                resized = img[ys][:, xs]
                payloads.append(resized.tobytes())
                metas.append({"width": tw, "height": th,
                              "channels": meta["channels"], "format": "raw"})
            out = pdf.copy()
            out[payload_col] = payloads
            out[meta_col] = metas
            yield out

    return df.mapInPandas(run, schema)


def frame_sample(
    df: DataFrame, *, payload_col: str = "payload", n_frames_col: str = "n_frames",
    every: int = 10,
) -> DataFrame:
    """Video frame sampling stub: emits (row × sampled frame_index) with a
    deterministic frame digest — the explode/partition shape of a real
    frame-sampler, without a codec."""
    out_schema = (
        f"{', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields if f.name != payload_col)}, "
        "frame_index int, frame_digest string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            base = pdf.drop(columns=[payload_col])
            for i in range(len(pdf)):
                n = int(pdf[n_frames_col].iloc[i])
                payload = pdf[payload_col].iloc[i]
                for fi in range(0, n, every):
                    digest = hashlib.sha256(payload + fi.to_bytes(4, "big")).hexdigest()[:16]
                    rows.append({**base.iloc[i].to_dict(),
                                 "frame_index": fi, "frame_digest": digest})
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=[*base.columns, "frame_index", "frame_digest"])

    return df.mapInPandas(run, out_schema)


def synthetic_image_table(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake multimodal table for tests/benchmarks:
    (item_id, payload binary, meta struct)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w, h = int(rng.integers(16, 48)), int(rng.integers(16, 48))
        payload = rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
        rows.append((i, bytearray(payload), {"width": w, "height": h,
                                             "channels": 3, "format": "fake"}))
    schema = T.StructType([
        T.StructField("item_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", IMAGE_META_SCHEMA),
    ])
    return spark.createDataFrame(rows, schema)
