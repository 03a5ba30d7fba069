"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode/feature-extraction libraries (PIL/ffmpeg/torchcodec) do NOT
exist in this environment, so the *decoders are stubs* — clearly marked
and deterministic — while everything Spark-side is real and tested:
schemas, Arrow batch shapes, mapInPandas plumbing, partitioning.  On a
real cluster only `_decode_image_stub` / `_sample_frames_stub` are
swapped for library calls; the plan shape is unchanged.

Layout: media rows are (media_id, kind, payload: binary, meta struct);
the synthetic payload generator packs deterministic pseudo-pixels so
feature extraction has real bytes to chew on."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int,height:int,channels:int,sample_rate:int,n_frames:int>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, feat array<float>, feat_dim int"
)


def synth_media(spark, n: int = 100, partitions: int = None) -> DataFrame:
    """Deterministic fake media table (SplitMix64-seeded bytes)."""
    from ..sources.synth import _splitmix64

    rng_df = spark.range(0, n, 1, partitions or 4)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.uint64)
            rows = []
            for i in ids:
                kind = ["image", "audio", "video"][int(i) % 3]
                w, h, c = 8 + int(i) % 8, 8 + int(i) % 4, 3
                seed = _splitmix64(np.array([i], dtype=np.uint64))[0]
                nbytes = w * h * c if kind == "image" else 256
                payload = (
                    _splitmix64(np.uint64(seed) + np.arange(nbytes, dtype=np.uint64))
                    & np.uint64(0xFF)
                ).astype(np.uint8).tobytes()
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": kind,
                        "payload": payload,
                        "meta": {
                            "width": w,
                            "height": h,
                            "channels": c,
                            "sample_rate": 16000 if kind == "audio" else 0,
                            "n_frames": 16 if kind == "video" else 1,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return rng_df.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes, meta) -> np.ndarray:
    """STUB decoder: interprets the payload as raw HxWxC uint8.  A real
    deployment replaces this with PIL/turbojpeg decode.  Raises on
    size mismatch exactly like a real decoder would on corrupt data."""
    w, h, c = meta["width"], meta["height"], meta["channels"]
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) != w * h * c:
        raise ValueError("corrupt image payload: %d != %d" % (len(arr), w * h * c))
    return arr.reshape(h, w, c)


def _sample_frames_stub(payload: bytes, meta, every: int = 4) -> list:
    """STUB frame sampler (video): real impl would use ffmpeg/decord."""
    n = meta["n_frames"]
    return list(range(0, n, every))


def extract_features(media: DataFrame, batch_note: str = "mean-channel") -> DataFrame:
    """mapInPandas feature extraction: images → per-channel means +
    dims; audio → byte histogram moments; video → sampled-frame count
    vector.  All numpy over Arrow batches; the per-kind dispatch is the
    real plumbing a production extractor needs."""

    def run(batches):
        for pdf in batches:
            out = []
            for t in pdf.itertuples(index=False):
                meta = t.meta
                if t.kind == "image":
                    img = _decode_image_stub(t.payload, meta)
                    feat = [float(img[:, :, ch].mean()) / 255.0 for ch in range(meta["channels"])]
                    feat += [meta["width"] / 64.0, meta["height"] / 64.0]
                elif t.kind == "audio":
                    arr = np.frombuffer(t.payload, dtype=np.uint8).astype(np.float64)
                    feat = [float(arr.mean()) / 255.0, float(arr.std()) / 255.0]
                else:  # video
                    frames = _sample_frames_stub(t.payload, meta)
                    feat = [float(len(frames)), float(meta["n_frames"])]
                out.append(
                    {
                        "media_id": t.media_id,
                        "kind": t.kind,
                        "feat": [np.float32(x) for x in feat],
                        "feat_dim": len(feat),
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """mapInPandas image resize (nearest-neighbor, numpy) — the batch
    shape and schema of a real thumbnailing stage."""

    def run(batches):
        for pdf in batches:
            out = []
            for t in pdf.itertuples(index=False):
                if t.kind != "image":
                    continue
                meta = t.meta
                img = _decode_image_stub(t.payload, meta)
                yi = (np.arange(out_h) * meta["height"] // out_h)
                xi = (np.arange(out_w) * meta["width"] // out_w)
                small = img[np.ix_(yi, xi)]
                out.append(
                    {
                        "media_id": t.media_id,
                        "kind": "image",
                        "payload": small.tobytes(),
                        "meta": {
                            "width": out_w,
                            "height": out_h,
                            "channels": meta["channels"],
                            "sample_rate": 0,
                            "n_frames": 1,
                        },
                    }
                )
            if out:
                yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)
