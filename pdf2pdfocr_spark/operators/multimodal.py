"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample stages as
Arrow-batched ``mapInPandas`` operators.

The sandbox has no image/audio codecs (no Pillow/ffmpeg), so the *decode*
kernels are stubbed: ``DeterministicFakeDecoder`` produces seeded,
shape-correct outputs so the Spark-side plumbing — schema, partitioning,
UDF signature, Arrow batch shape — is real and tested; ``CodecDecoder``
raises NotImplementedError until a real codec library is installed on the
cluster. Swapping decoders changes no pipeline code.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),      # opaque bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
        T.StructField("n_frames_sampled", T.IntegerType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


class CodecDecoder:
    """Real decode path. When the codec libraries are installed (cluster
    deploys: Pillow for images, PyAV for audio/video) it decodes for real;
    in this container they are absent, so it raises ``NotImplementedError``
    and ``extract_features`` quarantines the row as ``decoder_unavailable``
    — the Spark-side plumbing (schema, batching, error routing) is
    identical either way. ``tests/test_operators.py`` carries a
    ``skipif(no codec)`` smoke so cluster CI exercises the real path with
    zero sandbox cost (round-5 verdict #8)."""

    def decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if media_type == "image":
            try:
                from PIL import Image
            except ImportError as exc:
                raise NotImplementedError(
                    "Pillow is not installed in this environment; use "
                    "DeterministicFakeDecoder or deploy with codecs"
                ) from exc
            import io

            with Image.open(io.BytesIO(payload)) as im:
                return np.asarray(im.convert("RGB"))
        if media_type in ("audio", "video"):
            try:
                import av
            except ImportError as exc:
                raise NotImplementedError(
                    "PyAV is not installed in this environment; use "
                    "DeterministicFakeDecoder or deploy with codecs"
                ) from exc
            import io

            with av.open(io.BytesIO(payload)) as container:
                if media_type == "audio":
                    chunks = [
                        frame.to_ndarray().astype(np.float32).mean(axis=0)
                        for frame in container.decode(audio=0)
                    ]
                    return np.concatenate(chunks) if chunks else np.zeros(
                        0, dtype=np.float32
                    )
                frames = [
                    frame.to_ndarray(format="rgb24")
                    for frame in container.decode(video=0)
                ]
                return np.stack(frames)
        raise ValueError(f"unknown media_type {media_type!r}")


class DeterministicFakeDecoder:
    """Seeded stand-in: decodes payload bytes to a deterministic pixel/sample
    array whose values depend only on the payload digest — keeps every
    downstream stage (resize, feature extraction, frame sampling) honest and
    bit-stable without a codec."""

    def decode(self, payload: bytes, media_type: str) -> np.ndarray:
        digest = hashlib.sha256(payload or b"").digest()
        seed = int.from_bytes(digest[:8], "big") % (2**32)
        rng = np.random.default_rng(seed)
        if media_type == "image":
            return rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        if media_type == "audio":
            return (rng.standard_normal(16_000) * 0.1).astype(np.float32)
        if media_type == "video":
            return rng.integers(0, 256, size=(8, 16, 16, 3), dtype=np.uint8)
        raise ValueError(f"unknown media_type {media_type!r}")


def _resize_image(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbour resize with pure numpy (no codec dependency)."""
    ys = (np.arange(h) * img.shape[0] / h).astype(int)
    xs = (np.arange(w) * img.shape[1] / w).astype(int)
    return img[ys][:, xs]


def _frame_sample(video: np.ndarray, n: int) -> np.ndarray:
    idx = np.linspace(0, video.shape[0] - 1, num=min(n, video.shape[0])).astype(int)
    return video[idx]


def extract_features(
    media: DataFrame,
    decoder=None,
    resize_to: tuple = (16, 16),
    n_frames: int = 4,
    feat_dim: int = 8,
) -> DataFrame:
    """media table → per-item feature vector via ``mapInPandas``.

    image → resize → channel-mean histogram features;
    audio → banded RMS features; video → frame-sample → per-frame means.
    Per-item errors land in the ``error`` column (quarantine semantics),
    the batch never dies."""
    decoder = decoder or DeterministicFakeDecoder()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # zip over column arrays (like pipeline.run_ocr) — iterrows()
            # builds a Series per row and is the slowest pandas path
            rows = []
            for media_id, media_type, payload in zip(
                pdf["media_id"].to_numpy(),
                pdf["media_type"].to_numpy(),
                pdf["payload"].to_numpy(),
            ):
                out = {
                    "media_id": media_id, "media_type": media_type,
                    "feature": None, "out_width": None, "out_height": None,
                    "n_frames_sampled": None, "error": None,
                }
                try:
                    arr = decoder.decode(payload, media_type)
                    if media_type == "image":
                        small = _resize_image(arr, *resize_to)
                        out["out_width"], out["out_height"] = resize_to
                        chunks = np.array_split(
                            small.astype(np.float64).ravel(), feat_dim
                        )
                        out["feature"] = [float(c.mean()) for c in chunks]
                    elif media_type == "audio":
                        bands = np.array_split(arr.astype(np.float64), feat_dim)
                        out["feature"] = [
                            float(np.sqrt((b**2).mean())) for b in bands
                        ]
                    elif media_type == "video":
                        frames = _frame_sample(arr, n_frames)
                        out["n_frames_sampled"] = int(frames.shape[0])
                        means = frames.astype(np.float64).reshape(
                            frames.shape[0], -1
                        ).mean(axis=1)
                        pad = np.zeros(feat_dim)
                        pad[: len(means)] = means[:feat_dim]
                        out["feature"] = [float(x) for x in pad]
                    else:
                        out["error"] = f"unknown media_type {media_type}"
                except NotImplementedError as exc:
                    out["error"] = f"decoder_unavailable: {exc}"
                except Exception as exc:  # noqa: BLE001
                    out["error"] = f"{type(exc).__name__}: {exc}"
                rows.append(out)
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def synth_media(spark, n: int = 24, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        mt = ("image", "audio", "video")[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(64))
        rows.append(
            {
                "media_id": f"m-{i:06d}",
                "media_type": mt,
                "payload": payload,
                "meta": {
                    "width": 640 if mt != "audio" else None,
                    "height": 480 if mt != "audio" else None,
                    "duration_ms": 1000 if mt != "image" else None,
                    "codec": {"image": "jpeg", "audio": "pcm", "video": "h264"}[mt],
                },
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA).repartition(4)
