"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

No reference analog (ferenda's PDF/Word readers, [ref: ferenda/pdfreader.py],
[ref: ferenda/wordreader.py], shell out to external converters per file);
this is the Spark-native shape of that slot for a training-data pipeline:
the *plumbing* — schemas, batch iteration, partitioning, UDF signatures —
is real and tested; the codec step is stubbed because the sandbox ships no
image/audio libraries (PIL/cv2/librosa gated behind import-try, with a
deterministic fake for tests).

Scale notes:
- payloads stay in Arrow binary buffers end-to-end; `mapInPandas` streams
  batch iterators so one oversized asset never has to share a batch list
  with thousands of others (`maxRecordsPerBatch` bounds batch memory).
- feature extraction emits fixed-length float arrays → downstream reuse of
  the similarity/dedup operators (`operators.similarity`, `operators.dedup`)
  with zero extra plumbing.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

MEDIA_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)

FEATURE_DIM = 64


def _real_decode_available() -> bool:
    try:  # pragma: no cover - sandbox has no PIL
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(payload: bytes):  # pragma: no cover - real-codec path
    """Real decode path — requires PIL; the sandbox intentionally stubs it.
    Callers choosing mode='real' get a loud failure, not silent fakes."""
    if not _real_decode_available():
        raise NotImplementedError(
            "image decoding requires PIL/opencv, not present in this "
            "environment; use mode='fake' (deterministic) for plumbing tests"
        )
    import PIL.Image
    import io

    return PIL.Image.open(io.BytesIO(payload))


def _fake_features(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Deterministic fake decode: sha256-seeded pseudo-features + pseudo
    dimensions. Stable across machines/runs — good enough to exercise every
    piece of Spark plumbing around the codec hole."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.RandomState(seed)
    feats = rng.rand(FEATURE_DIM).astype(np.float32) * 2 - 1
    width = 64 + int.from_bytes(digest[8:10], "big") % 1984
    height = 64 + int.from_bytes(digest[10:12], "big") % 1984
    return feats, width, height


def extract_media_features(media: DataFrame, mode: str = "fake") -> DataFrame:
    """media(MEDIA schema) → MEDIA_FEATURES via mapInPandas.

    mode='fake' (default in-sandbox): deterministic hash-derived features.
    mode='real': decode via PIL → raises NotImplementedError here.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(payload)
                if mode == "real":
                    decode_image(b)  # raises NotImplementedError in-sandbox
                feats, w, h = _fake_features(b)
                rows.append(
                    dict(
                        media_id=int(mid),
                        kind=kind,
                        n_bytes=len(b),
                        payload_sha256=hashlib.sha256(b).hexdigest(),
                        width=w if kind == "image" else None,
                        height=h if kind == "image" else None,
                        features=feats.tolist(),
                    )
                )
            yield pd.DataFrame(rows)

    cols = ["media_id", "kind", "payload"]
    return media.select(cols).mapInPandas(fn, schema=MEDIA_FEATURES)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video → sampled frame rows (media_id, frame_idx, frame_payload).
    The decode is stubbed: frame payloads are deterministic slices of the
    container payload so the explode/repartition plumbing is real."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_payload", T.BinaryType(), False),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = max(len(b) // 256, 1)  # fake container structure
                for fi in range(0, n_frames, every_n):
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(fi)
                    out["frame_payload"].append(b[fi * 256 : (fi + 1) * 256])
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(fn, schema=schema)
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media corpus for tests (seeded payload bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                payload = hashlib.sha256(f"media:{i}".encode()).digest() * (
                    8 + (i % 5) * 16
                )
                rows.append(
                    dict(
                        media_id=i,
                        kind=kind,
                        mime={"image": "image/png", "audio": "audio/wav",
                              "video": "video/mp4"}[kind],
                        payload=payload,
                        meta={"src": f"synthetic:{i}"},
                    )
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA)
