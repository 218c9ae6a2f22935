"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode kernels are STUBBED (no image/audio libs in this
container; see `_decode_image_stub`) — the Spark-side plumbing is
real and tested: schema, partition-preserving mapInPandas batch shape,
Arrow transfer, and deterministic fake features so downstream
operators (ANN over extracted features) can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),      # image|audio|video
    T.StructField("payload", T.BinaryType(), False),   # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
    T.StructField("decode_status", T.StringType(), False),
])


def synthesize_media(spark, n: int, kinds=("image", "audio", "video")
                     ) -> DataFrame:
    """Deterministic opaque media rows (payload = seeded bytes)."""
    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % len(kinds)]
                payload = hashlib.sha256(f"media:{i}".encode()).digest() * 8
                rows.append({
                    "media_id": i, "kind": kind, "payload": payload,
                    "mime": {"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind],
                    "width": 64 if kind != "audio" else None,
                    "height": 64 if kind != "audio" else None,
                    "duration_ms": 1000 if kind != "image" else None,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA])

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB: a real deployment decodes with PIL/libvips here.
    Deterministic fake: fold payload bytes into FEATURE_DIM floats."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    pad = (-len(arr)) % FEATURE_DIM
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.float32)])
    return arr.reshape(-1, FEATURE_DIM).mean(axis=0) / 255.0


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over opaque payloads.
    Real decode is stubbed (deterministic), but batch shape,
    schema, and partitioning behavior are production-real."""
    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, statuses = [], []
            for payload in pdf["payload"]:
                try:
                    feats.append(
                        _decode_image_stub(bytes(payload)).tolist())
                    statuses.append("stub-decoded")
                except Exception as exc:  # quarantine, never crash
                    feats.append([0.0] * FEATURE_DIM)
                    statuses.append(f"error: {exc}")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "feature": feats,
                "decode_status": statuses,
            })

    return media.select("media_id", "kind", "payload") \
        .mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame-sampling plan (timestamps only — decode stubbed):
    one row per planned frame, derived with JVM-side sequence/explode
    so the fan-out happens before any Python stage."""
    vids = media.filter(F.col("kind") == "video")
    ts = F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
    return vids.select(
        "media_id",
        F.explode(ts).alias("frame_ts_ms"),
    )
