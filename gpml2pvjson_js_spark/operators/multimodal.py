"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Round 5: the image and audio paths are now REAL, dependency-free
decodes — PNG (signature + chunk walk + IHDR + zlib-inflated,
filter-0-unfiltered scanlines) and WAV (RIFF/fmt/data chunk walk +
PCM samples) are parsed with struct/zlib from the stdlib, so
`decode_status == "ok"`, width/height/duration_ms, and the features
(folded from actual pixel / PCM bytes) are honest for those two
formats. Only the video path remains a documented STUB (mp4 demux
needs codec libs this container lacks); its Spark-side plumbing —
schema, partition-preserving mapInPandas batch shape, Arrow transfer,
deterministic fake features — is real and tested either way.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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
    # parsed from the PAYLOAD (not copied from metadata columns):
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

_WAV_RATE = 8000  # synthesized PCM sample rate (Hz)


def _det_bytes(seed: str, n: int) -> bytes:
    """Deterministic byte stream: sha256 counter mode."""
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.sha256(f"{seed}:{i}".encode()).digest()
        i += 1
    return bytes(out[:n])


def _png_bytes(width: int, height: int, seed: str) -> bytes:
    """Minimal valid 8-bit grayscale PNG (filter 0 scanlines)."""
    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + _det_bytes(f"{seed}:row{y}", width)
                   for y in range(height))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _wav_bytes(duration_ms: int, seed: str, rate: int = _WAV_RATE) -> bytes:
    """Minimal valid RIFF/WAVE, 16-bit mono PCM."""
    n_samples = rate * duration_ms // 1000
    data = _det_bytes(seed, n_samples * 2)
    fmt = struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + 16 + 8 + len(data))
            + b"WAVE" + b"fmt " + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def _decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Stdlib PNG decode of the 8-bit grayscale / filter-0 subset:
    chunk walk -> IHDR dims -> inflate IDAT -> strip filter bytes.
    Raises on anything outside that subset (status becomes an error
    row, never a crash)."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos, width, height, idat = 8, None, None, b""
    while pos + 8 <= len(payload):
        (length,), typ = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if typ == b"IHDR":
            width, height, depth, color = struct.unpack(">IIBB", data[:10])
            if (depth, color) != (8, 0):
                raise ValueError(f"unsupported PNG depth/color "
                                 f"{depth}/{color}")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(idat)
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, width + 1)
    if rows[:, 0].any():
        raise ValueError("unsupported PNG filter type")
    return width, height, rows[:, 1:].reshape(-1)


def _decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Stdlib WAV decode: RIFF chunk walk -> (duration_ms, samples)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE header")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        typ = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + length]
        if typ == b"fmt ":
            _, channels, rate, _, _, bits = struct.unpack("<HHIIHH",
                                                          body[:16])
        elif typ == b"data":
            data = body
        pos += 8 + length + (length & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16 or channels != 1:
        raise ValueError(f"unsupported WAV layout {bits}bit x{channels}")
    samples = np.frombuffer(data, dtype="<i2")
    return int(len(samples) * 1000 // rate), samples


def synthesize_media(spark, n: int, kinds=("image", "audio", "video")
                     ) -> DataFrame:
    """Deterministic media rows. Image payloads are REAL PNGs and
    audio payloads REAL WAVs (synthesized byte-exactly above); video
    payloads are opaque seeded bytes (decode stubbed)."""
    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % len(kinds)]
                if kind == "image":
                    w, h = 32 + (i % 3) * 16, 24 + (i % 2) * 8
                    payload = _png_bytes(w, h, f"media:{i}")
                    mime, dur = "image/png", None
                elif kind == "audio":
                    w = h = None
                    dur = 250 * (1 + i % 4)
                    payload = _wav_bytes(dur, f"media:{i}")
                    mime = "audio/wav"
                else:
                    w = h = 64
                    dur = 1000
                    payload = _det_bytes(f"media:{i}", 256)
                    mime = "video/mp4"
                rows.append({
                    "media_id": i, "kind": kind, "payload": payload,
                    "mime": mime, "width": w, "height": h,
                    "duration_ms": dur,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA])

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def _fold_feature(arr: np.ndarray) -> list:
    """Fold a byte/sample array into FEATURE_DIM floats in [0, 1]."""
    arr = arr.astype(np.float32)
    pad = (-len(arr)) % FEATURE_DIM
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.float32)])
    scale = max(float(np.abs(arr).max()), 1.0)
    return (arr.reshape(-1, FEATURE_DIM).mean(axis=0) / scale).tolist()


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction over payload bytes.

    PNG and WAV payloads are REALLY decoded (stdlib inflate / PCM
    parse; `decode_status='ok'`, parsed dims/duration emitted);
    video decode is stubbed (`decode_status='stub-decoded'`,
    deterministic features from raw bytes). Malformed payloads
    quarantine as `error: ...` rows — a decode never crashes the
    task."""
    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, statuses, ws, hs, durs = [], [], [], [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                b = bytes(payload)
                w = h = dur = None
                try:
                    if kind == "image":
                        w, h, px = _decode_png(b)
                        feats.append(_fold_feature(px))
                        statuses.append("ok")
                    elif kind == "audio":
                        dur, samples = _decode_wav(b)
                        feats.append(_fold_feature(samples))
                        statuses.append("ok")
                    else:
                        feats.append(_fold_feature(
                            np.frombuffer(b, dtype=np.uint8)))
                        statuses.append("stub-decoded")
                except Exception as exc:  # quarantine, never crash
                    feats.append([0.0] * FEATURE_DIM)
                    statuses.append(f"error: {exc}")
                ws.append(w)
                hs.append(h)
                durs.append(dur)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "feature": feats,
                "decode_status": statuses,
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "duration_ms": pd.array(durs, dtype="Int32"),
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
