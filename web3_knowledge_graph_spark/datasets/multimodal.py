"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED — image/audio codecs are not in this container —
behind ``_decode_payload``: with real libraries it would be PIL/libav; here
it is a deterministic fake that derives pixel/sample statistics from the
payload bytes, keeping every Spark-side concern real and tested: schema
evolution, binary column transport through Arrow, batch-shaped UDF
signatures, partition sizing for large blobs.

Scale notes: binary payloads dominate row size, so partitions are sized by
``spark.sql.files.maxPartitionBytes`` not row count; metadata-only plans
(filters on media_type/width) must prune the payload column — keep payload
at the END of projections and select it only in the decode stage.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import MEDIA

FEATURE_DIM = 8

DECODED = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)

FRAMES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_s", T.DoubleType(), False),
        T.StructField("frame_hash", T.StringType(), False),
    ]
)


def _decode_payload(payload: bytes | None, media_type: str) -> list[float] | None:
    """STUB decode. Real implementation: PIL.Image.open / soundfile.read →
    normalized feature vector. The fake is deterministic in the bytes so
    tests and oracles are stable; raises for unknown modalities the way a
    real codec would. It hashes the HEX encoding of the payload (not the
    raw bytes) so the DuckDB oracle can replay it exactly — DuckDB's md5
    is VARCHAR-only, and repeat/concat in the hex domain is byte-faithful."""
    if payload is None:
        return None
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"no codec for media_type={media_type!r}")
    digest = hashlib.md5(bytes(payload).hex().encode()).digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def decode_features(media: DataFrame) -> DataFrame:
    """media → (media_id, media_type, ok, n_bytes, features[8]) via
    mapInPandas (Arrow batches; payload bytes never touch the driver)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_payload(p, mt)
                for p, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "ok": [f is not None for f in feats],
                    "n_bytes": [len(p) if p is not None else None for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(run, DECODED)


def sample_frames(media: DataFrame, fps: float = 1.0, max_frames: int = 16) -> DataFrame:
    """Video frame sampling: one row per sampled frame at ``fps``, capped at
    ``max_frames``. Frame extraction itself is the stubbed decode (hash of
    payload+index stands in for the frame tensor); the explode/partition
    shape is the real thing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_ts_s": [], "frame_hash": []}
            for mid, dur, payload in zip(
                pdf["media_id"], pdf["duration_s"], pdf["payload"]
            ):
                if payload is None or dur is None or dur <= 0:
                    continue
                n = min(int(dur * fps) + 1, max_frames)
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_s"].append(i / fps)
                    rows["frame_hash"].append(
                        hashlib.md5(payload + i.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return media.where(F.col("media_type") == "video").select(
        "media_id", "duration_s", "payload"
    ).mapInPandas(run, FRAMES)


def resize_metadata(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Resize planning as pure column math (no decode needed): target
    dimensions preserving aspect ratio with the long side capped. Native
    expressions — metadata-only, payload column pruned from the scan."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return media.where(F.col("media_type") == "image").select(
        "media_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )


def synthesize_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic media fixture (payload = md5-stream bytes)."""
    rows = []
    for i in range(n):
        mt = ("image", "audio", "video")[i % 3]
        payload = hashlib.md5(f"media{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (
                i,
                f"https://cdn.example/m/{i}",
                mt,
                bytearray(payload),
                64 + (i % 13) * 32 if mt == "image" else None,
                64 + (i % 7) * 48 if mt == "image" else None,
                float(i % 30 + 1) if mt in ("audio", "video") else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA)
