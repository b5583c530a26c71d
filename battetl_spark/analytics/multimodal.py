"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery is real and tested — schema, partition sizing,
Arrow batch shape, mapInPandas signatures; only the codec kernels are stubbed
(the container ships no image/audio libs) behind ``decoder=`` injection or a
deterministic fake, each clearly marked.

Scale notes: binary payloads dominate partition bytes — callers should size
``spark.sql.files.maxPartitionBytes`` down (payload rows are huge) and the
decode stage uses mapInPandas so one task streams Arrow batches without
materializing a partition of decoded frames at once.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), 3) + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(F.xxhash64("id", F.lit(1)), 1024) + 32).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(2)), 1024) + 32).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(3)), 60000)).cast("int").alias("duration_ms"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB decode kernel — a real deployment injects e.g. PIL/libav here.
    Deterministic: features derive from payload bytes."""
    if payload is None:
        return np.zeros(8, dtype=np.float32)
    arr = np.frombuffer(payload[:32].ljust(32, b"\0"), dtype=np.uint8)
    return (arr.reshape(4, 8).mean(axis=0) / 255.0).astype(np.float32)


def extract_features(
    media: DataFrame, decoder=None, batch_note: str = "arrow"
) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches). ``decoder``
    maps bytes -> np.ndarray[float32]; defaults to the deterministic stub.
    Raise NotImplementedError explicitly if a real codec is required."""
    decode = decoder or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [decode(p) for p in b["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in b["payload"]],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """STUB resize: real impl needs an image lib; the plumbing (metadata
    update + payload passthrough) is the Spark-side contract."""
    return media.withColumn("width", F.lit(target_w)).withColumn(
        "height", F.lit(target_h)
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp —
    pure Catalyst sequence explode; the decode of each frame is the stubbed
    kernel's job."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
                )
            ).alias("frame_ms"),
        )
    )
