"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata — the
pages table's ``html`` column is the text-modality instance of the
same pattern. The Spark-side machinery here is REAL and tested:
schemas, partition-preserving ``mapInPandas`` batch transforms, Arrow
batch shapes, deterministic outputs. The codec step itself is STUBBED
(this container has no image/audio libraries): ``decode_image``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic header parse + byte-histogram stands in for a real
decoder — swap ``_decode_one`` for PIL/ffmpeg and nothing else
changes.
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
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("byte_hist", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def synth_media(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table: payload = 16-byte header
    (magic, width, height, channels, n_frames) + hash-derived body."""
    df = spark.range(0, n, 1, partitions)
    h = F.abs(F.xxhash64("id", F.lit("media")))
    w = (F.pmod(h, 64) + 8).cast("int")
    ht = (F.pmod(F.abs(F.xxhash64("id", F.lit("h"))), 64) + 8).cast("int")
    mt = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.pmod(h, 3) + 1).cast("int"))
    # header: 'WDQ0' + width(4) + height(4) + channels(2) + frames(2)
    header = F.concat(
        F.encode(F.lit("WDQ0"), "UTF-8"),
        F.lpad(w.cast("string"), 4, "0").cast("binary"),
        F.lpad(ht.cast("string"), 4, "0").cast("binary"),
        F.lpad(F.lit(3).cast("string"), 2, "0").cast("binary"),
        F.lpad((F.pmod(h, 8) + 1).cast("string"), 2, "0").cast("binary"),
    )
    body = F.encode(F.sha2(F.concat(F.lit("body"), F.col("id").cast("string")), 256), "UTF-8")
    return df.select(
        F.col("id").alias("media_id"),
        mt.alias("media_type"),
        F.concat(header, body).alias("payload"),
        F.create_map(F.lit("source"), F.lit("synth")).alias("meta"),
    )


def _decode_one(payload: bytes, fake: bool) -> tuple[int, int, int, np.ndarray]:
    if payload is None or len(payload) < 16 or payload[:4] != b"WDQ0":
        return 0, 0, 0, np.zeros(16, dtype=np.float32)
    if not fake:
        # Real decoder (PIL / libvips / ffmpeg) goes here.
        raise NotImplementedError("image decoding requires PIL/libvips — not available in this container")
    w = int(payload[4:8])
    h = int(payload[8:12])
    ch = int(payload[12:14])
    body = np.frombuffer(payload[16:], dtype=np.uint8)
    hist = np.bincount(body >> 4, minlength=16).astype(np.float32)
    s = hist.sum()
    return w, h, ch, hist / s if s else hist


def decode_image_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """payload → (width, height, channels, 16-bin byte histogram) via
    ``mapInPandas`` (iterator of Arrow batches; constant memory)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [_decode_one(p, fake) for p in b["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"].to_numpy(),
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "channels": [r[2] for r in rows],
                    "byte_hist": [r[3] for r in rows],
                }
            )

    return df.select("media_id", "payload").mapInPandas(gen, IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every: int = 2) -> DataFrame:
    """'Video' frame sampling: split the body into n_frames chunks
    (per the fake header), keep every ``every``-th — one row per kept
    frame. Native expressions: explode over a sequence, substring on
    binary; a real implementation would swap the chunker for ffmpeg
    inside mapInPandas with the same output schema."""
    n_frames = F.substring(F.col("payload"), 15, 2).cast("string").cast("int")
    body_len = F.length(F.col("payload")) - 16
    chunk = F.greatest((body_len / n_frames).cast("int"), F.lit(1))
    frames = df.filter(F.col("media_type") == "video").select(
        "media_id",
        "payload",
        n_frames.alias("_nf"),
        chunk.alias("_ck"),
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no"),
    )
    return (
        frames.filter(F.col("frame_no") % every == 0)
        .select(
            "media_id",
            F.col("frame_no").cast("int"),
            F.substring(F.col("payload"), F.lit(17) + F.col("frame_no") * F.col("_ck"), F.col("_ck")).alias("frame"),
        )
    )
