"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode kernels (PIL/ffmpeg/librosa) are NOT available in this
container, so the decode step is stubbed behind a deterministic fake
(or ``NotImplementedError`` when ``strict=True``) — but the Spark-side
plumbing is real and tested: schema, Arrow batch shape, mapInPandas
partitioning, and the metadata contract a 100 TB media pipeline needs
(one row per asset, binary payload + struct metadata, frame-sampling
fan-out as posexplode).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("checksum", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def assets_from_documents(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic fake asset table derived from a text corpus (the
    sandbox has no media fixtures): payload = utf-8 bytes, kind cycles
    by id. Real pipelines replace this with the WARC/tar reader."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").cast("binary").alias("payload"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
    )


def decode_and_extract(df: DataFrame, strict: bool = False) -> DataFrame:
    """The decode/feature-extract stage: mapInPandas over asset rows ->
    FEATURE_SCHEMA. With ``strict=True`` raises NotImplementedError
    where a real decoder (PIL/ffmpeg) would run — marking exactly the
    integration point; otherwise emits deterministic fake features
    derived from the payload bytes (so tests pin batch shape + schema).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media decode requires PIL/ffmpeg; not available in this container"
                )
            rows = {k.name: [] for k in FEATURE_SCHEMA.fields}
            for aid, kind, payload in zip(pdf["asset_id"], pdf["kind"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                digest = hashlib.md5(raw).hexdigest()
                h = int(digest[:8], 16)
                rows["asset_id"].append(int(aid))
                rows["kind"].append(kind)
                rows["n_bytes"].append(len(raw))
                rows["checksum"].append(digest)
                if kind == "image":
                    rows["width"].append(64 + h % 1024)
                    rows["height"].append(64 + (h >> 10) % 1024)
                    rows["duration_ms"].append(None)
                else:
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["duration_ms"].append(1000 + h % 600_000)
            yield pd.DataFrame(rows)

    return df.mapInPandas(extract, FEATURE_SCHEMA)


def sample_frames(
    features: DataFrame, every_ms: int = 10_000, max_frames: int = 32
) -> DataFrame:
    """Frame-sampling fan-out for video assets: one row per sampled
    timestamp (posexplode of a JVM-generated sequence — no Python):
    (asset_id, frame_idx, ts_ms)."""
    n_frames = F.least(
        F.lit(max_frames),
        (F.col("duration_ms") / F.lit(every_ms)).cast("int") + 1,
    )
    return (
        features.filter(F.col("kind") == "video")
        .select(
            "asset_id",
            F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_i"),
        )
        .select(
            "asset_id",
            "frame_idx",
            (F.col("frame_idx") * every_ms).cast("long").alias("ts_ms"),
        )
    )
