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


def phash_assets(features: DataFrame) -> DataFrame:
    """Per-asset 60-bit perceptual-hash column — the LAION-style image
    near-dup key. A real dHash/pHash needs decoded pixels (PIL/ffmpeg,
    absent in this container — same integration point
    :func:`decode_and_extract` marks with ``strict=True``), so the
    stand-in derives the 60 bits from the decode stage's checksum;
    everything downstream of the decoder (hash width, banding, hamming
    join) is real and oracle-checked.

    Returns ``(asset_id, kind, phash)`` with ``phash`` a non-negative
    60-bit long (15 hex digits — the same width/decode convention as
    dedup.simhash_md5, so the hamming machinery is shared-by-contract).
    """
    return features.select(
        "asset_id",
        "kind",
        F.conv(F.substring("checksum", 1, 15), 16, 10).cast("long").alias("phash"),
    )


def hamming_near_dups(
    df: DataFrame,
    hash_col: str = "phash",
    id_col: str = "asset_id",
    max_hamming: int = 2,
    bits: int = 60,
) -> DataFrame:
    """Generic hamming-radius near-dup pairs over ANY precomputed
    perceptual-hash column: ``(id_a, id_b, hamming)`` for every pair
    within ``max_hamming`` bit flips. Exact recall by the pigeonhole
    principle: the hash splits into ``max_hamming + 1`` disjoint bit
    bands, and two hashes within the radius must agree on at least one
    whole band.

    Scale shape: the banded stream is built by ONE ``posexplode`` in
    the scan task (no per-band re-scan — dedup.simhash_md5_pairs'
    band-loop unions k+1 joins; this is the single-join form), so the
    whole operator is one self-join keyed on (band_idx, band_value)
    plus the pair-dedup exchange. Candidate buckets are bounded by
    band-value collisions — for random 60-bit hashes a bucket is the
    true duplicate cluster plus noise ~n²/2^width; the exact popcount
    verify runs inside the join projection. Pure JVM bit math, no
    Python.
    """
    n_bands = max_hamming + 1
    if bits // n_bands < 1:
        raise ValueError(f"bits={bits} too narrow for max_hamming={max_hamming}")
    width = bits // n_bands
    mask = (1 << width) - 1
    h = F.col(hash_col).cast("long")
    band_arr = F.array(
        *[
            F.shiftrightunsigned(h, b * width).bitwiseAND(F.lit(mask))
            for b in range(n_bands)
        ]
    )
    bands = df.select(
        F.col(id_col).alias("_id"),
        h.alias("_h"),
        F.posexplode(band_arr).alias("_bidx", "_bval"),
    )
    a = bands.select(
        F.col("_id").alias("id_a"), F.col("_h").alias("_ha"), "_bidx", "_bval"
    )
    b = bands.select(
        F.col("_id").alias("id_b"), F.col("_h").alias("_hb"), "_bidx", "_bval"
    )
    ham = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).cast("int")
    return (
        a.join(b, ["_bidx", "_bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


#: magic-byte table (public file-format signatures, the same list
#: Go's http.DetectContentType / the `file` utility encode): hex
#: prefix (at byte 1 unless noted) -> canonical MIME. RIFF and MP4
#: need a second probe at an offset; HTML/XML match explicit leading
#: markers only (no heuristic text scoring — that's quality_scores'
#: job on decoded text).
_MAGIC_PREFIX = (
    ("255044462D", "application/pdf"),          # %PDF-
    ("89504E470D0A1A0A", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("474946383761", "image/gif"),              # GIF87a
    ("474946383961", "image/gif"),              # GIF89a
    ("1F8B", "application/gzip"),
    ("504B0304", "application/zip"),
    ("494433", "audio/mpeg"),                   # ID3
    ("FFFB", "audio/mpeg"),                     # bare MPEG frame
    ("4F676753", "application/ogg"),            # OggS
    ("3C21444F43545950", "text/html"),          # <!DOCTYP
    ("3C68746D6C", "text/html"),                # <html
    ("3C48544D4C", "text/html"),                # <HTML
    ("3C3F786D6C", "application/xml"),          # <?xml
)

#: RIFF container format tags at bytes 9-12
_RIFF_KINDS = (
    ("57415645", "audio/wav"),                  # WAVE
    ("57454250", "image/webp"),                 # WEBP
    ("41564920", "video/x-msvideo"),            # AVI(space)
)

#: declared-MIME aliases normalized before comparison
_MIME_ALIASES = (("image/jpg", "image/jpeg"),)


def sniff_mime(bin_col) -> "F.Column":
    """Magic-byte MIME sniff of a binary column as ONE case
    expression over the hex of the first 16 bytes — zero Python,
    zero exchange, payload bytes never leave the scan (only a
    16-byte prefix is hexed). Unknown signatures report
    application/octet-stream; sniffing is deliberately marker-based
    (no statistical text detection)."""
    col = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    h = F.hex(F.expr(f"substring({bin_col}, 1, 16)")) if isinstance(
        bin_col, str
    ) else F.hex(F.substring(col, 1, 16))
    out = None
    for pfx, mime in _MAGIC_PREFIX:
        cond = h.startswith(pfx)
        out = F.when(cond, mime) if out is None else out.when(cond, mime)
    riff = h.startswith("52494646")
    for tag, mime in _RIFF_KINDS:
        out = out.when(riff & (h.substr(17, 8) == tag), mime)
    # ISO-BMFF: 'ftyp' at byte offset 4 (hex chars 9-16)
    out = out.when(h.substr(9, 8) == "66747970", "video/mp4")
    return out.otherwise("application/octet-stream")


def normalize_mime(declared_col) -> "F.Column":
    """Declared Content-Type → canonical comparison form: parameters
    stripped (everything after ';'), trimmed, lowercased, common
    aliases folded (image/jpg → image/jpeg)."""
    col = (
        F.col(declared_col)
        if isinstance(declared_col, str)
        else declared_col
    )
    norm = F.lower(F.trim(F.split(col, ";").getItem(0)))
    for alias, canon in _MIME_ALIASES:
        norm = F.when(norm == alias, canon).otherwise(norm)
    return norm


def sniff_content_type(
    df: DataFrame, bin_col: str = "payload", declared_col: str | None = None
) -> DataFrame:
    """Audit actual vs declared content types over a binary column:
    adds ``sniffed_mime`` and, when ``declared_col`` is given,
    ``declared_norm`` + ``mime_matches``. The crawl-filter tier (F3)
    trusts response headers; at 100 TB a mislabeled-payload audit is
    how you find the servers that lie — and it runs as a pure
    projection on the asset scan, composable with any downstream
    filter. Reference parity: fetcher.go trusts Content-Type for the
    parse gate; this is the verification the reference lacks."""
    out = df.withColumn("sniffed_mime", sniff_mime(bin_col))
    if declared_col is not None:
        out = out.withColumn(
            "declared_norm", normalize_mime(declared_col)
        ).withColumn(
            "mime_matches",
            F.col("declared_norm") == F.col("sniffed_mime"),
        )
    return out
