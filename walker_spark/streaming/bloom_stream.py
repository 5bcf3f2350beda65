"""Streaming Bloom-filter maintenance — the URL-seen shape as a
queryable sketch table (reference: walker's seen-URL set grows with
every fetch; urlseen.py keeps packed bitmaps for the engine's hot
path, this keeps the mergeable plain-row form for continuous
ingestion + ad-hoc membership analytics):

    parquet key drops --readStream--> foreachBatch:
        bloom_bits(batch)                     [k md5 positions/key]
        -> anti-join vs stored bit table      [only NEW bits append]
        -> append to the bits table

Idempotency is STRUCTURAL here, not bookkept: the sketch is a SET of
bit positions (sketches.bloom_bits contract), so at-least-once
redelivery can only try to re-insert bits that are already present —
the anti-join drops them and the table converges to exactly the union
regardless of delivery count or crash point (there is nothing a crash
between batches can corrupt: one table, append-only, set semantics).
The CMS trending stream needs path-per-batch OVERWRITE commits
because counts have no identity; bits DO (streaming/trending.py
counterpart note). A duplicate append racing the anti-join would be
harmless anyway — readers go through :func:`bloom_bits_table`, which
de-dups — but foreachBatch batches are serial per query, so it cannot
happen within one stream.

Probe with ``sketches.bloom_probe`` against :func:`bloom_bits_table`:
no false negative ever (pytest), deterministic false positives.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from walker_spark.operators.sketches import bloom_bits

KEY_SCHEMA = "key string"


def _has_parquet(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )


def bloom_bits_table(spark: SparkSession, bits_dir: str) -> DataFrame:
    """The current sketch: DISTINCT stored bit positions (distinct on
    read makes even a hypothetical duplicate append invisible)."""
    if not _has_parquet(bits_dir):
        return spark.createDataFrame([], "bit long")
    return spark.read.parquet(bits_dir).select("bit").distinct()


def stream_bloom_update(
    spark: SparkSession,
    input_dir: str,
    bits_dir: str,
    checkpoint_dir: str,
    m_bits: int = 1 << 20,
    k: int = 4,
    available_now: bool = True,
):
    """Start (and with ``available_now`` run to completion) the
    streaming bloom maintenance. Returns the StreamingQuery."""
    keys = spark.readStream.schema(KEY_SCHEMA).parquet(input_dir)

    def handle_batch(batch_df, batch_id: int):
        bits = bloom_bits(batch_df, "key", m_bits=m_bits, k=k)
        if _has_parquet(bits_dir):
            bits = bits.join(
                spark.read.parquet(bits_dir).select("bit"), "bit", "left_anti"
            )
        bits = bits.localCheckpoint()
        if bits.isEmpty():
            return
        bits.write.mode("append").parquet(bits_dir)

    writer = (
        keys.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
