"""Streaming change-rate maintenance — the incremental twin of
``operators.recrawl.change_rate_estimates`` for a continuously
arriving fetch log.

Each micro-batch reduces to its per-URL ``history_stats`` rows (the
MERGEABLE form: counts, first/last times and content keys) committed
under ``batch=<id>`` with OVERWRITE — at-least-once redelivery of a
micro-batch rewrites the same rows instead of double-counting (the
trending.py path-per-batch idempotency tool; change counts, like CMS
counts, have no semantic identity a set could dedup on).

Query time never replays raw history: segments merge per URL by an
ORDERED FOLD — sorted by segment start, counts add and the batch
boundary contributes one extra change when the older segment's
last_key differs from the newer's first_key. The fold output is
itself a valid stats row, so periodically rewriting the merged table
IS compaction (answers invariant, pytest-asserted).

Contract: per-URL batch segments must not interleave in event time —
true of a crawl's own fetch log, where each batch covers a later time
slice (same monotonicity note as the batch operator's docstring).
Equality with the batch recompute over the concatenated history is
exact under that contract (pytest).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from walker_spark.operators.recrawl import derive_schedule, history_stats

HIST_SCHEMA = "url string, ts timestamp, content_key string"

_SEG_FIELDS = ("first_t", "first_key", "n_obs", "n_changes", "last_t", "last_key")


def commit_batch(batch_df: DataFrame, batch_id: int, stats_dir: str) -> None:
    """Reduce one micro-batch of (url, ts, content_key) fetch events
    to its mergeable per-URL stats and commit under ``batch=<id>``
    (overwrite => redelivery no-op)."""
    history_stats(batch_df).write.mode("overwrite").parquet(
        os.path.join(stats_dir, f"batch={batch_id}")
    )


def stream_change_rates(
    spark: SparkSession,
    input_dir: str,
    stats_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Run the ingestion leg: fetch-log parquet drops stream in,
    per-batch mergeable stats commits stream out. Returns the
    StreamingQuery."""
    hist = spark.readStream.schema(HIST_SCHEMA).parquet(input_dir)
    writer = (
        hist.writeStream.foreachBatch(
            lambda df, bid: commit_batch(df, bid, stats_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now:
        query.awaitTermination()
    return query


def merged_stats(spark: SparkSession, stats_dir: str) -> DataFrame:
    """All committed segments merged per URL by the ordered fold:
    returns :func:`history_stats`-shaped rows. Segment count per URL
    is the number of batches that saw it — metadata-scale; the fold is
    one array expression after one url-keyed aggregate."""
    raw = spark.read.option("basePath", stats_dir).parquet(stats_dir)
    segs = raw.groupBy("url").agg(
        F.sort_array(F.collect_list(F.struct(*_SEG_FIELDS))).alias("_segs")
    )
    init = F.struct(
        F.lit(None).cast("long").alias("first_t"),
        F.lit(None).cast("string").alias("first_key"),
        F.lit(0).cast("long").alias("n_obs"),
        F.lit(0).cast("long").alias("n_changes"),
        F.lit(None).cast("long").alias("last_t"),
        F.lit(None).cast("string").alias("last_key"),
    )

    def merge(acc, s):
        boundary = (acc["last_key"] != s["first_key"]).cast("long")
        return F.when(
            acc["n_obs"] == 0,
            F.struct(
                s["first_t"].alias("first_t"),
                s["first_key"].alias("first_key"),
                s["n_obs"].alias("n_obs"),
                s["n_changes"].alias("n_changes"),
                s["last_t"].alias("last_t"),
                s["last_key"].alias("last_key"),
            ),
        ).otherwise(
            F.struct(
                acc["first_t"].alias("first_t"),
                acc["first_key"].alias("first_key"),
                (acc["n_obs"] + s["n_obs"]).alias("n_obs"),
                (acc["n_changes"] + s["n_changes"] + boundary).alias(
                    "n_changes"
                ),
                s["last_t"].alias("last_t"),
                s["last_key"].alias("last_key"),
            )
        )

    folded = segs.select("url", F.aggregate("_segs", init, merge).alias("_m"))
    return folded.select(
        "url",
        F.col("_m.n_obs").alias("n_obs"),
        F.col("_m.n_changes").alias("n_changes"),
        F.col("_m.first_t").alias("first_t"),
        F.col("_m.last_t").alias("last_t"),
        F.col("_m.first_key").alias("first_key"),
        F.col("_m.last_key").alias("last_key"),
    )


def change_rate_table(
    spark: SparkSession,
    stats_dir: str,
    min_interval_ms: int = 3_600_000,
    max_interval_ms: int = 30 * 86_400_000,
) -> DataFrame:
    """The continuously-maintained recrawl schedule: the merged stats
    through the SAME derive_schedule as the batch operator — identical
    columns, identical laws."""
    return derive_schedule(
        merged_stats(spark, stats_dir), min_interval_ms, max_interval_ms
    )
