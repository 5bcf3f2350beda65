"""Streaming trending-token detection over a persisted Count-Min
sketch — the operational use of the CMS merge law.

Each micro-batch of timestamped documents is reduced to (a) its
per-window Count-Min cells (``operators/sketches.cms_counts``) and
(b) a bounded per-window exact top-``cand_k`` candidate list; both
land under a ``batch=<id>`` directory with OVERWRITE semantics, so an
at-least-once redelivery of a micro-batch rewrites the same rows
instead of double-counting them (the classic foreachBatch
exactly-once trick; contrast dedup_stream.py, which gets idempotency
semantically via content keys — counts have no such identity, so the
path-per-batch commit is the correct tool here).

Query time never replays raw text: the sketch table merges by
``sum(cnt)`` over (win, d, bucket) — O(windows x depth x width) rows
per batch regardless of corpus size — and candidates are point-looked
up via ``cms_lookup``. Trending score = estimated count in the
current window minus the previous window, pure BIGINT.

At 100 TB/day this is the only workable shape: the raw token stream
is write-once, the queryable state is a few KB per (window, batch),
and compaction (merge-by-sum into one row set) can run any time
without changing answers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from walker_spark.operators.sketches import cms_counts, cms_lookup

DOC_SCHEMA = "doc_id long, ts_ms long, text string"

DEPTH, WIDTH = 4, 1024


def _win(col, win_ms: int):
    return (col.cast("long") / F.lit(win_ms)).cast("long").alias("win")


def _batch_tokens(batch_df: DataFrame, win_ms: int) -> DataFrame:
    from walker_spark.operators.dedup import tokens

    return batch_df.select(
        _win(F.col("ts_ms"), win_ms),
        F.explode(
            F.filter(tokens(F.col("text")), lambda s: F.length(s) > 0)
        ).alias("item"),
    )


def commit_batch(
    batch_df: DataFrame,
    batch_id: int,
    sketch_dir: str,
    cand_dir: str,
    win_ms: int,
    cand_k: int = 32,
) -> None:
    """Reduce one micro-batch to its sketch cells + candidate list and
    commit both under ``batch=<batch_id>`` with overwrite — redelivery
    of the same batch id is a no-op by construction (asserted in
    pytest). Candidates are the batch's exact per-window top-``cand_k``
    tokens (bounded rows; a token can only trend if it was heavy in at
    least one batch of the window)."""
    toks = _batch_tokens(batch_df, win_ms).localCheckpoint()
    cms = cms_counts(toks, ["win"], "item", depth=DEPTH, width=WIDTH)
    cms.write.mode("overwrite").parquet(
        os.path.join(sketch_dir, f"batch={batch_id}")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("win").orderBy(
        F.desc("c"), F.asc("item")
    )
    cands = (
        toks.groupBy("win", "item")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cand_k)
        .select("win", "item")
    )
    cands.write.mode("overwrite").parquet(
        os.path.join(cand_dir, f"batch={batch_id}")
    )


def stream_trending_tokens(
    spark: SparkSession,
    input_dir: str,
    sketch_dir: str,
    cand_dir: str,
    checkpoint_dir: str,
    win_ms: int = 3_600_000,
    cand_k: int = 32,
    available_now: bool = True,
):
    """Run the ingestion leg: parquet drops stream in, per-batch
    sketch + candidate commits stream out. Returns the
    StreamingQuery."""
    docs = spark.readStream.schema(DOC_SCHEMA).parquet(input_dir)
    writer = (
        docs.writeStream.foreachBatch(
            lambda df, bid: commit_batch(
                df, bid, sketch_dir, cand_dir, win_ms, cand_k
            )
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


def merged_sketch(spark: SparkSession, sketch_dir: str) -> DataFrame:
    """The queryable sketch: all batch commits merged by the CMS sum
    law. Running this through a writer periodically IS compaction —
    answers are invariant."""
    raw = spark.read.option("basePath", sketch_dir).parquet(sketch_dir)
    return raw.groupBy("win", "d", "bucket").agg(F.sum("cnt").alias("cnt"))


def trending_tokens(
    spark: SparkSession,
    sketch_dir: str,
    cand_dir: str,
    win: int,
    top_k: int = 10,
) -> DataFrame:
    """Top-``top_k`` tokens of window ``win`` by estimated count gain
    over window ``win - 1``: ``(item, est_now, est_prev, gain)``, all
    BIGINT, tie-broken (gain desc, item). Reads ONLY sketch cells and
    the bounded candidate table — never raw text."""
    sk = merged_sketch(spark, sketch_dir)
    cands = (
        spark.read.option("basePath", cand_dir)
        .parquet(cand_dir)
        .filter(F.col("win").isin(win, win - 1))
        .select("item")
        .distinct()
    )
    now = cms_lookup(
        sk.filter(F.col("win") == win).drop("win"),
        cands,
        [],
        "item",
        depth=DEPTH,
        width=WIDTH,
    ).withColumnRenamed("est_cnt", "est_now")
    prev = cms_lookup(
        sk.filter(F.col("win") == win - 1).drop("win"),
        cands,
        [],
        "item",
        depth=DEPTH,
        width=WIDTH,
    ).withColumnRenamed("est_cnt", "est_prev")
    return (
        now.join(prev, "item")
        .select(
            "item",
            "est_now",
            "est_prev",
            (F.col("est_now") - F.col("est_prev")).cast("long").alias("gain"),
        )
        .orderBy(F.desc("gain"), F.asc("item"))
        .limit(top_k)
    )
