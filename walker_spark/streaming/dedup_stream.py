"""Streaming corpus ingestion with incremental near-dup dedup.

Continuously arriving documents (parquet drops here; Kafka topics in
production) are deduped against the persisted corpus LSH index
(:func:`walker_spark.operators.dedup.minhash_index`); survivors are
appended to the corpus table and their index rows to the index table,
so the next micro-batch dedups against the grown index:

    parquet files --readStream--> foreachBatch:
        exact in-batch dedup (content key, keep min doc_id)
        -> anti-join content_key vs stored corpus   [exact redelivery drops]
        -> incremental_near_dups(batch, index)      [corpus near-dups drop]
        -> append survivors (with content_key) to corpus,
           their minhash_index rows to index

* ``foreachBatch`` reuses the exact batch operators, so streaming and
  batch dedup cannot diverge;
* the corpus table carries ``content_key`` (md5 of normalized text), so
  exact redelivery — including documents too short to shingle, which
  never get an index row — is dropped by a column-pruned anti-join
  against the stored keys before the LSH join (ADVICE r4);
* the corpus append and the index append are two writes; a crash
  between them is repaired at the next start by
  :func:`_reconcile_index` (re-index corpus rows absent from the
  index), so at-least-once redelivery stays idempotent across crashes
  (ADVICE r4 medium) — corpus is always written FIRST so the repair
  direction is well-defined;
* near-dups WITHIN one micro-batch both survive if neither matches the
  corpus (the corpus index is the dedup authority; run
  :func:`near_dup_clusters` over a batch first if intra-batch near-dup
  dedup is wanted) — documented policy, asserted in the test;
* ``Trigger.AvailableNow`` drains everything present then stops — the
  test/CI mode; production drops the trigger for continuous tailing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

from walker_spark.operators.dedup import (
    incremental_near_dups,
    minhash_index,
    normalized_text,
)

DOC_SCHEMA = "doc_id long, text string"


def _has_parquet(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )


def content_key(col):
    """128-bit exact-dup identity: md5 over the normalized text — the
    same identity :func:`walker_spark.operators.dedup.exact_dedup`
    groups on, stored in the corpus table for cross-batch anti-joins."""
    return F.md5(F.encode(normalized_text(col), "UTF-8"))


def _reconcile_index(
    spark: SparkSession,
    corpus_dir: str,
    index_dir: str,
    num_perm: int,
    bands: int,
    shingle_n: int,
) -> None:
    """Crash repair: corpus rows with no index row (a crash landed
    between the corpus append and the index append) are re-indexed
    before any batch runs, so their redeliveries and near-dups still
    match. Unshingleable docs legitimately have no index row; they
    yield nothing from minhash_index and cost one tiny recompute here
    (their redelivery protection is the content_key anti-join)."""
    if not _has_parquet(corpus_dir):
        return
    corpus = spark.read.parquet(corpus_dir)
    if _has_parquet(index_dir):
        indexed = spark.read.parquet(index_dir).select("doc_id")
        missing = corpus.join(indexed, "doc_id", "left_anti")
    else:
        missing = corpus
    if missing.isEmpty():
        return
    rows = minhash_index(
        missing, num_perm=num_perm, bands=bands, shingle_n=shingle_n
    ).localCheckpoint()
    if not rows.isEmpty():
        rows.write.mode("append").parquet(index_dir)


def stream_dedup_documents(
    spark: SparkSession,
    input_dir: str,
    corpus_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    available_now: bool = True,
):
    """Start (and with ``available_now`` run to completion) the
    streaming dedup ingestion. Returns the StreamingQuery."""

    _reconcile_index(spark, corpus_dir, index_dir, num_perm, bands, shingle_n)

    docs = spark.readStream.schema(DOC_SCHEMA).parquet(input_dir)

    def handle_batch(batch_df, batch_id: int):
        # exact in-batch dedup on the 128-bit content key (same
        # identity exact_dedup uses), deterministic keeper = min id
        batch = (
            batch_df.withColumn("content_key", content_key(F.col("text")))
            .groupBy("content_key")
            .agg(
                F.min("doc_id").alias("doc_id"),
                F.min_by("text", "doc_id").alias("text"),
            )
        )
        if _has_parquet(corpus_dir):
            # cross-batch exact dedup: redelivered docs — including
            # unshingleable ones with no index row — drop on the stored
            # key column (column-pruned scan, text never read)
            seen = spark.read.parquet(corpus_dir).select("content_key")
            batch = batch.join(seen, "content_key", "left_anti")
        if _has_parquet(index_dir):
            index = spark.read.parquet(index_dir)
            dups = incremental_near_dups(
                batch,
                index,
                threshold=threshold,
                num_perm=num_perm,
                bands=bands,
                shingle_n=shingle_n,
            ).select(F.col("id_new").alias("doc_id")).distinct()
            batch = batch.join(dups, "doc_id", "left_anti")
        survivors = batch.select("doc_id", "text", "content_key").localCheckpoint()
        if survivors.isEmpty():
            return
        # corpus FIRST, then index: a crash between the two is repaired
        # by _reconcile_index at the next start (the reverse order
        # would silently lose documents from the corpus)
        survivors.write.mode("append").parquet(corpus_dir)
        minhash_index(
            survivors, num_perm=num_perm, bands=bands, shingle_n=shingle_n
        ).write.mode("append").parquet(index_dir)

    writer = (
        docs.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now:
        query.awaitTermination()
    return query
