"""Streaming corpus ingestion with incremental near-dup dedup.

Continuously arriving documents (parquet drops here; Kafka topics in
production) are deduped against the persisted corpus LSH index
(:func:`walker_spark.operators.dedup.minhash_index`); survivors are
appended to the corpus table and their index rows to the index table,
so the next micro-batch dedups against the grown index:

    parquet files --readStream--> foreachBatch:
        exact in-batch dedup (content key, keep min doc_id)
        -> incremental_near_dups(batch, index)   [corpus near-dups drop]
        -> append survivors to corpus, their minhash_index rows to index

* ``foreachBatch`` reuses the exact batch operators, so streaming and
  batch dedup cannot diverge;
* at-least-once redelivery is idempotent: a redelivered document is an
  exact dup (jaccard 1.0) of its stored twin and drops;
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

    docs = spark.readStream.schema(DOC_SCHEMA).parquet(input_dir)

    def handle_batch(batch_df, batch_id: int):
        # exact in-batch dedup on the 128-bit content key (same
        # identity exact_dedup uses), deterministic keeper = min id
        batch = (
            batch_df.withColumn(
                "_ck", F.md5(F.encode(normalized_text(F.col("text")), "UTF-8"))
            )
            .groupBy("_ck")
            .agg(
                F.min("doc_id").alias("doc_id"),
                F.min_by("text", "doc_id").alias("text"),
            )
            .drop("_ck")
        )
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
        survivors = batch.localCheckpoint()
        if survivors.isEmpty():
            return
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
