"""Streaming lexical-index maintenance — the incremental twin of
``operators.retrieval.build/extend_postings_index`` for a continuously
arriving corpus: keep a BM25-servable :class:`PostingsIndex` current
without ever re-reading indexed text.

Each micro-batch builds ITS OWN three index tables (one batch scan)
and commits them under ``batch=<id>`` with OVERWRITE — the
path-per-batch idempotency tool (trending.py / recrawl_stream.py):
at-least-once redelivery rewrites the same deterministic rows instead
of double-counting. All three tables are MERGEABLE (postings by
union, dfreq by per-term sum, stats by sum), so

* serve time (:func:`load_postings_index`) folds every delta — and
  compacting all deltas into one is law-invariant;
* a doc id already committed by an EARLIER batch is dropped by a
  column-pruned anti-join against the stored postings ids before
  indexing (the extend contract: ids must be disjoint — the
  dedup_stream content_key precedent applied to the id key);
* the three writes per batch are ordered postings -> dfreq -> stats;
  a crash between them is repaired at the next start by
  :func:`_repair` re-DERIVING the missing dfreq/stats delta from the
  batch's postings (both are pure functions of it), so the commit
  needs no cross-table atomicity (the dedup_stream corpus-first
  repair direction, strengthened: here the tail tables are
  recomputable, not just reconcilable).

Batch and streaming cannot diverge: the per-batch build IS
``build_postings_index``, and the serve-time fold IS what
``extend_postings_index`` computes pairwise (parity pytest-asserted
against a one-shot build over the union corpus).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from walker_spark.operators.retrieval import PostingsIndex, build_postings_index

DOC_SCHEMA = "doc_id long, text string"


def _batches(root: str, table: str) -> list[str]:
    d = os.path.join(root, table)
    if not os.path.isdir(d):
        return []
    return sorted(
        n for n in os.listdir(d)
        if n.startswith("batch=") and os.path.isdir(os.path.join(d, n))
    )


def _read_deltas(spark: SparkSession, root: str, table: str) -> DataFrame | None:
    names = _batches(root, table)
    paths = [
        os.path.join(root, table, n)
        for n in names
        if any(f.endswith(".parquet") for f in os.listdir(os.path.join(root, table, n)))
    ]
    if not paths:
        return None
    return spark.read.parquet(*paths)


def _derive_tail(postings: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(dfreq, stats) as pure functions of a postings delta — the
    repair law AND the per-batch commit content."""
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("dfreq")
    )
    stats = (
        postings.select("id", "dl")
        .distinct()
        .agg(
            F.count(F.lit(1)).cast("long").alias("_N"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("_dl_sum"),
        )
    )
    return dfreq, stats


def _repair(spark: SparkSession, index_dir: str) -> int:
    """Re-derive any dfreq/stats delta missing for a committed postings
    delta (crash between the ordered writes). Returns batches repaired."""
    repaired = 0
    have_d = set(_batches(index_dir, "dfreq"))
    have_s = set(_batches(index_dir, "stats"))
    for b in _batches(index_dir, "postings"):
        pdir = os.path.join(index_dir, "postings", b)
        if not any(f.endswith(".parquet") for f in os.listdir(pdir)):
            continue
        if b in have_d and b in have_s:
            continue
        postings = spark.read.parquet(pdir)
        dfreq, stats = _derive_tail(postings)
        if b not in have_d:
            dfreq.write.mode("overwrite").parquet(os.path.join(index_dir, "dfreq", b))
        if b not in have_s:
            stats.write.mode("overwrite").parquet(os.path.join(index_dir, "stats", b))
        repaired += 1
    return repaired


def load_postings_index(spark: SparkSession, index_dir: str) -> PostingsIndex:
    """Fold every committed delta into a servable
    :class:`PostingsIndex` (postings union / per-term dfreq sum /
    one-row stats sum). Raises if nothing is committed yet."""
    postings = _read_deltas(spark, index_dir, "postings")
    if postings is None:
        raise FileNotFoundError(f"no postings deltas under {index_dir}")
    dfreq = _read_deltas(spark, index_dir, "dfreq")
    stats = _read_deltas(spark, index_dir, "stats")
    if dfreq is None or stats is None:
        raise RuntimeError(
            f"index at {index_dir} needs repair — run stream_index_documents "
            "(it repairs on start) or _repair()"
        )
    merged_dfreq = dfreq.groupBy("term").agg(
        F.sum("dfreq").cast("long").alias("dfreq")
    )
    merged_stats = stats.agg(
        F.sum("_N").cast("long").alias("_N"),
        F.sum("_dl_sum").cast("long").alias("_dl_sum"),
    )
    return PostingsIndex(postings, merged_dfreq, merged_stats)


def stream_index_documents(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (and with ``available_now`` run to completion) streaming
    index maintenance over a parquet drop directory. Returns the
    StreamingQuery."""
    _repair(spark, index_dir)

    docs = spark.readStream.schema(DOC_SCHEMA).parquet(input_dir)

    def handle_batch(batch_df, batch_id: int):
        batch = batch_df
        existing = _read_deltas(spark, index_dir, "postings")
        if existing is not None:
            # already-indexed ids drop before tokenization (column-
            # pruned id scan; the extend disjoint-ids contract)
            seen = existing.select(F.col("id").alias("doc_id")).distinct()
            batch = batch.join(seen, "doc_id", "left_anti")
        delta = build_postings_index(batch)
        postings = delta.postings.localCheckpoint()
        if postings.isEmpty():
            return
        b = f"batch={batch_id}"
        # ordered commit; each tail table is re-derivable from the
        # postings delta, so a crash anywhere is repaired on restart
        postings.write.mode("overwrite").parquet(
            os.path.join(index_dir, "postings", b)
        )
        dfreq, stats = _derive_tail(postings)
        dfreq.write.mode("overwrite").parquet(os.path.join(index_dir, "dfreq", b))
        stats.write.mode("overwrite").parquet(os.path.join(index_dir, "stats", b))

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
