"""Streaming lexical-index maintenance (streaming/index_stream.py):
parquet drops -> foreachBatch -> per-batch mergeable index deltas
under batch=<id>; serve-time fold == one-shot build; redelivery and
crash repair."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from walker_spark.operators.retrieval import bm25_topk_indexed, build_postings_index
from walker_spark.streaming.index_stream import (
    _repair,
    load_postings_index,
    stream_index_documents,
)

B1 = [(1, "spark shuffle join spark spark"), (2, "shuffle partition skew")]
B2 = [(3, "join broadcast join small table"), (4, "window rank dense rank")]
B3 = [(5, "spark window shuffle join broadcast")]


def _drop(spark, inbox, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(inbox)


def _index_tables_equal(a, b):
    for x, y in ((a.postings, b.postings), (a.dfreq, b.dfreq), (a.stats, b.stats)):
        assert sorted(map(tuple, x.collect())) == sorted(map(tuple, y.collect()))


def test_streaming_index_fold_equals_one_shot_build(spark, tmp_path):
    inbox, idx, ckpt = (str(tmp_path / n) for n in ("inbox", "idx", "ckpt"))
    for rows in (B1, B2, B3):
        _drop(spark, inbox, rows)
        stream_index_documents(spark, inbox, idx, ckpt)

    docs = spark.createDataFrame(B1 + B2 + B3, "doc_id long, text string")
    folded = load_postings_index(spark, idx)
    oneshot = build_postings_index(docs)
    _index_tables_equal(folded, oneshot)

    qdf = spark.createDataFrame(
        [(0, "spark join"), (1, "window rank")], "query_id int, query string"
    )
    assert sorted(map(tuple, bm25_topk_indexed(folded, qdf, k=3).collect())) == sorted(
        map(tuple, bm25_topk_indexed(oneshot, qdf, k=3).collect())
    )


def test_streaming_index_redelivery_is_idempotent(spark, tmp_path):
    inbox, idx = str(tmp_path / "inbox"), str(tmp_path / "idx")
    _drop(spark, inbox, B1)
    stream_index_documents(spark, inbox, idx, str(tmp_path / "ckpt1"))
    before = sorted(map(tuple, load_postings_index(spark, idx).postings.collect()))

    # fresh checkpoint => the SAME files replay as a new batch id; the
    # already-indexed ids drop on the anti-join, nothing double-counts
    stream_index_documents(spark, inbox, idx, str(tmp_path / "ckpt2"))
    after = load_postings_index(spark, idx)
    assert sorted(map(tuple, after.postings.collect())) == before
    assert after.stats.collect()[0]["_N"] == 2


def test_streaming_index_crash_repair_rederives_tail(spark, tmp_path):
    inbox, idx, ckpt = (str(tmp_path / n) for n in ("inbox", "idx", "ckpt"))
    _drop(spark, inbox, B1)
    stream_index_documents(spark, inbox, idx, ckpt)
    _drop(spark, inbox, B2)
    stream_index_documents(spark, inbox, idx, ckpt)

    # simulate a crash between the postings write and the tail writes
    # of the second batch: delete its dfreq AND stats deltas
    (b,) = [n for n in os.listdir(os.path.join(idx, "dfreq")) if n != "batch=0"]
    shutil.rmtree(os.path.join(idx, "dfreq", b))
    shutil.rmtree(os.path.join(idx, "stats", b))

    assert _repair(spark, idx) == 1
    folded = load_postings_index(spark, idx)
    oneshot = build_postings_index(
        spark.createDataFrame(B1 + B2, "doc_id long, text string")
    )
    _index_tables_equal(folded, oneshot)
    # repair is idempotent
    assert _repair(spark, idx) == 0
