"""Streaming corpus ingestion with incremental near-dup dedup
(streaming/dedup_stream.py): parquet drops -> foreachBatch ->
exact in-batch dedup + incremental near-dup against the growing
persisted LSH index."""

from __future__ import annotations

from walker_spark.streaming.dedup_stream import stream_dedup_documents


def _write_batch(spark, input_dir, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)


def _corpus_ids(spark, corpus_dir):
    return {r.doc_id for r in spark.read.parquet(corpus_dir).collect()}


def test_streaming_dedup_grows_index_across_batches(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: 2 is an exact dup of 1 (whitespace/case only); 3 distinct
    _write_batch(
        spark,
        inbox,
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "ALPHA  beta gamma delta epsilon"),
            (3, "one two three four five"),
        ],
    )
    stream_dedup_documents(
        spark, inbox, corpus, index, ckpt, threshold=0.5, shingle_n=1
    )
    assert _corpus_ids(spark, corpus) == {1, 3}
    assert spark.read.parquet(index).count() == 2

    # batch 2: 4 is a near-dup of stored 1 (jaccard 4/6 ~ 0.667 >= 0.5);
    # 1 is redelivered (exact dup of its stored twin, jaccard 1.0);
    # 5 is new; 6 and 7 are near-dups of EACH OTHER but not of the
    # corpus -> both survive (documented policy: the corpus index is
    # the dedup authority within a batch)
    _write_batch(
        spark,
        inbox,
        [
            (4, "alpha beta gamma delta zeta"),
            (1, "alpha beta gamma delta epsilon"),
            (5, "six seven eight nine ten"),
            (6, "red green blue cyan magenta"),
            (7, "red green blue cyan yellow"),
        ],
    )
    stream_dedup_documents(
        spark, inbox, corpus, index, ckpt, threshold=0.5, shingle_n=1
    )
    assert _corpus_ids(spark, corpus) == {1, 3, 5, 6, 7}
    # index grew exactly with the survivors
    assert spark.read.parquet(index).count() == 5

    # batch 3: near-dup of batch-2 survivor 6 now drops (index grew)
    _write_batch(spark, inbox, [(8, "red green blue cyan black")])
    stream_dedup_documents(
        spark, inbox, corpus, index, ckpt, threshold=0.5, shingle_n=1
    )
    assert _corpus_ids(spark, corpus) == {1, 3, 5, 6, 7}


def test_unshingleable_redelivery_and_crash_reconcile(spark, tmp_path):
    """ADVICE r4: (a) docs whose text yields no shingles still dedup on
    exact cross-batch redelivery (content_key anti-join); (b) a crash
    between the corpus append and the index append is repaired at the
    next start, so redeliveries/near-dups of the half-committed doc
    still drop."""
    from pyspark.sql import functions as F

    from walker_spark.streaming.dedup_stream import content_key

    inbox = str(tmp_path / "inbox")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    # doc 9 is empty -> zero shingles -> no index row, but it lands in
    # the corpus with its content_key
    _write_batch(spark, inbox, [(9, ""), (10, "alpha beta gamma delta epsilon")])
    stream_dedup_documents(
        spark, inbox, corpus, index, ckpt, threshold=0.5, shingle_n=1
    )
    assert _corpus_ids(spark, corpus) == {9, 10}
    assert {r.doc_id for r in spark.read.parquet(index).collect()} == {10}

    # redelivered empty doc (new id, same empty text) drops via the
    # stored content_key even though no index row exists for it
    _write_batch(spark, inbox, [(11, "   ")])  # normalizes equal to ""
    stream_dedup_documents(
        spark, inbox, corpus, index, ckpt, threshold=0.5, shingle_n=1
    )
    assert _corpus_ids(spark, corpus) == {9, 10}

    # simulate the crash: doc 12 reaches the corpus but not the index
    spark.createDataFrame(
        [(12, "pink orange violet lime teal")], "doc_id long, text string"
    ).withColumn("content_key", content_key(F.col("text"))).coalesce(1).write.mode(
        "append"
    ).parquet(corpus)
    # next start reconciles: 12 gets its index row, so its near-dup 13
    # (jaccard 4/6 >= 0.5) drops
    _write_batch(spark, inbox, [(13, "pink orange violet lime grey")])
    stream_dedup_documents(
        spark, inbox, corpus, index, ckpt, threshold=0.5, shingle_n=1
    )
    assert _corpus_ids(spark, corpus) == {9, 10, 12}
    assert {r.doc_id for r in spark.read.parquet(index).collect()} == {10, 12}
