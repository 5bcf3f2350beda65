"""Streaming bloom maintenance: 3-batch convergence, redelivery
idempotency by set semantics, zero-false-negative probe."""

import hashlib
import os
import uuid


def _write_batch(spark, inbox, keys):
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    df.coalesce(1).write.mode("append").parquet(inbox)


def _py_bits(keys, m, k):
    return {
        int(hashlib.md5(f"{x}:{j}".encode()).hexdigest()[:8], 16) % m
        for x in keys
        for j in range(k)
    }


def test_streaming_bloom_converges_and_redelivery_is_noop(spark, tmp_path):
    from walker_spark.streaming.bloom_stream import (
        bloom_bits_table,
        stream_bloom_update,
    )

    inbox = str(tmp_path / "inbox")
    bits = str(tmp_path / "bits")
    m, k = 512, 3

    b1 = [f"http://a.com/{i}" for i in range(30)]
    _write_batch(spark, inbox, b1)
    stream_bloom_update(
        spark, inbox, bits, str(tmp_path / "ck1"), m_bits=m, k=k
    ).awaitTermination()
    got1 = {r["bit"] for r in bloom_bits_table(spark, bits).collect()}
    assert got1 == _py_bits(b1, m, k)

    # batch 2 overlaps batch 1 heavily; only NEW bits append
    b2 = b1[:20] + [f"http://b.com/{i}" for i in range(10)]
    _write_batch(spark, inbox, b2)
    stream_bloom_update(
        spark, inbox, bits, str(tmp_path / "ck2"), m_bits=m, k=k
    ).awaitTermination()
    got2 = {r["bit"] for r in bloom_bits_table(spark, bits).collect()}
    assert got2 == _py_bits(b1 + b2, m, k)
    # stored rows stay duplicate-free even at the raw table level
    assert spark.read.parquet(bits).count() == len(got2)

    # full redelivery (fresh checkpoint => batch re-fires): a no-op
    stream_bloom_update(
        spark, inbox, bits, str(tmp_path / "ck3"), m_bits=m, k=k
    ).awaitTermination()
    assert spark.read.parquet(bits).count() == len(got2)

    # probe: every inserted key maybe=1 (no FN, ever)
    from walker_spark.operators.sketches import bloom_probe

    probe = bloom_probe(
        bloom_bits_table(spark, bits),
        spark.createDataFrame([(x,) for x in set(b1 + b2)], "key string"),
        "key",
        m_bits=m,
        k=k,
    )
    assert probe.filter("maybe = 0").count() == 0
