"""Structured Streaming ST6 coverage: watermarked windowed aggregation
and the applyInPandasWithState sessionizer, each checked against the
batch operator with identical semantics on the same rows."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from walker_spark.streaming import windowed as W


def _write_events(spark, path, rows):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    df.coalesce(1).write.mode("overwrite").parquet(path)


def _ts(s):
    from datetime import datetime, timezone

    return datetime.fromisoformat(s).replace(tzinfo=None)


EVENTS = [
    # user 1: two sessions separated by a > 30 min gap
    (1, _ts("2024-01-01 10:00:00")),
    (1, _ts("2024-01-01 10:10:00")),
    (1, _ts("2024-01-01 11:30:00")),
    (1, _ts("2024-01-01 11:40:00")),
    # user 2: one long session
    (2, _ts("2024-01-01 10:05:00")),
    (2, _ts("2024-01-01 10:25:00")),
    (2, _ts("2024-01-01 10:45:00")),
]

SENTINEL_USER = 999


def test_windowed_rollup_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    _write_events(spark, src, EVENTS)
    batch = {
        (r["window_start"], r["n_events"], r["approx_users"])
        for r in W.windowed_rollup(spark.read.parquet(src)).collect()
    }

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    q = (
        W.windowed_rollup(stream)
        .writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["n_events"], r["approx_users"])
        for r in spark.sql("select * from rollup_test").collect()
    }
    assert got == batch and len(got) == 2  # 10:00 and 11:00 windows


def test_sessionize_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "sessions")
    os.makedirs(src, exist_ok=True)
    # batch oracle on the real events only
    real = spark.createDataFrame(EVENTS, "user_id long, ts timestamp")
    expect = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in W.sessionize_batch(real, gap_s=1800).collect()
    }
    assert len(expect) == 3  # two sessions for user 1, one for user 2

    # three files processed as three triggers (maxFilesPerTrigger=1):
    # real events, then two far-future sentinel events whose arrival
    # advances the event-time watermark past every real session + gap,
    # firing the EventTimeTimeout that emits the closed sessions
    def write_one(name, rows, mtime):
        d = os.path.join(src, name)
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
            1
        ).write.mode("overwrite").parquet(d)
        for root, _dirs, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))
        os.utime(d, (mtime, mtime))
        return d

    t0 = time.time() - 100
    write_one("b1", EVENTS, t0)
    write_one("b2", [(SENTINEL_USER, _ts("2024-02-01 00:00:00"))], t0 + 10)
    write_one("b3", [(SENTINEL_USER, _ts("2024-02-02 00:00:00"))], t0 + 20)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    q = (
        W.sessionize_stream(stream, gap_s=1800, watermark="1 second")
        .writeStream.format("memory")
        .queryName("session_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql(
            f"select * from session_test where user_id != {SENTINEL_USER}"
        ).collect()
    }
    assert got == expect
