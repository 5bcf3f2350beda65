"""Streaming funnel maintenance: 3-batch composition == batch
funnel_users over the full log (cross-batch step transitions
included), redelivery idempotency, compaction invariance, randomized
composition parity."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

STEPS = ("view", "click", "buy")


def _df(spark, rows):
    from walker_spark.streaming.funnel_stream import EVENT_SCHEMA

    return spark.createDataFrame(rows, EVENT_SCHEMA).select(
        "user_id",
        F.timestamp_millis(F.col("ts").cast("long")).alias("ts"),
        "event_id",
        "event_type",
    )


def _mk(spark, rows):
    # rows: (user, ms, id, type) with ts passed as epoch-ms long
    from walker_spark.streaming.funnel_stream import EVENT_SCHEMA

    return spark.createDataFrame(
        [(u, ms, i, t) for u, ms, i, t in rows],
        "user_id long, ts long, event_id long, event_type string",
    ).select(
        "user_id",
        F.timestamp_millis("ts").alias("ts"),
        "event_id",
        "event_type",
    )


def _state(spark, stats):
    from walker_spark.streaming.funnel_stream import funnel_state

    return {
        r["user_id"]: (r["level"], r["entered_ms"])
        for r in funnel_state(spark, stats, STEPS).collect()
    }


def test_stream_funnel_matches_batch_and_is_idempotent(spark, tmp_path):
    from walker_spark.operators.funnel import funnel_users
    from walker_spark.streaming.funnel_stream import commit_batch

    stats = str(tmp_path / "stats")
    # u1 completes ACROSS batches (view in b1, click in b2, buy in b3);
    # u2 clicks before viewing (stuck at 1 after b2's view);
    # u3 appears only in b2; u4 does non-step events only -> absent
    b1 = [(1, 100, 1, "view"), (2, 110, 2, "click"), (4, 120, 3, "error")]
    b2 = [(1, 200, 4, "click"), (2, 210, 5, "view"), (3, 220, 6, "view")]
    b3 = [(1, 300, 7, "buy"), (2, 310, 8, "buy")]
    for bid, rows in enumerate((b1, b2, b3)):
        commit_batch(_mk(spark, rows), bid, stats, STEPS)

    got = _state(spark, stats)
    want = {
        r["user_id"]: (r["level"], r["entered_ms"])
        for r in funnel_users(_mk(spark, b1 + b2 + b3), STEPS).collect()
    }
    assert got == want
    assert got[1] == (3, 100) and got[2] == (1, 210) and got[3] == (1, 220)
    assert 4 not in got

    # at-least-once redelivery: recommitting batch 1 rewrites the
    # same rows — state unchanged
    commit_batch(_mk(spark, b2), 1, stats, STEPS)
    assert _state(spark, stats) == want


def test_stream_funnel_compaction_invariant(spark, tmp_path):
    from walker_spark.streaming.funnel_stream import (
        commit_batch,
        compact,
    )

    stats = str(tmp_path / "stats")
    b1 = [(1, 100, 1, "view"), (2, 110, 2, "view")]
    b2 = [(1, 200, 3, "click"), (2, 210, 4, "buy")]
    for bid, rows in enumerate((b1, b2)):
        commit_batch(_mk(spark, rows), bid, stats, STEPS)
    before = _state(spark, stats)

    # rewrite the whole table as ONE merged segment per user
    merged = compact(spark, stats, STEPS).collect()
    stats2 = str(tmp_path / "stats2")
    spark.createDataFrame(
        merged,
        "user_id long, seg_start_ms long, levels array<long>,"
        " anchor_ms long",
    ).write.mode("overwrite").parquet(stats2 + "/batch=0")
    assert _state(spark, stats2) == before


def test_stream_funnel_randomized_vs_batch(spark, tmp_path):
    from walker_spark.operators.funnel import funnel_users
    from walker_spark.streaming.funnel_stream import commit_batch

    rng = random.Random(0xFA)
    types = list(STEPS) + ["noise"]
    # per-user time-ordered batches (the documented contract): batch k
    # holds ms in [k*1000, (k+1)*1000)
    batches = []
    eid = 0
    for k in range(4):
        rows = []
        for u in range(25):
            for _ in range(rng.randint(0, 4)):
                rows.append(
                    (u, k * 1000 + rng.randrange(0, 1000), eid,
                     rng.choice(types))
                )
                eid += 1
        batches.append(rows)
    stats = str(tmp_path / "stats")
    for bid, rows in enumerate(batches):
        commit_batch(_mk(spark, rows), bid, stats, STEPS)
    got = _state(spark, stats)
    full = [r for b in batches for r in b]
    want = {
        r["user_id"]: (r["level"], r["entered_ms"])
        for r in funnel_users(_mk(spark, full), STEPS).collect()
    }
    assert got == want
