"""Watermarked windowed aggregation + custom stateful sessionization
(SURVEY §2.10 ST6 — streaming forms of the batch analytics).

Walker itself has no streaming surface (its daemons poll Cassandra),
so these are the engine's continuous-ingestion analogs for the same
tables a 100 TB pipeline feeds incrementally:

* :func:`windowed_rollup` — event-time tumbling-window counts with a
  watermark for late data. The SAME function body serves batch and
  streaming input (``withWatermark`` is a no-op on a batch DataFrame),
  so the streaming result is testable against the batch oracle
  (query `event_hourly_rollup`) on identical rows.
* :func:`sessionize` — gap-based sessions per user via
  ``applyInPandasWithState`` (GroupState + event-time timeout): the
  canonical custom stateful operator Spark's built-in windows cannot
  express. State per user is (session_start, last_seen, n_events);
  a session is emitted when the event-time watermark passes
  last_seen + gap. Batch fallback: the classic lag()/cumsum session
  assignment, same output schema — used by tests as the oracle.

Scale notes: state is partitioned by the group key (one shuffle), the
state store is RocksDB-backed on a real cluster, and the watermark
bounds state size — exactly the knobs the north_rule's streaming
story needs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", TimestampType(), False),
        StructField("session_end", TimestampType(), False),
        StructField("n_events", IntegerType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n", IntegerType()),
    ]
)


def windowed_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window event counts + distinct-ish user count per
    window. Works on a batch OR streaming DataFrame: on a stream the
    watermark lets Spark finalize (and drop state for) windows older
    than max(event time) - watermark; on batch it is ignored."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "approx_users",
        )
    )


def _session_rows(user_id, start_ms, last_ms, n):
    return pd.DataFrame(
        {
            "user_id": pd.array([user_id], dtype="int64"),
            "session_start": pd.to_datetime([start_ms], unit="ms"),
            "session_end": pd.to_datetime([last_ms], unit="ms"),
            "n_events": pd.array([n], dtype="int32"),
        }
    )


def sessionize_stream(
    events: DataFrame,
    gap_s: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming gap-based sessionization: consecutive events of a user
    closer than ``gap_s`` belong to one session; a session closes when
    the event-time watermark passes its last event + gap (event-time
    timeout), which is when its row is emitted. Custom stateful logic
    via applyInPandasWithState — per-user state never leaves the
    executor that owns the user's hash partition.

    Requires ``spark.sql.session.timeZone=UTC`` (the engine-wide
    setting): Arrow delivers session-localized naive timestamps, so a
    non-UTC session would shift the epoch-ms state against the UTC
    event-time watermark used by setTimeoutTimestamp.

    Ordering: a trigger's events are gathered across ALL Arrow chunks
    and sorted once (a >maxRecordsPerBatch group arrives as several
    chunks in no guaranteed order). Across triggers, an event that
    arrives late but within the watermark merges into the open session
    when it falls inside the gap window before session_start (lowering
    session_start); a late event older than that is emitted directly
    as its own single-event session — state only summarizes the open
    session, so earlier sessions cannot be reopened retroactively."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_s * 1000

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield _session_rows(user_id, start_ms, last_ms, n)
            return
        start_ms = last_ms = None
        n = 0
        if state.exists:
            start_ms, last_ms, n = state.get
        new_ts = sorted(
            int(t.value // 10**6)
            for pdf in pdfs
            for t in pd.to_datetime(pdf[ts_col])
        )
        out = []
        for ts in new_ts:
            if last_ms is None:
                start_ms, last_ms, n = ts, ts, 1
            elif ts >= start_ms - gap_ms and ts - last_ms <= gap_ms:
                start_ms = min(start_ms, ts)
                last_ms, n = max(last_ms, ts), n + 1
            elif ts < start_ms:
                # late beyond the open session's reach: emit standalone
                out.append((ts, ts, 1))
            else:
                out.append((start_ms, last_ms, n))
                start_ms, last_ms, n = ts, ts, 1
        state.update((start_ms, last_ms, n))
        state.setTimeoutTimestamp(last_ms + gap_ms)
        for s in out:
            yield _session_rows(user_id, *s)

    return (
        events.select(F.col(user_col).alias("user_id"), F.col(ts_col))
        .withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(
    events: DataFrame,
    gap_s: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Batch sessionization with identical semantics (the tests' oracle
    for the streaming operator, and the backfill path): lag() marks
    session starts, a running sum assigns session ids, then one groupBy
    — two window passes over a single hash(user) shuffle."""
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_exceeded = (
        F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w))
    ) > gap_s * 1000
    ses = (
        events.select(F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts"))
        # lag NULL (first event) -> NULL comparison -> coalesce to 1:
        # every user's first event opens a session
        .withColumn("_new", F.coalesce(gap_exceeded.cast("int"), F.lit(1)))
        .withColumn(
            "_sid",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return ses.groupBy("user_id", "_sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).cast("int").alias("n_events"),
    ).drop("_sid")
