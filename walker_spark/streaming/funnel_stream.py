"""Streaming funnel maintenance — the incremental twin of
``operators.funnel.funnel_users`` for a continuously arriving event
stream.

The batch funnel is a left fold per user, which is not naively
mergeable (a segment's effect depends on the incoming level). The
trick: the fold's per-segment effect IS a total function
{0..K} → {0..K} over incoming levels, and functions COMPOSE — so a
micro-batch reduces to a constant-size summary per user:

- ``levels``: the K+1-vector ``f(L)`` for every incoming level L,
  computed in ONE vectorized fold (each hypothesis advances
  independently over the same sorted events);
- ``anchor_ms``: the step-1 anchor this segment would set for a user
  ARRIVING at level 0 — simply the min timestamp of its step-1
  events (from level 0, the first step-1 event always advances);
- ``seg_start_ms``: the merge order key.

Merging two segments is function composition
(``out[i] = s2.levels[s1.levels[i]]``) plus "first segment to lift
level 0 wins the anchor" — associative given the ordered-segment
contract, so compacting any prefix into one summary row is exact
(the recrawl_stream invariant, pytest-asserted via stream == batch).

Commits follow the path-per-batch idempotency tool (``batch=<id>``
OVERWRITE): a segment summary is a pure function of its own batch, so
at-least-once redelivery rewrites identical rows.

Contracts (documented, matching recrawl_stream): per-user batches
must not interleave in event time, and the completion-window variant
(``span_ms``) is deliberately NOT offered here — a window anchored at
a continuous timestamp breaks the finite-function summary; run the
batch operator over the raw log when windows are needed.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "user_id long, ts timestamp, event_id long, event_type string"
)


def _steps_arr_sql(steps: Sequence[str]) -> str:
    inner = ", ".join(
        "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
        for s in steps
    )
    return f"array({inner})"


def segment_summaries(
    batch_df: DataFrame, steps: Sequence[str]
) -> DataFrame:
    """One micro-batch → per-user mergeable summaries
    ``(user_id, seg_start_ms, levels, anchor_ms)``. Same shapes as
    the batch operator: step-type filter at the scan, one user-keyed
    exchange, the vectorized fold is a zero-exchange expression."""
    k = len(steps)
    if k == 0:
        raise ValueError("funnel needs at least one step")
    steps_arr = _steps_arr_sql(steps)
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    ev = batch_df.filter(F.col("event_type").isin(list(steps))).select(
        F.col("user_id"),
        F.struct(
            ms.alias("ms"),
            F.col("event_id").alias("id"),
            F.col("event_type").alias("typ"),
        ).alias("_e"),
    )
    fold = (
        f"aggregate(_evs, sequence(0L, {k}L), "
        f"(acc, x) -> transform(acc, l -> CASE WHEN l < {k} "
        f"AND x.typ = element_at({steps_arr}, CAST(l + 1 AS INT)) "
        "THEN l + 1 ELSE l END))"
    )
    first_step = (
        "array_min(transform("
        f"filter(_evs, x -> x.typ = element_at({steps_arr}, 1)), "
        "x -> x.ms))"
    )
    return (
        ev.groupBy("user_id")
        .agg(F.array_sort(F.collect_list("_e")).alias("_evs"))
        .select(
            "user_id",
            F.expr("_evs[0].ms").alias("seg_start_ms"),
            F.expr(fold).alias("levels"),
            F.expr(first_step).alias("anchor_ms"),
        )
    )


def commit_batch(
    batch_df: DataFrame,
    batch_id: int,
    stats_dir: str,
    steps: Sequence[str],
) -> None:
    """Reduce one micro-batch to its summaries and commit under
    ``batch=<id>`` (overwrite ⇒ redelivery no-op)."""
    segment_summaries(batch_df, steps).write.mode("overwrite").parquet(
        os.path.join(stats_dir, f"batch={batch_id}")
    )


def stream_funnel(
    spark: SparkSession,
    input_dir: str,
    stats_dir: str,
    checkpoint_dir: str,
    steps: Sequence[str],
    available_now: bool = True,
):
    """Run the ingestion leg: event parquet drops stream in,
    per-batch mergeable funnel summaries stream out."""
    ev = spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)
    writer = (
        ev.writeStream.foreachBatch(
            lambda df, bid: commit_batch(df, bid, stats_dir, steps)
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


def funnel_state(
    spark: SparkSession, stats_dir: str, steps: Sequence[str]
) -> DataFrame:
    """The continuously-maintained per-user funnel state
    ``(user_id, level, entered_ms)`` — identical columns and values
    to ``funnel_users(history, steps)`` (no window) over the
    concatenated raw log. ONE user-keyed aggregate over summaries
    (segment count per user = batches that saw the user —
    metadata-scale), then the composition fold in place."""
    k = len(steps)
    raw = spark.read.option("basePath", stats_dir).parquet(stats_dir)
    segs = raw.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("seg_start_ms", "levels", "anchor_ms"))
        ).alias("_segs")
    )
    init = F.expr(
        f"named_struct('levels', sequence(0L, {k}L), "
        "'anchor', CAST(NULL AS BIGINT))"
    )

    def compose(acc, s):
        return F.struct(
            F.transform(
                acc["levels"],
                lambda l: F.element_at(
                    s["levels"], (l + 1).cast("int")
                ),
            ).alias("levels"),
            F.when(
                F.element_at(acc["levels"], 1) >= 1, acc["anchor"]
            )
            .otherwise(s["anchor_ms"])
            .alias("anchor"),
        )

    folded = segs.select(
        "user_id", F.aggregate("_segs", init, compose).alias("_m")
    )
    return folded.select(
        "user_id",
        F.element_at("_m.levels", 1).cast("long").alias("level"),
        F.when(
            F.element_at("_m.levels", 1) >= 1, F.col("_m.anchor")
        )
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("entered_ms"),
    )


def compact(spark: SparkSession, stats_dir: str, steps: Sequence[str]) -> DataFrame:
    """Composition is associative: any prefix of a user's segments
    collapses into one summary row whose further merges are exact.
    Returns the fully-merged summary table (what a periodic rewrite
    would commit) — its funnel_state equals the uncompacted one, the
    compaction invariant."""
    k = len(steps)
    raw = spark.read.option("basePath", stats_dir).parquet(stats_dir)
    segs = raw.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("seg_start_ms", "levels", "anchor_ms"))
        ).alias("_segs")
    )
    init = F.expr(
        f"named_struct('start', CAST(NULL AS BIGINT), "
        f"'levels', sequence(0L, {k}L), "
        "'anchor', CAST(NULL AS BIGINT))"
    )

    def compose(acc, s):
        return F.struct(
            F.coalesce(acc["start"], s["seg_start_ms"]).alias("start"),
            F.transform(
                acc["levels"],
                lambda l: F.element_at(
                    s["levels"], (l + 1).cast("int")
                ),
            ).alias("levels"),
            F.when(
                F.element_at(acc["levels"], 1) >= 1, acc["anchor"]
            )
            .otherwise(s["anchor_ms"])
            .alias("anchor"),
        )

    folded = segs.select(
        "user_id", F.aggregate("_segs", init, compose).alias("_m")
    )
    return folded.select(
        "user_id",
        F.col("_m.start").alias("seg_start_ms"),
        F.col("_m.levels").alias("levels"),
        F.col("_m.anchor").alias("anchor_ms"),
    )
