"""Ordered-funnel analytics over event streams — which users
completed step 1 → 2 → … → K IN ORDER, and where they dropped off.

The events surface already has sessionization, windowed rollups,
as-of attribution and range joins (streaming/windowed.py, joins.py);
the funnel is the remaining classic: ORDERED multi-step sequence
matching, the query product analytics engines special-case because
naive SQL needs a K-way self-join.

Semantics — FIRST-TOUCH, NO RESTART (documented subset of the many
industry variants): a user's chain anchors at their earliest step-1
event; each later step matches at its earliest event strictly after
the previous match in (time, event_id) order; an optional
``span_ms`` requires every later step within that window of the
anchor. No re-anchoring on failure — re-dated retries are a separate
funnel run.

Scale shape: events filter to the K step types at the scan (pushed
predicate), then ONE user-keyed exchange builds the per-user sorted
step-event array — the rows carry only (ms, id, type) triples, never
payloads, and a mega-user is a hot REDUCE key, not a hot window
partition. The greedy chain evaluates as a ZERO-EXCHANGE fold
(aggregate() with a (level, anchor) struct accumulator), and the
funnel rollup is a K-row aggregate. Greedy-earliest over the sorted
array is provably equivalent to K chained conditional mins
("earliest step-i event after match i-1"), which is exactly how the
DuckDB oracle computes it — two different algorithms, one contract
(the asof_join precedent).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lit(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def funnel_users(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    span_ms: int | None = None,
) -> DataFrame:
    """Per-user funnel state: ``(user_id, level, entered_ms)`` —
    ``level`` ∈ [0, K] is the deepest step reached under the ordered
    first-touch semantics, ``entered_ms`` the epoch-ms of the step-1
    anchor (-1 if the user never did step 1). Covers users with at
    least one step-type event (others have no funnel signal)."""
    k = len(steps)
    if k == 0:
        raise ValueError("funnel needs at least one step")
    steps_arr = "array(" + ", ".join(_lit(s) for s in steps) + ")"
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    ev = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("_u"),
        F.struct(
            ms.alias("ms"),
            F.col(id_col).alias("id"),
            F.col(type_col).alias("typ"),
        ).alias("_e"),
    )
    span_cond = (
        f"x.ms - acc.t1 <= {int(span_ms)}" if span_ms is not None else "true"
    )
    fold = (
        "aggregate(_evs, named_struct('lvl', 0, 't1', CAST(0 AS BIGINT)), "
        f"(acc, x) -> CASE WHEN acc.lvl < {k} "
        f"AND x.typ = element_at({steps_arr}, acc.lvl + 1) "
        f"AND (acc.lvl = 0 OR ({span_cond})) "
        "THEN named_struct('lvl', acc.lvl + 1, "
        "'t1', IF(acc.lvl = 0, x.ms, acc.t1)) "
        "ELSE acc END)"
    )
    return (
        ev.groupBy("_u")
        .agg(F.array_sort(F.collect_list("_e")).alias("_evs"))
        .select(F.col("_u"), F.expr(fold).alias("_f"))
        .select(
            F.col("_u").alias(user_col),
            F.col("_f.lvl").cast("long").alias("level"),
            F.when(F.col("_f.lvl") > 0, F.col("_f.t1"))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("entered_ms"),
        )
    )


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    span_ms: int | None = None,
) -> DataFrame:
    """The funnel itself: one row per step ``(step, step_name, users,
    conversion_ppm)`` — users who reached at least that step, and the
    exact-integer conversion rate vs step 1 (ppm, floor division;
    zero-user funnels report 0). Every step appears even at zero
    users. The per-level histogram is K+1 rows, so the rollup joins
    are driver-trivial regardless of corpus size."""
    spark = events.sparkSession
    users = funnel_users(
        events, steps, user_col, type_col, ts_col, id_col, span_ms
    )
    lvls = users.groupBy("level").agg(F.count(F.lit(1)).alias("_n"))
    steps_df = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)],
        "step long, step_name string",
    )
    reached = (
        steps_df.join(lvls, F.col("level") >= F.col("step"), "left")
        .groupBy("step", "step_name")
        .agg(F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("users"))
    )
    first = reached.filter(F.col("step") == 1).select(
        F.col("users").alias("_u1")
    )
    return reached.crossJoin(F.broadcast(first)).select(
        "step",
        "step_name",
        "users",
        F.expr(
            "CASE WHEN _u1 > 0 THEN (users * 1000000) div _u1 "
            "ELSE CAST(0 AS BIGINT) END"
        ).alias("conversion_ppm"),
    )


# ---------------------------------------------------------------------------
# Markov transition model (next-action analytics)
# ---------------------------------------------------------------------------


def transition_model(
    events: DataFrame,
    user_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition model over per-user event
    sequences: for every observed (src → dst) pair of CONSECUTIVE
    states in a user's (ts, id)-ordered stream,

        (src, dst, cnt, src_total, p_ppm)

    with ``p_ppm = cnt * 1e6 div src_total`` — the maximum-likelihood
    next-state probability in integer parts-per-million (exact
    cross-engine, the repo-wide no-float rule for driver-compared
    columns). A user's last event emits no pair; single-event users
    contribute nothing.

    Scale shape: ONE user-keyed exchange for the lead() window — rows
    carry only (user, state, ms, id), never payloads — then a
    (src, dst)-keyed hash agg with map-side partials; ``src_total``
    is a second-level rollup of the pair counts (sum over dst), NOT a
    re-scan of events. A mega-user is a hot window partition ONLY for
    the lead pass, which is O(1) state per row; the heavy reduce keys
    (popular transitions) are hash-agg keys with partial aggregation,
    the anchor_text_agg precedent."""
    from pyspark.sql import Window

    pairs = (
        events.select(
            F.col(user_col).alias("_u"),
            F.col(state_col).alias("src"),
            F.col(ts_col).alias("_ts"),
            F.col(id_col).alias("_id"),
        )
        .withColumn(
            "dst",
            F.lead("src").over(
                Window.partitionBy("_u").orderBy(
                    F.col("_ts").asc(), F.col("_id").asc()
                )
            ),
        )
        .filter(F.col("dst").isNotNull())
    )
    cnt = pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    # src_total as a window over the aggregated pair table (partitions
    # bounded by the state alphabet) — a groupBy+join-back here would
    # recompute the whole lead() pipeline for the totals branch
    w_src = Window.partitionBy("src").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return cnt.withColumn(
        "src_total", F.sum("cnt").over(w_src).cast("long")
    ).select(
        "src",
        "dst",
        "cnt",
        "src_total",
        F.expr("CAST(cnt * 1000000 div src_total AS BIGINT)").alias("p_ppm"),
    )


def top_transitions(model: DataFrame, k: int = 3) -> DataFrame:
    """Top-``k`` next states per source state from a
    :func:`transition_model` frame, ranked ``cnt desc, dst asc``
    (deterministic tie-break): adds ``rank``. Window partitions are
    bounded by the state-alphabet size (distinct dst per src), never
    by event volume."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    w = Window.partitionBy("src").orderBy(F.col("cnt").desc(), F.col("dst").asc())
    return (
        model.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix — the third classic of the
    event-sequence tier (funnel = ordered steps, Markov = next
    action, retention = do they come back): users cohort by the
    period of their FIRST activity, and each (cohort, offset) cell
    counts distinct users active ``offset`` periods later.

        (cohort_period, period_offset, n_users, cohort_size,
         retention_ppm)

    with ``period = epoch_day div period_days`` and ``retention_ppm
    = n_users * 1e6 div cohort_size`` — all BIGINT (epoch-integer
    periods, integer div), cross-engine exact; offset 0 is the cohort
    itself (retention_ppm = 1e6).

    Scale shape: activity first collapses to DISTINCT (user, period)
    — a two-phase hash agg whose map-side partials kill the per-event
    volume before any wire — then the first-touch min and the
    cohort join are user-keyed on that already-tiny frame, and the
    matrix is a (cohort, offset)-keyed agg bounded by periods².
    Nothing here ever re-reads raw events twice."""
    if period_days < 1:
        raise ValueError(f"period_days must be >= 1: {period_days}")
    period = F.expr(
        f"CAST((unix_millis(CAST({ts_col} AS TIMESTAMP)) div 86400000)"
        f" div {int(period_days)} AS BIGINT)"
    )
    from pyspark.sql import Window

    acts = (
        events.select(
            F.col(user_col).alias("_u"), period.alias("period")
        )
        .distinct()
    )
    # first-touch cohort as a window over the distinct activity table
    # and cohort_size as a window over the (periods^2-bounded) matrix —
    # the groupBy+join-back forms would recompute the activity distinct
    # once per branch (single-lineage rule; no joins anywhere)
    w_u = Window.partitionBy("_u").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ret = (
        acts.withColumn("cohort", F.min("period").over(w_u))
        .groupBy(
            "cohort",
            (F.col("period") - F.col("cohort")).alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    w_c = Window.partitionBy("cohort").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return ret.withColumn(
        "cohort_size",
        F.max(
            F.when(F.col("period_offset") == 0, F.col("n_users"))
        ).over(w_c).cast("long"),
    ).select(
        F.col("cohort").cast("long").alias("cohort_period"),
        F.col("period_offset").cast("long").alias("period_offset"),
        "n_users",
        "cohort_size",
        F.expr("CAST(n_users * 1000000 div cohort_size AS BIGINT)").alias(
            "retention_ppm"
        ),
    )


def top_paths(
    events: DataFrame,
    length: int = 3,
    k: int = 10,
    user_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-``k`` most common user journeys of ``length`` consecutive
    states (the sankey / path-analysis classic; the higher-order
    companion to :func:`transition_model`): every sliding window of
    ``length`` states in a user's (ts, id)-ordered stream counts
    once. Returns ``(path, cnt, rank)`` — ``path`` is the
    '>'-joined state sequence, ranked (cnt desc, path asc).

    Scale shape: ONE user-keyed exchange evaluates all ``length-1``
    lead() columns in a single window pass (rows carry only states
    and order keys), then a path-keyed hash agg with map-side
    partials and a sort-limit top-k (TakeOrdered — never a full
    sort)."""
    from pyspark.sql import Window

    if length < 2:
        raise ValueError(f"length must be >= 2: {length}")
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    w = Window.partitionBy("_u").orderBy(F.col("_ts").asc(), F.col("_id").asc())
    base = events.select(
        F.col(user_col).alias("_u"),
        F.col(state_col).alias("_s0"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
    )
    for i in range(1, length):
        base = base.withColumn(f"_s{i}", F.lead("_s0", i).over(w))
    path = F.concat_ws(">", *[F.col(f"_s{i}") for i in range(length)])
    return (
        base.filter(F.col(f"_s{length - 1}").isNotNull())
        .select(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("path"))
        .limit(k)
        .select(
            "path",
            "cnt",
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), F.asc("path")))
            .cast("int")
            .alias("rank"),
        )
    )
