"""Adaptive recrawl scheduling: per-URL change-rate estimation from
crawl history (Cho & Garcia-Molina, "Effective Page Refresh Policies
for Web Crawlers", TODS 2003).

The reference engine recrawls on a STATIC policy — a global
``refresh_percentage`` / ``min_link_refresh_time`` pair
(reference: config.go:68-70; dispatch F6/T2 implement it). The
adaptive upgrade every production crawler grows into is estimating
each page's change rate from its own fetch history (content
fingerprints across visits) and spacing revisits so crawl budget
concentrates where content actually moves.

All outputs are exact integers (the driver-hash rule): rates are ppm
(`changes * 10^6 div intervals`), intervals integer-ms `div`, so the
DuckDB oracle replays every value bit-for-bit — no ln()/float
estimator in the emitted columns (the Poisson-MLE refinement
-ln(1 - X/n) is monotone in X/n for fixed n, so ranking and
thresholding on change_ppm decide identically).

Scale shape: ONE exchange keyed on the URL (the window that orders
each URL's history), then a per-URL aggregate with map-side partials;
history rows carry (url, time, 32-byte key) — page bytes never move.
A URL's whole history lands on one task, bounded by revisit count
(hundreds), never corpus size.

The stats row ``(url, n_obs, n_changes, first_t, last_t, first_key,
last_key)`` is MERGEABLE for event-time-ordered batches (a crawl's
own fetch log is monotone per URL): counts add, the boundary
transition compares the older run's last_key to the newer run's
first_key — ``streaming/recrawl_stream.py`` maintains it
incrementally and derives the identical schedule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def history_stats(
    history: DataFrame,
    url_col: str = "url",
    time_col: str = "ts",
    key_col: str = "content_key",
) -> DataFrame:
    """Per-URL mergeable change statistics: ``(url, n_obs, n_changes,
    first_t, last_t, first_key, last_key)`` — times in epoch ms,
    history ordered by (time, key) so equal-timestamp rows are
    deterministic; first/last ride the aggregate as struct min/max (no
    second pass)."""
    t_ms = F.unix_millis(F.col(time_col).cast("timestamp"))
    seq = history.select(
        F.col(url_col).alias("url"),
        t_ms.alias("_t"),
        F.col(key_col).alias("_k"),
    ).withColumn(
        "_prev", F.lag("_k").over(Window.partitionBy("url").orderBy("_t", "_k"))
    )
    return seq.groupBy("url").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(
            (F.col("_prev").isNotNull() & (F.col("_prev") != F.col("_k")))
            .cast("long")
        )
        .cast("long")
        .alias("n_changes"),
        F.min(F.struct("_t", "_k"))["_t"].alias("first_t"),
        F.max(F.struct("_t", "_k"))["_t"].alias("last_t"),
        F.min(F.struct("_t", "_k"))["_k"].alias("first_key"),
        F.max(F.struct("_t", "_k"))["_k"].alias("last_key"),
    )


def derive_schedule(
    stats: DataFrame,
    min_interval_ms: int = 3_600_000,
    max_interval_ms: int = 30 * 86_400_000,
) -> DataFrame:
    """Turn :func:`history_stats` rows into the schedule columns (see
    :func:`change_rate_estimates` for the laws)."""
    if not 0 < min_interval_ms <= max_interval_ms:
        raise ValueError(
            f"need 0 < min <= max interval: {min_interval_ms}, {max_interval_ms}"
        )
    intervals = F.col("n_obs") - F.lit(1)
    change_ppm = F.when(
        intervals > 0,
        F.expr("n_changes * CAST(1000000 AS BIGINT) div (n_obs - 1)"),
    ).otherwise(F.lit(0))
    mean_interval = F.when(
        intervals > 0, F.expr("(last_t - first_t) div (n_obs - 1)")
    ).otherwise(F.lit(0))
    raw_suggest = F.when(
        intervals > 0,
        F.expr("(last_t - first_t) div greatest(n_changes, CAST(1 AS BIGINT))"),
    ).otherwise(F.lit(max_interval_ms))
    suggested = F.greatest(
        F.lit(min_interval_ms),
        F.least(F.lit(max_interval_ms), raw_suggest),
    )
    return stats.select(
        "url",
        "n_obs",
        "n_changes",
        change_ppm.cast("long").alias("change_ppm"),
        mean_interval.cast("long").alias("mean_interval_ms"),
        suggested.cast("long").alias("suggested_interval_ms"),
        (F.col("last_t") + suggested).cast("long").alias("next_fetch_ms"),
    )


def change_rate_estimates(
    history: DataFrame,
    url_col: str = "url",
    time_col: str = "ts",
    key_col: str = "content_key",
    min_interval_ms: int = 3_600_000,
    max_interval_ms: int = 30 * 86_400_000,
) -> DataFrame:
    """Per-URL change statistics and a suggested revisit interval:
    ``(url, n_obs, n_changes, change_ppm, mean_interval_ms,
    suggested_interval_ms, next_fetch_ms)``, all BIGINT.

    - ``n_changes``: fetches whose content key differs from the
      previous fetch's (history ordered by (time, key) — the key
      tiebreak makes equal-timestamp rows deterministic).
    - ``change_ppm = n_changes * 10^6 div (n_obs - 1)`` — the observed
      change frequency per revisit, in parts-per-million.
    - ``suggested_interval_ms``: observed span div max(n_changes, 1)
      (≈ one expected change per revisit), clamped to
      [min_interval_ms, max_interval_ms]. URLs with a single
      observation carry no evidence and get ``max_interval_ms``
      (a fresh page earns fast recrawl by changing, not by being new —
      the budget-safe default at 10^10 URLs).
    - ``next_fetch_ms = last observed time + suggested interval``.
    """
    return derive_schedule(
        history_stats(history, url_col, time_col, key_col),
        min_interval_ms,
        max_interval_ms,
    )


def crawl_budget(
    rates: DataFrame,
    budget_fetches: int,
    window_ms: int = 30 * 86_400_000,
    fallback_interval_ms: int = 30 * 86_400_000,
    partitions: int | None = None,
) -> DataFrame:
    """Budget-constrained refresh allocation over change-rate
    estimates: spend a global fetch budget (fetches per ``window_ms``)
    on the most change-active URLs first. Cho & Garcia-Molina's core
    observation is that a crawler cannot afford to chase every change;
    ranking by OBSERVED change activity concentrates the refresh
    budget where it buys freshness, and everyone else falls back to a
    slow floor instead of silently starving.

    - cost of a URL = ``window_ms div suggested_interval_ms`` — its
      fetches per window at the desired cadence;
    - URLs rank by (change_ppm, n_obs, url) in descending-activity
      order (url is unique, so the order is total — deterministic);
    - a distributed weighted prefix sum over that order (the
      assign_shards machinery: repartitionByRange localCheckpointed
      ONCE, per-partition cost totals as a broadcast offset table,
      local cumulative window keyed on the partition id) funds desired
      cadences until the budget is exhausted; PREFIX semantics — the
      budget funds a maximal prefix of the ranking, and the first URL
      whose cost would cross the budget is demoted along with
      everything ranked after it (no greedy fill-in: funding a
      less-active URL past a starved more-active one would invert the
      priority order and make the allocation order-sensitive);
    - unfunded URLs get ``fallback_interval_ms``.

    Output: ``(url, change_ppm, n_obs, cost_fetches,
    suggested_interval_ms, granted_interval_ms, demoted)`` — all
    BIGINT (demoted 0/1), exact-oracle integer arithmetic
    throughout."""
    if budget_fetches < 0:
        raise ValueError(f"budget must be >= 0: {budget_fetches}")
    spark = rates.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    order = [
        F.col("change_ppm").desc(),
        F.col("n_obs").desc(),
        F.col("url").asc(),
    ]
    ranged = (
        rates.select(
            "url",
            "change_ppm",
            "n_obs",
            "suggested_interval_ms",
            F.expr(
                f"CAST({int(window_ms)} AS BIGINT)"
                " div greatest(suggested_interval_ms, 1)"
            ).alias("cost_fetches"),
        )
        .repartitionByRange(p, *order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w_prev = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.sum("cost_fetches").alias("_cnt"))
        .select(
            "_pid",
            F.coalesce(F.sum("_cnt").over(w_prev), F.lit(0)).alias("_off"),
        )
    )
    w_pid = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    funded = (
        F.col("_off") + F.col("_local") + F.col("cost_fetches")
        <= F.lit(int(budget_fetches))
    )
    return (
        ranged.withColumn(
            "_local",
            F.coalesce(F.sum("cost_fetches").over(w_pid), F.lit(0)),
        )
        .join(F.broadcast(offsets), "_pid")
        .select(
            "url",
            "change_ppm",
            "n_obs",
            "cost_fetches",
            "suggested_interval_ms",
            F.when(funded, F.col("suggested_interval_ms"))
            .otherwise(F.lit(int(fallback_interval_ms)))
            .cast("long")
            .alias("granted_interval_ms"),
            (~funded).cast("long").alias("demoted"),
        )
    )
