"""Dispatcher job: one segment-generation pass as a DataFrame pipeline.

Spark restatement of the reference dispatcher (reference:
cassandra/dispatcher.go:284-341, 492-994 — SURVEY §3.2):

    eligible domains (undispatched, unexcluded, empty-backoff filter F7)
      -> partition-pruned links scan (S2)
      -> latest-row-per-URL window (F9/W1 — the load-bearing window op)
      -> per-class rank caps (T1; bounds applyInPandas group size)
      -> per-domain selection in applyInPandas (dispatch_core: clusters,
         removable query params, quotas — A5/T2/U1)
      -> segments append (S7, keep-last per key = Cassandra PK collapse)
      -> domain_info merge (stats A2 + dispatched flag + last_dispatch)

Everything before/after the bounded applyInPandas stage is pure
DataFrame ops — Catalyst prunes the links scan to eligible-domain
buckets and AQE handles skew. Scale levers: the links scan shuffles
once on the URL key for the window; mega-domains are bounded by the
rank caps before any Python sees them (O12).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Observation, Window, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from walker_spark.config import WalkerConfig
from walker_spark.operators import dispatch_core
from walker_spark.sources.store import FrontierStore

_EPOCH = "1970-01-01 00:00:00"

_SELECT_OUT = StructType(
    [
        StructField("dom", StringType(), False),
        StructField("subdom", StringType(), False),
        StructField("path", StringType(), False),
        StructField("proto", StringType(), False),
        StructField("time_ms", LongType(), False),
        StructField("seq", IntegerType(), False),
        StructField("tot_links", IntegerType(), False),
        StructField("uncrawled_links", IntegerType(), False),
    ]
)


def latest_links(links: DataFrame) -> DataFrame:
    """Latest crawl state per URL (F9/W1, dispatcher.go:553-577); ties on
    time resolved by write_seq (Cassandra same-PK overwrite).

    Partitioned by ``dom`` only (not the full URL key): within a domain,
    rows sort in clustering order with time DESC, and the first row of
    each (subdom, path, proto) group is the latest — walker's own
    single-pass scan trick (dispatcher.go:560-567) expressed with lag().
    One hash(dom) exchange that every downstream window, groupBy and
    applyInPandas in the dispatcher then reuses — the whole job is a
    single shuffle (verified via .explain: one Exchange, ReusedExchange
    elsewhere). Mega-domain sorts are bounded by Iceberg's matching
    write.sort-order at scale (O2)."""
    w = Window.partitionBy("dom").orderBy(
        "subdom",
        "path",
        "proto",
        F.col("time").desc(),
        F.col("write_seq").desc_nulls_last(),
    )
    prev_key = [
        F.lag("subdom").over(w),
        F.lag("path").over(w),
        F.lag("proto").over(w),
    ]
    is_first = (
        prev_key[0].isNull()
        | (prev_key[0] != F.col("subdom"))
        | (prev_key[1] != F.col("path"))
        | (prev_key[2] != F.col("proto"))
    )
    return links.withColumn("_first", is_first).filter(F.col("_first")).drop("_first")


def _make_select_fn(cfg: WalkerConfig, now_ms: int):
    limit = cfg.dispatcher.max_links_per_segment
    refresh = cfg.dispatcher.refresh_percentage
    min_refresh_ms = int(cfg.dispatcher.min_link_refresh_time * 1000)

    def select_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["subdom", "path", "proto"], kind="mergesort")
        dom = pdf["dom"].iloc[0]
        fnv_txt = [None if pd.isna(v) else int(v) for v in pdf["fnv_txt"]]
        rows = list(
            zip(
                pdf["subdom"],
                pdf["path"],
                pdf["proto"],
                (int(t) for t in pdf["time_ms"]),
                pdf["getnow"],
                fnv_txt,
            )
        )
        selection, tot, uncrawled = dispatch_core.select_segment(
            dom, rows, limit, refresh, min_refresh_ms, now_ms
        )
        # exact pre-cap stats ride in as window columns when present
        # (the single-pass pipeline in run_dispatch); the per-group
        # counts above are the fallback for direct callers/fixtures
        if "_tot" in pdf.columns:
            tot = int(pdf["_tot"].iloc[0])
            uncrawled = int(pdf["_unc"].iloc[0])
        if not selection:
            # marker row so empty dispatches still update domain_info
            return pd.DataFrame(
                {
                    "dom": [dom],
                    "subdom": [""],
                    "path": [""],
                    "proto": [""],
                    "time_ms": [0],
                    "seq": [-1],
                    "tot_links": [tot],
                    "uncrawled_links": [uncrawled],
                }
            )
        return pd.DataFrame(
            {
                "dom": dom,
                "subdom": [s for s, _, _, _ in selection],
                "path": [p for _, p, _, _ in selection],
                "proto": [pr for _, _, pr, _ in selection],
                "time_ms": [t for _, _, _, t in selection],
                "seq": list(range(len(selection))),
                "tot_links": tot,
                "uncrawled_links": uncrawled,
            }
        )

    return select_fn


def eligible_domains(domain_info: DataFrame, now_ms: int, cfg: WalkerConfig) -> DataFrame:
    """Undispatched, unexcluded domains outside the empty-dispatch
    backoff window (dispatcher.go:301-303, 519-531 — F7)."""
    retry_ms = int(cfg.dispatcher.empty_dispatch_retry_interval * 1000)
    ld = F.coalesce(F.unix_millis(F.col("last_dispatch")), F.lit(0))
    led = F.coalesce(F.unix_millis(F.col("last_empty_dispatch")), F.lit(0))
    backoff = (led > ld) & ((F.lit(now_ms) - led) < F.lit(retry_ms))
    return domain_info.filter(
        (~F.col("dispatched")) & (~F.col("excluded")) & (~backoff)
    )


def run_dispatch(
    store: FrontierStore,
    cfg: WalkerConfig,
    now_ms: int,
    iteration: int = 0,
) -> dict:
    """One dispatcher pass (oneShot(1), dispatcher.go:115-126).
    ``now_ms`` is passed explicitly for determinism (tests freeze it)."""
    import time as _time

    timings: dict[str, float] = {}
    _t0 = _time.time()

    def _mark(stage: str) -> None:
        nonlocal _t0
        timings[stage] = round(_time.time() - _t0, 2)
        _t0 = _time.time()

    domain_info = store.read("domain_info")
    eligible = eligible_domains(domain_info, now_ms, cfg).select("dom")

    links = store.read("links").join(eligible, "dom", "left_semi")
    latest = latest_links(links).select(
        "dom",
        "subdom",
        "path",
        "proto",
        F.unix_millis(F.col("time")).alias("time_ms"),
        F.coalesce(F.col("getnow"), F.lit(False)).alias("getnow"),
        F.col("fnv_txt"),
    )

    # Per-class rank caps (T1/O5): bound each domain's candidate set
    # before Python. getnow/uncrawled capped at the segment limit in
    # clustering order (dispatcher.go:569-572, 612-614); crawled capped
    # at max_crawled_candidates oldest-first (scale knob; the reference
    # is unbounded here, which cannot survive a mega-domain).
    limit = cfg.dispatcher.max_links_per_segment
    crawled_cap = max(limit, cfg.frontier.max_crawled_candidates)
    # Per-class rank = running count of same-class rows, over windows
    # partitioned by dom only (reuses the latest_links exchange).
    w_clu = Window.partitionBy("dom").orderBy("subdom", "path", "proto").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_old = Window.partitionBy("dom").orderBy(
        "time_ms", "subdom", "path", "proto"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_uncrawled = F.col("time_ms") == 0
    cls = (
        F.when(F.col("getnow"), F.lit(0)).when(is_uncrawled, F.lit(1)).otherwise(F.lit(2))
    )
    # Exact per-domain stats (A2) computed pre-cap in the SAME window
    # pass (unbounded frame over the dom partition — the rows already
    # sit sorted by dom from the latest-row window, so this adds no
    # exchange and no sort). They ride the capped rows into the
    # selection as `_tot`/`_unc`; round 2 computed them in a separate
    # groupBy branch, which re-ran the whole window pipeline a second
    # time and then paid a join to stitch the results back.
    w_dom = Window.partitionBy("dom").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    capped = (
        latest.withColumn("_cls", cls)
        .withColumn("_tot", F.count(F.lit(1)).over(w_dom).cast("int"))
        .withColumn("_unc", F.sum(is_uncrawled.cast("int")).over(w_dom).cast("int"))
        .withColumn(
            "_rk",
            F.when(
                F.col("_cls") == 2,
                F.sum((cls == 2).cast("int")).over(w_old),
            ).otherwise(
                F.when(
                    F.col("_cls") == 0,
                    F.sum((cls == 0).cast("int")).over(w_clu),
                ).otherwise(F.sum((cls == 1).cast("int")).over(w_clu)),
            ),
        )
        .filter(
            (F.col("_cls") == 0) & (F.col("_rk") <= limit)
            | (F.col("_cls") == 1) & (F.col("_rk") <= limit)
            | (F.col("_cls") == 2) & (F.col("_rk") <= crawled_cap)
        )
        .drop("_cls", "_rk")
    )

    selected = capped.groupBy("dom").applyInPandas(
        _make_select_fn(cfg, now_ms), _SELECT_OUT
    )
    selected = selected.localCheckpoint()  # one computation, two sinks
    _mark("select")

    link_rows = selected.filter(F.col("seq") >= 0)
    # Cassandra PK collapse: duplicate keys keep the last insert (U1/T3).
    w_last = Window.partitionBy("dom", "subdom", "path", "proto").orderBy(
        F.col("seq").desc()
    )
    segment = (
        link_rows.withColumn("_rn", F.row_number().over(w_last))
        .filter(F.col("_rn") == 1)
        .select(
            "dom",
            "subdom",
            "path",
            "proto",
            F.timestamp_millis(F.col("time_ms")).alias("time"),
        )
    )
    # ZERO extra metrics jobs: the segment-row count rides the segment
    # append as an Observation (the row_number-collapsed rows ARE the
    # distinct queued keys), and the dispatched-domain count rides the
    # domain_info merge below. A 0-row append commits an empty delta,
    # which store.read skips by design.
    seg_obs = Observation()
    segment = segment.observe(seg_obs, F.count(F.lit(1)).alias("n_seg"))
    store.append("segments", segment)
    n_segment_rows = int(seg_obs.get["n_seg"])
    _mark("segment_write")

    # domain_info merge (S7): every eligible domain gets stats + the
    # dispatched flag + last_dispatch/last_empty_dispatch = now
    # (insertSegment, dispatcher.go:941-994) — including domains with no
    # links at all, whose empty dispatch engages the F7 backoff.
    # queued_links counts pre-collapse rows.
    upd_agg = selected.groupBy("dom").agg(
        F.max("tot_links").alias("u_tot"),
        F.max("uncrawled_links").alias("u_uncrawled"),
        F.sum((F.col("seq") >= 0).cast("int")).cast("int").alias("u_queued"),
    )
    upd = eligible.join(upd_agg, "dom", "left").select(
        "dom",
        F.coalesce("u_tot", F.lit(0)).alias("u_tot"),
        F.coalesce("u_uncrawled", F.lit(0)).alias("u_uncrawled"),
        F.coalesce("u_queued", F.lit(0)).alias("u_queued"),
    )
    now_ts = F.timestamp_millis(F.lit(now_ms))
    merged = (
        domain_info.join(upd, "dom", "left")
        .withColumn("_hit", F.col("u_tot").isNotNull())
        .withColumn("_got", F.coalesce(F.col("u_queued") > 0, F.lit(False)))
        .select(
            "dom",
            "priority",
            "claim_tok",
            "claim_time",
            F.when(F.col("_hit"), F.col("_got")).otherwise(F.col("dispatched")).alias("dispatched"),
            "excluded",
            "exclude_reason",
            F.when(F.col("_hit"), F.col("u_tot")).otherwise(F.col("tot_links")).alias("tot_links"),
            F.when(F.col("_hit"), F.col("u_uncrawled"))
            .otherwise(F.col("uncrawled_links"))
            .alias("uncrawled_links"),
            F.when(F.col("_hit"), F.col("u_queued")).otherwise(F.col("queued_links")).alias("queued_links"),
            F.when(F.col("_hit") & F.col("_got"), now_ts)
            .otherwise(F.col("last_dispatch"))
            .alias("last_dispatch"),
            F.when(F.col("_hit") & ~F.col("_got"), now_ts)
            .otherwise(F.col("last_empty_dispatch"))
            .alias("last_empty_dispatch"),
            "next_crawl",
            "_hit",
            "_got",
        )
    )
    # domains dispatched non-empty == rows hit with a queued row;
    # observed during the merge write, no separate count job. The
    # observation sits at the TOP of the written plan — an observe
    # under a join gets pruned (with its metrics) when Catalyst folds
    # an empty side, which leaves Observation.get with no row.
    dom_obs = Observation()
    merged = merged.observe(
        dom_obs, F.count(F.when(F.col("_hit") & F.col("_got"), True)).alias("n_dom")
    ).drop("_hit", "_got")
    store.overwrite("domain_info", merged)
    n_dispatched = int(dom_obs.get["n_dom"])
    _mark("domain_info_merge")

    metrics = {
        "segment_rows": n_segment_rows,
        "domains_dispatched": n_dispatched,
        "now_ms": now_ms,
        "timings": timings,
    }
    store.record_run("dispatch", iteration, {"metrics": metrics})
    return metrics
