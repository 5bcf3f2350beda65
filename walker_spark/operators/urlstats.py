"""URL-space analytics: template mining over crawled/linked URLs.

A crawl's enemy at scale is the infinite URL space — calendars,
faceted search, session-id paths — where one site generates unbounded
distinct URLs from one page template. The reference engine defends
per-URL (normalization purges session ids, param voting collapses
query variants — functions/urlkernel.py, dispatch_core.py; reference
cassandra/dispatcher.go's dedup pass); template mining is the
CORPUS-level view: collapse every path's digit runs to a pattern and
rank patterns by volume per host, so the trap pages (one template,
millions of URLs) surface as a report a crawl operator can turn into
accept-filter rules (fetch.py F2).

Scale shape: template derivation is a zero-shuffle projection
(parse_url + one regexp, whole-stage codegen); the rollup is a
two-phase hash aggregate keyed on (host, template, url) then (host,
template) — map-side partials collapse repeats before either
exchange, so the shuffle carries template-cardinality rows, never URL
volume; the per-host top-k window partitions on host with
template-bounded input. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def url_templates(
    df: DataFrame, url_col: str = "url", top_k: int = 10
) -> DataFrame:
    """Per-host top-``top_k`` path templates: ``(host, template,
    n_urls, n_distinct, rank)`` where ``template`` is the URL path
    with every digit run collapsed to ``N`` (query strings are out of
    scope — the param-voting dedup owns those), ``n_urls`` counts rows
    (link occurrences), ``n_distinct`` distinct URLs, and ``rank``
    orders by (n_urls desc, template) within the host — deterministic,
    oracle-exact. A template with huge ``n_distinct`` and one shape is
    the crawl-trap signature."""
    if top_k < 1:
        raise ValueError(f"top_k must be positive: {top_k}")
    # try_parse_url: ANSI mode makes plain parse_url THROW on the
    # malformed URLs any real link corpus contains (CLAUDE.md gotcha)
    u = df.select(
        F.try_parse_url(F.col(url_col), F.lit("HOST")).alias("host"),
        F.regexp_replace(
            F.coalesce(
                F.try_parse_url(F.col(url_col), F.lit("PATH")), F.lit("")
            ),
            "[0-9]+",
            "N",
        ).alias("template"),
        F.col(url_col).alias("_url"),
    ).filter(F.col("host").isNotNull())
    per_url = u.groupBy("host", "template", "_url").agg(
        F.count(F.lit(1)).alias("_n")
    )
    agg = per_url.groupBy("host", "template").agg(
        F.sum("_n").cast("long").alias("n_urls"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    w = Window.partitionBy("host").orderBy(
        F.col("n_urls").desc(), F.col("template")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select("host", "template", "n_urls", "n_distinct", "rank")
    )


def politeness_audit(
    fetches: DataFrame,
    crawl_delay_ms: int,
    dom_col: str = "dom",
    time_col: str = "time_ms",
) -> DataFrame:
    """Per-domain politeness compliance over the crawl HISTORY: did the
    engine actually honor its delay envelope (reference config.go's
    ≤10 URL/s/process politeness contract; fetch.py enforces it
    forward — this is the audit that proves it backward, the report a
    crawl operator pulls when a webmaster complains).

    Input: one row per fetch event (domain, epoch-ms). Per domain the
    consecutive-fetch intervals are the diffs of the time-sorted
    sequence — well-defined as a multiset even under timestamp ties,
    so the report is deterministic and the DuckDB oracle matches
    bit-for-bit (pure integer ms; ``avg_interval_ms`` is an integer
    ``div``). Output ``(dom, n_fetches, min_interval_ms,
    avg_interval_ms, violations)`` with ``violations`` = intervals
    strictly below ``crawl_delay_ms``; single-fetch domains emit no
    row (no interval to audit — sparse contract).

    Scale shape: one hash exchange on dom feeding a lag window, then a
    dom-keyed aggregate with map-side partials. A mega-domain is a hot
    window partition here; at 10^9-fetch domains, pre-segment the
    history by (dom, time-bucket) and merge boundary terms — the
    mergeable-segment fold streaming/recrawl_stream.py already
    implements for change stats (same law, kept simple here because
    the audit is an offline report, not a superstep).
    """
    w = Window.partitionBy("dom").orderBy("t")
    iv = (
        fetches.select(
            F.col(dom_col).alias("dom"), F.col(time_col).cast("long").alias("t")
        )
        .withColumn("_prev", F.lag("t").over(w))
        .filter(F.col("_prev").isNotNull())
        .select("dom", (F.col("t") - F.col("_prev")).alias("_iv"))
    )
    return iv.groupBy("dom").agg(
        (F.count(F.lit(1)) + 1).cast("long").alias("n_fetches"),
        F.min("_iv").cast("long").alias("min_interval_ms"),
        F.expr("sum(_iv) div count(1)").cast("long").alias("avg_interval_ms"),
        F.sum((F.col("_iv") < crawl_delay_ms).cast("long"))
        .cast("long")
        .alias("violations"),
    )
