"""Frontier ingestion: seeds and parsed outlinks -> links/domain_info.

Spark restatement of ``walker seed`` / StoreParsedURL (reference:
cmd/cmd.go:398-436, cassandra/datastore.go:440-535 — SURVEY §3.3):

    raw urls -> normalize + primary-key UDF (X1-X4)
             -> URL-seen anti-join (J1, bloom-accelerated)
             -> append links rows at time=epoch
             -> anti-join domain_info (J4 replaces the 20k LRU domain
                cache) -> append new domains
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from walker_spark.config import WalkerConfig
from walker_spark.operators import urlseen
from walker_spark.plans import schemas
from walker_spark.sources.store import FrontierStore


def normalize_to_keys(urls: DataFrame, cfg: WalkerConfig, url_col: str = "url") -> DataFrame:
    """url strings -> (dom, subdom, path, proto, norm_url), dropping
    rows that fail to parse or lack an eTLD+1 (ParseAndNormalizeURL
    returning error, url.go:94-101)."""
    from walker_spark.functions.udfs import make_url_key_udf

    key_udf = make_url_key_udf(cfg.fetcher.purge_sid_list)
    return (
        urls.withColumn("_k", key_udf(F.col(url_col)))
        .select("_k.dom", "_k.subdom", "_k.path", "_k.proto", "_k.norm_url")
        .filter(F.col("dom").isNotNull())
    )


def new_link_rows(keys: DataFrame) -> DataFrame:
    """links rows at time=epoch for not-yet-crawled URLs
    (StoreParsedURL, datastore.go:461-463)."""
    epoch = F.timestamp_millis(F.lit(0))
    row = keys.select("dom", "subdom", "path", "proto").dropDuplicates()
    for field in schemas.LINKS.fields:
        if field.name == "time":
            row = row.withColumn("time", epoch)
        elif field.name not in ("dom", "subdom", "path", "proto"):
            row = row.withColumn(field.name, F.lit(None).cast(field.dataType))
    return row.select(*[f.name for f in schemas.LINKS.fields])


def add_new_domains(store: FrontierStore, keys: DataFrame, cfg: WalkerConfig) -> int:
    """Append domains unseen in domain_info (J4 anti-join; reference
    hasDomain/addDomain, datastore.go:479-535)."""
    if not cfg.frontier.add_new_domains:
        return 0
    existing = store.read("domain_info").select("dom")
    fresh = (
        keys.select("dom")
        .dropDuplicates()
        .join(existing, "dom", "left_anti")
        .select(
            "dom",
            F.lit(cfg.frontier.default_domain_priority).alias("priority"),
            F.lit(None).cast("string").alias("claim_tok"),
            F.lit(None).cast("timestamp").alias("claim_time"),
            F.lit(False).alias("dispatched"),
            F.lit(False).alias("excluded"),
            F.lit(None).cast("string").alias("exclude_reason"),
            F.lit(None).cast("int").alias("tot_links"),
            F.lit(None).cast("int").alias("uncrawled_links"),
            F.lit(None).cast("int").alias("queued_links"),
            F.lit(None).cast("timestamp").alias("last_dispatch"),
            F.lit(None).cast("timestamp").alias("last_empty_dispatch"),
            F.lit(0).cast("long").alias("next_crawl"),
        )
    )
    fresh = fresh.localCheckpoint()
    n = fresh.count()
    if n:
        store.append("domain_info", fresh)
    return n


def ingest_urls(
    store: FrontierStore,
    urls: DataFrame,
    cfg: WalkerConfig,
    use_bloom: bool = False,
    url_col: str = "url",
) -> dict:
    """Normalize, dedup against the seen set, and append the frontier
    rows + any new domains. Returns metrics."""
    keys = normalize_to_keys(urls, cfg, url_col).localCheckpoint()
    unseen = urlseen.filter_unseen(store, keys, use_bloom=use_bloom).localCheckpoint()
    n_new = unseen.count()
    n_domains = add_new_domains(store, unseen, cfg)
    if n_new:
        write_seq = store.version("links") + 1
        rows = new_link_rows(unseen).withColumn("write_seq", F.lit(write_seq).cast("long"))
        store.append("links", rows.select(*[f.name for f in schemas.LINKS.fields]))
    return {"urls_in": keys.count(), "links_new": n_new, "domains_new": n_domains}
