"""Structured Streaming ingestion + per-subdomain robots behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.crawlfix import NOW_MS
from walker_spark.config import FrontierConfig, WalkerConfig
from walker_spark.plans import schemas
from walker_spark.streaming.ingest import stream_seed_urls
from walker_spark.streaming.loop import CrawlEngine


def test_streaming_seed_ingestion_idempotent(spark, tmp_path):
    """readStream -> foreachBatch(ingest_urls): drained files land in
    the frontier once; re-delivered URLs dedupe via the URL-seen
    anti-join (streaming form of S8)."""
    from walker_spark.sources.store import FrontierStore

    root = tmp_path / "store"
    inbox = tmp_path / "inbox"
    ckpt = tmp_path / "ckpt"
    inbox.mkdir()
    store = FrontierStore(spark, str(root), num_buckets=4)
    cfg = WalkerConfig()

    (inbox / "batch1.txt").write_text(
        "http://s1.com/a.html\nhttp://s1.com/b.html\nhttp://s2.com/\n"
    )
    stream_seed_urls(store, cfg, str(inbox), str(ckpt))
    assert store.read("links").count() == 3
    assert store.read("domain_info").count() == 2

    # second file: one new URL + two re-deliveries -> only the new lands
    (inbox / "batch2.txt").write_text(
        "http://s1.com/a.html\nhttp://s2.com/\nhttp://s3.com/new.html\n"
    )
    stream_seed_urls(store, cfg, str(inbox), str(ckpt))
    assert store.read("links").count() == 4
    doms = {r["dom"] for r in store.read("domain_info").collect()}
    assert doms == {"s1.com", "s2.com", "s3.com"}


def test_per_subdomain_robots(spark, tmp_path):
    """robots.txt is fetched and honored per HOST, so a.com and
    www.a.com can disagree (fetcher_test.go:1416 TestFetcherWithRobots
    per-subdomain case)."""
    cfg = WalkerConfig(frontier=FrontierConfig(num_domain_buckets=4))
    engine = CrawlEngine(spark, str(tmp_path), cfg)
    page = b"<html><body>content</body></html>"
    pages = spark.createDataFrame(
        [
            ("http://a.com/robots.txt", b"User-agent: *\nDisallow: /x\n"),
            # www.a.com has no robots.txt -> default allow-all group
            ("http://a.com/x.html", page),
            ("http://www.a.com/x.html", page),
        ],
        "url string, html binary",
    ).select(
        "url",
        F.timestamp_millis(F.lit(1_690_000_000_000)).alias("warc_ts"),
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )
    engine.store.overwrite("pages", pages.select(*[f.name for f in schemas.PAGES.fields]))
    engine.seed(["http://a.com/x.html", "http://www.a.com/x.html"])
    engine.run(1, start_now_ms=NOW_MS)
    links = engine.store.read("links").collect()
    bare = [r for r in links if r["subdom"] == "" and r["robot_ex"]]
    www_fetched = [r for r in links if r["subdom"] == "www" and r["stat"] == 200]
    assert bare, "a.com/x.html must be robots-excluded"
    assert www_fetched, "www.a.com/x.html must be fetched (no robots there)"
