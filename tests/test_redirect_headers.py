"""Redirect hop rows (J6/S5) and header storage (S5) through the full
fetch engine — not just unit fixtures.

Reference semantics: fetcher.go:723-749 (CheckRedirect),
datastore.go:416-436 (hop rows with redto_url), datastore.go:389-395
(response headers stored when configured, multi-values \0-joined).
The table-driven simulation captures a redirect as a page whose only
content is an immediate meta refresh (delay 0); the engine follows the
chain one hop per superstep via the frontier.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from walker_spark.config import FetcherConfig, FrontierConfig, WalkerConfig
from walker_spark.plans import schemas
from walker_spark.streaming.loop import CrawlEngine

NOW0 = 1_700_000_000_000
FINAL_HTML = "<html><body><p>landed content</p></body></html>"


def _pages(spark):
    ts = datetime.datetime(2023, 7, 1, tzinfo=datetime.timezone.utc)
    rows = [
        (
            "http://redir.com/",
            ts,
            b'<html><body><a href="/r1.html">r</a> hello world</body></html>',
            None,
            None,
        ),
        (
            "http://redir.com/r1.html",
            ts,
            b'<html><head><meta http-equiv="refresh" content="0; '
            b'url=/final.html"></head><body></body></html>',
            None,
            None,
        ),
        ("http://redir.com/final.html", ts, FINAL_HTML.encode(), None, None),
    ]
    return spark.createDataFrame(rows, schemas.PAGES)


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    cfg = WalkerConfig(
        frontier=FrontierConfig(num_domain_buckets=4),
        fetcher=FetcherConfig(store_response_headers=True),
    )
    engine = CrawlEngine(spark, str(tmp_path_factory.mktemp("redir")), cfg)
    engine.store.overwrite("pages", _pages(spark))
    engine.seed(["http://redir.com/"])
    engine.run(3, start_now_ms=NOW0)
    return engine


def test_redirect_hop_row(eng):
    """The redirecting URL gets a 301 hop row with redto_url pointing
    at the (normalized, absolute) target — datastore.go:416-436."""
    hops = eng.store.read("links").filter(F.col("redto_url").isNotNull()).collect()
    assert len(hops) == 1
    hop = hops[0]
    assert hop["path"] == "/r1.html"
    assert hop["stat"] == 301
    assert hop["redto_url"] == "http://redir.com/final.html"
    assert hop["fnv"] == 0 and hop["fnv_txt"] == 0  # no body fingerprint


def test_redirect_target_fetched_next_superstep(eng):
    """The redirect target entered the frontier and was crawled."""
    final = (
        eng.store.read("links")
        .filter((F.col("path") == "/final.html") & (F.col("stat") == 200))
        .collect()
    )
    assert len(final) == 1


def test_headers_round_trip(eng):
    """store_response_headers=True persists a deterministic header map;
    multi-valued headers are \0-joined (datastore.go:389-395)."""
    row = (
        eng.store.read("links")
        .filter((F.col("path") == "/final.html") & (F.col("stat") == 200))
        .collect()[0]
    )
    h = row["headers"]
    assert h is not None
    assert h["Content-Length"] == str(len(FINAL_HTML.encode()))
    assert h["Content-Type"].startswith("text/html")
    assert "\x00" in h["Via"]


def test_headers_absent_by_default(spark, tmp_path_factory):
    """Without the config gate the headers column stays NULL (the
    reference's default)."""
    engine = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("redir-nohdr")),
        WalkerConfig(frontier=FrontierConfig(num_domain_buckets=4)),
    )
    engine.store.overwrite("pages", _pages(spark))
    engine.seed(["http://redir.com/"])
    engine.run(1, start_now_ms=NOW0)
    rows = engine.store.read("links").filter(F.col("stat") == 200).collect()
    assert rows and all(r["headers"] is None for r in rows)
