"""Engine-level link-extraction parity: iframe/object/embed sources,
meta http-equiv refresh, href with spaces, response-body storage
(fetcher_test.go:793, 1070, 1773, 1587 behaviors through the full
pipeline)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.crawlfix import NOW_MS
from walker_spark.config import FetcherConfig, FrontierConfig, WalkerConfig
from walker_spark.plans import schemas
from walker_spark.streaming.loop import CrawlEngine

ROOT = """<html><head>
<meta http-equiv="refresh" content="5; url=/refreshed.html">
<title>Extraction</title></head><body>
<a href="/with space.html">spaced</a>
<iframe src="/frame.html"></iframe>
<object data="/obj.html"></object>
<embed src="/emb.html">
<img src="/image.png">
<script src="/script.js"></script>
<p>body text</p>
</body></html>"""


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    cfg = WalkerConfig(
        fetcher=FetcherConfig(store_response_body=True),
        frontier=FrontierConfig(num_domain_buckets=4),
    )
    engine = CrawlEngine(spark, str(tmp_path_factory.mktemp("extract")), cfg)
    pages = spark.createDataFrame(
        [("http://ext.com/", ROOT.encode("utf-8"))], "url string, html binary"
    ).select(
        "url",
        F.timestamp_millis(F.lit(1_690_000_000_000)).alias("warc_ts"),
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )
    engine.store.overwrite("pages", pages.select(*[f.name for f in schemas.PAGES.fields]))
    engine.seed(["http://ext.com/"])
    engine.run(1, start_now_ms=NOW_MS)
    return engine


def test_link_tags_extracted(crawled):
    """a/iframe/object/embed + meta-refresh produce frontier rows;
    img/script are in the default ignore_tags (parse.go:135-154,
    config.go:128)."""
    paths = {
        r["path"]
        for r in crawled.store.read("links")
        .filter(F.unix_millis("time") == 0)
        .collect()
    }
    assert {"/frame.html", "/obj.html", "/emb.html", "/refreshed.html"} <= paths
    assert "/image.png" not in paths
    assert "/script.js" not in paths


def test_href_with_space_normalized(crawled):
    """Spaces in hrefs are percent-encoded in the stored RequestURI
    (Go URL.RequestURI escaping; fetcher_test.go:793)."""
    paths = {r["path"] for r in crawled.store.read("links").collect()}
    assert "/with%20space.html" in paths


def test_store_response_body(crawled):
    """store_response_body keeps the page body on the fetch row
    (schema.go:62-63; fetcher_test.go:1587)."""
    row = (
        crawled.store.read("links")
        .filter((F.col("path") == "/") & (F.col("stat") == 200))
        .collect()[0]
    )
    assert row["body"] is not None and "body text" in row["body"]
