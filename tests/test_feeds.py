"""RSS/Atom feed source: parse fields + edge cases, HTML
autodiscovery, frontier seeding."""

from __future__ import annotations

from walker_spark.config import WalkerConfig
from walker_spark.operators.feeds import (
    feeds_from_html,
    parse_feeds,
    seed_from_feeds,
)

_RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
 <title>site</title><link>http://a.com/</link>
 <item><link> http://a.com/post1 </link>
   <pubDate>Tue, 5 Mar 2024 12:00:00 GMT</pubDate>
   <guid isPermaLink="false">tag-1</guid></item>
 <item><link>http://b.net/cross?x=1&amp;y=2</link>
   <pubDate>garbage date</pubDate></item>
 <item><link>http://a.com/feb30</link>
   <pubDate>Fri, 30 Feb 2024 00:00:00 GMT</pubDate></item>
 <item><pubDate>Mon, 1 Jan 2024 00:00:00 GMT</pubDate></item>
</channel></rss>"""

_ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
 <title>blog</title>
 <entry><link rel="alternate" href="http://a.com/e1"/>
   <updated>2024-03-05T08:30:00+02:00</updated>
   <id>urn:uuid:e1</id></entry>
 <entry><link href="http://a.com/e2"/><updated>soon</updated></entry>
</feed>"""


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, body string")


def test_parse_feeds_fields(spark):
    got = {
        (r["feed_url"], r["link"]): (
            r["kind"],
            r["same_host"],
            r["pub_days"],
            r["entry_id"],
        )
        for r in parse_feeds(
            _pages(
                spark,
                [
                    ("http://a.com/feed.xml", _RSS),
                    ("http://a.com/atom.xml", _ATOM),
                ],
            )
        ).collect()
    }
    # full RSS item: trimmed link, RFC822 date (2024-03-05 = 19787),
    # guid as identity
    assert got[("http://a.com/feed.xml", "http://a.com/post1")] == (
        "rss", True, 19787, "tag-1"
    )
    # cross-host + entity-decoded + garbage date -> -1, link identity
    assert got[("http://a.com/feed.xml", "http://b.net/cross?x=1&y=2")] == (
        "rss", False, -1, "http://b.net/cross?x=1&y=2"
    )
    # Feb 30 fails engine calendar validation -> -1
    assert got[("http://a.com/feed.xml", "http://a.com/feb30")][2] == -1
    # the linkless item is dropped entirely
    assert len([k for k in got if k[0].endswith("feed.xml")]) == 3
    # atom: href attribute, W3C date prefix, id identity
    assert got[("http://a.com/atom.xml", "http://a.com/e1")] == (
        "atom", True, 19787, "urn:uuid:e1"
    )
    # atom without parseable date -> -1, id falls back to link
    assert got[("http://a.com/atom.xml", "http://a.com/e2")] == (
        "atom", True, -1, "http://a.com/e2"
    )


def test_feeds_from_html_autodiscovery(spark):
    html = (
        "<html><head>"
        '<link rel="alternate" type="application/rss+xml" href="http://a.com/feed.xml">'
        '<LINK HREF="http://a.com/atom.xml" TYPE="application/atom+xml" REL="alternate"/>'
        '<link rel="stylesheet" href="http://a.com/style.css">'
        "</head></html>"
    )
    df = spark.createDataFrame(
        [("http://a.com/", html)], "url string, html string"
    )
    got = {r["feed_url"] for r in feeds_from_html(df).collect()}
    assert got == {"http://a.com/feed.xml", "http://a.com/atom.xml"}


def test_seed_from_feeds_idempotent(spark, tmp_path):
    from tests.crawlfix import build_store

    store = build_store(spark, str(tmp_path / "store"), [], [])
    cfg = WalkerConfig()
    pages = _pages(
        spark,
        [
            (
                "http://s1.com/feed.xml",
                "<rss><channel>"
                "<item><link>http://s1.com/a.html</link></item>"
                "<item><link>http://other.net/x.html</link></item>"
                "</channel></rss>",
            )
        ],
    )
    # default: cross-host entries are ingested (feeds may cross hosts)
    m = seed_from_feeds(store, cfg, pages)
    assert m["feed_entries"] == 2 and m["links_new"] == 2
    assert m["cross_host_dropped"] == 0
    m2 = seed_from_feeds(store, cfg, pages)
    assert m2["links_new"] == 0 and store.read("links").count() == 2

    # opting into same-host enforcement drops the cross-host entry
    store2 = build_store(spark, str(tmp_path / "store2"), [], [])
    m3 = seed_from_feeds(store2, cfg, pages, enforce_same_host=True)
    assert m3["links_new"] == 1 and m3["cross_host_dropped"] == 1
