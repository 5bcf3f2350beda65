"""Sitemap ingestion: parse, robots discovery, frontier seeding."""

from __future__ import annotations

from walker_spark.config import WalkerConfig
from walker_spark.operators.sitemaps import (
    parse_sitemaps,
    seed_from_sitemaps,
    sitemaps_from_robots,
)

_SM = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
 <url><loc> http://a.com/p?x=1&amp;y=2 </loc><lastmod>2024-03-05T12:00:00+02:00</lastmod><changefreq>DAILY</changefreq><priority>0.8</priority></url>
 <url><loc>http://b.com/cross</loc><lastmod>garbage</lastmod></url>
 <url><loc></loc></url>
 <url><priority>0.3</priority></url>
 <url><loc>http://a.com/&lt;odd&gt;&apos;q&quot;&amp;amp;</loc></url>
</urlset>"""

_IDX = (
    "<sitemapindex><sitemap><loc>http://a.com/sm2.xml</loc>"
    "<lastmod>2024-01-15</lastmod></sitemap></sitemapindex>"
)


def test_parse_sitemaps_fields_and_edge_cases(spark):
    df = spark.createDataFrame(
        [
            ("http://a.com/sitemap.xml", _SM),
            ("http://a.com/sitemap_index.xml", _IDX),
        ],
        "url string, body string",
    )
    got = {
        (r["sitemap_url"], r["loc"]): (
            r["kind"],
            r["same_host"],
            r["lastmod_days"],
            r["changefreq"],
            r["priority_milli"],
        )
        for r in parse_sitemaps(df).collect()
    }
    # full entry: trimmed + entity-decoded loc, W3C datetime date part
    # as epoch days (2024-03-05 = 19787), lowered changefreq, exact
    # priority milli-units
    assert got[("http://a.com/sitemap.xml", "http://a.com/p?x=1&y=2")] == (
        "url", True, 19787, "daily", 800
    )
    # cross-host + unparseable lastmod -> flagged, -1, defaults
    assert got[("http://a.com/sitemap.xml", "http://b.com/cross")] == (
        "url", False, -1, "", 500
    )
    # entity decode is single-pass: &amp;amp; -> &amp;, never &
    assert got[
        ("http://a.com/sitemap.xml", "http://a.com/<odd>'q\"&amp;")
    ] == ("url", True, -1, "", 500)
    # index entries come out kind='sitemap'; empty/missing loc dropped
    assert got[("http://a.com/sitemap_index.xml", "http://a.com/sm2.xml")] == (
        "sitemap", True, 19737, "", 500
    )
    assert len(got) == 4


def test_parse_sitemaps_loc_length_cap(spark):
    long_loc = "http://a.com/" + "x" * 3000
    df = spark.createDataFrame(
        [("http://a.com/s.xml", f"<url><loc>{long_loc}</loc></url>")],
        "url string, body string",
    )
    assert parse_sitemaps(df).count() == 0
    assert parse_sitemaps(df, max_loc_len=4000).count() == 1


def test_sitemaps_from_robots(spark):
    body = (
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: http://a.com/sitemap.xml\n"
        "  sitemap:\thttp://cdn.example.net/other.xml  \n"
        "# sitemap: http://commented.out/s.xml is still a directive line\n"
    )
    df = spark.createDataFrame(
        [("http://a.com/robots.txt", body)], "url string, body string"
    )
    got = {r["sitemap_url"] for r in sitemaps_from_robots(df).collect()}
    # the robots line-parse is prefix-anchored: the commented line does
    # not start with 'sitemap:' so it is NOT a directive
    assert got == {
        "http://a.com/sitemap.xml",
        "http://cdn.example.net/other.xml",
    }


def test_seed_from_sitemaps_idempotent_and_same_host(spark, tmp_path):
    from tests.crawlfix import build_store

    store = build_store(spark, str(tmp_path / "store"), [], [])
    cfg = WalkerConfig()
    body = (
        "<urlset>"
        "<url><loc>http://s1.com/a.html</loc></url>"
        "<url><loc>http://s1.com/b.html</loc></url>"
        "<url><loc>http://evil.net/offsite.html</loc></url>"
        "</urlset>"
    )
    pages = spark.createDataFrame(
        [("http://s1.com/sitemap.xml", body)], "url string, body string"
    )
    m = seed_from_sitemaps(store, cfg, pages)
    assert m["links_new"] == 2 and m["domains_new"] == 1
    assert m["sitemap_entries"] == 3 and m["cross_host_dropped"] == 1
    assert store.read("links").count() == 2

    # re-seeding the unchanged sitemap is a no-op (URL-seen dedup)
    m2 = seed_from_sitemaps(store, cfg, pages)
    assert m2["links_new"] == 0 and m2["domains_new"] == 0
    assert store.read("links").count() == 2

    # opting out of the same-host rule ingests the cross-host URL too
    m3 = seed_from_sitemaps(store, cfg, pages, enforce_same_host=False)
    assert m3["links_new"] == 1 and m3["cross_host_dropped"] == 0
    assert {r["dom"] for r in store.read("domain_info").collect()} == {
        "s1.com",
        "evil.net",
    }
