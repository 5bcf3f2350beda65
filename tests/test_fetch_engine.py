"""Fetch-stage behavior tests, translated from the reference's
mock-HTTP fetcher suite (fetcher_test.go — robots deny, FNV goldens,
noindex/nofollow, content-size cap, link accept filters, 304s) into
table-driven `pages` fixtures (FIXTURES.md §6): the fetch join reads
fixtures instead of a mock server, everything else asserts the same
observable rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from walker_spark.config import DispatcherConfig, FetcherConfig, FrontierConfig, WalkerConfig
from walker_spark.functions.fnv import fnv1_64
from walker_spark.plans import schemas
from walker_spark.streaming.loop import CrawlEngine

FNV_HTML = """<!DOCTYPE html>
<html>
<head>
<meta http-equiv="Content-Type" content="text/html; charset=utf-8">
<title>No Links</title>
</head>
<div>
\tRoses are red, violets are blue, golang is the bomb, aint it so true!
</div>
</html>"""
FNV_TEXT = "No Links\n\nRoses are red, violets are blue, golang is the bomb, aint it so true!"

ROOT_HTML = """<html><head><title>Root</title></head><body>
<a href="/page1.html">one</a>
<a href="/page2.html">two</a>
<a href="/private/secret.html">secret</a>
<a href="/skipme/x.html">skip</a>
<a href="/%s.html">long</a>
<a href="/big.html">big</a>
<a href="/nowhere.html">missing</a>
<a href="http://b.com/">other</a>
</body></html>""" % ("x" * 120)

NOINDEX_HTML = """<html><head><meta name="robots" content="noindex">
<title>NoIndex</title></head><body><a href="/page3.html">three</a></body></html>"""

NOFOLLOW_HTML = """<html><head><meta name="robots" content="nofollow">
<title>NoFollow</title></head><body>
<a href="http://c.com/">should not follow</a></body></html>"""

BASE_TS = 1_690_000_000_000
NOW0 = 1_700_000_000_000


def _pages(spark):
    def page(url, body):
        return (url, BASE_TS, body.encode("utf-8"), None, "en")

    rows = [
        ("http://a.com/robots.txt", BASE_TS,
         b"User-agent: *\nDisallow: /private/\n", None, None),
        page("http://a.com/", ROOT_HTML),
        page("http://a.com/page1.html", FNV_HTML),
        page("http://a.com/page2.html", NOINDEX_HTML),
        page("http://a.com/private/secret.html", "<html><body>hidden</body></html>"),
        page("http://a.com/skipme/x.html", "<html><body>skipped</body></html>"),
        ("http://a.com/big.html", BASE_TS,
         b"<html><body>" + b"A" * 5000 + b"</body></html>", None, "en"),
        page("http://b.com/", NOFOLLOW_HTML),
    ]
    return spark.createDataFrame(
        [(u, t, h, x, l) for (u, t, h, x, l) in rows],
        "url string, warc_ts_ms long, html binary, text string, lang string",
    ).select(
        "url", F.timestamp_millis("warc_ts_ms").alias("warc_ts"), "html", "text", "lang"
    ).select(*[f.name for f in schemas.PAGES.fields])


CFG = WalkerConfig(
    fetcher=FetcherConfig(
        max_http_content_size_bytes=4096,
        exclude_link_patterns=("/skipme/",),
        max_path_length=100,
    ),
    dispatcher=DispatcherConfig(),
    frontier=FrontierConfig(num_domain_buckets=4),
)


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fetch-engine"))
    handled_paths: list[set] = []

    def handler(df):
        handled_paths.append(
            {(r["path"], r["stat"]) for r in df.select("path", "stat").collect()}
        )

    engine = CrawlEngine(spark, root, CFG, handler=handler)
    engine.store.overwrite("pages", _pages(spark))
    engine.seed(["http://a.com/"])
    metrics = engine.run(iterations=3, start_now_ms=NOW0)
    links = engine.store.read("links").collect()
    return engine, links, handled_paths, metrics


def _rows(links, path, dom="a.com"):
    return [r for r in links if r["dom"] == dom and r["path"] == path]


def test_fnv_fingerprints_roundtrip(crawled):
    """Golden FNV-1/64 body+text fingerprints (fetcher_test.go:1255-1312)."""
    _, links, _, _ = crawled
    rows = [r for r in _rows(links, "/page1.html") if r["stat"] == 200]
    assert rows, "page1 was never fetched"
    r = rows[0]
    assert r["fnv"] == fnv1_64(FNV_HTML.encode("utf-8"))
    assert r["fnv_txt"] == fnv1_64(FNV_TEXT.encode("utf-8"))
    assert r["mime"] == "text/html"


def test_robots_exclusion(crawled):
    """Disallowed path stored with robot_ex=true at time=epoch, never
    fetched (fetcher.go:531-536; fetcher_test.go:394-511)."""
    _, links, _, _ = crawled
    rows = _rows(links, "/private/secret.html")
    assert rows
    # all rows sit at time=epoch; the exclusion row overwrites the
    # discovery row in Cassandra (same PK) — here the latest write wins
    latest = max(rows, key=lambda r: r["write_seq"] or 0)
    assert latest["robot_ex"] is True
    assert all(r["stat"] is None for r in rows)
    assert all(r["time"].timestamp() == 0 for r in rows)


def test_link_accept_filters(crawled):
    """exclude_link_patterns and max_path_length drop candidate links
    before they reach the frontier (fetcher.go:786-805;
    fetcher_test.go:1124, 1723)."""
    _, links, _, _ = crawled
    assert not _rows(links, "/skipme/x.html")
    assert not [r for r in links if len(r["path"]) > 100]


def test_content_size_cap(crawled):
    """Oversized body -> stored error row, no fingerprint/parse
    (fetcher.go:614-638; fetcher_test.go:1490)."""
    _, links, _, _ = crawled
    rows = [r for r in _rows(links, "/big.html") if r["stat"] is not None]
    assert rows
    r = rows[0]
    assert "content size exceeded" in (r["err"] or "")
    assert r["fnv"] == 0 and r["fnv_txt"] == 0
    assert r["mime"] is None


def test_fetch_error_for_missing_host(crawled):
    """URL absent from pages == unreachable host: err stored, no stat
    (fetcher.go:540-545)."""
    _, links, _, _ = crawled
    rows = [r for r in _rows(links, "/nowhere.html") if r["err"] is not None]
    assert rows and rows[0]["stat"] is None


def test_meta_nofollow_stops_link_collection(crawled):
    """Links after a nofollow meta are not collected (parse.go:92-110),
    so c.com never enters the frontier (fetcher_test.go:915)."""
    engine, links, _, _ = crawled
    assert not [r for r in links if r["dom"] == "c.com"]
    doms = {r["dom"] for r in engine.store.read("domain_info").collect()}
    assert "b.com" in doms and "c.com" not in doms


def test_meta_noindex_suppresses_handler(crawled):
    """noindex pages are stored but their 200-fetch never reaches the
    handler (fetcher.go:599-601); a later 304 recrawl MAY reach it —
    the reference documents that quirk explicitly (fetcher.go:547-560
    comment: 'By definition a 304 is never MetaNoIndex')."""
    _, links, handled, _ = crawled
    rows = [r for r in _rows(links, "/page2.html") if r["stat"] == 200]
    assert rows, "noindex page is still fetched and stored"
    all_handled = set().union(*handled) if handled else set()
    assert ("/page1.html", 200) in all_handled
    assert ("/page2.html", 200) not in all_handled
    # fetch-error pages (oversize) never reach the handler as 200s
    assert ("/big.html", 200) not in all_handled


def test_not_modified_304(crawled):
    """Recrawl of a page whose warc_ts predates the last crawl yields
    304 with no mime/body/fingerprint (fetcher.go:547-560;
    fetcher_test.go:1346-1414)."""
    _, links, _, _ = crawled
    rows = [r for r in _rows(links, "/") if r["stat"] == 304]
    assert rows, "root page should have been recrawled as 304"
    assert all(r["mime"] is None and r["fnv"] == 0 for r in rows)


def test_outlinks_at_epoch_and_dedup(crawled):
    """Discovered outlinks land once, at time=epoch (datastore.go:461-463);
    re-discovery across iterations does not duplicate them (J1)."""
    _, links, _, _ = crawled
    epoch_rows = [
        r for r in _rows(links, "/page1.html") if r["time"].timestamp() == 0
    ]
    assert len(epoch_rows) == 1


def test_resume_from_checkpoint(crawled, spark):
    """Run manifests give crash-safe resume (ST2/M7): a fresh engine on
    the same root continues at the next iteration."""
    engine, _, _, metrics = crawled
    fresh = CrawlEngine(spark, engine.store.root, CFG)
    assert fresh.resume_iteration() == 3
    assert [m["iteration"] for m in metrics] == [0, 1, 2]
    runs = engine.store.runs()
    assert all("table_versions" in r for r in runs)


def test_robots_rules_cache_invalidation(spark, tmp_path):
    """The per-host PARSED rules table is built once per (pages
    snapshot, fetcher identity) and only rebuilt when either changes —
    the table analog of the reference's per-host robots cache
    (fetcher.go:656-721). A superstep never re-parses robots bodies."""
    import datetime as _dt

    from walker_spark.operators.fetch import _robots_rules_table
    from walker_spark.sources.store import FrontierStore

    store = FrontierStore(spark, str(tmp_path / "rb"), num_buckets=2)
    body = (
        b"User-agent: walker\nDisallow: /w/\nCrawl-delay: 2\n\n"
        b"User-agent: *\nDisallow: /a/\n"
    )
    ts = _dt.datetime(2023, 7, 1, tzinfo=_dt.timezone.utc)
    pages = spark.createDataFrame(
        [("http://cache.com/robots.txt", ts, bytearray(body), None, "en")],
        schemas.PAGES,
    )
    store.overwrite("pages", pages)

    cfg = WalkerConfig(fetcher=FetcherConfig(user_agent="walker"))
    r1 = {r["host"]: r for r in _robots_rules_table(store, cfg).collect()}
    v1 = store.version("robots_rules")
    assert r1["cache.com"]["crawl_delay"] == 2000
    assert "/w/" in r1["cache.com"]["rules_json"]

    # same snapshot + same identity: reused, no rebuild
    _robots_rules_table(store, cfg)
    assert store.version("robots_rules") == v1

    # different user agent: rebuilt, different group selected
    other = WalkerConfig(fetcher=FetcherConfig(user_agent="someone-else"))
    r2 = {r["host"]: r for r in _robots_rules_table(store, other).collect()}
    assert store.version("robots_rules") > v1
    assert "/a/" in r2["cache.com"]["rules_json"]

    # pages snapshot bump: rebuilt even under the original identity
    v2 = store.version("robots_rules")
    store.overwrite("pages", pages)
    _robots_rules_table(store, cfg)
    assert store.version("robots_rules") > v2


def test_bucketed_spj_parity(spark, tmp_path, monkeypatch):
    """The storage-partitioned fetch join (url-bucketed pages, one
    left-outer SMJ, missing rows through the parse fn) must produce a
    links table identical to the broadcast path's — same crawl, same
    seed, bucketed copy built via build_bucketed_pages."""
    from walker_spark.operators import fetch as fetch_mod
    from walker_spark.operators.fetch import build_bucketed_pages

    # the size gate would route this tiny fixture to broadcast; force
    # the SPJ path so parity is actually exercised
    monkeypatch.setattr(fetch_mod, "_SPJ_MIN_BYTES", 0)

    def crawl(root, bucketed: bool):
        engine = CrawlEngine(spark, root, CFG)
        engine.store.overwrite("pages", _pages(spark))
        if bucketed:
            build_bucketed_pages(engine.store, buckets=4)
            meta = engine.store.get_meta("pages_bucketed")
            assert meta and meta["pages_version"] == engine.store.version("pages")
        engine.seed(["http://a.com/"])
        engine.run(iterations=2, start_now_ms=NOW0)
        rows = engine.store.read("links").collect()
        key = lambda r: (r["dom"], r["subdom"], r["path"], r["proto"],
                         r["time"], r["write_seq"])
        return sorted(
            (
                key(r), r["stat"], r["err"], r["robot_ex"], r["mime"],
                r["fnv"], r["fnv_txt"],
            )
            for r in rows
        )

    a = crawl(str(tmp_path / "broadcast"), bucketed=False)
    b = crawl(str(tmp_path / "bucketed"), bucketed=True)
    assert a == b and len(a) > 0
