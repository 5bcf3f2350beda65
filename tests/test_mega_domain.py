"""Mega-domain dispatch: per-domain caps bound skew (O12/T1) while the
quota composition stays exact at the default 500/25% config
(dispatcher.go:867-937 at production defaults)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.crawlfix import NOW_MS, build_store, days_ago, domain_row, link_row
from walker_spark.config import WalkerConfig
from walker_spark.operators.dispatch import run_dispatch


def test_mega_domain_segment_cap_and_quota(spark, tmp_path):
    d = "mega.com"
    links = [
        link_row(f"http://{d}/u{i:05d}.html") for i in range(1200)
    ] + [
        link_row(f"http://{d}/c{i:05d}.html", days_ago(1 + (i % 400)), 200)
        for i in range(800)
    ]
    store = build_store(spark, str(tmp_path), [domain_row(d)], links)
    cfg = WalkerConfig()  # defaults: limit 500, refresh 25%
    run_dispatch(store, cfg, NOW_MS)

    seg = store.read("segments").collect()
    assert len(seg) == 500  # T1: the segment cap bounds any mega-host
    uncrawled = [r for r in seg if r["path"].startswith("/u")]
    crawled = [r for r in seg if r["path"].startswith("/c")]
    # idealCrawled = round(0.25 * 500) = 125; idealUncrawled = 375 (T2)
    assert len(uncrawled) == 375 and len(crawled) == 125
    # uncrawled picked in clustering order: the first 375 u-paths
    assert {r["path"] for r in uncrawled} == {
        f"/u{i:05d}.html" for i in range(375)
    }
    # crawled picked oldest-first: ages cycle 1..400 over 800 links, so
    # every selected link must be at least as old as any unselected one
    ages = {
        r["path"]: NOW_MS - r["time"].timestamp() * 1000 for r in crawled
    }
    youngest_selected = min(ages.values())
    assert youngest_selected >= 338 * 86_400_000  # 125 pairs of oldest ages

    info = store.read("domain_info").collect()[0]
    assert info["tot_links"] == 2000
    assert info["uncrawled_links"] == 1200
    assert info["queued_links"] == 500
    assert info["dispatched"] is True


def test_parser_robust_to_garbage_bytes():
    """Broken encodings and truncated markup must never throw — the
    reference finishes with whatever was parsed (parse.go:33-36)."""
    from walker_spark.functions import htmlparse

    for raw in (
        b"\xff\xfe\x00garbage\x81\x9d",
        b"<html><a href='/x'>unclosed",
        b"<<<<>>>>&&&&;;;",
        b"",
        "<html><body>é中文</body></html>".encode("utf-16"),
    ):
        res = htmlparse.parse_html(raw)
        assert res.text is not None
