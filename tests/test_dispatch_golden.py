"""Golden dispatcher segment-selection tests.

Row-for-row translation of the reference's integration fixtures
(cassandra/dispatcher_test.go:46-565 `DispatcherTests`, run with
MaxLinksPerSegment=9, RefreshPercentage=33 — dispatcher_test.go:587-588),
plus MinLinkRefreshTime (698-801), DomainInfoStats (1190-1277) and
DispatchPruning empty-dispatch backoff (1279-1356). The expected
outcome is the exact URL set in `segments` per domain and the
`dispatched` flag, as the reference asserts (dispatcher_test.go:643-674).

Each case gets its own domain so a single dispatcher pass covers all of
them (segment generation is per-domain independent, reference
generateRoutine/dispatcher.go:393-402).
"""

from __future__ import annotations

import pytest

from tests.crawlfix import (
    NOW_MS,
    build_store,
    days_ago,
    dispatched_flags,
    domain_row,
    link_row,
    segment_urls,
)
from walker_spark.config import DispatcherConfig, WalkerConfig
from walker_spark.operators.dispatch import run_dispatch

CFG = WalkerConfig(
    dispatcher=DispatcherConfig(max_links_per_segment=9, refresh_percentage=33.0)
)


def _case_basic(d):
    return (
        [domain_row(d)],
        [link_row(f"http://{d}/")],
        {f"http://{d}/"},
        True,
    )


def _case_nothing(d):
    return ([domain_row(d)], [], set(), False)


def _case_multiple_links(d):
    links = [
        link_row(f"http://{d}/page1.html"),
        link_row(f"http://{d}/page2.html"),
        link_row(f"http://{d}/page404.html"),
        link_row(f"http://{d}/page500.html"),
        *[link_row(f"http://{d}/notcrawled{i}.html") for i in range(1, 6)],
        link_row(f"http://{d}/page1.html", days_ago(4), 200),
        link_row(f"http://{d}/page2.html", days_ago(3), 200),
        link_row(f"http://{d}/page404.html", days_ago(2), 404),
        link_row(f"http://{d}/page500.html", days_ago(1), 500),
        link_row(f"http://{d}/getnow1.html", getnow=True),
        link_row(f"http://{d}/getnow2.html", getnow=True),
        link_row(f"http://{d}/getnow3.html", getnow=True),
    ]
    expected = {
        f"http://{d}/page1.html",
        f"http://{d}/page2.html",
        *[f"http://{d}/notcrawled{i}.html" for i in range(1, 5)],
        f"http://{d}/getnow1.html",
        f"http://{d}/getnow2.html",
        f"http://{d}/getnow3.html",
    }
    return ([domain_row(d)], links, expected, True)


def _case_all_crawled_order(d):
    ages = {
        "a": 1, "b": 2, "c": 3, "d": 4,
        "e": 31, "f": 32, "g": 33, "h": 34,
        "i": 61, "j": 62, "k": 63,
    }
    links = [
        link_row(f"http://{d}/l.html", days_ago(64), 200),
        link_row(f"http://{d}/m.html", days_ago(91), 200),
    ]
    links += [
        link_row(f"http://{d}/{n}.html", days_ago(age), 200) for n, age in ages.items()
    ]
    # these two cover the earlier l/m rows (latest-per-URL)
    links += [
        link_row(f"http://{d}/l.html", NOW_MS - 1000, 200, write_seq=2),
        link_row(f"http://{d}/m.html", NOW_MS - 1000, 200, write_seq=2),
    ]
    expected = {f"http://{d}/{n}.html" for n in "cdefghijk"}
    return ([domain_row(d)], links, expected, True)


def _case_no_getnow(d):
    links = [
        link_row(f"http://{d}/page1.html"),
        link_row(f"http://{d}/page2.html"),
        link_row(f"http://{d}/page404.html"),
        link_row(f"http://{d}/page500.html"),
        *[link_row(f"http://{d}/notcrawled{i}.html") for i in range(1, 10)],
        link_row(f"http://{d}/page1.html", days_ago(4), 200),
        link_row(f"http://{d}/page2.html", days_ago(3), 200),
        link_row(f"http://{d}/page404.html", days_ago(2), 404),
        link_row(f"http://{d}/page500.html", days_ago(1), 500),
    ]
    expected = {
        f"http://{d}/page1.html",
        f"http://{d}/page2.html",
        f"http://{d}/page404.html",
        *[f"http://{d}/notcrawled{i}.html" for i in range(1, 7)],
    }
    return ([domain_row(d)], links, expected, True)


def _case_only_uncrawled(d):
    links = [link_row(f"http://{d}/notcrawled{i}.html") for i in range(1, 10)]
    expected = {f"http://{d}/notcrawled{i}.html" for i in range(1, 10)}
    return ([domain_row(d)], links, expected, True)


def _case_query_parms_ok(d):
    return (
        [domain_row(d)],
        [link_row(f"http://{d}/page1.html?p=v")],
        {f"http://{d}/page1.html?p=v"},
        True,
    )


def _case_no_already_dispatched(d):
    return (
        [domain_row(d, dispatched=True)],
        [link_row(f"http://{d}/page1.html")],
        set(),
        True,  # flag was already set and stays set
    )


def _case_should_be_excluded(d):
    return (
        [domain_row(d, excluded=True)],
        [link_row(f"http://{d}/page1.html")],
        set(),
        False,
    )


def _case_basic_query_filtering(d):
    links = [
        link_row(f"http://{d}/page1.html", days_ago(4), 200, fnv_txt=12345),
        link_row(f"http://{d}/page1.html?pag=1", days_ago(4), 200, fnv_txt=12345),
        link_row(f"http://{d}/page1.html?pag=1&pag=1"),
        link_row(f"http://{d}/page2.html?pag=1"),
    ]
    expected = {f"http://{d}/page1.html", f"http://{d}/page2.html?pag=1"}
    return ([domain_row(d)], links, expected, True)


def _case_multi_param_filtering(d):
    links = [
        link_row(f"http://{d}/?a=b&c=d&e=f", days_ago(4), 200, fnv_txt=3456),
        link_row(f"http://{d}/?e=f&a=b", days_ago(4), 200, fnv_txt=3456),
        link_row(f"http://{d}/?c=d&a=b", days_ago(4), 200, fnv_txt=3456),
    ]
    expected = {f"http://{d}/?a=b"}
    return ([domain_row(d)], links, expected, True)


def _case_subdomain_filtering(d):
    links = [
        link_row(f"http://{d}/?a=b", days_ago(4), 200, fnv_txt=111222),
        link_row(f"http://{d}/", days_ago(4), 200, fnv_txt=111222),
        link_row(f"http://www.{d}/?a=b", days_ago(4), 200, fnv_txt=111222),
        link_row(f"http://www.{d}/?c=d&e=f", days_ago(4), 200, fnv_txt=1234),
        link_row(f"http://www.{d}/?e=f", days_ago(4), 200, fnv_txt=1234),
    ]
    expected = {
        f"http://{d}/",
        f"http://www.{d}/?a=b",
        f"http://www.{d}/?e=f",
    }
    return ([domain_row(d)], links, expected, True)


CASES = {
    "BasicTest": _case_basic,
    "NothingToDispatch": _case_nothing,
    "MultipleLinksTest": _case_multiple_links,
    "AllCrawledCorrectOrder": _case_all_crawled_order,
    "NoGetNow": _case_no_getnow,
    "OnlyUncrawled": _case_only_uncrawled,
    "QueryParmsOK": _case_query_parms_ok,
    "NoAlreadyDispatched": _case_no_already_dispatched,
    "ShouldBeExcluded": _case_should_be_excluded,
    "BasicQueryParameterFiltering": _case_basic_query_filtering,
    "MultiParameterQueryFiltering": _case_multi_param_filtering,
    "QueryFilteringDistinguishesSubdomains": _case_subdomain_filtering,
    # identical fixture re-asserted in the reference (dispatcher_test.go:520-565)
    "QueryFilteringClearsDuplicateLinks": _case_subdomain_filtering,
}


@pytest.fixture(scope="module")
def golden_run(spark, tmp_path_factory):
    """One dispatcher pass over every case (distinct domains)."""
    domains, links, expected = [], [], {}
    auto_fp = 1000  # nextAutoFingerprint (dispatcher_test.go:608)
    for idx, (tag, builder) in enumerate(CASES.items()):
        d = f"case{idx:02d}.com"
        ds, ls, exp, flag = builder(d)
        # auto-assign unique fingerprints to crawled links without one
        fixed = []
        for l in ls:
            if l[4] != 0 and l[12] is None:  # crawled, no fnv_txt
                l = l[:12] + (auto_fp,) + l[13:]
                auto_fp += 1
            fixed.append(l)
        domains += ds
        links += fixed
        expected[tag] = (d, exp, flag)
    store = build_store(spark, str(tmp_path_factory.mktemp("golden")), domains, links)
    run_dispatch(store, CFG, NOW_MS, iteration=0)
    return store, expected


@pytest.mark.parametrize("tag", list(CASES))
def test_golden_segments(golden_run, tag):
    store, expected = golden_run
    dom, exp_urls, exp_flag = expected[tag]
    assert segment_urls(store, dom) == exp_urls, tag
    assert dispatched_flags(store)[dom] is exp_flag, tag


def test_min_link_refresh_time(spark, tmp_path):
    """MinLinkRefreshTime=49h: only links crawled >49h ago recrawl
    (dispatcher_test.go:698-801)."""
    cfg = WalkerConfig(
        dispatcher=DispatcherConfig(
            max_links_per_segment=9,
            refresh_percentage=33.0,
            min_link_refresh_time=49 * 3600.0,
        )
    )
    d = "refresh.com"
    links = [
        link_row(f"http://{d}/page1.html", days_ago(1)),
        link_row(f"http://{d}/page2.html", days_ago(2)),
        link_row(f"http://{d}/page3.html", days_ago(3)),
        link_row(f"http://{d}/page4.html", days_ago(4)),
    ]
    store = build_store(spark, str(tmp_path), [domain_row(d)], links)
    run_dispatch(store, cfg, NOW_MS)
    assert segment_urls(store, d) == {
        f"http://{d}/page3.html",
        f"http://{d}/page4.html",
    }


def test_domain_info_stats(spark, tmp_path):
    """tot=4 distinct URLs, uncrawled=2, queued=3 with
    MinLinkRefreshTime=12h (dispatcher_test.go:1190-1277; defaults
    limit=500/refresh=25)."""
    cfg = WalkerConfig(
        dispatcher=DispatcherConfig(min_link_refresh_time=12 * 3600.0)
    )
    d = "stats.com"
    links = [
        link_row(f"http://{d}/page1.html", days_ago(1)),
        link_row(f"http://{d}/page1.html", days_ago(2)),
        link_row(f"http://{d}/page1.html", days_ago(3)),
        link_row(f"http://{d}/page1.html", days_ago(4)),
        link_row(f"http://{d}/page2.html"),
        link_row(f"http://{d}/page3.html"),
        link_row(f"http://{d}/page4.html", NOW_MS),
    ]
    store = build_store(spark, str(tmp_path), [domain_row(d)], links)
    run_dispatch(store, cfg, NOW_MS)
    row = (
        store.read("domain_info")
        .select("tot_links", "uncrawled_links", "queued_links")
        .collect()[0]
    )
    assert (row["tot_links"], row["uncrawled_links"], row["queued_links"]) == (4, 2, 3)


def test_dispatch_pruning_backoff(spark, tmp_path):
    """Empty-dispatch backoff (F7): skip only when last_empty_dispatch
    is newer than last_dispatch AND within the retry interval
    (dispatcher_test.go:1279-1356, interval=15m)."""
    cfg = WalkerConfig(
        dispatcher=DispatcherConfig(empty_dispatch_retry_interval=15 * 60.0)
    )
    m = 60_000
    domains = [
        domain_row("a.com", last_dispatch_ms=NOW_MS, last_empty_dispatch_ms=NOW_MS - 10 * m),
        domain_row("b.com", last_dispatch_ms=NOW_MS - 20 * m, last_empty_dispatch_ms=NOW_MS - 10 * m),
        domain_row("c.com", last_dispatch_ms=NOW_MS - 30 * m, last_empty_dispatch_ms=NOW_MS - 20 * m),
    ]
    links = [
        link_row("http://a.com/page1.html", days_ago(1)),
        link_row("http://b.com/page1.html", days_ago(1)),
        link_row("http://c.com/page1.html", days_ago(1)),
    ]
    store = build_store(spark, str(tmp_path), domains, links)
    run_dispatch(store, cfg, NOW_MS)
    doms = {r["dom"] for r in store.read("segments").select("dom").collect()}
    assert doms == {"a.com", "c.com"}
