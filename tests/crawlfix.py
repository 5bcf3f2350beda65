"""Shared fixture builders for crawl-engine tests.

Translates the reference's test harness shapes (ExistingDomainInfo /
ExistingLink, cassandra/dispatcher_test.go:27-42) into frontier-store
rows. Times are frozen (FIXTURES.md: walker compares against time.Now,
tests here pass now explicitly).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from walker_spark.functions import urlkernel
from walker_spark.plans import schemas
from walker_spark.sources.store import FrontierStore

NOW_MS = 1_700_000_000_000
DAY_MS = 86_400_000

NOT_YET = 0  # epoch == walker.NotYetCrawled


def days_ago(n: float) -> int:
    return NOW_MS - int(n * DAY_MS)


def url_key(url: str):
    """(dom, subdom, path, proto) via the normalize+pk kernel — the
    same path MustParse+TLDPlusOneAndSubdomain takes in the reference
    tests."""
    norm = urlkernel.normalize_url(url)
    assert norm is not None, url
    key = urlkernel.primary_key(norm)
    assert key is not None, url
    return key


def domain_row(
    dom: str,
    priority: int = 10,
    dispatched: bool = False,
    excluded: bool = False,
    claim_tok: str | None = None,
    last_dispatch_ms: int | None = None,
    last_empty_dispatch_ms: int | None = None,
    next_crawl: int = 0,
):
    return (
        dom,
        priority,
        claim_tok,
        None,
        dispatched,
        excluded,
        None,
        None,
        None,
        None,
        last_dispatch_ms,
        last_empty_dispatch_ms,
        next_crawl,
    )


def link_row(
    url: str,
    time_ms: int = NOT_YET,
    stat: int | None = None,
    getnow: bool = False,
    fnv_txt: int | None = None,
    write_seq: int = 1,
):
    dom, subdom, path, proto = url_key(url)
    return (
        dom,
        subdom,
        path,
        proto,
        time_ms,
        stat,
        None,
        None,
        None,
        getnow,
        None,
        None,
        fnv_txt,
        None,
        None,
        write_seq,
    )


def build_store(
    spark, tmpdir: str, domains: list, links: list, num_buckets: int = 4
) -> FrontierStore:
    store = FrontierStore(spark, tmpdir, num_buckets=num_buckets)
    if domains:
        df = spark.createDataFrame(
            [
                d[:10]
                + (
                    None if d[10] is None else d[10],
                    None if d[11] is None else d[11],
                    d[12],
                )
                for d in domains
            ],
            schema="dom string, priority int, claim_tok string, claim_time timestamp,"
            " dispatched boolean, excluded boolean, exclude_reason string,"
            " tot_links int, uncrawled_links int, queued_links int,"
            " last_dispatch_ms long, last_empty_dispatch_ms long, next_crawl long",
        ).select(
            "dom",
            "priority",
            "claim_tok",
            "claim_time",
            "dispatched",
            "excluded",
            "exclude_reason",
            "tot_links",
            "uncrawled_links",
            "queued_links",
            F.timestamp_millis("last_dispatch_ms").alias("last_dispatch"),
            F.timestamp_millis("last_empty_dispatch_ms").alias("last_empty_dispatch"),
            "next_crawl",
        )
        store.append("domain_info", df)
    if links:
        df = spark.createDataFrame(
            links,
            schema="dom string, subdom string, path string, proto string,"
            " time_ms long, stat int, err string, robot_ex boolean,"
            " redto_url string, getnow boolean, mime string, fnv long,"
            " fnv_txt long, body string, headers map<string,string>, write_seq long",
        ).select(
            "dom",
            "subdom",
            "path",
            "proto",
            F.timestamp_millis("time_ms").alias("time"),
            "stat",
            "err",
            "robot_ex",
            "redto_url",
            "getnow",
            "mime",
            "fnv",
            "fnv_txt",
            "body",
            "headers",
            "write_seq",
        )
        store.append("links", df.select(*[f.name for f in schemas.LINKS.fields]))
    return store


def segment_urls(store: FrontierStore, dom: str | None = None) -> set[str]:
    """Reconstructed URL set in segments (reference assertion shape,
    dispatcher_test.go:643-659: CreateURL over key columns)."""
    df = store.read("segments")
    if dom is not None:
        df = df.filter(F.col("dom") == dom)
    return {
        urlkernel.url_from_key(r["dom"], r["subdom"], r["path"], r["proto"])
        for r in df.select("dom", "subdom", "path", "proto").collect()
    }


def dispatched_flags(store: FrontierStore) -> dict[str, bool]:
    return {
        r["dom"]: r["dispatched"]
        for r in store.read("domain_info").select("dom", "dispatched").collect()
    }
