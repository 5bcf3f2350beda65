"""link accept predicate unit tests (shouldStoreParsedLink semantics,
fetcher.go:786-805; include patterns rescue excluded paths —
fetcher_test.go:1124 include/exclude behaviors)."""

from __future__ import annotations

import pytest

from walker_spark.config import FetcherConfig, WalkerConfig
from walker_spark.operators.fetch import link_accept_condition

ROWS = [
    ("/keep.html", "http"),
    ("/skipme/page.html", "http"),
    ("/skipme/but-special/page.html", "http"),
    ("/" + "x" * 60 + ".html", "http"),
    ("/keep.html", "ftp"),
]


def _accepted(spark, cfg: WalkerConfig) -> set[str]:
    df = spark.createDataFrame(ROWS, "path string, proto string")
    return {
        (r["path"], r["proto"])
        for r in df.filter(link_accept_condition(cfg)).collect()
    }


def test_exclude_include_and_protocols(spark):
    cfg = WalkerConfig(
        fetcher=FetcherConfig(
            exclude_link_patterns=("/skipme/",),
            include_link_patterns=("special",),
            max_path_length=50,
            accept_protocols=("http", "https"),
        )
    )
    got = _accepted(spark, cfg)
    assert got == {
        ("/keep.html", "http"),
        # include pattern rescues an excluded path
        ("/skipme/but-special/page.html", "http"),
    }


def test_no_patterns_only_length_and_proto(spark):
    cfg = WalkerConfig(
        fetcher=FetcherConfig(max_path_length=50, accept_protocols=("http",))
    )
    got = _accepted(spark, cfg)
    assert got == {
        ("/keep.html", "http"),
        ("/skipme/page.html", "http"),
        ("/skipme/but-special/page.html", "http"),
    }


def test_zero_max_path_length_disables_cap(spark):
    cfg = WalkerConfig(
        fetcher=FetcherConfig(max_path_length=0, accept_protocols=("http",))
    )
    got = _accepted(spark, cfg)
    assert ("/" + "x" * 60 + ".html", "http") in got
