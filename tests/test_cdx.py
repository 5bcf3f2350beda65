"""CDX-J capture-index source: SURT keys, audit/strict parse, latest
capture collapse, gz round-trip, frontier seeding."""

from __future__ import annotations

import gzip

import pytest

from walker_spark.config import WalkerConfig
from walker_spark.sources.cdx import (
    latest_captures,
    parse_cdx_lines,
    read_cdxj,
    seed_from_cdx,
    surt_key,
)

# 2024-03-05 = epoch day 19787
_TS = "20240305120000"
_TS_S = 19787 * 86400 + 12 * 3600

_GOOD = (
    "com,example,h1)/p/1 20240305120000 "
    '{"url": "http://h1.example.com/p/1", "mime": "text/html",'
    ' "status": "200", "digest": "sha1:AAA", "length": "512",'
    ' "offset": "1024", "filename": "seg-00001.warc.gz"}'
)


def _lines_df(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "value string")


def test_surt_key_subset_transform(spark):
    urls = [
        "http://www.Example.COM/Path/X?Q=1&b=2",
        "https://user:pw@a.b.example.org:443/x",
        "http://example.com",
        "http://example.com:8080/p",
        "http://example.com:80/p#frag",
        "not a url",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r["s"] for r in df.select(surt_key("url").alias("s")).collect()]
    assert got == [
        # lowercase everything (documented subset), query kept verbatim
        "com,example,www)/path/x?q=1&b=2",
        # userinfo and default :443 dropped, host labels reversed
        "org,example,b,a)/x",
        # empty path -> '/'
        "com,example)/",
        # non-default port kept after the reversed host
        "com,example:8080)/p",
        # default :80 dropped; fragment never part of the key
        "com,example)/p",
        # no authority -> NULL
        None,
    ]


def test_parse_audit_classifies_and_types(spark):
    rows = parse_cdx_lines(
        _lines_df(
            spark,
            [
                _GOOD,
                # stored key disagrees with the url -> audit signal
                "com,example,h9)/wrong 20240305120000 "
                '{"url": "http://h1.example.com/p/1", "mime": "text/html"}',
                # line shape broken (no 14-digit ts)
                "garbage line without a timestamp {}",
                # braces match the line regex but the JSON is invalid
                "k 20240305120000 {bad}",
                # JSON valid but url missing
                'k 20240305120000 {"mime": "x"}',
                # month 13 -> ts error
                'k 20241399120000 {"url": "http://a.com/"}',
                # hour 24 -> ts error (pure-integer clock check)
                'k 20240305240000 {"url": "http://a.com/"}',
                # absent numeric fields are NULL, not an error
                'com,a)/ 20240305120000 {"url": "http://a.com/"}',
            ],
        )
    ).collect()
    good = rows[0]
    assert good["_error"] == ""
    assert good["surt"] == "com,example,h1)/p/1"
    assert good["ts_s"] == _TS_S
    assert good["url"] == "http://h1.example.com/p/1"
    assert (good["status"], good["length_b"], good["offset_b"]) == (
        200,
        512,
        1024,
    )
    assert good["filename"] == "seg-00001.warc.gz"
    assert good["surt_matches"] is True

    assert rows[1]["_error"] == "" and rows[1]["surt_matches"] is False
    assert rows[2]["_error"] == "format"
    assert rows[3]["_error"] == "json"
    assert rows[4]["_error"] == "json"
    assert rows[5]["_error"] == "ts"
    assert rows[6]["_error"] == "ts"
    # every non-error field is NULL on an error row
    assert rows[2]["url"] is None and rows[2]["ts_s"] is None
    ok = rows[7]
    assert ok["_error"] == "" and ok["status"] is None
    assert ok["length_b"] is None and ok["mime"] is None


def test_parse_strict_raises_at_scan_time(spark):
    df = _lines_df(spark, [_GOOD, "broken"])
    # audit mode never throws
    assert parse_cdx_lines(df).count() == 2
    with pytest.raises(Exception, match="malformed CDX-J"):
        parse_cdx_lines(df, strict=True).collect()


def test_latest_captures_newest_wins(spark):
    mk = (
        'com,a)/ {ts} {{"url": "http://a.com/", "digest": "{d}",'
        ' "mime": "text/html"}}'
    )
    parsed = parse_cdx_lines(
        _lines_df(
            spark,
            [
                mk.format(ts="20240305120000", d="old"),
                mk.format(ts="20250101000000", d="new"),
                mk.format(ts="20240101000000", d="oldest"),
                "broken line {}",
            ],
        )
    )
    got = latest_captures(parsed).collect()
    assert len(got) == 1
    assert got[0]["url"] == "http://a.com/" and got[0]["digest"] == "new"
    assert got[0]["ts_s"] == 20089 * 86400  # 2025-01-01


def test_read_cdxj_gz_roundtrip(spark, tmp_path):
    p = tmp_path / "captures.cdxj.gz"
    with gzip.open(p, "wt") as f:
        f.write(_GOOD + "\n")
        f.write("broken\n")
    rows = read_cdxj(spark, str(p)).collect()
    assert {r["_error"] for r in rows} == {"", "format"}
    assert [r["url"] for r in rows if r["_error"] == ""] == [
        "http://h1.example.com/p/1"
    ]


def test_seed_from_cdx_filters_and_idempotent(spark, tmp_path):
    from tests.crawlfix import build_store

    store = build_store(spark, str(tmp_path / "store"), [], [])
    cfg = WalkerConfig()
    mk = (
        "k {ts} {{\"url\": \"{u}\", \"mime\": \"{m}\","
        " \"status\": \"{s}\"}}"
    )
    parsed = parse_cdx_lines(
        _lines_df(
            spark,
            [
                mk.format(ts="20240305120000", u="http://s1.com/a.html", m="text/html", s="200"),
                # second capture of the same URL -> frontier sees it once
                mk.format(ts="20250101000000", u="http://s1.com/a.html", m="text/html; charset=utf-8", s="200"),
                mk.format(ts="20240305120000", u="http://s1.com/b.html", m="text/html", s="200"),
                # wrong status / wrong mime / malformed -> all dropped
                mk.format(ts="20240305120000", u="http://s1.com/gone.html", m="text/html", s="404"),
                mk.format(ts="20240305120000", u="http://s1.com/img.png", m="image/png", s="200"),
                "broken line {}",
            ],
        )
    )
    m = seed_from_cdx(store, cfg, parsed)
    assert m["capture_urls"] == 2 and m["links_new"] == 2
    assert m["domains_new"] == 1
    assert store.read("links").count() == 2
    # re-seeding the same index is a no-op (URL-seen dedup)
    m2 = seed_from_cdx(store, cfg, parsed)
    assert m2["links_new"] == 0 and m2["domains_new"] == 0
    assert store.read("links").count() == 2


def test_stream_cdx_captures_incremental(spark, tmp_path):
    from tests.crawlfix import build_store
    from walker_spark.streaming.ingest import stream_cdx_captures

    store = build_store(spark, str(tmp_path / "store"), [], [])
    cfg = WalkerConfig()
    drop = tmp_path / "drop"
    drop.mkdir()
    ckpt = str(tmp_path / "ckpt")
    mk = (
        'k {ts} {{"url": "{u}", "mime": "text/html", "status": "200"}}'
    )
    (drop / "day1.cdxj").write_text(
        mk.format(ts="20240305120000", u="http://s1.com/a.html")
        + "\n"
        + mk.format(ts="20240306120000", u="http://s1.com/b.html")
        + "\nbroken line {}\n"
    )
    stream_cdx_captures(store, cfg, str(drop), ckpt)
    assert store.read("links").count() == 2

    # a second drop processes ONLY the new file (stream checkpoint);
    # its duplicate URL dedupes through URL-seen
    (drop / "day2.cdxj").write_text(
        mk.format(ts="20240307120000", u="http://s1.com/a.html")
        + "\n"
        + mk.format(ts="20240307120000", u="http://s1.com/c.html")
        + "\n"
    )
    stream_cdx_captures(store, cfg, str(drop), ckpt)
    assert store.read("links").count() == 3

    # a fresh checkpoint redelivers everything — idempotent end state
    stream_cdx_captures(store, cfg, str(drop), str(tmp_path / "ckpt2"))
    assert store.read("links").count() == 3
