"""WARC source: record framing, gz-member handling, HTTP envelope
split, FAILFAST/audit contract (sources/warc.py)."""

import gzip
import os
import tempfile

import pytest

from walker_spark.sources.warc import build_warc_bytes, read_warc

RECORDS = [
    {
        "warc_type": "warcinfo",
        "content_type": "application/warc-fields",
        "payload": b"software: walker-spark\r\nformat: WARC/1.0\r\n",
    },
    {
        "warc_type": "request",
        "target_uri": "http://a.com/x.html",
        "content_type": "application/http;msgtype=request",
        "payload": b"GET /x.html HTTP/1.1\r\nHost: a.com\r\n\r\n",
    },
    {
        "warc_type": "response",
        "target_uri": "http://a.com/x.html",
        "content_type": "application/http;msgtype=response",
        # body deliberately contains the record separator sequence —
        # Content-Length framing must not tear on it
        "payload": (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
            b"<html>\r\n\r\nbody with blank lines</html>"
        ),
    },
    {
        "warc_type": "response",
        "target_uri": "http://a.com/missing.html",
        "content_type": "application/http;msgtype=response",
        "payload": b"HTTP/1.1 404 Not Found\r\n\r\ngone",
    },
    {
        "warc_type": "resource",
        "target_uri": "http://a.com/raw.bin",
        "content_type": "application/octet-stream",
        "payload": bytes(range(256)),  # binary payload incl. \r\n\r\n-free
    },
]


def _expect_responses():
    return {
        "http://a.com/x.html": (200, "text/html; charset=utf-8",
                                b"<html>\r\n\r\nbody with blank lines</html>"),
        "http://a.com/missing.html": (404, None, b"gone"),
    }


@pytest.mark.parametrize("gz,members", [(False, True), (True, True), (True, False)])
def test_read_warc_plain_gz_and_single_member(spark, gz, members):
    with tempfile.TemporaryDirectory() as d:
        name = "seg-0.warc.gz" if gz else "seg-0.warc"
        with open(os.path.join(d, name), "wb") as f:
            f.write(build_warc_bytes(RECORDS, gz=gz, per_record_members=members))
        rows = read_warc(spark, d).collect()
    assert [r["warc_type"] for r in sorted(rows, key=lambda r: r["record_id"])] == [
        "warcinfo", "request", "response", "response", "resource"
    ]
    got = {
        r["target_uri"]: (r["http_status"], r["http_content_type"], bytes(r["body"]))
        for r in rows
        if r["warc_type"] == "response"
    }
    assert got == _expect_responses()
    res = next(r for r in rows if r["warc_type"] == "resource")
    assert bytes(res["body"]) == bytes(range(256)) and res["body_len"] == 256
    # non-response records carry no HTTP envelope fields
    req = next(r for r in rows if r["warc_type"] == "request")
    assert req["http_status"] is None and req["body"].startswith(b"GET ")
    assert all(r["_corrupt"] == 0 for r in rows)


def test_read_warc_type_filter_and_multi_file(spark):
    with tempfile.TemporaryDirectory() as d:
        for i in range(3):
            with open(os.path.join(d, f"seg-{i}.warc.gz"), "wb") as f:
                f.write(build_warc_bytes(RECORDS, gz=True))
        df = read_warc(spark, d, types=("response",))
        rows = df.collect()
    assert len(rows) == 6 and {r["warc_type"] for r in rows} == {"response"}


def test_read_warc_failfast_vs_audit(spark):
    good = build_warc_bytes(RECORDS, gz=False)
    torn = good[: len(good) // 2] + b"garbage that is not a warc record"
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "good.warc"), "wb") as f:
            f.write(good)
        with open(os.path.join(d, "torn.warc"), "wb") as f:
            f.write(torn)
        with pytest.raises(Exception):
            read_warc(spark, d).collect()
        rows = read_warc(spark, d, audit=True).collect()
    corrupt = [r for r in rows if r["_corrupt"] == 1]
    assert len(corrupt) == 1 and corrupt[0]["path"].endswith("torn.warc")
    assert sum(r["_corrupt"] == 0 for r in rows) >= len(RECORDS)


def test_warc_rows_feed_pages_shape(spark):
    """The ingest handoff: response rows map onto the engine's pages
    surface (url, html bytes) — the point of the source."""
    from pyspark.sql import functions as F

    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "seg.warc.gz"), "wb") as f:
            f.write(build_warc_bytes(RECORDS, gz=True))
        pages = (
            read_warc(spark, d, types=("response",))
            .filter(F.col("http_status") == 200)
            .select(
                F.col("target_uri").alias("url"),
                F.col("body").alias("raw"),
                F.col("http_content_type").alias("content_type"),
            )
        )
        out = pages.collect()
    assert len(out) == 1 and out[0]["url"] == "http://a.com/x.html"
    assert b"<html>" in bytes(out[0]["raw"])
