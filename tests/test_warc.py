"""WARC source additions: parse-time type filter and strict/salvage
torn-record contract (sources/warc.py; the roundtrip/export coverage
lives in test_training_ops.py)."""

import pytest

from walker_spark.sources.warc import _parse_warc_bytes, build_warc_bytes, read_warc

RECS = [
    ("http://a.com/x.html", "2024-01-01T00:00:00Z", 200, "text/html",
     b"<html>\r\n\r\nbody with a blank line</html>"),
    ("http://a.com/y.html", "2024-01-01T00:00:00Z", 404, "text/plain", b"gone"),
]


def _warcinfo() -> bytes:
    payload = b"software: walker-spark\r\n"
    return (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        + f"Content-Length: {len(payload)}\r\n\r\n".encode()
        + payload
        + b"\r\n\r\n"
    )


def test_read_warc_type_filter(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_warcinfo() + build_warc_bytes(RECS))
    all_rows = read_warc(spark, str(tmp_path / "a.warc")).collect()
    assert sorted(r["record_type"] for r in all_rows) == [
        "response", "response", "warcinfo"
    ]
    resp = read_warc(spark, str(tmp_path / "a.warc"), types=("response",)).collect()
    assert {r["record_type"] for r in resp} == {"response"}
    assert {r["http_status"] for r in resp} == {200, 404}
    # framing survives a payload containing the record separator
    body = next(bytes(r["payload"]) for r in resp if r["http_status"] == 200)
    assert body == RECS[0][4]


def test_read_warc_strict_vs_salvage(spark, tmp_path):
    good = build_warc_bytes(RECS)
    torn = good + b"garbage that is not a warc record"
    (tmp_path / "torn.warc").write_bytes(torn)

    # salvage (default): everything before the tear survives
    rows = read_warc(spark, str(tmp_path / "torn.warc")).collect()
    assert len(rows) == 2

    # strict: the tear is a loud error
    with pytest.raises(Exception):
        read_warc(spark, str(tmp_path / "torn.warc"), strict=True).collect()


def test_parse_strict_error_classes():
    ok = build_warc_bytes(RECS)
    assert len(list(_parse_warc_bytes("f", ok, strict=True))) == 2
    # truncated payload (Content-Length overruns the buffer)
    with pytest.raises(ValueError):
        list(_parse_warc_bytes("f", ok[:-10], strict=True))
    # non-WARC leading bytes
    with pytest.raises(ValueError):
        list(_parse_warc_bytes("f", b"HTTP/1.1 200 OK\r\n\r\nx", strict=True))
    # salvage mode: same inputs, no raise
    assert len(list(_parse_warc_bytes("f", ok[:-10]))) <= 2
    assert list(_parse_warc_bytes("f", b"not warc")) == []
