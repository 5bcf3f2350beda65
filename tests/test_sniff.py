"""Magic-byte MIME sniffing: signature table, offset probes (RIFF,
ISO-BMFF), declared-type normalization and mismatch audit."""

from __future__ import annotations

from walker_spark.operators.multimodal import sniff_content_type

CASES = [
    (b"%PDF-1.7 xxxx", "application/pdf"),
    (b"\x89PNG\r\n\x1a\nxxxx", "image/png"),
    (b"\xff\xd8\xff\xe0JFIF", "image/jpeg"),
    (b"GIF89a....", "image/gif"),
    (b"\x1f\x8b\x08rest", "application/gzip"),
    (b"PK\x03\x04zipzip", "application/zip"),
    (b"ID3\x04tag", "audio/mpeg"),
    (b"OggSxxxx", "application/ogg"),
    (b"<!DOCTYPE html><html>", "text/html"),
    (b"<html><body>", "text/html"),
    (b"<?xml version='1.0'?>", "application/xml"),
    (b"RIFF\x00\x00\x00\x00WAVEfmt ", "audio/wav"),
    (b"RIFF\x00\x00\x00\x00WEBPVP8 ", "image/webp"),
    (b"RIFF\x00\x00\x00\x00AVI LIST", "video/x-msvideo"),
    (b"\x00\x00\x00\x18ftypmp42", "video/mp4"),
    (b"just some text", "application/octet-stream"),
    (b"RIFF\x00\x00\x00\x00XXXX", "application/octet-stream"),
    (b"", "application/octet-stream"),
]


def test_sniff_signatures(spark):
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, (b, _) in enumerate(CASES)],
        "id long, payload binary",
    )
    got = {
        r["id"]: r["sniffed_mime"]
        for r in sniff_content_type(df).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (i, CASES[i], got[i])


def test_declared_normalization_and_audit(spark):
    rows = [
        (0, bytearray(b"\x89PNG\r\n\x1a\n"), "image/png"),
        (1, bytearray(b"\x89PNG\r\n\x1a\n"), "Image/PNG; charset=binary"),
        (2, bytearray(b"\xff\xd8\xff\xe0"), "image/jpg"),  # alias folds
        (3, bytearray(b"\xff\xd8\xff\xe0"), "image/png"),  # server lies
    ]
    df = spark.createDataFrame(rows, "id long, payload binary, mime string")
    got = {
        r["id"]: (r["declared_norm"], r["mime_matches"])
        for r in sniff_content_type(df, declared_col="mime").collect()
    }
    assert got[0] == ("image/png", True)
    assert got[1] == ("image/png", True)
    assert got[2] == ("image/jpeg", True)
    assert got[3] == ("image/png", False)
