"""WARC source: read ISO 28500 web-archive files into the engine's
table model — the standard interchange format between crawlers
(wget/Heritrix/CommonCrawl) and training-data pipelines (reference:
walker persists fetches to its pages table, fetcher.go; WARC is the
export/import surface a user swapping crawlers needs).

Format subset (public spec, ISO 28500 / IIPC warc-specifications):
records are ``WARC/1.0`` header blocks terminated by CRLFCRLF, a body
of exactly ``Content-Length`` bytes, then CRLFCRLF; ``response``
records carry an HTTP message (status line, headers, body) as the
block. ``.warc.gz`` files are the usual per-record gzip members —
decoded as a multi-member stream.

Scale shape: one task per WARC file (``binaryFile`` source — WARC's
record framing has no split points without an index, so the FILE is
the parallelism unit; shard archives into many ~1 GB files, exactly
how CommonCrawl ships). Parsing is one ``mapInPandas`` pass; payload
bytes are born in the scan task and never shuffle (same contract as
the pages table's html).
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("warc_file", StringType(), False),
        StructField("record_type", StringType(), True),
        StructField("url", StringType(), True),
        StructField("warc_date", StringType(), True),
        StructField("http_status", IntegerType(), True),
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), False),
        StructField("checksum", StringType(), False),
    ]
)

_CRLF2 = b"\r\n\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the .warc.gz
    convention: one member per record). gzip.decompress stops after
    the FIRST member, so loop a raw zlib stream instead."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data))
        data = d.unused_data
        if not d.eof:  # truncated trailing member
            break
    return b"".join(out)


def _parse_warc_bytes(name: str, data: bytes, strict: bool = False):
    """Yield WARC_SCHEMA dicts from raw (already-decompressed) bytes.
    ``strict`` turns a torn/malformed record into a loud ValueError
    (FAILFAST — the read_jsonl contract); default keeps the salvage
    behavior: stop at the tear, keep everything parsed before it."""

    def torn(msg: str):
        if strict:
            raise ValueError(f"{name}: {msg}")

    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            torn(f"unterminated WARC header block at offset {pos}")
            break
        header = data[pos:hdr_end].decode("utf-8", "replace")
        lines = header.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            torn(f"not a WARC version line at offset {pos}")
            break
        fields = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields.get("content-length", "0"))
        except ValueError:
            torn(f"bad Content-Length at offset {pos}")
            break
        if hdr_end + 4 + clen > n:
            torn(f"payload overruns file at offset {pos}")
        block = data[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        rtype = fields.get("warc-type")
        url = fields.get("warc-target-uri")
        wdate = fields.get("warc-date")
        status = None
        mime = None
        payload = block
        if rtype == "response" and block.startswith(b"HTTP/"):
            he = block.find(_CRLF2)
            if he >= 0:
                hlines = block[:he].decode("utf-8", "replace").split("\r\n")
                parts = hlines[0].split(" ", 2)
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                for ln in hlines[1:]:
                    k, _, v = ln.partition(":")
                    if k.strip().lower() == "content-type":
                        mime = v.strip()
                payload = block[he + 4 :]
        yield {
            "warc_file": name,
            "record_type": rtype,
            "url": url,
            "warc_date": wdate,
            "http_status": status,
            "mime": mime,
            "payload": payload,
            "n_bytes": len(payload),
            "checksum": hashlib.md5(payload).hexdigest(),
        }


def read_warc(
    spark: SparkSession,
    path: str,
    types: tuple[str, ...] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Read WARC (or per-record-gzipped .warc.gz) files into a
    DataFrame of WARC_SCHEMA rows — one row per record, ``payload``
    the HTTP body for response records (raw block otherwise).

    ``types`` filters by WARC-Type INSIDE the parse task (the usual
    ingest wants ``("response",)`` only; dropping request/metadata
    records before they become rows avoids materializing them at
    all). ``strict=True`` raises on a torn/malformed record (the
    read_jsonl FAILFAST contract); the default salvages — a torn
    segment keeps every record before the tear, the quarantine mode
    for damaged archives."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in WARC_SCHEMA.fields}
            for name, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if name.endswith(".gz"):
                    data = _gunzip_members(data)
                for rec in _parse_warc_bytes(name, data, strict=strict):
                    if types is not None and rec["record_type"] not in types:
                        continue
                    for k, v in rec.items():
                        rows[k].append(v)
            yield pd.DataFrame(rows)

    raw = spark.read.format("binaryFile").load(path).select("path", "content")
    return raw.mapInPandas(parse, WARC_SCHEMA)


MANIFEST_SCHEMA = StructType(
    [
        StructField("warc_file", StringType(), False),
        StructField("n_records", LongType(), False),
        StructField("file_bytes", LongType(), False),
        StructField("payload_bytes", LongType(), False),
    ]
)


def write_warc(
    df: DataFrame,
    out_dir: str,
    gzip_members: bool = True,
    date: str = "1970-01-01T00:00:00Z",
) -> DataFrame:
    """Distributed WARC export: every partition of ``df`` (columns
    ``url``, ``http_status``, ``mime``, ``payload``; optional
    ``warc_date`` overriding ``date``) becomes ONE ``part-NNNNN.warc``
    (``.gz`` with per-record gzip members, mtime=0, when
    ``gzip_members``) shard in ``out_dir`` — the CommonCrawl sharding
    convention, so the file count IS the read-side parallelism. Shards
    are written to a dot-tmp name then atomically renamed (task retry
    leaves no partial shard); empty partitions write nothing. Eager:
    runs one job and returns the collected per-file manifest as a
    (tiny) DataFrame. Payload bytes stay in the task that owns the
    partition — repartition upstream to choose shard count/size.
    Reference parity: walker persists fetches to its pages table
    (fetcher.go); this is the export half of the WARC interchange
    surface, read_warc the import half."""
    import os

    spark = df.sparkSession
    os.makedirs(out_dir, exist_ok=True)
    has_date = "warc_date" in df.columns
    ext = ".warc.gz" if gzip_members else ".warc"

    def writer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        final = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        tmp = os.path.join(out_dir, f".part-{pid:05d}{ext}.tmp")
        n_rec = 0
        n_payload = 0
        f = None
        try:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                if f is None:
                    f = open(tmp, "wb")
                dates = pdf["warc_date"] if has_date else None
                recs = [
                    (
                        u,
                        dates.iloc[i] if dates is not None else date,
                        int(s),
                        m,
                        bytes(p),
                    )
                    for i, (u, s, m, p) in enumerate(
                        zip(
                            pdf["url"],
                            pdf["http_status"],
                            pdf["mime"],
                            pdf["payload"],
                        )
                    )
                ]
                f.write(build_warc_bytes(recs, gzip_members=gzip_members))
                n_rec += len(recs)
                n_payload += int(sum(len(r[4]) for r in recs))
            if f is not None:
                f.close()
                f = None
                os.replace(tmp, final)
                yield pd.DataFrame(
                    {
                        "warc_file": [final],
                        "n_records": [n_rec],
                        "file_bytes": [os.path.getsize(final)],
                        "payload_bytes": [n_payload],
                    }
                )
        finally:
            if f is not None:
                f.close()

    cols = ["url", "http_status", "mime", "payload"] + (
        ["warc_date"] if has_date else []
    )
    manifest = df.select(*cols).mapInPandas(writer, MANIFEST_SCHEMA).collect()
    return spark.createDataFrame(manifest, MANIFEST_SCHEMA)


def build_warc_bytes(records, gzip_members: bool = False) -> bytes:
    """Serialize ``(url, date, status, mime, body_bytes)`` tuples as a
    WARC response stream (deterministic — the test/fixture writer and
    the export path share it; gzip members use mtime=0 so shard bytes
    are bit-reproducible)."""
    import gzip as _gzip

    out = []
    for url, date, status, mime, body in records:
        http = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: {mime}\r\n\r\n"
        ).encode() + body
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{hashlib.md5(url.encode()).hexdigest()}>\r\n"
            f"WARC-Date: {date}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            "Content-Type: application/http;msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        rec = hdr + http + _CRLF2
        out.append(_gzip.compress(rec, mtime=0) if gzip_members else rec)
    return b"".join(out)
