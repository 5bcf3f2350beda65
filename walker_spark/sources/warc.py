"""WARC source — the archive format web crawls actually ship in
(ISO 28500: WARC/1.0 and 1.1; every Common Crawl release is a set of
~1 GB ``.warc.gz`` segment files). The reference engine fetches live
HTTP (fetcher.go) — a Spark-first crawl/corpus engine additionally
needs to INGEST crawls that already happened, and WARC is that
interchange surface: read segments, surface (url, headers, html bytes)
rows, and feed them straight into the pages table / parse kernel /
training-data operators.

Spark shape — file-granular parallelism, record parsing in Arrow
batches:

- ``spark.read.format("binaryFile")`` lists and distributes the
  segment files; ONE FILE = ONE TASK. That is the honest scale unit
  for WARC: a crawl is 10^4-10^5 segment files of ~1 GB (Common Crawl
  publishes 64k/crawl, capped at 1 GB precisely so file-level
  parallelism is enough), so a 1000-executor cluster saturates on the
  file dimension alone. binaryFile's 2 GB/file JVM limit matches the
  format's own convention.
- Record splitting + header parsing happen in ``mapInPandas`` (Arrow
  batches in, small row batches out) — pure byte scanning against the
  framed ``Content-Length`` layout, NEVER a regex over payload bytes
  (bodies are binary; a separator scan would tear records whose body
  contains the separator).
- ``.warc.gz`` is handled transparently: the format gzips each record
  as its OWN gzip member and concatenates, and Python's zlib consumes
  concatenated members in one stream — so the same parser serves both
  plain and gz segments.

Strictness contract mirrors read_jsonl: default raises on a torn/
malformed record (FAILFAST); ``audit=True`` yields a per-file
``_corrupt`` count instead and keeps the parse alive.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd  # module-level: pandas_udf/mapInPandas type hints
from pyspark.sql import DataFrame, SparkSession

#: output schema of read_warc: one row per WARC record. body holds the
#: record payload with any HTTP envelope stripped (response records);
#: http_status/-content_type are parsed from that envelope and null
#: for non-response records.
WARC_SCHEMA = (
    "path string, warc_type string, target_uri string, warc_date string, "
    "record_id string, content_type string, http_status int, "
    "http_content_type string, body binary, body_len long, _corrupt int"
)

_CRLF = b"\r\n"
_BLANK = b"\r\n\r\n"


def _parse_records(buf: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers-lowercased, payload) per record from one
    uncompressed WARC buffer. Framing is Content-Length only — the
    ISO 28500 layout: version line, CRLF-separated headers, blank
    line, exactly Content-Length payload bytes, blank line."""
    i, n = 0, len(buf)
    while i < n:
        while buf[i : i + 2] == _CRLF:
            i += 2
        if i >= n:
            return
        eol = buf.find(_CRLF, i)
        if eol < 0 or not buf[i:eol].startswith(b"WARC/"):
            raise ValueError(f"not a WARC version line at offset {i}")
        hdr_end = buf.find(_BLANK, eol)
        if hdr_end < 0:
            raise ValueError(f"unterminated WARC header block at offset {i}")
        headers: dict = {}
        for line in buf[eol + 2 : hdr_end].split(_CRLF):
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = v.strip().decode(
                "utf-8", "replace"
            )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError(f"bad Content-Length at offset {i}") from e
        start = hdr_end + 4
        if start + clen > n:
            raise ValueError(f"payload overruns file at offset {i}")
        yield headers, buf[start : start + clen]
        i = start + clen


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) from an application/http payload;
    (None, None, payload) when no HTTP envelope is present."""
    sep = payload.find(_BLANK)
    first = payload.split(_CRLF, 1)[0]
    if sep < 0 or not first.startswith(b"HTTP/"):
        return None, None, payload
    parts = first.split()
    status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else None
    ctype = None
    for line in payload[:sep].split(_CRLF)[1:]:
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("utf-8", "replace")
    return status, ctype, payload[sep + 4 :]


def _decompress(raw: bytes) -> bytes:
    """Transparent per-record-gzip-member handling: gzip.GzipFile over
    the whole stream consumes concatenated members (the .warc.gz
    convention) as well as a single member or plain bytes."""
    if raw[:2] != b"\x1f\x8b":
        return raw
    return gzip.GzipFile(fileobj=io.BytesIO(raw)).read()


def read_warc(
    spark: SparkSession,
    path: str,
    audit: bool = False,
    types: tuple[str, ...] | None = None,
) -> DataFrame:
    """Read WARC/WARC.GZ segment files into one row per record
    (:data:`WARC_SCHEMA`). ``types`` filters by WARC-Type at parse
    time (e.g. ``("response",)`` — the usual ingest wants responses
    only, and dropping request/metadata records inside the scan task
    avoids materializing them at all). Default FAILFAST; ``audit=True``
    swallows a file's records after the first torn record and reports
    the file as one row with ``_corrupt = 1`` (body null), so a
    quality pass can quarantine segments without losing the scan.
    """
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list = []
            for fpath, raw in zip(pdf["path"], pdf["content"]):
                try:
                    buf = _decompress(bytes(raw))
                    for h, payload in _parse_records(buf):
                        wtype = h.get("warc-type", "")
                        if types is not None and wtype not in types:
                            continue
                        status, hctype, body = (
                            _split_http(payload)
                            if wtype == "response"
                            and h.get("content-type", "").startswith("application/http")
                            else (None, None, payload)
                        )
                        out.append(
                            (
                                fpath,
                                wtype,
                                h.get("warc-target-uri"),
                                h.get("warc-date"),
                                h.get("warc-record-id"),
                                h.get("content-type"),
                                status,
                                hctype,
                                body,
                                len(body),
                                0,
                            )
                        )
                except Exception:
                    if not audit:
                        raise
                    out.append(
                        (fpath, None, None, None, None, None, None, None, None, None, 1)
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "path",
                    "warc_type",
                    "target_uri",
                    "warc_date",
                    "record_id",
                    "content_type",
                    "http_status",
                    "http_content_type",
                    "body",
                    "body_len",
                    "_corrupt",
                ],
            )

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def build_warc_bytes(
    records: list[dict], gz: bool = False, per_record_members: bool = True
) -> bytes:
    """Serialize records to WARC bytes (the test/fixture twin of
    read_warc; also the shape a WARC SINK would emit per partition).
    Each record dict: ``warc_type``, ``target_uri``, ``payload``
    (bytes), optional ``warc_date``/``record_id``/``content_type``.
    ``gz=True`` emits the standard one-gzip-member-per-record layout
    (``per_record_members=False`` degrades to a single member — both
    must parse identically)."""
    chunks: list[bytes] = []
    for i, r in enumerate(records):
        payload = r["payload"]
        hdrs = [
            b"WARC/1.0",
            f"WARC-Type: {r['warc_type']}".encode(),
            f"WARC-Record-ID: {r.get('record_id', f'<urn:test:{i}>')}".encode(),
            f"WARC-Date: {r.get('warc_date', '2024-01-01T00:00:00Z')}".encode(),
            f"Content-Length: {len(payload)}".encode(),
        ]
        if r.get("target_uri"):
            hdrs.append(f"WARC-Target-URI: {r['target_uri']}".encode())
        if r.get("content_type"):
            hdrs.append(f"Content-Type: {r['content_type']}".encode())
        rec = _CRLF.join(hdrs) + _BLANK + payload + _BLANK
        chunks.append(gzip.compress(rec) if gz and per_record_members else rec)
    if gz and not per_record_members:
        return gzip.compress(b"".join(chunks))
    return b"".join(chunks)
