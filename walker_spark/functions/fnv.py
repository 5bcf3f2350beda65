"""FNV-1 64-bit fingerprints (NOT FNV-1a: multiply *before* xor).

The reference fingerprints every fetched body and every extracted text
with Go's ``hash/fnv`` ``New64()`` and stores ``int64(Sum64())``
(reference: fetcher.go:585-589, 774-776; golden test
fetcher_test.go:1255-1344). Parameters are the published FNV-1
constants.

``fnv1_64_batch`` vectorizes *across rows* with numpy: the recurrence
is sequential per byte, but all rows in an Arrow batch advance one byte
position per vector op. Rows are processed in length-sorted chunks so a
single huge page doesn't pad the whole batch.
"""

from __future__ import annotations

import numpy as np

FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
_MASK = 0xFFFFFFFFFFFFFFFF


def fnv1_64(data: bytes) -> int:
    """Scalar reference implementation; returns signed int64."""
    h = FNV_OFFSET
    for b in data:
        h = ((h * FNV_PRIME) & _MASK) ^ b
    return h - (1 << 64) if h >= (1 << 63) else h


def _fnv1_chunk(chunk: list[bytes], out: np.ndarray, idx: np.ndarray) -> None:
    n = len(chunk)
    lens = np.fromiter((len(b) for b in chunk), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    if maxlen:
        # byte-position-major layout: the per-position loop reads
        # contiguous rows (n bytes each). A (rows, positions) layout
        # would read stride-maxlen columns — ~cacheline-per-element
        # traffic that saturates memory bandwidth and anti-scales with
        # concurrent workers.
        mat = np.zeros((maxlen, n), dtype=np.uint8)
        for i, b in enumerate(chunk):
            if b:
                mat[: len(b), i] = np.frombuffer(b, dtype=np.uint8)
        prime = np.uint64(FNV_PRIME)
        with np.errstate(over="ignore"):
            for j in range(maxlen):
                active = lens > j
                upd = (h * prime) ^ mat[j].astype(np.uint64)
                h = np.where(active, upd, h)
    out[idx] = h.view(np.int64)


def fnv1_64_batch(values, chunk_rows: int = 1024) -> np.ndarray:
    """FNV-1/64 of a sequence of bytes/str (None -> 0), as int64 array."""
    data = [
        v.encode("utf-8") if isinstance(v, str) else (v if v is not None else b"")
        for v in values
    ]
    n = len(data)
    out = np.zeros(n, dtype=np.int64)
    if not n:
        return out
    order = np.argsort(np.fromiter((len(b) for b in data), dtype=np.int64, count=n), kind="stable")
    for s in range(0, n, chunk_rows):
        idx = order[s : s + chunk_rows]
        _fnv1_chunk([data[i] for i in idx], out, idx)
    return out
